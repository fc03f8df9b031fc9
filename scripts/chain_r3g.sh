#!/bin/bash
# Round-3 chip chain, part G (replaces chain_r3e's tail): wait for the
# in-flight queue_r3e.sh, then drain (ONE device job at a time):
#   1. queue_r3f.sh — rec2k_j_hn index + phase-2 test infer (lost to the
#      stage-3 timeout) + pallas-NMS on-chip microbench
#   2. sweep_r3b_isolation.sh — attribute the caps CER/speed split
#   3. rebuild_jp2.sh — jp retrain on the coverage-aware deduped charset
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
log() { echo "=== $(date -u +%H:%M:%S) chainG: $*"; }

QE_PID="${1:-}"
if [ -n "$QE_PID" ]; then
  log "waiting for queue_r3e (pid $QE_PID)"
  while kill -0 "$QE_PID" 2>/dev/null; do sleep 60; done
  log "queue_r3e finished"
fi

# re-run queue_r3e first: every stage is existence-guarded, so this is a
# no-op when it drained cleanly, and picks up build-index + benches when
# its trainer hit the timeout (same set -e failure queue_r3c had)
bash "$REPO/scripts/queue_r3e.sh" >> /tmp/queue_r3e.log 2>&1 || \
  log "queue_r3e rerun exited nonzero (see /tmp/queue_r3e.log)"
bash "$REPO/scripts/queue_r3f.sh" >> /tmp/queue_r3f.log 2>&1 || \
  log "queue_r3f exited nonzero (see /tmp/queue_r3f.log)"
bash "$REPO/scripts/sweep_r3b_isolation.sh" >> /tmp/sweep_r3b.log 2>&1 || \
  log "sweep_r3b exited nonzero (see /tmp/sweep_r3b.log)"
bash "$REPO/scripts/rebuild_jp2.sh" >> /tmp/jp2_chip.log 2>&1 || \
  log "rebuild_jp2 exited nonzero (see /tmp/jp2_chip.log)"
log "chain G drained"
