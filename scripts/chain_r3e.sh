#!/bin/bash
# Round-3 chip chain, part E (replaces chain_r3d's tail): wait for the
# in-flight queue_r3c.sh to finish, then drain (ONE device job at a
# time):
#   1. queue_r3e.sh — mobilenet recognizer train + eval5k bench (the
#      encoder-wall attack; microbench says encoder = 363 of ~450 ms)
#   2. sweep_r3b_isolation.sh — attribute the caps CER/speed split
#   3. rebuild_jp2.sh — jp retrain on the coverage-aware deduped charset
# Final BENCH_TRAINED.json flag pick + bench.py stays manual.
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
log() { echo "=== $(date -u +%H:%M:%S) chainE: $*"; }

QC_PID="${1:-}"
if [ -n "$QC_PID" ]; then
  log "waiting for queue_r3c (pid $QC_PID)"
  while kill -0 "$QC_PID" 2>/dev/null; do sleep 60; done
  log "queue_r3c finished"
fi

bash "$REPO/scripts/queue_r3e.sh" >> /tmp/queue_r3e.log 2>&1 || \
  log "queue_r3e exited nonzero (see /tmp/queue_r3e.log)"
bash "$REPO/scripts/sweep_r3b_isolation.sh" >> /tmp/sweep_r3b.log 2>&1 || \
  log "sweep_r3b exited nonzero (see /tmp/sweep_r3b.log)"
bash "$REPO/scripts/rebuild_jp2.sh" >> /tmp/jp2_chip.log 2>&1 || \
  log "rebuild_jp2 exited nonzero (see /tmp/jp2_chip.log)"
log "chain E drained"
