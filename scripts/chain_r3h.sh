#!/bin/bash
# Round-3 chip chain, part H (replaces chain_r3g with a higher-value
# order): wait for the in-flight queue_r3e.sh (mobilenet encoder attack
# on the north-star), then drain ONE device job at a time:
#   1. queue_r3e.sh rerun — existence-guarded no-op when it drained
#      cleanly; recovers build-index + benches if the trainer timed out
#   2. queue_r3f.sh — rec2k_j_hn index + phase-2 en test infer +
#      pallas-NMS microbench + serve smoke (the round-2 CPU-only tail)
#   3. rebuild_jp2.sh — jp retrain on the coverage-aware deduped charset
#      (VERDICT #8; CPU stages already done)
#   4. sweep_r3b_isolation.sh — cap attribution (diagnostic, last)
#   5. pick_northstar.py — pin the winning trained config in
#      BENCH_TRAINED.json for the driver's end-of-round bench
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
log() { echo "=== $(date -u +%H:%M:%S) chainH: $*"; }

QE_PID="${1:-}"
if [ -n "$QE_PID" ]; then
  log "waiting for queue_r3e (pid $QE_PID)"
  while kill -0 "$QE_PID" 2>/dev/null; do sleep 60; done
  log "queue_r3e finished"
fi

bash "$REPO/scripts/queue_r3e.sh" >> /tmp/queue_r3e.log 2>&1 || \
  log "queue_r3e rerun exited nonzero (see /tmp/queue_r3e.log)"
bash "$REPO/scripts/queue_r3f.sh" >> /tmp/queue_r3f.log 2>&1 || \
  log "queue_r3f exited nonzero (see /tmp/queue_r3f.log)"
bash "$REPO/scripts/rebuild_jp2.sh" >> /tmp/jp2_chip.log 2>&1 || \
  log "rebuild_jp2 exited nonzero (see /tmp/jp2_chip.log)"
bash "$REPO/scripts/sweep_r3b_isolation.sh" >> /tmp/sweep_r3b.log 2>&1 || \
  log "sweep_r3b exited nonzero (see /tmp/sweep_r3b.log)"
python "$REPO/scripts/pick_northstar.py" || log "pick_northstar: no pin"
log "chain H drained"
