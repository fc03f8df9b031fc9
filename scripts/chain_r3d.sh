#!/bin/bash
# Round-3 chip chain, part D: wait out the relay outage, then drain the
# queued chip work in order (ONE device job at a time):
#   1. queue_r3c.sh  — stage microbench, anchors+sc test infer,
#                      en phase-2 hns train + infer
#   2. sweep_r3b_isolation.sh — attribute the caps CER/speed split
#   3. rebuild_jp2.sh — jp retrain on the coverage-aware deduped charset
# Final BENCH_TRAINED.json flag pick + bench.py run stays manual (needs
# a human/agent look at the sweep results).
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
log() { echo "=== $(date -u +%H:%M:%S) chain: $*"; }

log "probing chip (5-min loop until the relay returns)"
while ! timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
  log "chip unreachable; sleeping 300s"
  sleep 300
done
log "chip is back"

bash "$REPO/scripts/queue_r3c.sh" >> /tmp/queue_r3c.log 2>&1 || \
  log "queue_r3c exited nonzero (see /tmp/queue_r3c.log)"
bash "$REPO/scripts/sweep_r3b_isolation.sh" >> /tmp/sweep_r3b.log 2>&1 || \
  log "sweep_r3b exited nonzero (see /tmp/sweep_r3b.log)"
bash "$REPO/scripts/rebuild_jp2.sh" >> /tmp/jp2_chip.log 2>&1 || \
  log "rebuild_jp2 exited nonzero (see /tmp/jp2_chip.log)"
log "chain drained"
