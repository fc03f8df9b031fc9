#!/bin/bash
# Round-5 chip queue: after chain_r5a (variance sessions + pin) exits,
# run chain_r5c (jp v3 two-phase retrain at the merged charset) then
# chain_r5b (FCOS for real + degradation suite + serve latency).  One
# device job at a time; each chain is stage-guarded and resumable.
REPO="$(cd "$(dirname "$0")/.." && pwd)"

if [ -f /tmp/chain_r5a.pid ]; then
  while kill -0 "$(cat /tmp/chain_r5a.pid)" 2>/dev/null; do sleep 30; done
fi
echo "=== $(date -u +%H:%M:%S) r5a done; starting r5c (jp v3)"
bash "$REPO/scripts/chain_r5c.sh" > /tmp/chain_r5c.log 2>&1
echo "=== $(date -u +%H:%M:%S) r5c done; starting r5b (fcos/degraded/serve)"
bash "$REPO/scripts/chain_r5b.sh" > /tmp/chain_r5b.log 2>&1
echo "=== $(date -u +%H:%M:%S) r5b done"
