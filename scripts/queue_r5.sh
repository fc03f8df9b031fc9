#!/bin/bash
# Round-5 chip queue: serialize all device jobs, riding out relay
# outages.  Deadline-aware ordering: chain_r5a (variance sessions +
# dither decision + jp coupled + pin) always first; then, if enough
# round time remains, chain_r5c (jp v3 retrain, the longest job) before
# chain_r5b (FCOS + degradation suite + serve latency) — otherwise b
# first so the cheaper verdict items land.
REPO="$(cd "$(dirname "$0")/.." && pwd)"
END_EPOCH="${ROUND_END_EPOCH:-$(date -d 'today 10:15' +%s 2>/dev/null || echo 0)}"

if [ -f /tmp/chain_r5a.pid ]; then
  while kill -0 "$(cat /tmp/chain_r5a.pid)" 2>/dev/null; do sleep 30; done
fi

for attempt in 1 2 3; do
  if [ -f /root/drive2/sweep_r5/en_bits2.result.json ] && \
     [ -f /root/drive2/sweep_r5/jp/jp_v2.result.json ]; then
    break
  fi
  bash "$REPO/scripts/wait_device.sh" 14400 || break
  echo "=== $(date -u +%H:%M:%S) (re)running chain_r5a (attempt $attempt)"
  bash "$REPO/scripts/chain_r5a.sh" >> /tmp/chain_r5a_queue.log 2>&1
done

left=$(( END_EPOCH - $(date +%s) ))
echo "=== $(date -u +%H:%M:%S) r5a phase done; ${left}s to round end"
if [ "$left" -gt 16200 ]; then
  order="c b"
else
  order="b c"   # short on time: cheap verdict items first
fi
for chain in $order; do
  bash "$REPO/scripts/wait_device.sh" 10800 || break
  echo "=== $(date -u +%H:%M:%S) starting r5$chain"
  bash "$REPO/scripts/chain_r5$chain.sh" > /tmp/chain_r5$chain.log 2>&1
done
echo "=== $(date -u +%H:%M:%S) queue done"
