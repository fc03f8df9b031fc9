#!/bin/bash
# Round-5 chip queue: serialize all device jobs, riding out relay
# outages.  Order: chain_r5a (variance sessions + dither decision +
# jp coupled + pin) -> chain_r5c (jp v3 retrain) -> chain_r5b (FCOS +
# degradation suite + serve latency).  Every chain is stage-guarded and
# resumable, so re-running after an outage only redoes missing stages.
REPO="$(cd "$(dirname "$0")/.." && pwd)"

if [ -f /tmp/chain_r5a.pid ]; then
  while kill -0 "$(cat /tmp/chain_r5a.pid)" 2>/dev/null; do sleep 30; done
fi

# r5a may have burned its attempts during an outage — re-run it until
# its en results exist (stages skip what's already done)
for attempt in 1 2 3; do
  if [ -f /root/drive2/sweep_r5/en_bits2.result.json ] && \
     [ -f /root/drive2/sweep_r5/jp/jp_v2.result.json ]; then
    break
  fi
  bash "$REPO/scripts/wait_device.sh" 14400 || break
  echo "=== $(date -u +%H:%M:%S) (re)running chain_r5a (attempt $attempt)"
  bash "$REPO/scripts/chain_r5a.sh" >> /tmp/chain_r5a_queue.log 2>&1
done

bash "$REPO/scripts/wait_device.sh" 14400
echo "=== $(date -u +%H:%M:%S) starting r5c (jp v3)"
bash "$REPO/scripts/chain_r5c.sh" > /tmp/chain_r5c.log 2>&1
bash "$REPO/scripts/wait_device.sh" 7200
echo "=== $(date -u +%H:%M:%S) starting r5b (fcos/degraded/serve)"
bash "$REPO/scripts/chain_r5b.sh" > /tmp/chain_r5b.log 2>&1
echo "=== $(date -u +%H:%M:%S) queue done"
