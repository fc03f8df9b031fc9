#!/bin/bash
# Copy round-5 measurement outputs from the (wipeable) artifact drives
# into the repo, so results survive VM reboots.  Idempotent; run as
# results land and before round end.
REPO="$(cd "$(dirname "$0")/.." && pwd)"
R=$REPO/bench_results/r5
mkdir -p "$R"
for f in /root/drive2/sweep_r5/*.result.json \
         /root/drive2/sweep_r5/*.sessions.jsonl \
         /root/drive2/sweep_r5/serve_latency.jsonl \
         /root/drive2/sweep_r5/jp/*.result.json \
         /root/drive2/sweep_r5/jp/*.sessions.jsonl \
         /root/drive2/eval_degraded/degraded_results.json; do
  [ -e "$f" ] && cp -f "$f" "$R/$(basename "$f")"
done
# jp dir results keep a jp_ prefix to avoid collisions
for f in /root/drive2/sweep_r5/jp/*.result.json; do
  [ -e "$f" ] && cp -f "$f" "$R/$(basename "$f")"
done
# training provenance: final metrics + args of each run dir
for d in /root/drive2/rec2k_mn /root/drive2/rec2k_mn_hn /root/drive2/loc2k \
         /root/drivejp/rec_knn6k3 /root/drivejp/rec_knn6k3_hn \
         /root/drivejp/loc_vert; do
  [ -d "$d" ] || continue
  n=$(basename "$d")
  for f in metrics.jsonl args_log.json model.json ref.txt; do
    [ -e "$d/$f" ] && { mkdir -p "$R/runs/$n"; cp -f "$d/$f" "$R/runs/$n/$f"; }
  done
done
echo "persisted: $(ls "$R" | wc -l) files"
