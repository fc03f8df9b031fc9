#!/bin/bash
# Round-3 sweep, part 2: isolate WHICH cap buys the caps-config speed (now on the mobilenet encoder, rec2k_mn)
# (528 lines/s vs trim's 360) and which one costs its CER (0.0574 vs
# 0.0327).  eval5k has <=60 boxes/line, so max_det=128 cannot truncate
# GT — the suspects are max_nms (drops low-rank candidates pre-NMS) and
# crop_window (clips crop extents).  Each variant = one bench.py
# run_trained invocation; results in /root/drive2/sweep_r3/.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
OUT=/root/drive2/sweep_r3
mkdir -p "$OUT"
cd "$REPO"

BASE_FLAGS='"--recognizer_dir", "/root/drive2/rec2k_mn",
    "--localizer_dir", "/root/drive2/loc2k",
    "--lang", "en",
    "--localizer_conf_thresh", "0.3",
    "--localizer_iou_thresh", "0.25",
    "--adaptive_height",
    "--transfer_bits", "4",
    "--line_batch", "256",
    "--crop_batch", "8192",
    "--encoder_sub_batch", "2048",
    "--adaptive_width", "--chunk_sort", "width"'

spec() {
  local extra=""
  [ -n "$2" ] && extra=", $2"
  cat > "$OUT/$1.json" <<EOF
{
  "image_dir": "/root/drive2/eval5k/images",
  "coco_json": "/root/drive2/eval5k/corpus.json",
  "max_lines": 5000,
  "artifacts": ["/root/drive2/rec2k_mn/ref.npz",
                "/root/drive2/loc2k/best_bbox_mAP.msgpack"],
  "flags": [$BASE_FLAGS$extra]
}
EOF
}

run() {
  if [ -e "$OUT/$1.result.json" ]; then echo "skip $1 (done)"; return; fi
  echo "=== $(date -u +%H:%M:%S) sweep2: $1"
  if BENCH_TRAINED_SPEC="$OUT/$1.json" timeout 3600 \
      python bench.py > "$OUT/$1.result.json" 2> "$OUT/$1.log"; then
    tail -1 "$OUT/$1.result.json"
  else
    echo "FAILED $1 (rc=$?)"; rm -f "$OUT/$1.result.json"
  fi
}

# isolate each cap on top of trim
spec mniso_det '"--max_det", "128"'
spec mniso_nms '"--max_nms", "512"'
spec mniso_win '"--crop_window", "128"'
run mniso_det
run mniso_nms
run mniso_win

# best-guess recombinations: keep the speed caps, relax the CER one(s)
spec mncaps_relax1 '"--max_det", "128", "--max_nms", "768", "--crop_window", "160"'
spec mncaps_relax2 '"--max_det", "192", "--max_nms", "512", "--crop_window", "160"'
run mncaps_relax1
run mncaps_relax2

echo "=== sweep2 done"
for f in "$OUT"/mniso_*.result.json "$OUT"/mncaps_relax*.result.json; do
  echo "$f"; tail -1 "$f" 2>/dev/null
done
