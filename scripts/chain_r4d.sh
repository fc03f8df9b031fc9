#!/bin/bash
# Round-4 chain D — combine the sweep's winning axes, then re-pin.
#
# Chain B findings (sweep_r4, all at CER 0.013270 — every config below
# is CER-lossless, the phase-2 encoder owns the accuracy):
#   det96   575.6  (device program shrinks: argsort/NMS scale with max_det)
#   lb512   599.5  (half the relay round trips)
#   w16     512.8  (payload cut alone didn't move device_get -> the wait
#                   is device compute + latency, not bytes)
#   det128  422-433; trim 425.7
# So: stack lb512 + det96 (+w16, free), and measure the fixed Pallas NMS
# on the same shape as a separate candidate (validates the Mosaic fix
# on-chip, VERDICT #3).
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
source "$REPO/scripts/stage_lib.sh"
D=/root/drive2
OUT=$D/sweep_r4
mkdir -p "$OUT"
cd "$REPO"

REC=$D/rec2k_mn_hn
BASE='"--recognizer_dir", "/root/drive2/rec2k_mn_hn",
    "--localizer_dir", "/root/drive2/loc2k",
    "--lang", "en",
    "--localizer_conf_thresh", "0.3", "--localizer_iou_thresh", "0.25",
    "--adaptive_height", "--transfer_bits", "4",
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
  "artifacts": ["$REC/ref.npz", "$REC/enc_best.msgpack",
                "/root/drive2/loc2k/best_bbox_mAP.msgpack"],
  "flags": [$BASE$extra]
}
EOF
}
bench_stage() {
  spec "$1" "$2"
  stage "bench_$1" "$OUT/$1.result.json" 3600 \
      "$REC/ref.npz" "$REC/enc_best.msgpack" \
      "$D/loc2k/best_bbox_mAP.msgpack" -- \
    env BENCH_TRAINED_SPEC="$OUT/$1.json" BENCH_PROFILE=1 \
        BENCH_OUT="$OUT/$1.result.json" \
    bash -c 'python bench.py > "$BENCH_OUT.tmp" 2> "${BENCH_OUT%.result.json}.log" && mv "$BENCH_OUT.tmp" "$BENCH_OUT"'
}

COMBO='"--line_batch", "512", "--crop_batch", "16384", "--max_det", "96", "--max_words", "16"'
bench_stage hn_combo "$COMBO"
bench_stage hn_combo_pallas "$COMBO"', "--nms_kernel", "pallas"'
stage pick_northstar - 300 -- python "$REPO/scripts/pick_northstar.py"
stage_summary
