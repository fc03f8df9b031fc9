#!/bin/bash
# Round-4 chain E — re-measure the pinned winner at HEAD (picks up the
# vectorized en postprocess + first-char lookup) and try 2-bit transfer
# on top (halves the h2d bytes; r3 measured ~+0.003 CER from ordered
# dither, still 4x inside the 0.0593 budget).  Re-pins afterwards.
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
    "--adaptive_height",
    "--encoder_sub_batch", "2048",
    "--adaptive_width", "--chunk_sort", "width",
    "--line_batch", "512", "--crop_batch", "16384",
    "--max_det", "96", "--max_words", "16", "--nms_kernel", "pallas"'
spec() {
  local extra=""
  [ -n "$2" ] && extra=", $2"
  cat > "$OUT/$1.json" <<SPEC
{
  "image_dir": "/root/drive2/eval5k/images",
  "coco_json": "/root/drive2/eval5k/corpus.json",
  "max_lines": 5000,
  "artifacts": ["$REC/ref.npz", "$REC/enc_best.msgpack",
                "/root/drive2/loc2k/best_bbox_mAP.msgpack"],
  "flags": [$BASE$extra]
}
SPEC
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

bench_stage hn_combo_pallas2 '"--transfer_bits", "4"'
bench_stage hn_combo_pallas_bits2 '"--transfer_bits", "2"'
stage pick_northstar - 300 -- python "$REPO/scripts/pick_northstar.py"
stage_summary
