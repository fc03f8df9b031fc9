#!/bin/bash
# Round-4 chain B — coupled sweep with the phase-2 (hard-negative)
# encoder + the wall-clock profile the round-3 verdict asked for.
#
# Premises from the round-3 isolation sweep (BENCH_ACCURACY.md):
#   * --max_det 128 is the only CER-lossless cap (483.65 @ 0.0249);
#   * --max_nms 512 costs CER AND speed — excluded;
#   * the device program supports ~1,550 lines/s at this geometry, so the
#     measured 483 is host/pipeline-bound: every run here also emits the
#     per-stage host wall-clock split (BENCH_PROFILE=1).
# New axes this round: phase-2 encoder (CER headroom), case-repair
# anchors + spell-check (host-side accuracy levers — VERDICT #5 asks
# whether their CER gain buys throughput caps), max_det 96, and
# line_batch 512 (fewer relay round trips per line).
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
bench_stage() {  # bench_stage NAME EXTRA_FLAGS_JSON
  spec "$1" "$2"
  stage "bench_$1" "$OUT/$1.result.json" 3600 \
      "$REC/ref.npz" "$REC/enc_best.msgpack" \
      "$D/loc2k/best_bbox_mAP.msgpack" -- \
    env BENCH_TRAINED_SPEC="$OUT/$1.json" BENCH_PROFILE=1 \
        BENCH_OUT="$OUT/$1.result.json" \
    bash -c 'python bench.py > "$BENCH_OUT.tmp" 2> "${BENCH_OUT%.result.json}.log" && mv "$BENCH_OUT.tmp" "$BENCH_OUT"'
}

LB256='"--line_batch", "256", "--crop_batch", "8192"'
ANCHOR='"--anchor_margin", "0.15", "--anchor_multiplier", "2.0"'
SC='"--spell_check", "--dictionary_path", "/root/drive2/dict2k.txt", "--homoglyphs", "/root/drive2/homoglyphs2k.txt"'

# 1. the expected winner shape (cache-hot) + its profile
bench_stage hn_det128 "$LB256"', "--max_det", "128"'
# 2. host-side accuracy levers on the same device shapes (no recompile)
bench_stage hn_det128_anchor "$LB256"', "--max_det", "128", '"$ANCHOR"
bench_stage hn_det128_anchor_sc "$LB256"', "--max_det", "128", '"$ANCHOR"', '"$SC"
# 3. no-caps CER floor with the phase-2 encoder
bench_stage hn_trim "$LB256"
# 4. tighter det cap (recompile; argsort/ROI scale with max_det)
bench_stage hn_det96 "$LB256"', "--max_det", "96"'
# 5. bigger chunks: fewer relay round trips (recompile)
bench_stage hn_det128_lb512 '"--line_batch", "512", "--crop_batch", "16384", "--max_det", "128"'
# 6. shrink the packed device->host payload: word boxes are 2/3 of it at
#    max_words 64; reading-order slice makes 16 lossless here (recompile)
bench_stage hn_det128_w16 "$LB256"', "--max_det", "128", "--max_words", "16"'

stage pick_northstar - 300 -- python "$REPO/scripts/pick_northstar.py"
stage_summary
