#!/bin/bash
# Round-3 chip queue, part E: the encoder IS the wall (stage microbench
# at the trained geometry: encoder 363 ms vs detector 31.6 + NMS 60 +
# ROI 26.5 per 256-line batch).  convnext_atto@128 runs ~35 us/crop;
# mobilenetv3_small_050 measured ~5.5 us/crop in the round-2 profile —
# the reference's own fast recognizer backbone (README.md:133-135).
# Train it on the en corpus (single phase, reusing rec2k_j's mined
# hns.txt) and bench eval5k with the trained artifact.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
log() { echo "=== $(date -u +%H:%M:%S) r3e: $*"; }
D=/root/drive2
OUT=/root/drive2/sweep_r3
cd "$D"

# ---- 1. mobilenet recognizer (same recipe as rec2k_j_hn) ----
if [ ! -e rec2k_mn/enc_best.msgpack ]; then
  log "train rec2k_mn (mobilenetv3_small_050 @128 gray, paired_jitter, hns)"
  timeout 5400 python -m effocr_tpu train-recognizer --root_dir_path tree2k \
    --train_ann_path split2k_train.json --val_ann_path split2k_val.json \
    --test_ann_path split2k_test.json --run_name rec2k_mn --lang en \
    --auto_model mobilenetv3_small_050 --imsize 128 --input_channels 1 \
    --batch_size 128 --lr 1e-3 --lr_schedule cosine --warmup_frac 0.05 \
    --aux_ce_weight 1.0 --ref_source centroid --num_epochs 16 \
    --num_passes 20 --paired_jitter 0.1 --hns_txt_path rec2k_j/hns.txt \
    --data_device resident --test_at_end
fi
if [ ! -e rec2k_mn/ref.npz ]; then
  log "build-index rec2k_mn"
  timeout 1800 python -m effocr_tpu build-index --run_dir rec2k_mn --test
fi

# ---- 2. eval5k bench with the mobilenet encoder, three flag variants ----
cd "$REPO"
BASE='"--recognizer_dir", "/root/drive2/rec2k_mn",
    "--localizer_dir", "/root/drive2/loc2k",
    "--lang", "en",
    "--localizer_conf_thresh", "0.3", "--localizer_iou_thresh", "0.25",
    "--adaptive_height", "--transfer_bits", "4",
    "--line_batch", "256", "--encoder_sub_batch", "2048",
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
  "flags": [$BASE$extra]
}
EOF
}
run() {
  if [ -e "$OUT/$1.result.json" ]; then log "skip $1 (done)"; return; fi
  log "bench $1"
  if BENCH_TRAINED_SPEC="$OUT/$1.json" timeout 3600 \
      python bench.py > "$OUT/$1.result.json" 2> "$OUT/$1.log"; then
    tail -1 "$OUT/$1.result.json"
  else
    log "FAILED $1 (rc=$?)"; rm -f "$OUT/$1.result.json"
  fi
}
spec mn_trim   '"--crop_batch", "8192"'
spec mn_trim12 '"--crop_batch", "12288"'
spec mn_caps   '"--crop_batch", "8192", "--max_nms", "512", "--max_det", "128", "--crop_window", "128"'
run mn_trim
run mn_trim12
run mn_caps

# ---- 3. fallback: convnext_atto @96 if the mobilenet CER is off ----
CER=$(python -c "
import json,sys
try:
    for l in open('$OUT/mn_trim.result.json'):
        if l.startswith('{'): print(json.loads(l)['cer']); break
except Exception: print(1.0)" | tail -1)
log "mn_trim CER = $CER"
if python -c "import sys; sys.exit(0 if float('$CER') > 0.055 else 1)"; then
  cd "$D"
  if [ ! -e rec2k_a96/enc_best.msgpack ]; then
    log "fallback: train rec2k_a96 (convnext_atto @96)"
    timeout 5400 python -m effocr_tpu train-recognizer --root_dir_path tree2k \
      --train_ann_path split2k_train.json --val_ann_path split2k_val.json \
      --test_ann_path split2k_test.json --run_name rec2k_a96 --lang en \
      --auto_model convnext_atto --imsize 96 --input_channels 1 \
      --batch_size 128 --lr 1e-3 --lr_schedule cosine --warmup_frac 0.05 \
      --aux_ce_weight 1.0 --ref_source centroid --num_epochs 16 \
      --num_passes 20 --paired_jitter 0.1 --hns_txt_path rec2k_j/hns.txt \
      --data_device resident --test_at_end
  fi
  if [ ! -e rec2k_a96/ref.npz ]; then
    timeout 1800 python -m effocr_tpu build-index --run_dir rec2k_a96 --test
  fi
  cd "$REPO"
  BASE="${BASE/rec2k_mn/rec2k_a96}"
  spec a96_trim '"--crop_batch", "8192"'
  sed -i 's#rec2k_mn/ref.npz#rec2k_a96/ref.npz#' "$OUT/a96_trim.json"
  run a96_trim
fi

log "queue E drained"
