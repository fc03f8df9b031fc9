#!/bin/bash
# Round-3 full artifact rebuild (host scratch wiped between sessions).
# Rebuilds the north-star artifact set from scratch and runs the decisive
# coupled bench (mobilenet caps + crop_batch 12288), then pins the winner
# in BENCH_TRAINED.json via pick_northstar.py.
#
# ONE chip + ONE CPU core: run alone, top to bottom. Every stage is
# guarded so the script re-enters after an interruption.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
D=/root/drive2
OUT=$D/sweep_r3
mkdir -p "$D/fonts" "$OUT"
for f in DejaVuSerif.ttf DejaVuSans.ttf DejaVuSerif-Bold.ttf; do
  ln -sf /usr/share/fonts/truetype/dejavu/$f "$D/fonts/$f"
done
cd "$D"
log() { echo "=== $(date -u +%H:%M:%S) rebuild_r3: $*"; }

# ---- 1. corpora (host CPU; corpus2k train/tune, eval5k held out) ----
if [ ! -e corpus2k/corpus.json ]; then
  log "make-corpus corpus2k (2,400 lines)"
  python -m effocr_tpu make-corpus --out_dir corpus2k --n_lines 2400 --lang en \
    --font_dir fonts --noise_std 6 --blur_sigma 0.6 --seed 7
fi
if [ ! -e split2k_val.json ]; then
  log coco-split
  python -m effocr_tpu coco-split --coco_json corpus2k/corpus.json \
    --out_prefix split2k --train_frac 0.8334 --val_frac 0.0833 --seed 99
fi
if [ ! -e eval5k/corpus.json ]; then
  log "make-corpus eval5k (5,000 held-out lines, seed-disjoint)"
  python -m effocr_tpu make-corpus --out_dir eval5k --n_lines 5000 --lang en \
    --font_dir fonts --noise_std 6 --blur_sigma 0.6 --seed 1234
fi
if [ ! -d english_charsets ]; then
  python -c "from effocr_tpu.data.builtin_charsets import write_charset_dir; write_charset_dir('english_charsets')"
fi
if [ ! -d tree2k ]; then
  log format-dataset
  python -m effocr_tpu format-dataset --image_dir corpus2k/images \
    --coco_jsons split2k_train.json,split2k_val.json,split2k_test.json \
    --crops_save_dir crops2k --cat_id 0 --font_dir fonts --spaces \
    --charset_dir english_charsets --dataset_save_dir tree2k
fi

# ---- 2. mobilenet recognizer (the measured north-star encoder) ----
if [ ! -e rec2k_mn/enc_best.msgpack ]; then
  log "train-recognizer rec2k_mn (mobilenetv3_small_050 @128 gray, paired_jitter)"
  timeout 5400 python -m effocr_tpu train-recognizer --root_dir_path tree2k \
    --train_ann_path split2k_train.json --val_ann_path split2k_val.json \
    --test_ann_path split2k_test.json --run_name rec2k_mn --lang en \
    --auto_model mobilenetv3_small_050 --imsize 128 --input_channels 1 \
    --batch_size 128 --lr 1e-3 --lr_schedule cosine --warmup_frac 0.05 \
    --aux_ce_weight 1.0 --ref_source centroid --num_epochs 16 \
    --num_passes 20 --paired_jitter 0.1 --infer_hardneg_k 8 \
    --data_device resident --test_at_end
fi
if [ ! -e rec2k_mn/ref.npz ]; then
  log "build-index rec2k_mn"
  timeout 1800 python -m effocr_tpu build-index --run_dir rec2k_mn --test
fi

# ---- 3. localizer (yolov5s gray, multi-height, fitted anchors) ----
if [ ! -e loc2k/best_bbox_mAP.msgpack ]; then
  log "train-localizer loc2k (yolov5s gray, multi_height 64,96, fit_anchors)"
  timeout 5400 python -m effocr_tpu train-localizer --image_dir corpus2k/images \
    --train_coco split2k_train.json --val_coco split2k_val.json \
    --run_name loc2k --arch yolov5s --input_size 1024 --multi_height 64,96 \
    --input_channels 1 --fit_anchors --batch_size 16 --num_epochs 60 \
    --eval_period 10 --data_device resident
fi

# ---- 4. decisive benches on eval5k (mncaps12 first, then trim12) ----
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
    log "FAILED $1"; rm -f "$OUT/$1.result.json"
  fi
}
spec mncaps12 '"--crop_batch", "12288", "--max_nms", "512", "--max_det", "128", "--crop_window", "128"'
spec mn_trim12 '"--crop_batch", "12288"'
run mncaps12
python "$REPO/scripts/pick_northstar.py" || log "pick_northstar: no pin"
run mn_trim12
python "$REPO/scripts/pick_northstar.py" || log "pick_northstar: no pin"
log "rebuild_r3_full drained"
