#!/bin/bash
# Rebuild the round-2 English demo artifacts from scratch (host scratch at
# /root/drive2 is ephemeral and was wiped between sessions; configs mirror
# BENCH_ACCURACY.md "Setup"). ONE chip + ONE CPU core: run alone, top to
# bottom. Stages are idempotent-ish (skip via the [ -e ] guards) so the
# script can be re-entered after an interruption.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
export PYTHONPATH="$REPO:/root/.axon_site"
D=/root/drive2
mkdir -p "$D/fonts"
for f in DejaVuSerif.ttf DejaVuSans.ttf DejaVuSerif-Bold.ttf; do
  ln -sf /usr/share/fonts/truetype/dejavu/$f "$D/fonts/$f"
done
cd "$D"

log() { echo "=== $(date -u +%H:%M:%S) $*"; }

if [ ! -e corpus/corpus.json ]; then
  log make-corpus
  python -m effocr_tpu make-corpus --out_dir corpus --n_lines 400 --lang en \
    --font_dir fonts --noise_std 6 --blur_sigma 0.6 --seed 7
fi

if [ ! -e split_val.json ]; then
  log coco-split
  python -m effocr_tpu coco-split --coco_json corpus/corpus.json \
    --out_prefix split --train_frac 0.8 --val_frac 0.1 --seed 99
fi

if [ ! -d english_charsets ]; then
  log charsets
  python -c "from effocr_tpu.data.builtin_charsets import write_charset_dir; write_charset_dir('english_charsets')"
fi

if [ ! -d tree ]; then
  log format-dataset
  python -m effocr_tpu format-dataset --image_dir corpus/images \
    --coco_jsons split_train.json,split_val.json,split_test.json \
    --crops_save_dir crops --cat_id 0 --font_dir fonts --spaces \
    --charset_dir english_charsets --dataset_save_dir tree
fi

if [ ! -e rec_knn/ref.npz ]; then
  log train-recognizer
  timeout 3000 python -m effocr_tpu train-recognizer --root_dir_path tree \
    --train_ann_path split_train.json --val_ann_path split_val.json \
    --test_ann_path split_test.json --run_name rec_knn --lang en \
    --auto_model convnext_atto --imsize 128 --batch_size 128 \
    --lr 1e-3 --lr_schedule cosine --warmup_frac 0.05 \
    --aux_ce_weight 1.0 --ref_source centroid --num_epochs 16 \
    --num_passes 20 --data_device resident --test_at_end
fi

if [ ! -e loc_rect/best_bbox_mAP.msgpack ]; then
  log train-localizer
  timeout 3600 python -m effocr_tpu train-localizer --image_dir corpus/images \
    --train_coco split_train.json --val_coco split_val.json \
    --run_name loc_rect --arch yolov5n --input_size 1024 --input_height 96 \
    --batch_size 16 --num_epochs 150 --eval_period 10 \
    --data_device resident
fi

log infer
timeout 1800 python -m effocr_tpu infer --image_dir corpus/images \
  --coco_json split_val.json --recognizer_dir rec_knn \
  --localizer_dir loc_rect --lang en \
  --localizer_conf_thresh 0.3 --localizer_iou_thresh 0.25 \
  --transfer_bits 4 --line_batch 128 --crop_batch 6144 \
  --save_output out_val
log done
