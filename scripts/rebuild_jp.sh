#!/bin/bash
# Rebuild the round-2 Japanese vertical demo from scratch, now with the
# render-deduped charset (error-analysis: 39.8% of jp edits were render-
# identical codepoint twins; expect CER ~0.041 vs 0.0686). Configs mirror
# BENCH_ACCURACY.md "Japanese vertical end-to-end" + the queued dedup.
# CJK fonts come from the reference's japan_font_files assets (font
# binaries, not code). ONE chip + ONE CPU core: run alone, top to bottom;
# stages are guarded so the script can be re-entered.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
export PYTHONPATH="$REPO:/root/.axon_site"
D=/root/drivejp
mkdir -p "$D/fonts"
for f in /root/reference/japan_font_files/*.ttf; do
  ln -sf "$f" "$D/fonts/$(basename "$f")"
done
ln -sf /usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf "$D/fonts/"
ln -sf /usr/share/fonts/truetype/dejavu/DejaVuSans.ttf "$D/fonts/"
cd "$D"

log() { echo "=== $(date -u +%H:%M:%S) $*"; }

if [ ! -e charset_dedup/charset.txt ]; then
  log make-charset "(union coverage >=U+0100, render-deduped)"
  mkdir -p charset_dedup
  python -m effocr_tpu make-charset --font_dir fonts \
    --out charset_dedup/charset.txt --mode union --min_codepoint 256 \
    --dedupe_renders
fi

if [ ! -e corpus6kd/corpus.json ]; then
  log make-corpus "(6000 vertical lines)"
  python -m effocr_tpu make-corpus --out_dir corpus6kd --lang jp --vertical \
    --n_lines 6000 --chars_per_line 12 --noise_std 5 --blur_sigma 0.5 \
    --seed 11 --font_dir fonts --charset_file charset_dedup/charset.txt
fi

if [ ! -e split6kd_val.json ]; then
  log coco-split
  python -m effocr_tpu coco-split --coco_json corpus6kd/corpus.json \
    --out_prefix split6kd --train_frac 0.8 --val_frac 0.1 --seed 99
fi

if [ ! -d tree6kd ]; then
  log format-dataset "(71k crops + renders; slow on one core)"
  mkdir -p japan_charsets_dedup
  cp charset_dedup/charset.txt japan_charsets_dedup/
  python -m effocr_tpu format-dataset --image_dir corpus6kd/images \
    --coco_jsons split6kd_train.json,split6kd_val.json,split6kd_test.json \
    --crops_save_dir crops6kd --cat_id 0 --font_dir fonts \
    --charset_dir japan_charsets_dedup --dataset_save_dir tree6kd
fi

if [ ! -e rec_knn6kd/ref.npz ]; then
  log train-recognizer "(phase 1, ~8 min on chip)"
  timeout 3600 python -m effocr_tpu train-recognizer --root_dir_path tree6kd \
    --train_ann_path split6kd_train.json --val_ann_path split6kd_val.json \
    --test_ann_path split6kd_test.json --run_name rec_knn6kd --lang jp \
    --auto_model convnext_atto --imsize 128 --batch_size 128 \
    --lr 1e-3 --lr_schedule cosine --warmup_frac 0.05 \
    --aux_ce_weight 1.0 --ref_source centroid --crop_sim 0.2 \
    --num_epochs 40 --eval_period 4 --data_device resident \
    --infer_hardneg_k 8 --test_at_end
fi

if [ ! -e rec_knn6kd_hn/ref.npz ]; then
  log train-recognizer "(phase 2, hard negatives; harvest ~epoch 10 is fine)"
  timeout 3600 python -m effocr_tpu train-recognizer --root_dir_path tree6kd \
    --train_ann_path split6kd_train.json --val_ann_path split6kd_val.json \
    --test_ann_path split6kd_test.json --run_name rec_knn6kd_hn --lang jp \
    --auto_model convnext_atto --imsize 128 --batch_size 128 \
    --lr 1e-3 --lr_schedule cosine --warmup_frac 0.05 \
    --aux_ce_weight 1.0 --ref_source centroid --crop_sim 0.2 \
    --num_epochs 40 --eval_period 4 --data_device resident \
    --hns_txt_path rec_knn6kd/hns.txt --test_at_end
fi

if [ ! -e loc_vert/best_bbox_mAP.msgpack ]; then
  log train-localizer "(640x96 vertical canvas, 25 epochs)"
  timeout 3600 python -m effocr_tpu train-localizer --image_dir corpus6kd/images \
    --train_coco split6kd_train.json --val_coco split6kd_val.json \
    --run_name loc_vert --arch yolov5n --input_size 96 --input_height 640 \
    --batch_size 16 --num_epochs 25 --eval_period 5 --data_device resident
fi

log infer "(600 held-out vertical lines, pallas retrieval)"
timeout 3600 python -m effocr_tpu infer --image_dir corpus6kd/images \
  --coco_json split6kd_test.json --recognizer_dir rec_knn6kd_hn \
  --localizer_dir loc_vert --lang jp --vertical --retrieval_kernel pallas \
  --transfer_bits 4 --line_batch 120 --crop_batch 4096 --save_output out_jpd
log done
