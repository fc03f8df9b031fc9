#!/bin/bash
# Round-3 Japanese rebuild v2: the coverage-aware charset dedup
# (data/fonts.dedupe_render_identical) removes the 328 codepoint twins
# the round-2 dedup missed (18% of out_jpd3 edits were still
# render-identical), and the recognizer gains --paired_jitter 0.1 (the
# en round-3 win against detector box jitter: e2e subs ran 2x the
# crop-level error).  CPU stages (corpus/tree) run during relay
# outages; chip stages are guarded for re-entry.  Reuses loc_vert (the
# detector's training distribution is charset-agnostic: same generator,
# fonts, canvas).
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
export PYTHONPATH="$REPO:/root/.axon_site"
D=/root/drivejp
cd "$D"

log() { echo "=== $(date -u +%H:%M:%S) $*"; }
CPU="env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu"

if [ ! -e charset_dedup2/charset.txt ]; then
  log make-charset "(union >=U+0100, coverage-aware render dedup)"
  mkdir -p charset_dedup2
  $CPU python -m effocr_tpu make-charset --font_dir fonts \
    --out charset_dedup2/charset.txt --mode union --min_codepoint 256 \
    --dedupe_renders
fi

if [ ! -e corpus6k2/corpus.json ]; then
  log make-corpus "(6000 vertical lines, deduped charset v2)"
  $CPU python -m effocr_tpu make-corpus --out_dir corpus6k2 --lang jp \
    --vertical --n_lines 6000 --chars_per_line 12 --noise_std 5 \
    --blur_sigma 0.5 --seed 11 --font_dir fonts \
    --charset_file charset_dedup2/charset.txt
fi

if [ ! -e split6k2_val.json ]; then
  log coco-split
  $CPU python -m effocr_tpu coco-split --coco_json corpus6k2/corpus.json \
    --out_prefix split6k2 --train_frac 0.8 --val_frac 0.1 --seed 99
fi

if [ ! -d tree6k2 ]; then
  log format-dataset "(crops + renders; slow on one core)"
  mkdir -p japan_charsets_dedup2
  cp charset_dedup2/charset.txt japan_charsets_dedup2/
  $CPU python -m effocr_tpu format-dataset --image_dir corpus6k2/images \
    --coco_jsons split6k2_train.json,split6k2_val.json,split6k2_test.json \
    --crops_save_dir crops6k2 --cat_id 0 --font_dir fonts \
    --charset_dir japan_charsets_dedup2 --dataset_save_dir tree6k2
fi

# ---- chip stages below ----
if ! timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
  log "chip unreachable (relay outage) — CPU stages done, rerun later"
  exit 0
fi

if [ ! -e rec_knn6k2/ref.npz ]; then
  log train-recognizer "(phase 1 + paired_jitter)"
  timeout 3600 python -m effocr_tpu train-recognizer --root_dir_path tree6k2 \
    --train_ann_path split6k2_train.json --val_ann_path split6k2_val.json \
    --test_ann_path split6k2_test.json --run_name rec_knn6k2 --lang jp \
    --auto_model convnext_atto --imsize 128 --batch_size 128 \
    --lr 1e-3 --lr_schedule cosine --warmup_frac 0.05 \
    --aux_ce_weight 1.0 --ref_source centroid --crop_sim 0.2 \
    --paired_jitter 0.1 --num_epochs 40 --eval_period 4 \
    --data_device resident --infer_hardneg_k 8 --test_at_end
fi

if [ ! -e rec_knn6k2_hn/ref.npz ]; then
  log train-recognizer "(phase 2, hard negatives + paired_jitter)"
  timeout 5400 python -m effocr_tpu train-recognizer --root_dir_path tree6k2 \
    --train_ann_path split6k2_train.json --val_ann_path split6k2_val.json \
    --test_ann_path split6k2_test.json --run_name rec_knn6k2_hn --lang jp \
    --auto_model convnext_atto --imsize 128 --batch_size 128 \
    --lr 1e-3 --lr_schedule cosine --warmup_frac 0.05 \
    --aux_ce_weight 1.0 --ref_source centroid --crop_sim 0.2 \
    --paired_jitter 0.1 --num_epochs 40 --eval_period 4 \
    --data_device resident --hns_txt_path rec_knn6k2/hns.txt --test_at_end
fi

if [ ! -e out_jp2/metrics.json ]; then
  log infer "(600 held-out vertical lines, pallas retrieval)"
  timeout 3600 python -m effocr_tpu infer --image_dir corpus6k2/images \
    --coco_json split6k2_test.json --recognizer_dir rec_knn6k2_hn \
    --localizer_dir loc_vert --lang jp --vertical --retrieval_kernel pallas \
    --transfer_bits 4 --line_batch 120 --crop_batch 4096 \
    --save_output out_jp2
fi

log "jp2 done"
tail -3 out_jp2/metrics.json 2>/dev/null || true
