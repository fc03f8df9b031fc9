#!/bin/bash
# Round-3 chip queue, part B (post crop-geometry fix, commit 914e55b).
# Prereq: scripts/queue_r3.sh artifacts exist (rec2k_j, loc2k, loc_vert,
# rec_knn6kd_hn with crop_geometry=tight stamped in model.json) and the
# eval5k north-star bench (python bench.py with BENCH_TRAINED.json) has
# been recorded.  ONE chip, ONE job at a time; stages are guarded for
# re-entry after session death.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
log() { echo "=== $(date -u +%H:%M:%S) $*"; }

D=/root/drive2
J=/root/drivejp

# ---- 1. jp vertical test infer with matched (tight) crop geometry ----
cd "$J"
if [ ! -e out_jpd2/metrics.json ]; then
  log "jp vertical test infer (tight geometry)"
  timeout 3600 python -m effocr_tpu infer --image_dir corpus6kd/images \
    --coco_json split6kd_test.json --recognizer_dir rec_knn6kd_hn \
    --localizer_dir loc_vert --lang jp --vertical --retrieval_kernel pallas \
    --transfer_bits 4 --line_batch 120 --crop_batch 4096 --save_output out_jpd2
fi

# ---- 2. en held-out test split: spell-check + homoglyph threshold
#          re-validation on a split never used for tuning (VERDICT r2 #9) ----
cd "$D"
if [ ! -e out2k_test/metrics.json ]; then
  log "en test infer (plain)"
  timeout 3600 python -m effocr_tpu infer --image_dir corpus2k/images \
    --coco_json split2k_test.json --recognizer_dir rec2k_j \
    --localizer_dir loc2k --lang en \
    --localizer_conf_thresh 0.3 --localizer_iou_thresh 0.25 \
    --adaptive_height --transfer_bits 4 --line_batch 128 --crop_batch 6144 \
    --save_output out2k_test
fi
if [ ! -e homoglyphs2k.txt ]; then
  log "build-homoglyphs (rec2k_j index)"
  timeout 1800 python -m effocr_tpu build-homoglyphs \
    --recognizer_dir rec2k_j --out homoglyphs2k.txt || true
fi
if [ ! -e dict2k.txt ]; then
  log "build-freq-dict from train-split texts"
  timeout 600 python -m effocr_tpu build-freq-dict \
    --coco_jsons split2k_train.json --out dict2k.txt || true
fi
if [ -e homoglyphs2k.txt ] && [ ! -e out2k_test_sc/metrics.json ]; then
  log "en test infer (spell-check + homoglyphs)"
  timeout 3600 python -m effocr_tpu infer --image_dir corpus2k/images \
    --coco_json split2k_test.json --recognizer_dir rec2k_j \
    --localizer_dir loc2k --lang en \
    --localizer_conf_thresh 0.3 --localizer_iou_thresh 0.25 \
    --adaptive_height --transfer_bits 4 --line_batch 128 --crop_batch 6144 \
    --spell_check --dictionary_path dict2k.txt --homoglyphs homoglyphs2k.txt \
    --save_output out2k_test_sc
fi

# ---- 3. jp phase-2 hard-negative training: continue the 40-epoch
#          schedule from the epoch-9 interrupt (part A timeout), rebuild
#          the index from the improved best checkpoint, re-infer ----
cd "$J"
if [ ! -e rec_knn6kd_hn/RESUMED_R3B ]; then
  log "jp phase-2 hns --resume (7200s slice)"
  timeout 7200 python -m effocr_tpu train-recognizer --root_dir_path tree6kd \
    --train_ann_path split6kd_train.json --val_ann_path split6kd_val.json \
    --test_ann_path split6kd_test.json --run_name rec_knn6kd_hn --lang jp \
    --auto_model convnext_atto --imsize 128 --batch_size 128 --lr 1e-3 \
    --lr_schedule cosine --warmup_frac 0.05 --aux_ce_weight 1.0 \
    --ref_source centroid --num_epochs 40 --num_passes 1 --crop_sim 0.2 \
    --hns_txt_path rec_knn6kd/hns.txt --resume \
    --data_device resident --eval_period 4 || true
  touch rec_knn6kd_hn/RESUMED_R3B
  rm -f rec_knn6kd_hn/ref.npz
fi
if [ ! -e rec_knn6kd_hn/ref.npz ]; then
  log "build-index rec_knn6kd_hn (post-resume best)"
  timeout 3600 python -m effocr_tpu build-index --run_dir rec_knn6kd_hn --test
fi
if [ ! -e out_jpd3/metrics.json ]; then
  log "jp vertical test infer (resumed hn encoder)"
  timeout 3600 python -m effocr_tpu infer --image_dir corpus6kd/images \
    --coco_json split6kd_test.json --recognizer_dir rec_knn6kd_hn \
    --localizer_dir loc_vert --lang jp --vertical --retrieval_kernel pallas \
    --transfer_bits 4 --line_batch 120 --crop_batch 4096 --save_output out_jpd3
fi

# ---- 4. --augment on-chip pass (crashed on a transient chip error in A) ----
cd "$D"
if [ ! -e loc_aug_chip/best_bbox_mAP.msgpack ]; then
  log "train-localizer --augment on-chip pass (short)"
  timeout 3600 python -m effocr_tpu train-localizer --image_dir corpus2k/images \
    --train_coco split2k_train.json --val_coco split2k_val.json \
    --run_name loc_aug_chip --arch yolov5n --input_size 1024 \
    --multi_height 64,96 --input_channels 1 --batch_size 16 \
    --num_epochs 10 --eval_period 5 --augment --data_device resident
fi

log "queue B drained"
