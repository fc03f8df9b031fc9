#!/bin/bash
# Round-4 chain C — finish the jp v2 rebuild (VERDICT r3 #4).
#
# Phase 1 (rec_knn6k2, coverage-aware dedup charset, paired_jitter) is
# trained; its in-training hns mining was cut by the stage timeout, so
# chain_r4a mined hns.txt standalone (build-index --mine_hardneg).  This
# chain runs the phase-2 hard-negative retrain and the held-out infer.
#
# The HardNegativeClassSampler epoch is ~40x the phase-1 epoch (one
# spliced confusion set per paired train crop, reference
# recognizer_samplers.py:94-156), so: num_epochs 12 (cosine completes
# inside the budget; pre-wipe evidence says most of the phase-2 gain
# lands by epoch ~9), eval_period 1 (best-ckpt lands every epoch — a
# timeout still leaves a usable best), and a build-index recovery stage.
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
source "$REPO/scripts/stage_lib.sh"
J=/root/drivejp
cd "$J"

stage jp_p2 rec_knn6k2_hn/enc_best.msgpack 16200 \
    tree6k2 rec_knn6k2/hns.txt -- \
  python -m effocr_tpu train-recognizer --root_dir_path tree6k2 \
    --train_ann_path split6k2_train.json --val_ann_path split6k2_val.json \
    --test_ann_path split6k2_test.json --run_name rec_knn6k2_hn --lang jp \
    --auto_model convnext_atto --imsize 128 --batch_size 128 \
    --lr 1e-3 --lr_schedule cosine --warmup_frac 0.05 \
    --aux_ce_weight 1.0 --ref_source centroid --crop_sim 0.2 \
    --paired_jitter 0.1 --num_epochs 12 --eval_period 1 \
    --data_device resident --hns_txt_path rec_knn6k2/hns.txt --test_at_end

stage jp_p2_index rec_knn6k2_hn/ref.npz 3600 \
    rec_knn6k2_hn/enc_best.msgpack -- \
  python -m effocr_tpu build-index --run_dir rec_knn6k2_hn --test

stage jp_infer out_jp2/metrics.json 3600 \
    rec_knn6k2_hn/ref.npz loc_vert/best_bbox_mAP.msgpack -- \
  python -m effocr_tpu infer --image_dir corpus6k2/images \
    --coco_json split6k2_test.json --recognizer_dir rec_knn6k2_hn \
    --localizer_dir loc_vert --lang jp --vertical --retrieval_kernel pallas \
    --transfer_bits 4 --line_batch 120 --crop_batch 4096 \
    --save_output out_jp2

stage jp_error_analysis out_jp2/error_analysis.json 1800 \
    out_jp2/inference_results.json -- \
  python -m effocr_tpu error-analysis \
    --results out_jp2/inference_results.json \
    --coco_json split6k2_test.json --font_dir fonts \
    --save_json out_jp2/error_analysis.json

stage_summary
