#!/bin/bash
# Round-5 chain C — jp v3 chip stages (VERDICT #4: close the jp residual
# toward 0.035).  Same two-phase recipe as v2 (rebuild_jp2.sh) on the
# render-distance-merged charset v3 (dedupe_tol 0.07, 11,029 classes;
# host stages: rebuild_jp3_host.sh).  The localizer is reused from v2
# (loc_vert) — detection is glyph-agnostic and the corpus recipe is
# unchanged; the 19% deletion residual is attacked separately by a conf
# sweep at infer time.
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
source "$REPO/scripts/stage_lib.sh"
cd /root/drivejp

stage jp3_p1 rec_knn6k3/ref.npz 5400 tree6k3 split6k3_train.json -- \
  python -m effocr_tpu train-recognizer --root_dir_path tree6k3 \
    --train_ann_path split6k3_train.json --val_ann_path split6k3_val.json \
    --test_ann_path split6k3_test.json --run_name rec_knn6k3 --lang jp \
    --auto_model convnext_atto --imsize 128 --batch_size 128 \
    --lr 1e-3 --lr_schedule cosine --warmup_frac 0.05 \
    --aux_ce_weight 1.0 --ref_source centroid --crop_sim 0.2 \
    --paired_jitter 0.1 --num_epochs 40 --eval_period 4 \
    --data_device resident --infer_hardneg_k 8 --test_at_end

# recover the index/hns if the train stage was timeout-cut (the round-4
# standalone-mine path)
stage jp3_p1_index rec_knn6k3/hns.txt 3600 rec_knn6k3/enc_best.msgpack -- \
  python -m effocr_tpu build-index --run_dir rec_knn6k3 --mine_hardneg 8

stage jp3_p2 rec_knn6k3_hn/ref.npz 7200 rec_knn6k3/hns.txt -- \
  python -m effocr_tpu train-recognizer --root_dir_path tree6k3 \
    --train_ann_path split6k3_train.json --val_ann_path split6k3_val.json \
    --test_ann_path split6k3_test.json --run_name rec_knn6k3_hn --lang jp \
    --auto_model convnext_atto --imsize 128 --batch_size 128 \
    --lr 1e-3 --lr_schedule cosine --warmup_frac 0.05 \
    --aux_ce_weight 1.0 --ref_source centroid --crop_sim 0.2 \
    --paired_jitter 0.1 --num_epochs 40 --eval_period 4 \
    --data_device resident --hns_txt_path rec_knn6k3/hns.txt --test_at_end

stage jp3_p2_index rec_knn6k3_hn/ref.npz 3600 \
    rec_knn6k3_hn/enc_best.msgpack -- \
  python -m effocr_tpu build-index --run_dir rec_knn6k3_hn

stage jp3_infer out_jp3/metrics.json 3600 \
    rec_knn6k3_hn/ref.npz loc_vert/best_bbox_mAP.msgpack -- \
  python -m effocr_tpu infer --image_dir corpus6k3/images \
    --coco_json split6k3_test.json --recognizer_dir rec_knn6k3_hn \
    --localizer_dir loc_vert --lang jp --vertical --retrieval_kernel pallas \
    --transfer_bits 4 --line_batch 120 --crop_batch 4096 \
    --save_output out_jp3

# deletion attack: conf sweep (cheap; 0.3 is the v2 operating point)
stage jp3_conf15 out_jp3_c15/metrics.json 1800 out_jp3/metrics.json -- \
  python -m effocr_tpu infer --image_dir corpus6k3/images \
    --coco_json split6k3_test.json --recognizer_dir rec_knn6k3_hn \
    --localizer_dir loc_vert --lang jp --vertical --retrieval_kernel pallas \
    --localizer_conf_thresh 0.15 \
    --transfer_bits 4 --line_batch 120 --crop_batch 4096 \
    --save_output out_jp3_c15

stage jp3_error out_jp3/error_analysis.json 1800 \
    out_jp3/inference_results.json -- \
  python -m effocr_tpu error-analysis \
    --results out_jp3/inference_results.json \
    --coco_json split6k3_test.json --font_dir fonts --top 30 \
    --save_json out_jp3/error_analysis.json

stage_summary
tail -c 400 out_jp3/metrics.json 2>/dev/null || true
