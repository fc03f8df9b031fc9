#!/bin/bash
# North-star chain (VERDICT r2 #1): train grayscale-native en artifacts for
# the fast configuration and demonstrate >=625 lines/s/chip AND CER <= 0.0593
# in ONE trained-artifact invocation (timing semantics match the reference's
# infer_effocr_onnx_multi.py:394-395 — wall clock over the whole corpus,
# host decode included).
#
# Corpora (built by the round-3 session on 2026-08-19, make-corpus):
#   /root/drive2/corpus2k  — 2,400 lines, split2k_{train,val,test}.json, tree2k
#   /root/drive2/eval5k    — 5,000 held-out lines (seed-disjoint), corpus.json
#
# ONE chip, ONE job at a time. Stages are guarded so the script re-enters.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
export PYTHONPATH="$REPO:/root/.axon_site"
D=/root/drive2
cd "$D"

log() { echo "=== $(date -u +%H:%M:%S) $*"; }

# Stage 1 — grayscale recognizer (fast-config geometry: convnext_atto@128,
# 1 channel), hns mined for an optional phase 2.
if [ ! -e rec2k/ref.npz ]; then
  log "train-recognizer rec2k (grayscale)"
  timeout 5400 python -m effocr_tpu train-recognizer --root_dir_path tree2k \
    --train_ann_path split2k_train.json --val_ann_path split2k_val.json \
    --test_ann_path split2k_test.json --run_name rec2k --lang en \
    --auto_model convnext_atto --imsize 128 --input_channels 1 \
    --batch_size 128 --lr 1e-3 --lr_schedule cosine --warmup_frac 0.05 \
    --aux_ce_weight 1.0 --ref_source centroid --num_epochs 16 \
    --num_passes 20 --data_device resident --infer_hardneg_k 8 --test_at_end
fi

# Stage 2 — paired-jitter A/B twin (VERDICT r2 #3: detector-jitter CER gap;
# jitter-augmented paired crops should make the encoder robust to box noise).
if [ ! -e rec2k_j/ref.npz ]; then
  log "train-recognizer rec2k_j (grayscale + paired_jitter 0.1)"
  timeout 5400 python -m effocr_tpu train-recognizer --root_dir_path tree2k \
    --train_ann_path split2k_train.json --val_ann_path split2k_val.json \
    --test_ann_path split2k_test.json --run_name rec2k_j --lang en \
    --auto_model convnext_atto --imsize 128 --input_channels 1 \
    --batch_size 128 --lr 1e-3 --lr_schedule cosine --warmup_frac 0.05 \
    --aux_ce_weight 1.0 --ref_source centroid --num_epochs 16 \
    --num_passes 20 --paired_jitter 0.1 --data_device resident --test_at_end
fi

# Stage 3 — grayscale multi-height localizer, capacity up (yolov5s), fitted
# anchor priors (char boxes are far smaller than the COCO defaults).
if [ ! -e loc2k/best_bbox_mAP.msgpack ]; then
  log "train-localizer loc2k (yolov5s gray, multi_height 64,96, fit_anchors)"
  timeout 7200 python -m effocr_tpu train-localizer --image_dir corpus2k/images \
    --train_coco split2k_train.json --val_coco split2k_val.json \
    --run_name loc2k --arch yolov5s --input_size 1024 --multi_height 64,96 \
    --input_channels 1 --fit_anchors --batch_size 16 --num_epochs 60 \
    --eval_period 5 --data_device resident
fi

# Stage 4 — A/B on the val split (detected boxes): pick the better recognizer.
for rec in rec2k rec2k_j; do
  if [ ! -e "out2k_${rec}/inference_results.json" ]; then
    log "infer val ($rec)"
    timeout 3600 python -m effocr_tpu infer --image_dir corpus2k/images \
      --coco_json split2k_val.json --recognizer_dir "$rec" \
      --localizer_dir loc2k --lang en \
      --localizer_conf_thresh 0.3 --localizer_iou_thresh 0.25 \
      --adaptive_height --transfer_bits 4 --line_batch 128 --crop_batch 6144 \
      --save_output "out2k_${rec}"
  fi
done

log "A/B done — run stage 5 (eval5k north-star) manually with the winner:"
echo "  cd $D && timeout 3600 python -m effocr_tpu infer \\"
echo "    --image_dir eval5k/images --coco_json eval5k/corpus.json \\"
echo "    --recognizer_dir <WINNER> --localizer_dir loc2k --lang en \\"
echo "    --localizer_conf_thresh 0.3 --localizer_iou_thresh 0.25 \\"
echo "    --adaptive_height --transfer_bits 4 --line_batch 256 \\"
echo "    --crop_batch 6144 --save_output out_eval5k"
log done
