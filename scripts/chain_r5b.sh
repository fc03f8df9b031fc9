#!/bin/bash
# Round-5 chain B — train an alternate detector backend for real
# (VERDICT #5), the shifted-degradation eval suite (VERDICT #7), and the
# serve-mode latency table (VERDICT #9).
#
# 1. fcos_train   — FCOS (anchor-free family, models/fcos.py) on
#                   corpus2k at the loc2k budget/recipe (same canvas,
#                   same epochs; no --fit_anchors — anchor-free).
# 2. fcos_infer   — e2e CER through the UNCHANGED pipeline with the
#                   FCOS checkpoint + the pinned recognizer.
# 3. degraded_gen — host-side: build the 7-variant shifted-degradation
#                   suite from eval5k (scripts/make_degraded_eval.py).
# 4. degraded_eval— score the pinned artifacts across the suite.
# 5. serve_latency— p50/p95/p99 at 3 offered loads (continuous batching).
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
source "$REPO/scripts/stage_lib.sh"
D=/root/drive2
cd "$D"

stage fcos_train loc2k_fcos/best_bbox_mAP.msgpack 9000 \
    corpus2k/images split2k_train.json -- \
  python -m effocr_tpu train-localizer --image_dir corpus2k/images \
    --train_coco split2k_train.json --val_coco split2k_val.json \
    --run_name loc2k_fcos --arch fcos_s --input_size 1024 \
    --multi_height 64,96 --input_channels 1 --batch_size 16 \
    --num_epochs 60 --eval_period 10 --data_device resident

stage fcos_infer out_fcos/metrics.json 3600 \
    loc2k_fcos/best_bbox_mAP.msgpack rec2k_mn_hn/ref.npz -- \
  python -m effocr_tpu infer --image_dir eval5k/images \
    --coco_json eval5k/corpus.json --recognizer_dir rec2k_mn_hn \
    --localizer_dir loc2k_fcos --lang en \
    --localizer_conf_thresh 0.3 --localizer_iou_thresh 0.25 \
    --adaptive_height --adaptive_width --chunk_sort width \
    --encoder_sub_batch 2048 --line_batch 512 --crop_batch 20480 \
    --max_det 96 --max_words 16 --nms_kernel pallas \
    --transfer_bits 2 --out_quant u16 \
    --save_output out_fcos

stage degraded_gen eval_degraded/jpeg40/corpus.json 3600 \
    eval5k/corpus.json -- \
  python "$REPO/scripts/make_degraded_eval.py" --src eval5k \
    --out eval_degraded --n 2500

stage degraded_eval eval_degraded/degraded_results.json 7200 \
    eval_degraded/jpeg40/corpus.json -- \
  python "$REPO/scripts/degraded_eval.py" --suite eval_degraded

stage serve_latency sweep_r5/serve_latency.jsonl 3600 \
    rec2k_mn_hn/ref.npz -- \
  bash -c "python $REPO/scripts/serve_latency_bench.py \
    --loads 100,300,600 --n 900 --max_latency_ms 50 \
    > sweep_r5/serve_latency.jsonl"

stage_summary
