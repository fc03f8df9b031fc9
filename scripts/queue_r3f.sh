#!/bin/bash
# Round-3 chip queue, part F: stages queue_r3c lost when its trainer hit
# the 90-min timeout mid-final-epoch (set -e aborted before build-index),
# plus the pallas-NMS on-chip validation.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
log() { echo "=== $(date -u +%H:%M:%S) r3f: $*"; }
D=/root/drive2
cd "$D"

if [ ! -e rec2k_j_hn/ref.npz ]; then
  log "build-index rec2k_j_hn (phase-2 hns encoder)"
  timeout 1800 python -m effocr_tpu build-index --run_dir rec2k_j_hn --test
fi

if [ -e rec2k_j_hn/ref.npz ] && [ ! -e out2k_test_hn/metrics.json ]; then
  log "en test infer (phase-2 hns encoder, anchors)"
  timeout 3600 python -m effocr_tpu infer --image_dir corpus2k/images \
    --coco_json split2k_test.json --recognizer_dir rec2k_j_hn \
    --localizer_dir loc2k --lang en \
    --localizer_conf_thresh 0.3 --localizer_iou_thresh 0.25 \
    --adaptive_height --transfer_bits 4 --line_batch 128 --crop_batch 6144 \
    --anchor_margin 0.15 --anchor_multiplier 2.0 \
    --save_output out2k_test_hn
fi

cd "$REPO"
if [ ! -e /root/drive2/sweep_r3/nms_microbench_pallas.log ]; then
  log "pallas-NMS microbench (Mosaic lowering + xla-vs-pallas timing)"
  timeout 2400 python scripts/nms_microbench.py --canvas_w 1024 \
    --encoder convnext_atto --imsize 128 --crops_per_line 33 \
    > /root/drive2/sweep_r3/nms_microbench_pallas.log 2>&1 || true
  grep -E 'decode\+NMS|batched' /root/drive2/sweep_r3/nms_microbench_pallas.log
fi

log "queue F drained"
