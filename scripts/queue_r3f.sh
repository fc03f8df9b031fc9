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

# serve on-chip smoke (the one round-2 feature still CPU-only): watch-dir
# mode, 12 lines dropped in, JSONL out, self-terminating
if [ ! -e /root/drive2/serve_smoke/out.jsonl ]; then
  log "serve on-chip smoke (watch-dir, 12 lines)"
  cd "$D"
  rm -rf serve_smoke && mkdir -p serve_smoke/in serve_smoke/done
  timeout 1200 python -m effocr_tpu serve --watch_dir serve_smoke/in \
    --processed_dir serve_smoke/done --out serve_smoke/out.jsonl \
    --recognizer_dir rec2k_j --localizer_dir loc2k --lang en \
    --localizer_conf_thresh 0.3 --localizer_iou_thresh 0.25 \
    --adaptive_height --transfer_bits 4 --line_batch 16 --crop_batch 1024 \
    --stop_after_s 720 &
  SERVE_PID=$!
  sleep 20   # feed early: the engine compiles lazily on the first batch
              # (2-9 min through the relay) and stop_after_s must cover it
  i=0
  for f in $(python -c "
import json
c = json.load(open('eval5k/corpus.json'))
print('\n'.join(x['file_name'] for x in c['images'][:12]))"); do
    cp "eval5k/images/$f" serve_smoke/in/
    i=$((i+1)); [ $((i % 4)) -eq 0 ] && sleep 10
  done
  wait $SERVE_PID || true
  log "serve produced $(wc -l < serve_smoke/out.jsonl 2>/dev/null || echo 0) results"
fi

log "queue F drained"
