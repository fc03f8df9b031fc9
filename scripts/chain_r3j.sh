#!/bin/bash
# Round-3 chip chain, part J (post-wipe): waits for rebuild_r3_full.sh,
# then drains the remaining on-chip items:
#   1. spell-check assets (freq dict from the train split, index-derived
#      homoglyphs from rec2k_mn) — host-side, cheap
#   2. held-out test-split infer: plain + anchors+spell-check (re-validates
#      the round-3 best-quality row on the rebuilt artifacts)
#   3. pallas-vs-xla NMS microbench at the trained geometry (open item:
#      validates Mosaic lowering of the while_loop fixpoint on the chip)
#   4. cap-attribution sweep (sweep_r3b_isolation.sh)
#   5. pick_northstar.py re-pin
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
D=/root/drive2
log() { echo "=== $(date -u +%H:%M:%S) chainJ: $*"; }

PID="${1:-}"
if [ -n "$PID" ]; then
  log "waiting for rebuild_r3_full (pid $PID)"
  while kill -0 "$PID" 2>/dev/null; do sleep 30; done
  log "rebuild_r3_full finished"
fi
cd "$D"

if [ ! -e dict2k.txt ]; then
  log build-freq-dict
  python -m effocr_tpu build-freq-dict --coco_jsons split2k_train.json \
    --out dict2k.txt
fi
if [ ! -e homoglyphs2k.txt ]; then
  log build-homoglyphs
  python -m effocr_tpu build-homoglyphs --recognizer_dir rec2k_mn \
    --out homoglyphs2k.txt
fi

if [ ! -e out2k_test/metrics.json ]; then
  log "test infer (plain)"
  timeout 1800 python -m effocr_tpu infer --image_dir corpus2k/images \
    --coco_json split2k_test.json --recognizer_dir rec2k_mn \
    --localizer_dir loc2k --lang en \
    --localizer_conf_thresh 0.3 --localizer_iou_thresh 0.25 \
    --adaptive_height --transfer_bits 4 --line_batch 128 --crop_batch 8192 \
    --save_output out2k_test
fi
if [ ! -e out2k_test_anchor_sc/metrics.json ]; then
  log "test infer (anchors + spell-check + homoglyphs)"
  timeout 1800 python -m effocr_tpu infer --image_dir corpus2k/images \
    --coco_json split2k_test.json --recognizer_dir rec2k_mn \
    --localizer_dir loc2k --lang en \
    --localizer_conf_thresh 0.3 --localizer_iou_thresh 0.25 \
    --adaptive_height --transfer_bits 4 --line_batch 128 --crop_batch 8192 \
    --anchor_margin 0.15 --anchor_multiplier 2.0 \
    --spell_check --dictionary_path dict2k.txt --homoglyphs homoglyphs2k.txt \
    --save_output out2k_test_anchor_sc
fi

if [ ! -e /root/drive2/sweep_r3/nms_pallas_microbench.log ]; then
  log "pallas-vs-xla NMS microbench (trained geometry)"
  cd "$REPO"
  mkdir -p /root/drive2/sweep_r3   # ADVICE r3: standalone runs predate it
  timeout 1800 python scripts/nms_microbench.py --canvas_w 1024 \
    --encoder mobilenetv3_small_050 --imsize 128 --crops_per_line 33 \
    > /root/drive2/sweep_r3/nms_pallas_microbench.log 2>&1 || \
    log "microbench FAILED"
  tail -20 /root/drive2/sweep_r3/nms_pallas_microbench.log || true
fi

bash "$REPO/scripts/sweep_r3b_isolation.sh" || log "sweep_r3b exited nonzero"
python "$REPO/scripts/pick_northstar.py" || log "pick_northstar: no pin"
log "chain J drained"
