#!/bin/bash
# Post-wipe jp v2 chain: waits for the en chain, re-creates /root/drivejp
# prerequisites (font links, vertical localizer), then drains
# rebuild_jp2.sh (coverage-aware deduped charset + paired_jitter recognizer,
# VERDICT r2 #8). CJK fonts are the reference's japan_font_files assets
# (font binaries, not code).
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
D=/root/drivejp
mkdir -p "$D/fonts"
for f in /root/reference/japan_font_files/*.ttf; do
  ln -sf "$f" "$D/fonts/$(basename "$f")"
done
ln -sf /usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf "$D/fonts/"
ln -sf /usr/share/fonts/truetype/dejavu/DejaVuSans.ttf "$D/fonts/"
log() { echo "=== $(date -u +%H:%M:%S) chainJP: $*"; }

PID="${1:-}"
if [ -n "$PID" ]; then
  log "waiting for chain_r3j (pid $PID)"
  while kill -0 "$PID" 2>/dev/null; do sleep 30; done
  log "chain_r3j finished"
fi

# CPU stages (charset/corpus/tree) + recognizer chip stages
bash "$REPO/scripts/rebuild_jp2.sh" || log "rebuild_jp2 pass 1 exited nonzero"

cd "$D"
# vertical localizer (rebuild_jp2 assumes it exists; retrain post-wipe)
if [ ! -e loc_vert/best_bbox_mAP.msgpack ] && [ -e split6k2_val.json ]; then
  log "train-localizer loc_vert (640x96 vertical)"
  timeout 3600 python -m effocr_tpu train-localizer --image_dir corpus6k2/images \
    --train_coco split6k2_train.json --val_coco split6k2_val.json \
    --run_name loc_vert --arch yolov5n --input_size 96 --input_height 640 \
    --batch_size 16 --num_epochs 25 --eval_period 5 --data_device resident
fi

# second pass picks up the final infer once loc_vert exists
bash "$REPO/scripts/rebuild_jp2.sh" || log "rebuild_jp2 pass 2 exited nonzero"
log "chain JP drained"
