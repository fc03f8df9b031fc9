#!/bin/bash
# Round-3 chip chain, part I: queue_r3e's mobilenet results put the
# north-star within one flag of reach (mn_caps 604.8 lines/s/chip @ CER
# 0.0415; mn_trim12 showed --crop_batch 12288 buys +13% with zero CER
# cost by avoiding overflow re-dispatch).  Run the decisive combined
# config FIRST, then drain the rest:
#   1. wait for the in-flight queue_r3f.sh
#   2. mncaps12 bench (caps + crop_batch 12288) + pin via pick_northstar
#   3. rebuild_jp2.sh (jp v2 retrain, VERDICT #8)
#   4. sweep_r3b_isolation.sh (cap attribution on the mobilenet encoder)
#   5. pick_northstar.py re-pin (in case a relax variant wins)
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
log() { echo "=== $(date -u +%H:%M:%S) chainI: $*"; }
OUT=/root/drive2/sweep_r3

QF_PID="${1:-}"
if [ -n "$QF_PID" ]; then
  log "waiting for queue_r3f (pid $QF_PID)"
  while kill -0 "$QF_PID" 2>/dev/null; do sleep 60; done
  log "queue_r3f finished"
fi

if [ ! -e "$OUT/mncaps12.result.json" ]; then
  log "decisive bench: mn caps + crop_batch 12288"
  cat > "$OUT/mncaps12.json" <<'EOF'
{
  "image_dir": "/root/drive2/eval5k/images",
  "coco_json": "/root/drive2/eval5k/corpus.json",
  "max_lines": 5000,
  "artifacts": ["/root/drive2/rec2k_mn/ref.npz",
                "/root/drive2/loc2k/best_bbox_mAP.msgpack"],
  "flags": ["--recognizer_dir", "/root/drive2/rec2k_mn",
    "--localizer_dir", "/root/drive2/loc2k",
    "--lang", "en",
    "--localizer_conf_thresh", "0.3", "--localizer_iou_thresh", "0.25",
    "--adaptive_height", "--transfer_bits", "4",
    "--line_batch", "256", "--encoder_sub_batch", "2048",
    "--adaptive_width", "--chunk_sort", "width",
    "--crop_batch", "12288",
    "--max_nms", "512", "--max_det", "128", "--crop_window", "128"]
}
EOF
  cd "$REPO"
  if BENCH_TRAINED_SPEC="$OUT/mncaps12.json" timeout 3600 \
      python bench.py > "$OUT/mncaps12.result.json" 2> "$OUT/mncaps12.log"; then
    tail -1 "$OUT/mncaps12.result.json"
  else
    log "mncaps12 FAILED"; rm -f "$OUT/mncaps12.result.json"
  fi
fi
python "$REPO/scripts/pick_northstar.py" || log "pick_northstar: no pin"

bash "$REPO/scripts/rebuild_jp2.sh" >> /tmp/jp2_chip.log 2>&1 || \
  log "rebuild_jp2 exited nonzero (see /tmp/jp2_chip.log)"
bash "$REPO/scripts/sweep_r3b_isolation.sh" >> /tmp/sweep_r3b.log 2>&1 || \
  log "sweep_r3b exited nonzero (see /tmp/sweep_r3b.log)"
python "$REPO/scripts/pick_northstar.py" || log "pick_northstar: no pin"
log "chain I drained"
