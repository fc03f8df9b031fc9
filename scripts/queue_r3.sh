#!/bin/bash
# Round-3 chip queue. ONE chip, ONE job at a time; every stage is guarded so
# the script can be killed and re-entered at any point (sessions die often).
# Order = VERDICT r2 priority: en north-star -> jp tail -> comparator ->
# --augment on-chip pass.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
log() { echo "=== $(date -u +%H:%M:%S) $*"; }

# ---- 1. en north-star chain (rec2k, rec2k_j, loc2k, A/B val infers) ----
bash "$REPO/scripts/northstar_en.sh"

D=/root/drive2
cd "$D"

# ---- 2. pick the A/B winner by val CER, run the 5k-line north-star ----
if [ ! -e out_eval5k/metrics.json ]; then
  WINNER=$(python - <<'EOF'
import json
best, rec = 9.9, "rec2k"
for r in ("rec2k", "rec2k_j"):
    try:
        cer = json.load(open(f"out2k_{r}/metrics.json"))["cer"]
    except Exception:
        continue
    if cer < best:
        best, rec = cer, r
print(rec)
EOF
)
  log "north-star eval5k infer (winner=$WINNER)"
  timeout 3600 python -m effocr_tpu infer --image_dir eval5k/images \
    --coco_json eval5k/corpus.json --recognizer_dir "$WINNER" \
    --localizer_dir loc2k --lang en \
    --localizer_conf_thresh 0.3 --localizer_iou_thresh 0.25 \
    --adaptive_height --transfer_bits 4 --line_batch 256 \
    --crop_batch 6144 --save_output out_eval5k
fi

# ---- 3. jp tail: index for the hn encoder, vertical localizer, test infer ----
J=/root/drivejp
cd "$J"
if [ ! -e rec_knn6kd_hn/ref.npz ]; then
  log "build-index rec_knn6kd_hn (+test p@1)"
  timeout 3600 python -m effocr_tpu build-index --run_dir rec_knn6kd_hn --test
fi
if [ ! -e loc_vert/best_bbox_mAP.msgpack ]; then
  log "train-localizer loc_vert (640x96 vertical)"
  timeout 3600 python -m effocr_tpu train-localizer --image_dir corpus6kd/images \
    --train_coco split6kd_train.json --val_coco split6kd_val.json \
    --run_name loc_vert --arch yolov5n --input_size 96 --input_height 640 \
    --batch_size 16 --num_epochs 25 --eval_period 5 --data_device resident
fi
if [ ! -e out_jpd/metrics.json ]; then
  log "jp vertical test infer (deduped charset + hn encoder)"
  timeout 3600 python -m effocr_tpu infer --image_dir corpus6kd/images \
    --coco_json split6kd_test.json --recognizer_dir rec_knn6kd_hn \
    --localizer_dir loc_vert --lang jp --vertical --retrieval_kernel pallas \
    --transfer_bits 4 --line_batch 120 --crop_batch 4096 --save_output out_jpd
fi

# ---- 4. comparator: seq2seq baseline on the same en corpus/split ----
cd "$D"
if [ ! -e seq2k/metrics.jsonl ]; then
  log "train-seq2seq seq2k (comparator table, same val split)"
  timeout 7200 python -m effocr_tpu train-seq2seq --image_dir corpus2k/images \
    --train_coco split2k_train.json --val_coco split2k_val.json \
    --run_name seq2k --batch_size 32 --num_epochs 30 \
    --data_device resident
fi

# ---- 5. one on-chip --augment localizer pass (VERDICT r2 queue item) ----
if [ ! -e loc_aug_chip/best_bbox_mAP.msgpack ]; then
  log "train-localizer --augment on-chip pass (short)"
  timeout 3600 python -m effocr_tpu train-localizer --image_dir corpus2k/images \
    --train_coco split2k_train.json --val_coco split2k_val.json \
    --run_name loc_aug_chip --arch yolov5n --input_size 1024 \
    --multi_height 64,96 --input_channels 1 --batch_size 16 \
    --num_epochs 10 --eval_period 5 --augment --data_device resident
fi

log "queue drained"
