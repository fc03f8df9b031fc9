#!/bin/bash
# Round-5 from-scratch rebuild after the VM wipe (drive2/drivejp lost),
# deadline-aware.  Differences from rebuild_r4_full.sh:
#   * eval5k renders in the BACKGROUND during chip training (1-core
#     host: it is only needed by the final benches, not by training).
#   * loc2k trains BEFORE recognizer phase 2 — the localizer is
#     required for any coupled bench; phase 2 only improves CER.
#   * phase 2 runs only if enough round time remains (~75 min on-chip,
#     NOTES_ROUND4); otherwise benches run against the phase-1
#     recognizer (CER ~0.0249, still inside the 0.0593 envelope).
#   * ends with the round-5 variance protocol (VERDICT #1/#6):
#     bench_sessions.py en_bits2 vs en_bits4 x N separate sessions,
#     then pick_northstar pins on worst-of-N.
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
source "$REPO/scripts/stage_lib.sh"
D=/root/drive2
OUT=$D/sweep_r5
END_EPOCH="${ROUND_END_EPOCH:-$(date -d 'today 12:30' +%s 2>/dev/null || echo 0)}"
left() { echo $(( END_EPOCH - $(date +%s) )); }
mkdir -p "$D/fonts" "$OUT"
for f in DejaVuSerif.ttf DejaVuSans.ttf DejaVuSerif-Bold.ttf; do
  ln -sf /usr/share/fonts/truetype/dejavu/$f "$D/fonts/$f"
done
cd "$D"

# ---- 1. train corpus + crop tree (host, serial: blocks training) ----
stage corpus2k corpus2k/corpus.json 3600 -- \
  python -m effocr_tpu make-corpus --out_dir corpus2k --n_lines 2400 \
    --lang en --font_dir fonts --noise_std 6 --blur_sigma 0.6 --seed 7
stage coco_split split2k_val.json 600 corpus2k/corpus.json -- \
  python -m effocr_tpu coco-split --coco_json corpus2k/corpus.json \
    --out_prefix split2k --train_frac 0.8334 --val_frac 0.0833 --seed 99
stage charsets english_charsets 300 -- \
  python -c "from effocr_tpu.data.builtin_charsets import write_charset_dir; write_charset_dir('english_charsets')"
stage tree2k tree2k 7200 corpus2k/images split2k_train.json english_charsets -- \
  python -m effocr_tpu format-dataset --image_dir corpus2k/images \
    --coco_jsons split2k_train.json,split2k_val.json,split2k_test.json \
    --crops_save_dir crops2k --cat_id 0 --font_dir fonts --spaces \
    --charset_dir english_charsets --dataset_save_dir tree2k

# ---- 2. eval5k held-out corpus: background render (bench-only dep) ----
if [ ! -e eval5k/corpus.json ]; then
  _stage_log eval5k_bg "RUN (background)"
  nohup python -m effocr_tpu make-corpus --out_dir eval5k --n_lines 5000 \
    --lang en --font_dir fonts --noise_std 6 --blur_sigma 0.6 --seed 1234 \
    > /tmp/eval5k.log 2>&1 &
  echo $! > /tmp/eval5k.pid
fi

# ---- 3. recognizer phase 1 + index + standalone hns mine (chip) ----
stage rec_p1 rec2k_mn/enc_best.msgpack 5400 tree2k -- \
  python -m effocr_tpu train-recognizer --root_dir_path tree2k \
    --train_ann_path split2k_train.json --val_ann_path split2k_val.json \
    --test_ann_path split2k_test.json --run_name rec2k_mn --lang en \
    --auto_model mobilenetv3_small_050 --imsize 128 --input_channels 1 \
    --batch_size 128 --lr 1e-3 --lr_schedule cosine --warmup_frac 0.05 \
    --aux_ce_weight 1.0 --ref_source centroid --num_epochs 16 \
    --num_passes 20 --paired_jitter 0.1 --infer_hardneg_k 8 \
    --data_device resident --test_at_end
stage rec_p1_index rec2k_mn/ref.npz 1800 rec2k_mn/enc_best.msgpack -- \
  python -m effocr_tpu build-index --run_dir rec2k_mn --test
stage rec_p1_mine rec2k_mn/hns.txt 2400 rec2k_mn/ref.npz -- \
  python -m effocr_tpu build-index --run_dir rec2k_mn --mine_hardneg 8

# ---- 4. localizer (required for ANY coupled bench -> before p2) ----
stage loc2k loc2k/best_bbox_mAP.msgpack 5400 corpus2k/images -- \
  python -m effocr_tpu train-localizer --image_dir corpus2k/images \
    --train_coco split2k_train.json --val_coco split2k_val.json \
    --run_name loc2k --arch yolov5s --input_size 1024 --multi_height 64,96 \
    --input_channels 1 --fit_anchors --batch_size 16 --num_epochs 60 \
    --eval_period 10 --data_device resident

# ---- 5. recognizer phase 2 (the flagship) if the deadline allows ----
# ~75 min train + ~10 min index; benches need ~45 min after.
if [ "$(left)" -gt 7800 ] || [ "$END_EPOCH" -eq 0 ]; then
  stage rec_p2 rec2k_mn_hn/enc_best.msgpack 5400 tree2k rec2k_mn/hns.txt -- \
    python -m effocr_tpu train-recognizer --root_dir_path tree2k \
      --train_ann_path split2k_train.json --val_ann_path split2k_val.json \
      --test_ann_path split2k_test.json --run_name rec2k_mn_hn --lang en \
      --auto_model mobilenetv3_small_050 --imsize 128 --input_channels 1 \
      --batch_size 128 --lr 1e-3 --lr_schedule cosine --warmup_frac 0.05 \
      --aux_ce_weight 1.0 --ref_source centroid --num_epochs 16 \
      --num_passes 20 --paired_jitter 0.1 --infer_hardneg_k 8 \
      --data_device resident --test_at_end --hns_txt_path rec2k_mn/hns.txt
  stage rec_p2_index rec2k_mn_hn/ref.npz 1800 rec2k_mn_hn/enc_best.msgpack -- \
    python -m effocr_tpu build-index --run_dir rec2k_mn_hn --test
else
  _stage_log rec_p2 "SKIPPED (deadline: $(left)s left) — benching phase-1"
fi

# ---- 6. variance-honest benches (VERDICT #1 + #6) ----
if [ -e rec2k_mn_hn/ref.npz ]; then REC=$D/rec2k_mn_hn; else REC=$D/rec2k_mn; fi
LOC=$D/loc2k
# wait for the background eval5k render (bounded)
for i in $(seq 1 240); do
  [ -e "$D/eval5k/corpus.json" ] && break
  sleep 15
done
ENBASE='"--recognizer_dir", "'$REC'",
    "--localizer_dir", "'$LOC'",
    "--lang", "en",
    "--localizer_conf_thresh", "0.3", "--localizer_iou_thresh", "0.25",
    "--adaptive_height", "--encoder_sub_batch", "2048",
    "--adaptive_width", "--chunk_sort", "width",
    "--line_batch", "512", "--crop_batch", "20480",
    "--max_det", "96", "--max_words", "16",
    "--nms_kernel", "pallas", "--out_quant", "u16"'
for bits in 2 4; do
  cat > "$OUT/en_bits$bits.json" <<EOF
{
  "image_dir": "$D/eval5k/images",
  "coco_json": "$D/eval5k/corpus.json",
  "max_lines": 5000,
  "artifacts": ["$REC/ref.npz", "$REC/enc_best.msgpack",
                "$LOC/best_bbox_mAP.msgpack"],
  "flags": [$ENBASE, "--transfer_bits", "$bits"]
}
EOF
done
cd "$REPO"
SESS=3
[ "$END_EPOCH" -ne 0 ] && [ "$(left)" -lt 3000 ] && SESS=2
stage en_sessions "$OUT/en_bits2.result.json" 10800 \
    "$REC/ref.npz" "$D/eval5k/corpus.json" -- \
  python "$REPO/scripts/bench_sessions.py" \
    "$OUT/en_bits2.json" "$OUT/en_bits4.json" \
    --out "$OUT" --sessions $SESS --gap 60
stage pin - 600 "$OUT/en_bits2.result.json" -- \
  env NORTHSTAR_SWEEP_DIRS="$OUT" \
    python "$REPO/scripts/pick_northstar.py"

stage_summary
