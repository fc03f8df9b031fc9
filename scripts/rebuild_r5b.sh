#!/bin/bash
# Round-5 chip schedule, phase B (takes over from rebuild_r5.sh after
# the wipe).  Adopts the in-flight rec_p1 trainer (arg 1 = its pid),
# then runs every remaining chip stage with deadline-dynamic budgets
# instead of all-or-nothing gates:
#   rec_p1 index/mine -> loc2k -> rec_p2 (timeout = what the deadline
#   affords; best-ckpt-so-far survives a cut) -> variance sessions +
#   worst-of-N pin (VERDICT #1/#6) -> serve latency (#9) -> degraded
#   suite eval (#7) -> jp v3 lite (#3/#4: loc_vert + phase-1 + coupled
#   bench) if time remains.
# Host-side inputs (jp tree, degraded corpora) are produced in parallel
# by scripts/host_bg_r5.sh; jp stages precondition-fail harmlessly if
# prep has not landed.
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
source "$REPO/scripts/stage_lib.sh"
D=/root/drive2
J=/root/drivejp
OUT=$D/sweep_r5
END_EPOCH="${ROUND_END_EPOCH:-$(date -d 'today 12:30' +%s 2>/dev/null || echo 0)}"
left() { if [ "$END_EPOCH" -eq 0 ]; then echo 99999; else echo $(( END_EPOCH - $(date +%s) )); fi; }
mkdir -p "$OUT"

# ---- 0. adopt the in-flight rec_p1 trainer ----
WAITPID="${1:-}"
if [ -n "$WAITPID" ]; then
  _stage_log adopt "waiting on in-flight trainer pid $WAITPID"
  while kill -0 "$WAITPID" 2>/dev/null; do sleep 20; done
  _stage_log adopt "trainer exited"
fi
cd "$D"

stage rec_p1_index rec2k_mn/ref.npz 1800 rec2k_mn/enc_best.msgpack -- \
  python -m effocr_tpu build-index --run_dir rec2k_mn --test
stage rec_p1_mine rec2k_mn/hns.txt 2400 rec2k_mn/ref.npz -- \
  python -m effocr_tpu build-index --run_dir rec2k_mn --mine_hardneg 8

stage loc2k loc2k/best_bbox_mAP.msgpack 5400 corpus2k/images -- \
  python -m effocr_tpu train-localizer --image_dir corpus2k/images \
    --train_coco split2k_train.json --val_coco split2k_val.json \
    --run_name loc2k --arch yolov5s --input_size 1024 --multi_height 64,96 \
    --input_channels 1 --fit_anchors --batch_size 16 --num_epochs 60 \
    --eval_period 10 --data_device resident

# ---- rec phase 2: spend whatever the deadline affords (>=15 min).
# Checkpoints are written at every val improvement, so a timeout cut
# still leaves enc_best.msgpack for the index stage (round-3 recovery
# path, exercised in anger).  Reserve ~90 min for sessions+serve+
# degraded after it.
P2TO=$(( $(left) - 5400 )); [ $P2TO -gt 5400 ] && P2TO=5400
if [ $P2TO -gt 900 ]; then
  stage rec_p2 rec2k_mn_hn/enc_best.msgpack $P2TO tree2k rec2k_mn/hns.txt -- \
    python -m effocr_tpu train-recognizer --root_dir_path tree2k \
      --train_ann_path split2k_train.json --val_ann_path split2k_val.json \
      --test_ann_path split2k_test.json --run_name rec2k_mn_hn --lang en \
      --auto_model mobilenetv3_small_050 --imsize 128 --input_channels 1 \
      --batch_size 128 --lr 1e-3 --lr_schedule cosine --warmup_frac 0.05 \
      --aux_ce_weight 1.0 --ref_source centroid --num_epochs 16 \
      --num_passes 20 --paired_jitter 0.1 --infer_hardneg_k 8 \
      --data_device resident --hns_txt_path rec2k_mn/hns.txt
  stage rec_p2_index rec2k_mn_hn/ref.npz 1800 rec2k_mn_hn/enc_best.msgpack -- \
    python -m effocr_tpu build-index --run_dir rec2k_mn_hn --test
else
  _stage_log rec_p2 "SKIPPED (deadline: $(left)s left) — benching phase-1"
fi

# ---- variance-honest sessions + worst-of-N pin (VERDICT #1 + #6) ----
if [ -e rec2k_mn_hn/ref.npz ]; then REC=$D/rec2k_mn_hn; else REC=$D/rec2k_mn; fi
LOC=$D/loc2k
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
[ "$(left)" -lt 3600 ] && SESS=2
stage en_sessions "$OUT/en_bits2.result.json" 7200 \
    "$REC/ref.npz" "$D/eval5k/corpus.json" "$LOC/best_bbox_mAP.msgpack" -- \
  python "$REPO/scripts/bench_sessions.py" \
    "$OUT/en_bits2.json" "$OUT/en_bits4.json" \
    --out "$OUT" --sessions $SESS --gap 45
stage pin - 600 "$OUT/en_bits2.result.json" -- \
  env NORTHSTAR_SWEEP_DIRS="$OUT" \
    python "$REPO/scripts/pick_northstar.py"

# ---- serve-mode latency table (VERDICT #9; ~10 min) ----
cd "$D"
if [ "$(left)" -gt 600 ]; then
  stage serve_latency $OUT/serve_latency.jsonl 1500 "$REC/ref.npz" -- \
    bash -c "python $REPO/scripts/serve_latency_bench.py \
      --loads 100,300,600 --n 900 --max_latency_ms 50 \
      > $OUT/serve_latency.jsonl"
fi

# ---- shifted-degradation suite (VERDICT #7; host gen in host_bg_r5) ----
if [ "$(left)" -gt 900 ]; then
  stage degraded_eval eval_degraded/degraded_results.json 3600 \
      eval_degraded/done.marker -- \
    python "$REPO/scripts/degraded_eval.py" --suite eval_degraded
fi

# ---- jp v3 lite (VERDICT #3 + #4): loc_vert + phase-1 + coupled row ----
if [ "$(left)" -gt 2400 ] && [ -d "$J" ]; then
  cd "$J"
  stage loc_vert loc_vert/best_bbox_mAP.msgpack 2400 \
      corpus6k3/images split6k3_train.json -- \
    python -m effocr_tpu train-localizer --image_dir corpus6k3/images \
      --train_coco split6k3_train.json --val_coco split6k3_val.json \
      --run_name loc_vert --arch yolov5n --input_size 96 --input_height 640 \
      --batch_size 16 --num_epochs 25 --eval_period 5 --data_device resident
  P1TO=$(( $(left) - 1500 )); [ $P1TO -gt 2700 ] && P1TO=2700
  if [ $P1TO -gt 600 ]; then
    stage jp3_p1 rec_knn6k3/enc_best.msgpack $P1TO tree6k3 -- \
      python -m effocr_tpu train-recognizer --root_dir_path tree6k3 \
        --train_ann_path split6k3_train.json --val_ann_path split6k3_val.json \
        --test_ann_path split6k3_test.json --run_name rec_knn6k3 --lang jp \
        --auto_model convnext_atto --imsize 128 --batch_size 128 \
        --lr 1e-3 --lr_schedule cosine --warmup_frac 0.05 \
        --aux_ce_weight 1.0 --ref_source centroid --crop_sim 0.2 \
        --paired_jitter 0.1 --num_epochs 40 --eval_period 4 \
        --data_device resident
    stage jp3_index rec_knn6k3/ref.npz 1200 rec_knn6k3/enc_best.msgpack -- \
      python -m effocr_tpu build-index --run_dir rec_knn6k3
  fi
  cat > "$OUT/jp_v3.json" <<EOF
{
  "image_dir": "$J/corpus6k3/images",
  "coco_json": "$J/split6k3_test.json",
  "max_lines": 600,
  "artifacts": ["$J/rec_knn6k3/ref.npz", "$J/rec_knn6k3/enc_best.msgpack",
                "$J/loc_vert/best_bbox_mAP.msgpack"],
  "flags": ["--recognizer_dir", "$J/rec_knn6k3",
    "--localizer_dir", "$J/loc_vert",
    "--lang", "jp", "--vertical", "--retrieval_kernel", "pallas",
    "--transfer_bits", "4", "--line_batch", "120",
    "--crop_batch", "4096"]
}
EOF
  mkdir -p "$OUT/jp"
  stage jp_sessions "$OUT/jp/jp_v3.result.json" 2700 \
      rec_knn6k3/ref.npz loc_vert/best_bbox_mAP.msgpack -- \
    python "$REPO/scripts/bench_sessions.py" "$OUT/jp_v3.json" \
      --out "$OUT/jp" --sessions 2 --gap 30
fi

stage_summary
