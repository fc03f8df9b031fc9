#!/bin/bash
# Round-3 chip queue, part C (post throughput sweep).
# 1. Stage-attribution microbench at the TRAINED geometry (what is the
#    wall now that host decode is native: transfer / detector / NMS /
#    encoder?)
# 2. On-chip confirmation of the offline-tuned case-repair anchors
#    (+ spell-check) on the held-out en test split.
# 3. en phase-2 hard-negative round on the winning paired-jitter config
#    (error-analysis: l->I x44 = 20% of residual edits, u<->n, i->j)
# 4. test-split infer with the phase-2 encoder (anchors + spell-check).
# 5. Final bench.py at HEAD (BENCH_TRAINED.json carries the winning
#    sweep flags + anchors by then).
# ONE chip, one job at a time; stages guarded for re-entry.
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
log() { echo "=== $(date -u +%H:%M:%S) $*"; }
D=/root/drive2

# ---- 1. device-stage microbench at the trained en geometry ----
cd "$REPO"
if [ ! -e /root/drive2/sweep_r3/nms_microbench_trained.log ]; then
  log "stage microbench (trained geometry: 64x1024, convnext_atto@128)"
  timeout 2400 python scripts/nms_microbench.py --canvas_w 1024 \
    --encoder convnext_atto --imsize 128 --crops_per_line 33 \
    > /root/drive2/sweep_r3/nms_microbench_trained.log 2>&1 || true
  tail -20 /root/drive2/sweep_r3/nms_microbench_trained.log
fi

# ---- 2. anchors + spell-check on-chip confirmation (held-out test) ----
cd "$D"
if [ ! -e out2k_test_anchor_sc/metrics.json ]; then
  log "en test infer (tuned anchors + spell-check)"
  timeout 3600 python -m effocr_tpu infer --image_dir corpus2k/images \
    --coco_json split2k_test.json --recognizer_dir rec2k_j \
    --localizer_dir loc2k --lang en \
    --localizer_conf_thresh 0.3 --localizer_iou_thresh 0.25 \
    --adaptive_height --transfer_bits 4 --line_batch 128 --crop_batch 6144 \
    --anchor_margin 0.15 --anchor_multiplier 2.0 \
    --spell_check --dictionary_path dict2k.txt --homoglyphs homoglyphs2k.txt \
    --save_output out2k_test_anchor_sc
fi

# ---- 3. en phase-2 hns training (rec2k_j config + hns.txt) ----
if [ ! -e rec2k_j_hn/enc_best.msgpack ]; then
  log "en phase-2 hns train (rec2k_j + hns.txt)"
  timeout 5400 python -m effocr_tpu train-recognizer --root_dir_path tree2k \
    --train_ann_path split2k_train.json --val_ann_path split2k_val.json \
    --test_ann_path split2k_test.json --run_name rec2k_j_hn --lang en \
    --auto_model convnext_atto --imsize 128 --input_channels 1 \
    --batch_size 128 --lr 1e-3 --lr_schedule cosine --warmup_frac 0.05 \
    --aux_ce_weight 1.0 --ref_source centroid --num_epochs 16 \
    --num_passes 20 --paired_jitter 0.1 --hns_txt_path rec2k_j/hns.txt \
    --data_device resident --test_at_end
fi
if [ ! -e rec2k_j_hn/ref.npz ]; then
  log "build-index rec2k_j_hn"
  timeout 1800 python -m effocr_tpu build-index --run_dir rec2k_j_hn --test
fi

# ---- 4. test-split infer with the phase-2 encoder ----
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

# (final coupled bench moved to the end of the chain: it must run with
# the winning sweep flags pinned into BENCH_TRAINED.json, after
# sweep_r3b_isolation.sh picks them.)

log "queue C drained"
