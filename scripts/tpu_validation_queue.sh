#!/bin/bash
# TPU validation queue — run top to bottom when the axon relay is back.
# (Relay outage started 2026-08-17 ~20:00 UTC; back 2026-08-18.
#  Probe: timeout 90 python -c "import jax; print(jax.devices())")
# ONE chip, ONE job at a time; first compiles 2-9 min each through the
# remote-compile relay (persistent cache helps within a round).
#
# NOTE 2026-08-18: host scratch (/root/drive2, /root/drivejp) was WIPED
# between sessions — trained artifacts and corpora are gone. Steps 3-5
# below need `scripts/rebuild_en.sh` / `scripts/rebuild_jp.sh` run first
# (they recreate the corpora and retrain from the BENCH_ACCURACY.md
# configs; rebuild_jp.sh already folds in the deduped-charset retrain
# that step 6 queued).
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"

log() { echo "=== $(date -u +%H:%M:%S) $*"; }

# 1. bench at HEAD for the record (~1,800-2,100 expected; driver also
#    runs this at round end — this is the early warning)
log "bench.py (median of 3)"
timeout 3600 python bench.py

# 2. driver entry points at HEAD
log "entry() compile check"
timeout 1800 python -c "
import __graft_entry__ as g, jax
fn, args = g.entry()
out = jax.jit(fn)(*args)
jax.block_until_ready(out)
print('entry OK')"

# 3. en infer at HEAD on-chip (packed 4-bit fused path + --data_parallel
#    flag parses; single chip -> runs unsharded with a notice)
log "en infer (rec_knn/loc_rect artifacts)"
(cd /root/drive2 && timeout 3600 python -m effocr_tpu infer \
  --image_dir corpus/images --coco_json split_val.json \
  --recognizer_dir rec_knn --localizer_dir loc_rect --lang en \
  --localizer_conf_thresh 0.3 --localizer_iou_thresh 0.25 \
  --transfer_bits 4 --line_batch 128 --crop_batch 6144 --data_parallel)
# expect CER ~0.059

# 4. jp vertical infer at HEAD on-chip (pallas retrieval at 13.5k classes)
log "jp infer (rec_knn6k_hn/loc_vert artifacts)"
(cd /root/drivejp && timeout 3600 python -m effocr_tpu infer \
  --image_dir corpus6k/images --coco_json split6k_test.json \
  --recognizer_dir rec_knn6k_hn --localizer_dir loc_vert --lang jp \
  --vertical --retrieval_kernel pallas --transfer_bits 4 \
  --line_batch 120 --crop_batch 4096)
# expect CER ~0.0686

# 5. NEW since outage: detection augmentation on-chip (short A/B)
log "train-localizer --augment smoke (20 epochs)"
(cd /root/drive2 && timeout 3600 python -m effocr_tpu train-localizer \
  --image_dir corpus/images --train_coco split_train.json \
  --val_coco split_val.json --run_name loc_aug_smoke --arch yolov5n \
  --input_size 320 --batch_size 8 --num_epochs 20 --eval_period 5 \
  --data_device resident --augment)

# 5b. NEW: stage-isolation microbench (attributes fused-program latency;
#     decode+NMS now runs the sort-free presorted path — compare vs the
#     round-2 profile: detector 31 / decode+NMS 30 / encoder 34 ms)
log "nms_microbench"
timeout 3600 python scripts/nms_microbench.py 256

# ---- optional longer runs (CER pushes), in priority order ------------
# 6. jp deduped-charset retrain (corpus ALREADY STAGED on host:
#    /root/drivejp/{charset_dedup,corpus6kd,split6kd_*,tree6kd};
#    error-analysis found 39.8% of jp edits are render-identical
#    codepoint twins — BENCH_ACCURACY.md). Run:
#    sh /root/drivejp/run_full_jpd.sh      # ~8 min on chip
#    then phase-2 hns + infer per the script's trailer comments;
#    expect CER ~0.041 vs 0.0686 (reuse loc_vert detector).
# 7. en phase-2 hard-negative round (error-analysis: l->I x10, u<->n x10
#    are trainable confusions; rec_knn is phase-1 only)
# 8. --augment full A/B vs loc_rect's recipe (AP at matched epochs)
# 9. convnext_tiny encoder on the en corpus (CER push vs atto's 0.0585)
log "queue done"
