#!/bin/bash
# Round-4 chain A — the two cheapest CER levers, back to back on the chip:
#   1. en phase-2 hard-negative retrain (VERDICT r3 #2): rec2k_mn_hn from
#      the already-mined /root/drive2/rec2k_mn/hns.txt.  Pre-wipe evidence
#      (queue_r3e) says phase-2 at these flags reaches CER ~0.0128 no-caps.
#   2. jp hns recovery (VERDICT r3 #4): mine rec_knn6k2/hns.txt standalone
#      (its in-training mining was cut by the stage timeout), unblocking
#      the phase-2 jp train that chain_jp drained on.
# Reference two-phase flow: train_effocr_recognizer.py:389-404 + README.
# No set -e: stages are guarded + non-fatal (scripts/stage_lib.sh).
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
source "$REPO/scripts/stage_lib.sh"
D=/root/drive2
J=/root/drivejp

cd "$D"
stage en_hn_train rec2k_mn_hn/enc_best.msgpack 5400 \
    tree2k rec2k_mn/hns.txt -- \
  python -m effocr_tpu train-recognizer --root_dir_path tree2k \
    --train_ann_path split2k_train.json --val_ann_path split2k_val.json \
    --test_ann_path split2k_test.json --run_name rec2k_mn_hn --lang en \
    --auto_model mobilenetv3_small_050 --imsize 128 --input_channels 1 \
    --batch_size 128 --lr 1e-3 --lr_schedule cosine --warmup_frac 0.05 \
    --aux_ce_weight 1.0 --ref_source centroid --num_epochs 16 \
    --num_passes 20 --paired_jitter 0.1 --infer_hardneg_k 8 \
    --data_device resident --test_at_end --hns_txt_path rec2k_mn/hns.txt

stage en_hn_index rec2k_mn_hn/ref.npz 1800 \
    rec2k_mn_hn/enc_best.msgpack -- \
  python -m effocr_tpu build-index --run_dir rec2k_mn_hn --test

stage en_hn_eval_nocaps out_eval5k_hn/metrics.json 2400 \
    rec2k_mn_hn/ref.npz loc2k/best_bbox_mAP.msgpack eval5k/corpus.json -- \
  python -m effocr_tpu infer --image_dir eval5k/images \
    --coco_json eval5k/corpus.json \
    --recognizer_dir rec2k_mn_hn --localizer_dir loc2k --lang en \
    --localizer_conf_thresh 0.3 --localizer_iou_thresh 0.25 \
    --adaptive_height --transfer_bits 4 --line_batch 256 \
    --crop_batch 8192 --encoder_sub_batch 2048 \
    --adaptive_width --chunk_sort width \
    --save_output out_eval5k_hn

cd "$J"
stage jp_mine rec_knn6k2/hns.txt 2400 \
    rec_knn6k2/enc_best.msgpack rec_knn6k2/ref.npz tree6k2 -- \
  python -m effocr_tpu build-index --run_dir rec_knn6k2 --mine_hardneg 8

stage_summary
