#!/bin/bash
# Round-5 chain A — variance-honest north-star measurement (VERDICT #1)
# + the 2-bit-dither decision (VERDICT #6) + the jp coupled number
# (VERDICT #3), in one interleaved run so all configs sample the same
# relay-weather windows.
#
# Three specs, M separate bench.py invocations each (separate processes,
# spaced) via scripts/bench_sessions.py:
#   en_bits2   — the round-4 pinned config (2-bit dithered transfer)
#   en_bits4   — same flags at 4-bit (recovers CER 0.0133 + exact-line
#                75.5%; re-pin it if its WORST session clears 625)
#   jp_v2      — trained jp v2 artifacts (rec_knn6k2_hn + loc_vert),
#                600 held-out vertical lines — the first warm coupled
#                jp lines/s/chip + CER row
# pick_northstar then re-pins on worst-of-N (en only; jp is recorded as
# its own BENCH row, not the north-star).
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
source "$REPO/scripts/stage_lib.sh"
OUT=/root/drive2/sweep_r5
mkdir -p "$OUT"
cd "$REPO"

REC=/root/drive2/rec2k_mn_hn
LOC=/root/drive2/loc2k
ENBASE='"--recognizer_dir", "/root/drive2/rec2k_mn_hn",
    "--localizer_dir", "/root/drive2/loc2k",
    "--lang", "en",
    "--localizer_conf_thresh", "0.3", "--localizer_iou_thresh", "0.25",
    "--adaptive_height", "--encoder_sub_batch", "2048",
    "--adaptive_width", "--chunk_sort", "width",
    "--line_batch", "512", "--crop_batch", "20480",
    "--max_det", "96", "--max_words", "16",
    "--nms_kernel", "pallas", "--out_quant", "u16"'

cat > "$OUT/en_bits2.json" <<EOF
{
  "image_dir": "/root/drive2/eval5k/images",
  "coco_json": "/root/drive2/eval5k/corpus.json",
  "max_lines": 5000,
  "artifacts": ["$REC/ref.npz", "$REC/enc_best.msgpack",
                "$LOC/best_bbox_mAP.msgpack"],
  "flags": [$ENBASE, "--transfer_bits", "2"]
}
EOF
cat > "$OUT/en_bits4.json" <<EOF
{
  "image_dir": "/root/drive2/eval5k/images",
  "coco_json": "/root/drive2/eval5k/corpus.json",
  "max_lines": 5000,
  "artifacts": ["$REC/ref.npz", "$REC/enc_best.msgpack",
                "$LOC/best_bbox_mAP.msgpack"],
  "flags": [$ENBASE, "--transfer_bits", "4"]
}
EOF
JREC=/root/drivejp/rec_knn6k2_hn
cat > "$OUT/jp_v2.json" <<EOF
{
  "image_dir": "/root/drivejp/corpus6k2/images",
  "coco_json": "/root/drivejp/split6k2_test.json",
  "max_lines": 600,
  "artifacts": ["$JREC/ref.npz", "$JREC/enc_best.msgpack",
                "/root/drivejp/loc_vert/best_bbox_mAP.msgpack"],
  "flags": ["--recognizer_dir", "$JREC",
    "--localizer_dir", "/root/drivejp/loc_vert",
    "--lang", "jp", "--vertical", "--retrieval_kernel", "pallas",
    "--transfer_bits", "4", "--line_batch", "120",
    "--crop_batch", "4096"]
}
EOF

stage en_sessions "$OUT/en_bits2.result.json" 14400 \
    "$REC/ref.npz" -- \
  python "$REPO/scripts/bench_sessions.py" \
    "$OUT/en_bits2.json" "$OUT/en_bits4.json" \
    --out "$OUT" --sessions 3 --gap 150

# jp coupled row in its own subdir (recorded as a BENCH row, never a
# north-star pin candidate — different corpus)
mkdir -p "$OUT/jp"
stage jp_sessions "$OUT/jp/jp_v2.result.json" 7200 \
    "$JREC/ref.npz" -- \
  python "$REPO/scripts/bench_sessions.py" "$OUT/jp_v2.json" \
    --out "$OUT/jp" --sessions 3 --gap 90

# re-pin on worst-of-N; ONLY multi-session results are scanned (the new
# protocol: single-session rows from r3/r4 pinned best weather)
stage pin - 600 "$OUT/en_bits2.result.json" -- \
  env NORTHSTAR_SWEEP_DIRS="$OUT" \
    python "$REPO/scripts/pick_northstar.py"

stage_summary
