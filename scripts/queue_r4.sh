#!/bin/bash
# Round-4 chip queue: sweep (chain B) -> jp hns mine (long budget) ->
# jp phase-2 + infer (chain C).  One device job at a time; each part is
# internally guarded (stage_lib), so re-running the queue re-enters.
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
source "$REPO/scripts/stage_lib.sh"

bash "$REPO/scripts/chain_r4b.sh"

cd /root/drivejp
stage jp_mine rec_knn6k2/hns.txt 7200 \
    rec_knn6k2/enc_best.msgpack tree6k2 -- \
  python -m effocr_tpu build-index --run_dir rec_knn6k2 --mine_hardneg 8

bash "$REPO/scripts/chain_r4c.sh"
stage_summary
