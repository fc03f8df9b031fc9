#!/bin/bash
# Round-5 jp v3 HOST stages (no chip): corpus + splits + dataset tree at
# the render-distance-merged charset (VERDICT #4).
#
# charset_dedup3 = make-charset --dedupe_renders --dedupe_tol 0.07: the
# equivalence-class widening over v2's exact-pixel dedup.  Threshold
# chosen from the v2 error analysis (/tmp -> NOTES_ROUND5.md): 89 of 277
# substitution edits sit at render_dist <= 0.07 (projected CER 0.0491 ->
# ~0.037); beyond ~0.1 the merge starts collapsing humanly-distinct
# glyphs.  Same corpus recipe/seeds as v2 otherwise (rebuild_jp2.sh).
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO:/root/.axon_site"
source "$REPO/scripts/stage_lib.sh"
cd /root/drivejp
CPU="env JAX_PLATFORMS=cpu"

stage charset3 charset_dedup3/charset.txt 3600 -- \
  $CPU python -m effocr_tpu make-charset --font_dir fonts --mode union \
    --min_codepoint 256 --out charset_dedup3/charset.txt \
    --dedupe_renders --dedupe_tol 0.07

stage corpus3 corpus6k3/corpus.json 7200 charset_dedup3/charset.txt -- \
  $CPU python -m effocr_tpu make-corpus --out_dir corpus6k3 --lang jp \
    --vertical --n_lines 6000 --chars_per_line 12 --noise_std 5 \
    --blur_sigma 0.5 --seed 11 --font_dir fonts \
    --charset_file charset_dedup3/charset.txt

stage split3 split6k3_val.json 600 corpus6k3/corpus.json -- \
  $CPU python -m effocr_tpu coco-split --coco_json corpus6k3/corpus.json \
    --out_prefix split6k3 --train_frac 0.8 --val_frac 0.1 --seed 99

stage tree3 tree6k3 10800 corpus6k3/images split6k3_train.json -- \
  bash -c "mkdir -p japan_charsets_dedup3 && \
    cp charset_dedup3/charset.txt japan_charsets_dedup3/ && \
    $CPU python -m effocr_tpu format-dataset --image_dir corpus6k3/images \
      --coco_jsons split6k3_train.json,split6k3_val.json,split6k3_test.json \
      --crops_save_dir crops6k3 --cat_id 0 --font_dir fonts \
      --charset_dir japan_charsets_dedup3 --dataset_save_dir tree6k3"

stage_summary
