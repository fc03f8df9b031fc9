"""Offline en_postprocess anchor sweep from saved inference artifacts.

`infer --save_output` writes inference_coco.json with per-char boxes (in
original image space) and raw decoded chars in reading order — everything
en_postprocess consumes except word boundaries, which this script recovers
from the saved line text (spaces are inserted exactly at word_end_idx, and
case/period repair never changes character counts).  That makes the
case/punctuation-repair hyperparameters (anchor_margin, anchor_multiplier
— reference defaults None/4, i.e. repair off:
infer_effocr_onnx_multi.py:92) tunable offline against ground truth
without re-running the detector/recognizer.

Heights/bottoms here are in original-image space while the pipeline
measures them in letterbox space; both thresholds are relative to the
line's own anchor average (margin * avg_h), so the per-line scale cancels
and the sweep transfers.

Usage:
  python scripts/tune_postprocess.py --pred_coco out_val/inference_coco.json \
      --gt_coco split2k_val.json [--dictionary_path d.txt --homoglyphs h.txt]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from effocr_tpu.eval.textline import textline_evaluation  # noqa: E402
from effocr_tpu.pipelines.lang import en_postprocess  # noqa: E402


def recover_lines(pred_coco):
    """-> {file_name: (raw_chars, word_end_idx, heights, bottoms, text)}."""
    annos_by_img = {}
    for a in pred_coco["annotations"]:
        annos_by_img.setdefault(a["image_id"], []).append(a)
    out = {}
    for im in pred_coco["images"]:
        annos = annos_by_img.get(im["id"], [])
        chars = [a["text"] for a in annos]
        heights = [a["bbox"][3] for a in annos]
        bottoms = [a["bbox"][1] + a["bbox"][3] for a in annos]
        text = im.get("text") or ""
        # invert space insertion: en_postprocess emits " "+c at each
        # word_end_idx then strips; repairs never change char counts
        word_end = []
        pos = 0
        for ch in text:
            if ch == " ":
                word_end.append(pos)
            else:
                pos += 1
        if pos != len(chars):
            # postprocess returned None (empty line) or text was altered
            # downstream; skip boundary recovery, keep raw stream
            word_end = []
        out[im["file_name"]] = (chars, word_end, heights, bottoms, text)
    return out


def replay(lines, gt_texts, margin, mult, spell=None):
    pairs = []
    for fn, gt in gt_texts.items():
        chars, word_end, heights, bottoms, text = lines.get(
            fn, ([], [], [], [], "")
        )
        if chars and word_end:
            raw = "".join(c[0] if c else " " for c in chars)
            pred = en_postprocess(
                raw, word_end, heights, bottoms,
                anchor_margin=margin, anchor_multiplier=mult,
            ) or ""
        else:
            pred = text
        if spell is not None and pred:
            pred = spell(pred)
        pairs.append((gt, pred))
    return textline_evaluation(
        pairs, print_incorrect=False, no_spaces_in_eval=False,
        norm_edit_distance=False, uncased=False,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pred_coco", required=True)
    p.add_argument("--gt_coco", required=True)
    p.add_argument("--margins", type=float, nargs="*",
                   default=[0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.4])
    p.add_argument("--multipliers", type=float, nargs="*",
                   default=[2.0, 3.0, 4.0, 6.0])
    p.add_argument("--dictionary_path", help="replay homoglyph spell-check "
                   "on top of each anchor setting")
    p.add_argument("--homoglyphs")
    args = p.parse_args()

    spell = None
    if args.dictionary_path:
        from effocr_tpu.utils.spell_check import (
            default_dicts,
            visual_spell_checker,
        )

        worddict, vsim, abbrevs = default_dicts(
            args.dictionary_path, args.homoglyphs
        )
        spell = lambda s: visual_spell_checker(s, worddict, vsim, abbrevs)

    with open(args.pred_coco) as f:
        pred = json.load(f)
    with open(args.gt_coco) as f:
        gt = json.load(f)
    gt_texts = {im["file_name"]: im["text"] for im in gt["images"]
                if "text" in im}

    lines = recover_lines(pred)
    acc, cer = replay(lines, gt_texts, None, 4.0, spell)
    print(f"baseline (repair off): acc {acc:.2f}  CER {cer:.5f}")
    best = (acc, -cer, None, 4.0)
    for m in args.margins:
        for k in args.multipliers:
            acc, cer = replay(lines, gt_texts, m, k, spell)
            marker = ""
            if (acc, -cer) > best[:2]:
                best = (acc, -cer, m, k)
                marker = "  <-- best"
            print(f"margin {m:<5} mult {k:<4}: acc {acc:.2f}  "
                  f"CER {cer:.5f}{marker}")
    print(f"\nbest: anchor_margin={best[2]} anchor_multiplier={best[3]} "
          f"(acc {best[0]:.2f}, CER {-best[1]:.5f})")


if __name__ == "__main__":
    main()
