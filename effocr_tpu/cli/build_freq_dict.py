"""Build a "word count" frequency dictionary for the homoglyph spell
checker from any text corpus.

The reference consumes symspellpy's bundled 82k-word english frequency list
(utils/spell_check_utils.py:14-23).  That asset isn't redistributable here,
so this tool derives an equivalent file from text you have: plain text
files, or the `text` fields of COCO line-annotation JSONs.  Output format
matches create_worddict: whitespace-separated ``word count`` pairs.

    python -m effocr_tpu build-freq-dict --out freq.txt \
        --text_files book1.txt,book2.txt --coco_jsons train.json

Counts are case-folded; tokens are stripped of punctuation and filtered to
alphabetic words.  --merge_builtin seeds the output with the builtin
common-word list (scaled web-frequency counts) so tiny corpora still rank
everyday words sensibly.
"""

from __future__ import annotations

import argparse
import json
import re
from collections import Counter

_WORD = re.compile(r"[A-Za-z]+(?:'[A-Za-z]+)?")


def count_words(texts, min_count: int = 1, min_len: int = 1) -> Counter:
    counts: Counter = Counter()
    for text in texts:
        for m in _WORD.finditer(text):
            w = m.group(0).lower()
            if len(w) >= min_len:
                counts[w] += 1
    if min_count > 1:
        counts = Counter({w: c for w, c in counts.items()
                          if c >= min_count})
    return counts


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--text_files", type=str, default=None,
                   help="comma-separated plain-text files")
    p.add_argument("--coco_jsons", type=str, default=None,
                   help="comma-separated COCO JSONs; uses images[].text")
    p.add_argument("--min_count", type=int, default=1)
    p.add_argument("--min_len", type=int, default=1)
    p.add_argument("--merge_builtin", action="store_true", default=False,
                   help="seed with the builtin common-word frequencies "
                        "(scaled to the corpus size)")
    args = p.parse_args()
    assert args.text_files or args.coco_jsons, (
        "need --text_files and/or --coco_jsons"
    )

    texts = []
    for path in (args.text_files or "").split(","):
        if path:
            with open(path) as f:
                texts.append(f.read())
    for path in (args.coco_jsons or "").split(","):
        if path:
            with open(path) as f:
                coco = json.load(f)
            texts.extend(im.get("text", "") for im in coco["images"])

    counts = count_words(texts, args.min_count, args.min_len)

    if args.merge_builtin:
        from effocr_tpu.utils.spell_check import create_worddict

        builtin = create_worddict()
        # scale builtin web counts down to the corpus count scale so corpus
        # evidence dominates where both exist
        top = max(counts.values()) if counts else 1
        btop = max(builtin.values())
        for w, c in builtin.items():
            scaled = max(int(c * top / btop / 2), 1)
            counts[w] = max(counts.get(w, 0), scaled)

    items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    with open(args.out, "w") as f:
        f.write("\n".join(f"{w} {c}" for w, c in items))
    print(f"{len(items)} words -> {args.out}")


if __name__ == "__main__":
    main()
