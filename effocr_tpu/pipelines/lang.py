"""Language-specific pre/post-processing (pure host functions).

Behavioral parity with the reference, which duplicates this logic in three
drivers (infer_effocr_onnx_multi.py:70-140, infer_effocr.py:346-419,
onnx_engines/infer_ocr_yolo.py:441-514); here it is centralized once.

- en_preprocess: reading-order sort + word-boundary indices (the char whose
  right edge is nearest to, and right of, each word box's left edge).
- en_postprocess: space insertion at word boundaries, then (optionally,
  when anchor_margin is set) case repair against the average height of
  "distinct lowercase" letters (aenr) and '-' -> '.' repair by baseline
  position.
- jp_preprocess: reading-order sort only (y when vertical).

Quirk faithfully kept: in en_preprocess the closest-char index persists
across words, so a word box with no char right-edge beyond its left edge
reuses the previous word's boundary (infer_effocr_onnx_multi.py:75-86).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

LARGE_NUMBER = 1_000_000_000

DISTINCT_LOWERCASE = list("aenr")       # utils/spell_check_utils.py:60-61
NONDISTINCT_LOWERCASE = list("wuosvcxz")  # :64-65


def en_preprocess(
    bboxes_char: Sequence[Sequence[float]],
    bboxes_word: Sequence[Sequence[float]],
    vertical: bool = False,
) -> Tuple[List[Sequence[float]], List[int]]:
    """Sort char/word boxes in reading order; find word-end char indices."""
    key = (lambda b: b[1]) if vertical else (lambda b: b[0])
    sorted_chars = sorted(bboxes_char, key=key)
    sorted_words = sorted(bboxes_word, key=key)

    char_rights = [b[2] for b in sorted_chars]
    word_end_idx: List[int] = []
    closest_idx = 0
    for word in sorted_words:
        wordleft = word[0]
        prev_dist = LARGE_NUMBER
        for idx, charright in enumerate(char_rights):
            dist = abs(wordleft - charright)
            if dist < prev_dist and charright > wordleft:
                prev_dist = dist
                closest_idx = idx
        word_end_idx.append(closest_idx)
    assert len(word_end_idx) == len(sorted_words)
    return sorted_chars, word_end_idx


def word_end_indices(
    char_boxes, word_boxes, vertical: bool = False
) -> List[int]:
    """Vectorized ``en_preprocess`` word-end computation (numpy arrays in,
    no list round-trips) for the hot consumer path.

    Semantics are exactly en_preprocess (and the reference,
    infer_effocr_onnx_multi.py:70-89) including the quirk that a word
    with no char right-edge beyond its left edge inherits the PREVIOUS
    word's index (``closest_idx`` carries across iterations).  Indices
    are into the x0-sorted (y0 if vertical) char order.  Golden-tested
    against en_preprocess in tests/test_lang.py.
    """
    import numpy as np

    cb = np.asarray(char_boxes, np.float32).reshape(-1, 4)
    wb = np.asarray(word_boxes, np.float32).reshape(-1, 4)
    ax = 1 if vertical else 0
    ck = cb[:, ax]
    wk = wb[:, ax]
    # device output is already reading-order sorted; skip the argsorts
    # when monotone (the common case) — stable sort of sorted = identity
    if ck.size > 1 and not (ck[1:] >= ck[:-1]).all():
        cb = cb[np.argsort(ck, kind="stable")]
    if wk.size > 1 and not (wk[1:] >= wk[:-1]).all():
        wb = wb[np.argsort(wk, kind="stable")]
    rights = cb[:, 2]
    # one [m, k] pass: per word, first index minimizing |wordleft - right|
    # among chars whose right edge passes the word's left edge
    wl = wb[:, 0:1]                                       # [m, 1]
    qual = rights[None, :] > wl                           # [m, k]
    dist = np.where(qual, np.abs(wl - rights[None, :]), np.inf)
    best = dist.argmin(axis=1)
    has = qual.any(axis=1)
    out: List[int] = []
    closest = 0
    for b, h in zip(best, has):
        if h:
            closest = int(b)
        out.append(closest)
    return out


def batch_word_ends(flat_rights, n_chars, word_lefts, word_valid):
    """``word_end_indices`` for a whole line-segment in one vectorized
    pass (the per-line calls were ~40% of the consumer thread at
    line_batch 512).

    flat_rights: [>= sum(n_chars)] char right edges, line-major reading
    order (the fused device output).  n_chars: [n] chars per line.
    word_lefts: [n, w] word left edges, reading-order sorted with the
    invalid slots LAST (the device word_key sort).  word_valid: [n, w]
    prefix mask.  Returns [n, w] int32: per valid word slot, the
    word-end char index with the exact en_preprocess carry semantics
    (a word with no char right-edge beyond its left edge inherits the
    previous word's index; initial carry 0).  Entries beyond the valid
    prefix are meaningless.  Golden-tested against word_end_indices in
    tests/test_lang.py.
    """
    import numpy as np

    n, w = word_lefts.shape
    n_chars = np.asarray(n_chars[:n], np.int64)
    total = int(n_chars.sum())
    if n == 0 or w == 0 or total == 0:
        return np.zeros((n, w), np.int32)
    kmax = int(n_chars.max())
    offsets = np.concatenate([[0], np.cumsum(n_chars)])
    rows = np.repeat(np.arange(n), n_chars)
    cols = np.arange(total) - np.repeat(offsets[:-1], n_chars)
    rights = np.full((n, kmax), -np.inf, np.float32)
    rights[rows, cols] = np.asarray(flat_rights[:total], np.float32)

    wl = np.where(word_valid, word_lefts, np.inf).astype(np.float32)
    qual = rights[:, None, :] > wl[:, :, None]            # [n, w, kmax]
    dist = np.where(qual, np.abs(wl[:, :, None] - rights[:, None, :]),
                    np.inf)
    best = dist.argmin(axis=2).astype(np.int32)           # [n, w]
    has = qual.any(axis=2)
    # carry: each word takes the best of the most recent word that HAS a
    # qualifying char (else the line-initial 0)
    slot = np.where(has, np.arange(w, dtype=np.int32)[None, :], -1)
    last = np.maximum.accumulate(slot, axis=1)            # [n, w]
    fill = np.take_along_axis(best, np.maximum(last, 0), axis=1)
    return np.where(last >= 0, fill, 0).astype(np.int32)


def insert_spaces(text: str, word_end_idx) -> Optional[str]:
    """The anchor-free en_postprocess fast path: insert a space before
    each word-end char index, strip, with the same empty-input contract
    (empty text or no word boxes -> None).  Equivalent to
    en_postprocess(text, word_end_idx, ..., anchor_margin=None) without
    the per-char interleave loop (tests/test_lang.py asserts parity)."""
    if len(text) == 0 or len(word_end_idx) == 0:
        return None
    cuts = sorted(set(int(i) for i in word_end_idx))
    pieces = [text[a:b] for a, b in zip([0] + cuts, cuts + [None])]
    return " ".join(pieces).strip()


def _flatten(items):
    for item in items:
        if isinstance(item, (tuple, list)):
            yield from _flatten(item)
        else:
            yield item


def en_postprocess(
    line_output: str,
    word_end_idx: Sequence[int],
    charheights: Sequence[float],
    charbottoms: Sequence[float],
    anchor_margin: Optional[float] = None,
    anchor_multiplier: float = 4,
) -> Optional[str]:
    """Space insertion + optional case/punctuation repair.

    line_output: the raw decoded char string (one char per detection, in
    reading order).  charheights/charbottoms are measured in the localizer's
    640-letterbox space (infer_effocr_onnx_multi.py:320-322).
    """
    assert len(line_output) == len(charheights) == len(charbottoms), (
        f"{len(line_output)} == {len(charheights)} == {len(charbottoms)}"
    )
    if any(
        len(x) == 0
        for x in (line_output, word_end_idx, charheights, charbottoms)
    ):
        return None

    # single fused pass (was three comprehensions + a recursive flatten —
    # this runs per line on the inference hot path)
    word_end_set = set(word_end_idx)
    outchars: List[str] = []
    heights: List[float] = []
    bottoms: List[float] = []
    for i, c in enumerate(line_output):
        if i in word_end_set:
            outchars.append(" ")
            heights.append(LARGE_NUMBER)
            bottoms.append(0)
        outchars.append(c)
        heights.append(charheights[i])
        bottoms.append(charbottoms[i])
    if bottoms and bottoms[0] == 0:
        bottoms = bottoms[1:]
    if heights and heights[0] == LARGE_NUMBER:
        heights = heights[1:]

    line = "".join(outchars).strip()
    assert len(heights) == len(line), (
        f"heights = {len(heights)}; output = {len(line)}"
    )

    if anchor_margin is None:
        return line
    distinct_idx = [i for i, c in enumerate(line) if c in DISTINCT_LOWERCASE]
    if len(distinct_idx) == 0:
        return line

    avg_h = sum(heights[i] for i in distinct_idx) / len(distinct_idx)
    tolower = {
        i for i, c in enumerate(line)
        if abs(heights[i] - avg_h) < anchor_margin * avg_h
    }
    toupper = {
        i for i, c in enumerate(line)
        if heights[i] - avg_h > anchor_margin * anchor_multiplier * avg_h
    }
    avg_b = sum(bottoms[i] for i in distinct_idx) / len(distinct_idx)
    toperiod = {
        i for i, c in enumerate(line)
        if c == "-" and abs(bottoms[i] - avg_b) < anchor_margin * avg_h
    }

    nondistinct = set(NONDISTINCT_LOWERCASE)
    line = "".join(
        c.lower() if i in tolower else c for i, c in enumerate(line)
    )
    line = "".join(
        c.upper() if i in toupper and c in nondistinct else c
        for i, c in enumerate(line)
    )
    line = "".join(
        "." if i in toperiod else c for i, c in enumerate(line)
    )
    return line


def jp_preprocess(
    bboxes_char: Sequence[Sequence[float]], vertical: bool = True
) -> List[Sequence[float]]:
    """Reading-order sort (infer_effocr_onnx_multi.py:134-140)."""
    key = (lambda b: b[1]) if vertical else (lambda b: b[0])
    return sorted(bboxes_char, key=key)
