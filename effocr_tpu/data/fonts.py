"""Font glyph rendering: builds the prototype/render half of the recognizer
dataset.

Behavioral parity with format_effocr_recognizer_dataset.py:
- draw_single_char (:131-171): draw on a 4x canvas, crop to ink bbox with
  fractional padding, invert to dark-on-white, pad right/bottom to square
  with white, resize to canvas_size.
- draw_single_char_ascender (:174-185): English variant that keeps the full
  ascender/descender vertical metric (crop x to ink, y from 0 to advance
  height), so 'a' and 'A' render at different relative heights — this is what
  makes the case-repair postprocess possible.
- get_unicode_coverage_from_ttf (:188-192), filter_recurring_hash (:195-205)
  (tofu/duplicate-glyph removal), render_chars (:208-239), paired_chars
  (:242-260) with the load-bearing PAIRED_ filename prefix.

Uses modern Pillow APIs (textbbox/getbbox; LANCZOS) — the reference's
font.getsize/Image.ANTIALIAS are removed upstream.
"""

from __future__ import annotations

import os
from collections import defaultdict
from glob import glob
from itertools import chain
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw, ImageFont, ImageOps


def get_unicode_coverage_from_ttf(ttf_path: str) -> Tuple[List[int], List[str]]:
    """Decimal codepoints + chars covered by a TTF/OTF cmap."""
    from fontTools.ttLib import TTFont

    with TTFont(
        ttf_path, 0, allowVID=0, ignoreDecompileErrors=True, fontNumber=-1
    ) as ttf:
        codepoints = sorted(
            set(
                chain.from_iterable(
                    table.cmap.keys() for table in ttf["cmap"].tables
                )
            )
        )
    return codepoints, [chr(c) for c in codepoints]


def draw_single_char(
    ch: str, font: ImageFont.FreeTypeFont, canvas_size: int, padding: float = 0.0
) -> Optional[Image.Image]:
    """Centered glyph -> ink-cropped, inverted, white-square, canvas_size²."""
    img = Image.new("L", (canvas_size * 4, canvas_size * 4), 0)
    c_w, c_h = img.size
    draw = ImageDraw.Draw(img)
    try:
        draw.text((c_w // 2, c_h // 2), ch, 255, font=font, anchor="mm")
    except OSError:
        return None
    bbox = img.getbbox()
    if bbox is None:
        return None
    l, u, r, d = bbox
    if l >= r or u >= d:
        return None
    xpad, ypad = int(padding * (r - l)), int(padding * (d - u))
    arr = np.asarray(img)
    arr = arr[max(u - ypad, 0) : d + ypad, max(l - xpad, 0) : r + xpad]
    arr = 255 - arr
    h, w = arr.shape
    side = max(h, w)
    sq = np.full((side, side), 255, dtype=np.uint8)
    # reference pads the short sides symmetrically (ConstantPad2d with
    # pad_len = |w-h|/2 on both ends of the short axis)
    if w > h:
        off = (side - h) // 2
        sq[off : off + h, :w] = arr
    else:
        off = (side - w) // 2
        sq[:h, off : off + w] = arr
    out = Image.fromarray(sq)
    return out.resize((canvas_size, canvas_size), Image.LANCZOS)


def draw_single_char_ascender(
    ch: str, font: ImageFont.FreeTypeFont, canvas_size: int, padding: float = 0.0
) -> Optional[Image.Image]:
    """English draw: x cropped to ink, y spans the font's line height, so
    relative glyph height survives (format_effocr_recognizer_dataset.py:174-185).
    Not squared; the training transform pads to square."""
    canvas_width, canvas_height = canvas_size * 5, canvas_size * 5
    img = Image.new("RGB", (canvas_width, canvas_height), (0, 0, 0))
    draw = ImageDraw.Draw(img)
    try:
        draw.text((0, 0), ch, (255, 255, 255), font=font)
    except OSError:
        return None
    bbox = img.getbbox()
    if bbox is None:
        return None
    x0, y0, x1, y1 = bbox
    # modern replacement for font.getsize(ch): full line height = ascent+descent
    ascent, descent = font.getmetrics()
    h = ascent + descent
    vdist, hdist = y1 - y0, x1 - x0
    x0 = x0 - hdist * padding
    x1 = x1 + hdist * padding
    h = h + vdist * padding
    uninverted = img.crop((x0, 0, x1, h))
    return ImageOps.invert(uninverted)


def filter_recurring_hash(
    charset: Sequence[str],
    font: ImageFont.FreeTypeFont,
    canvas_size: int,
    sample_size: int = 2000,
    seed: int = 0,
) -> List[int]:
    """Hashes of renders appearing >2x in a sample — tofu boxes etc.
    (format_effocr_recognizer_dataset.py:195-205)."""
    chars = list(charset)
    np.random.default_rng(seed).shuffle(chars)
    hash_count: dict = defaultdict(int)
    for c in chars[:sample_size]:
        img = draw_single_char(c, font, canvas_size)
        if img is not None:
            hash_count[hash(img.tobytes())] += 1
    return [h for h, n in hash_count.items() if n > 2]


def render_chars(
    font_paths: Sequence[str],
    unicode_chars: Sequence[str],
    save_path: str,
    padding: float = 0.0,
    draw_func: Callable = draw_single_char,
    square: bool = False,
    canvas_size: int = 256,
) -> int:
    """Render covered chars per font into <save_path>/<ord>/ PNG tree.

    Filenames: {hex(ord)}_{idx}_{font_name}.png
    (format_effocr_recognizer_dataset.py:236-238).
    """
    os.makedirs(save_path, exist_ok=True)
    idx = 0
    for font_path in font_paths:
        font_name = os.path.splitext(os.path.basename(font_path))[0]
        font = ImageFont.truetype(font_path, size=canvas_size)
        _, covered = get_unicode_coverage_from_ttf(font_path)
        covered = sorted(set(c for c in covered if c in set(unicode_chars)))
        filter_hashes = set(
            filter_recurring_hash(covered, font, canvas_size)
        )
        for c in covered:
            img = draw_func(c, font, canvas_size, padding=padding)
            if img is None:
                continue
            if hash(img.tobytes()) in filter_hashes:
                continue
            char_dir = os.path.join(save_path, str(ord(c)))
            os.makedirs(char_dir, exist_ok=True)
            name = f"{hex(ord(c))}_{idx}_{font_name}.png"
            if square:
                img.resize((64, 64)).save(os.path.join(char_dir, name))
            else:
                img.save(os.path.join(char_dir, name))
            idx += 1
    return idx


def render_signatures(
    chars: Sequence[str],
    font_paths: Sequence[str],
    canvas_size: int = 64,
) -> Dict[str, Tuple[Tuple[int, int], ...]]:
    """char -> tuple of (font index, raster hash) over fonts rendering it.

    Two chars with EQUAL signatures are indistinguishable in every corpus
    font — cross-script clones (Cyrillic А / Greek Α / Latin A in many
    faces), super/subscript twins, dash variants.  A recognizer trained
    on such a charset carries irreducible confusion between them.
    """
    sigs: Dict[str, list] = {c: [] for c in chars}
    want = set(chars)
    for fi, fp in enumerate(font_paths):
        font = ImageFont.truetype(fp, size=canvas_size)
        _, covered = get_unicode_coverage_from_ttf(fp)
        for c in sorted(want.intersection(covered)):
            img = draw_single_char(c, font, canvas_size)
            if img is not None:
                sigs[c].append((fi, hash(img.tobytes())))
    return {c: tuple(s) for c, s in sigs.items()}


def dedupe_render_identical(
    chars: Sequence[str],
    font_paths: Sequence[str],
    canvas_size: int = 64,
    tol: float = 0.0,
) -> Tuple[List[str], List[Tuple[str, str]]]:
    """Drop charset entries indistinguishable from a kept entry in every
    COMMON font (the charset-level extension of filter_recurring_hash —
    the reference only prunes duplicate RENDERS,
    format_effocr_recognizer_dataset.py:195-205, so its charsets keep
    pixel-identical codepoint twins and the corpus ground truth becomes
    unanswerable from pixels).  Returns (kept, [(dropped, kept_twin)]).

    Two chars are merged when they share >=1 rendering font and their
    renders match in ALL fonts covering both — NOT when their coverage
    vectors are equal: codepoint twins often live in different cmap
    subsets (Kangxi radical U+2FBB vs ideograph U+5F73), and a crop can
    only ever come from a font that renders its char, so common-font
    identity is exactly "no crop distinguishes them".  Wider-coverage
    chars are preferred as the kept representative.  `tol` > 0 also
    merges near-identical renders (mean |a-b|/255 <= tol per common
    font); 0 keeps the exact-hash criterion.  Chars no font renders are
    kept (downstream rendering skips them).
    """
    import numpy as _np

    # per-font renders: font idx -> {char: raster}
    renders: List[Dict[str, "_np.ndarray"]] = []
    want = set(chars)
    for fp in font_paths:
        font = ImageFont.truetype(fp, size=canvas_size)
        _, covered = get_unicode_coverage_from_ttf(fp)
        per = {}
        for c in sorted(want.intersection(covered)):
            img = draw_single_char(c, font, canvas_size)
            if img is not None:
                per[c] = _np.asarray(img, _np.uint8)
        renders.append(per)

    coverage = {
        c: [fi for fi, per in enumerate(renders) if c in per] for c in chars
    }

    def _same(a: str, b: str) -> bool:
        common = [fi for fi in coverage[a] if fi in set(coverage[b])]
        if not common:
            return False
        for fi in common:
            ra, rb = renders[fi][a], renders[fi][b]
            if tol <= 0.0:
                if ra.tobytes() != rb.tobytes():
                    return False
            elif float(_np.mean(_np.abs(ra.astype(_np.int16) - rb)) / 255.0) > tol:
                return False
        return True

    # Candidate pairs, complete by construction (no false negatives):
    # exact mode buckets by raster hash; tolerant mode uses the bound
    # mean|a-b| >= L1(4x4 mean-pooled thumbnails)/16, so every pair
    # within tol collides with pooled-L1 <= 16*tol*255.
    cand: Dict[str, set] = {c: set() for c in chars}
    if tol <= 0.0:
        buckets: Dict[tuple, List[str]] = {}
        for fi, per in enumerate(renders):
            for c, r in per.items():
                buckets.setdefault((fi, hash(r.tobytes())), []).append(c)
        for cs in buckets.values():
            if len(cs) > 1:
                s = set(cs)
                for c in cs:
                    cand[c].update(s)
    else:
        pool = max(1, canvas_size // 4)
        lim = 16.0 * tol * 255.0
        for per in renders:
            cs = sorted(per)
            if len(cs) < 2:
                continue
            th = _np.stack([
                per[c][: 4 * pool, : 4 * pool]
                .reshape(4, pool, 4, pool)
                .astype(_np.float32)
                .mean(axis=(1, 3))
                .ravel()
                for c in cs
            ])
            step = 256
            for lo in range(0, len(cs), step):
                d = _np.abs(
                    th[lo: lo + step, None, :] - th[None, :, :]
                ).sum(-1)
                for i, j in zip(*_np.nonzero(d <= lim)):
                    a, b = cs[lo + i], cs[j]
                    if a != b:
                        cand[a].add(b)
                        cand[b].add(a)

    order = sorted(
        range(len(chars)), key=lambda i: (-len(coverage[chars[i]]), i)
    )
    rep: Dict[str, str] = {}  # dropped char -> kept twin
    kept_set: set = set()
    for i in order:
        c = chars[i]
        if not coverage[c]:
            kept_set.add(c)
            continue
        twin = next(
            (k for k in sorted(cand[c]) if k in kept_set and _same(c, k)),
            None,
        )
        if twin is None:
            kept_set.add(c)
        else:
            rep[c] = twin
    kept = [c for c in chars if c not in rep]
    dropped = [(c, rep[c]) for c in chars if c in rep]
    return kept, dropped


# Neighbor-glyph sets of the reference's AddAdjacentChars augmentations
# (utils/datasets_utils.py:97 and :129).  The jp string's duplicates are
# kept verbatim — they weight the sampling distribution.
ADJACENT_CHARS_JP = "HOXELI代西岡光夫締西岡雪"
ADJACENT_CHARS_EN = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.,"
)


def render_adjacent_bank(
    font_path: str, size: int, lang: str = "en"
) -> np.ndarray:
    """Per-side neighbor-glyph bank for the on-device AddAdjacentChars
    augmentation (reference: utils/datasets_utils.py:93-144, defined but
    unwired there; opt-in here via RecognizerTrainConfig.adjacent_font_path).

    The reference draws a neighbor glyph with PIL so only an `offx`-wide
    sliver peeks past the crop edge (e.g. anchor "rm" at x=offx for the
    left side).  The TPU equivalent pre-renders each glyph flush against
    the relevant canvas edge; at train time the batch kernel slices the
    flush edge off and composites it at the opposite border
    (data/transforms.py _compose_adjacent).

    Returns uint8 [V, N, size, size], white background, dark ink.
    V = sides in order: en (l, r) — bottom-anchored like the reference's
    "rb"/"lb" anchors at y=h; jp (l, r, t, b) — centered like "rm"/"lm"/
    "mb"/"mt" at the canvas midlines.
    """
    chars = list(ADJACENT_CHARS_JP if lang == "jp" else ADJACENT_CHARS_EN)
    try:
        _, covered = get_unicode_coverage_from_ttf(font_path)
        cov = set(covered)
        kept = [c for c in chars if c in cov]
        if kept:
            chars = kept
    except Exception:
        pass  # coverage probe is best-effort; PIL renders tofu otherwise
    font = ImageFont.truetype(font_path, size=size)
    if lang == "jp":
        anchors = [("rm", (size, size // 2)), ("lm", (0, size // 2)),
                   ("mb", (size // 2, size)), ("mt", (size // 2, 0))]
    else:
        anchors = [("rb", (size, size)), ("lb", (0, size))]
    bank = np.full((len(anchors), len(chars), size, size), 255, np.uint8)
    for v, (anchor, xy) in enumerate(anchors):
        for i, c in enumerate(chars):
            img = Image.new("L", (size, size), 255)
            ImageDraw.Draw(img).text(xy, c, 0, font=font, anchor=anchor)
            bank[v, i] = np.asarray(img)
    return bank


def paired_chars(
    dir_paths: Sequence[str], save_path: str, omit: str = "", square: bool = False
) -> int:
    """Copy real char crops into the tree as PAIRED_* files
    (format_effocr_recognizer_dataset.py:242-260).  The PAIRED_ prefix is
    load-bearing: it selects the non-augmenting transform and the split
    membership downstream."""
    idx = 0
    for dir_path in dir_paths:
        for fpath in sorted(glob(os.path.join(dir_path, "*.png"))):
            stem = os.path.splitext(os.path.basename(fpath))[0]
            c = stem.split("_")[-1]
            if c.startswith("0x"):
                c = chr(int(c, base=16))
            if c in omit:
                continue
            char_dir = os.path.join(save_path, str(ord(c)))
            os.makedirs(char_dir, exist_ok=True)
            img = Image.open(fpath)
            name = f"PAIRED_{stem}_{idx}.png"
            if square:
                img = img.resize((224, 224))
            img.save(os.path.join(char_dir, name))
            idx += 1
    return idx
