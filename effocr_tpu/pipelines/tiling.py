"""Sliding-window tiling for extreme-aspect text lines.

The reference letterboxes every line onto one fixed canvas
(onnx_engines/localizer_engine.py:107-138), so a very wide line scales
down until its glyphs are unreadable: a 4,000 px-wide newspaper line on
the 640 canvas leaves ~8 px of content height, and the reference has no
recourse (SURVEY.md §5 "long-context" row).  Tiling splits such a line
into overlapping windows that each letterbox at a readable scale, OCRs
every window through the normal fused pipeline (a tile is just another
line in the chunk), and merges the per-tile decodes by ownership span —
each tile keeps only detections whose reading-axis center falls in its
owned interval, with a small margin + cross-tile IoU dedup to absorb
detector jitter at the boundaries.

Pure host-side planning/merging; the device programs are unchanged.
"""

from __future__ import annotations

import math
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np


class TileKey(NamedTuple):
    """Chunk key for one tile of a tiled parent line."""

    parent: object
    index: int


class Tile(NamedTuple):
    start: int        # slice start along the reading axis, parent px
    stop: int         # slice stop (exclusive)
    own_lo: float     # ownership interval along the reading axis
    own_hi: float


def plan_tiles(
    length: int,
    cross: int,
    canvas_main: int,
    canvas_cross: int,
    min_content: int,
    overlap_factor: float = 2.0,
) -> Optional[List[Tile]]:
    """Tile plan along the reading axis, or None when no tiling is needed.

    length/cross: parent extent along/across the reading axis (px).
    canvas_main/canvas_cross: detector canvas extents, same orientation.
    min_content: tile so that the letterboxed content's cross extent is at
    least this many px (0 disables).  overlap_factor: overlap between
    consecutive tiles = factor * cross (bounds how wide a glyph can be and
    still fall fully inside the tile that owns it).
    """
    if min_content <= 0 or length <= 0 or cross <= 0:
        return None
    r_plain = min(canvas_main / length, canvas_cross / cross)
    # target scale: content cross extent >= min_content, but never
    # upscale past native resolution or past the canvas cross extent
    r_t = min(min_content / cross, 1.0, canvas_cross / cross)
    if r_plain >= r_t:
        return None  # the plain letterbox already renders readably
    tile_len = int(canvas_main / r_t)
    if tile_len >= length:
        return None
    overlap = min(max(int(overlap_factor * cross), 0), tile_len // 2)
    stride = max(tile_len - overlap, 1)
    n = 1 + math.ceil((length - tile_len) / stride)
    starts = sorted({min(i * stride, length - tile_len) for i in range(n)})
    # ownership boundary between consecutive tiles = overlap midpoint
    bounds = [
        (starts[i + 1] + (starts[i] + tile_len)) / 2.0
        for i in range(len(starts) - 1)
    ]
    tiles = []
    for i, s in enumerate(starts):
        lo = 0.0 if i == 0 else bounds[i - 1]
        hi = float(length) if i == len(starts) - 1 else bounds[i]
        tiles.append(Tile(s, s + tile_len, lo, hi))
    return tiles


def _iou(a: np.ndarray, b: np.ndarray) -> float:
    from effocr_tpu.eval.coco_map import _iou_matrix

    return float(_iou_matrix(a[None], b[None])[0, 0])


def merge_tile_parts(
    parts: Sequence[Dict],
    plan: Sequence[Tile],
    vertical: bool,
    margin: float,
) -> Tuple[List[str], np.ndarray, np.ndarray]:
    """Merge per-tile decodes into one line, reading-order sorted.

    parts[i]: {"chars": [str], "boxes": np [k,4] parent coords reading-
    order sorted, "words": np [m,4] parent coords} for tile i.  Ownership
    filter with ±margin px slack, then IoU dedup across adjacent tiles
    (detector jitter can place the same glyph's center on either side of
    a boundary; with the margin both tiles keep it and the dedup drops
    the copy whose center sits closer to its tile's cut edge).
    Returns (chars, char boxes [k,4], word boxes [m,4]).
    """
    ax = 1 if vertical else 0
    kept: List[Tuple[float, str, np.ndarray, int, float]] = []
    words_all: List[Tuple[float, np.ndarray]] = []
    for t, (part, tile) in enumerate(zip(parts, plan)):
        boxes = np.asarray(part["boxes"], np.float32).reshape(-1, 4)
        for ch, box in zip(part["chars"], boxes):
            ctr = (box[ax] + box[ax + 2]) / 2.0
            if not (tile.own_lo - margin <= ctr < tile.own_hi + margin):
                continue
            # depth: distance of the center from the tile's cut edges —
            # the copy seen farther from a cut is the better-localized one
            depth = min(ctr - tile.start, tile.stop - ctr)
            kept.append((float(ctr), ch, box, t, float(depth)))
        words = np.asarray(part.get("words", ()), np.float32).reshape(-1, 4)
        for box in words:
            edge = box[ax]  # only the leading edge drives space insertion
            if tile.own_lo - margin <= edge < tile.own_hi + margin:
                words_all.append((float(edge), box))

    # cross-tile char dedup: same glyph decoded by two adjacent tiles
    kept.sort(key=lambda e: (e[0], e[3]))
    dedup: List[Tuple[float, str, np.ndarray, int, float]] = []
    for e in kept:
        if dedup:
            p = dedup[-1]
            if p[3] != e[3] and _iou(p[2], e[2]) > 0.4:
                if e[4] > p[4]:
                    dedup[-1] = e
                continue
        dedup.append(e)

    # reading order by leading edge (the reference's sort key,
    # infer_effocr_onnx_multi.py:72), stable
    dedup.sort(key=lambda e: e[2][ax])
    chars = [e[1] for e in dedup]
    boxes = (
        np.stack([e[2] for e in dedup])
        if dedup else np.zeros((0, 4), np.float32)
    )

    words_all.sort(key=lambda e: e[0])
    wdedup: List[np.ndarray] = []
    for edge, box in words_all:
        if wdedup and abs(edge - wdedup[-1][ax]) < max(4.0, margin):
            continue
        wdedup.append(box)
    words = (
        np.stack(wdedup) if wdedup else np.zeros((0, 4), np.float32)
    )
    return chars, boxes, words
