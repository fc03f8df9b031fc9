"""Wide-line tiling: plan + merge unit tests (pipelines/tiling.py)."""

import numpy as np
import pytest

from effocr_tpu.pipelines.tiling import (
    Tile,
    merge_tile_parts,
    plan_tiles,
)


def test_plan_none_when_disabled_or_readable():
    # disabled
    assert plan_tiles(4000, 60, 640, 640, 0) is None
    # plain letterbox already renders at >= min_content
    assert plan_tiles(700, 60, 640, 640, 32) is None
    # line shorter than one tile
    assert plan_tiles(640, 60, 640, 640, 64) is None


@pytest.mark.parametrize("length,cross,minc", [
    (4000, 60, 48), (2200, 60, 48), (1500, 40, 32), (10000, 30, 30),
])
def test_plan_covers_and_partitions(length, cross, minc):
    plan = plan_tiles(length, cross, 640, 640, minc)
    assert plan is not None and len(plan) >= 2
    # tiles cover the whole line, in order, uniform length, overlapping
    assert plan[0].start == 0 and plan[-1].stop == length
    for t in plan:
        assert 0 <= t.start < t.stop <= length
        # each tile letterboxes at a scale >= the target
        r_tile = min(640 / (t.stop - t.start), 640 / cross)
        assert cross * r_tile >= minc - 1
    for a, b in zip(plan, plan[1:]):
        assert b.start < a.stop  # overlap
        assert a.stop - b.start >= min(2 * cross, (a.stop - a.start) // 2) - 1
    # ownership spans partition [0, length]
    assert plan[0].own_lo == 0.0 and plan[-1].own_hi == float(length)
    for a, b in zip(plan, plan[1:]):
        assert a.own_hi == b.own_lo
        # the boundary sits inside the overlap, so an owned glyph is
        # fully visible in its owner
        assert b.start < a.own_hi < a.stop


def test_merge_ownership_and_dedup():
    # two tiles, boundary at 500; glyph at the boundary detected by both
    plan = [Tile(0, 560, 0.0, 500.0), Tile(440, 1000, 500.0, 1000.0)]
    box = lambda x: np.array([x, 10, x + 20, 50], np.float32)
    parts = [
        {"chars": ["a", "b"], "boxes": np.stack([box(100), box(490)]),
         "words": np.zeros((0, 4), np.float32)},
        # same boundary glyph seen again (jittered 1px), plus one more
        {"chars": ["b", "c"], "boxes": np.stack([box(491), box(700)]),
         "words": np.zeros((0, 4), np.float32)},
    ]
    chars, boxes, words = merge_tile_parts(parts, plan, False, margin=5.0)
    assert chars == ["a", "b", "c"]
    assert boxes.shape == (3, 4)
    # the surviving boundary copy is the one deeper inside its tile:
    # tile 1's (center 501 -> 61 px from its cuts) over tile 0's (60 px)
    assert boxes[1][0] == 491.0

    # outside-ownership detections (clipped partials at cut edges) drop
    parts[0]["chars"] = ["a", "X"]
    parts[0]["boxes"] = np.stack([box(100), box(545)])  # 545 >> own_hi+5
    chars, boxes, _ = merge_tile_parts(parts, plan, False, margin=5.0)
    assert chars == ["a", "b", "c"]


def test_merge_words_dedup_and_order():
    plan = [Tile(0, 560, 0.0, 500.0), Tile(440, 1000, 500.0, 1000.0)]
    wbox = lambda x, w: np.array([x, 0, x + w, 60], np.float32)
    parts = [
        {"chars": [], "boxes": np.zeros((0, 4), np.float32),
         "words": np.stack([wbox(80, 100), wbox(480, 100)])},
        {"chars": [], "boxes": np.zeros((0, 4), np.float32),
         # duplicate of the boundary word (left edge jitter) + one owned
         "words": np.stack([wbox(482, 60), wbox(700, 90)])},
    ]
    _, _, words = merge_tile_parts(parts, plan, False, margin=5.0)
    assert words.shape[0] == 3
    assert list(words[:, 0]) == [80.0, 480.0, 700.0]


def test_merge_vertical_axis():
    plan = [Tile(0, 560, 0.0, 500.0), Tile(440, 1000, 500.0, 1000.0)]
    vbox = lambda y: np.array([10, y, 50, y + 20], np.float32)
    parts = [
        {"chars": ["x"], "boxes": vbox(100)[None],
         "words": np.zeros((0, 4), np.float32)},
        {"chars": ["y"], "boxes": vbox(800)[None],
         "words": np.zeros((0, 4), np.float32)},
    ]
    chars, boxes, _ = merge_tile_parts(parts, plan, True, margin=5.0)
    assert chars == ["x", "y"]
    assert boxes[0][1] == 100.0
