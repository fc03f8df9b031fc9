"""Goldens for en/jp pre/postprocessing (reference semantics)."""

import pytest

from effocr_tpu.pipelines.lang import (
    LARGE_NUMBER,
    en_postprocess,
    en_preprocess,
    jp_preprocess,
)


def box(x0, y0, x1, y1):
    return [x0, y0, x1, y1]


def test_en_preprocess_sorts_and_finds_word_ends():
    # three chars 'a b' with word box starting after the first char
    chars = [box(20, 0, 30, 10), box(0, 0, 10, 10), box(40, 0, 50, 10)]
    words = [box(15, 0, 50, 10)]  # word starts at 15
    sorted_chars, word_end_idx = en_preprocess(chars, words)
    assert [c[0] for c in sorted_chars] == [0, 20, 40]
    # char whose right edge (10, 30, 50) is nearest to 15 while > 15 -> idx 1
    assert word_end_idx == [1]


def test_en_preprocess_stale_closest_idx_quirk():
    # word box left of every char right edge except none -> reuses previous
    chars = [box(0, 0, 10, 10)]
    words = [box(2, 0, 9, 10), box(50, 0, 60, 10)]  # 2nd word: no charright>50
    _, word_end_idx = en_preprocess(chars, words)
    assert word_end_idx == [0, 0]


def test_en_preprocess_vertical_sort():
    chars = [box(0, 30, 10, 40), box(0, 0, 10, 10)]
    sorted_chars, _ = en_preprocess(chars, [], vertical=True)
    assert [c[1] for c in sorted_chars] == [0, 30]


def test_en_postprocess_spaces():
    # "the cat": word-end idx 3 ('c' starts a new word)
    out = en_postprocess(
        "thecat", [3], [10.0] * 6, [20.0] * 6, anchor_margin=None
    )
    assert out == "the cat"


def test_en_postprocess_space_at_start_stripped():
    out = en_postprocess("abc", [0], [10.0] * 3, [20.0] * 3)
    assert out == "abc"


def test_en_postprocess_empty_returns_none():
    assert en_postprocess("", [], [], []) is None
    assert en_postprocess("ab", [], [1, 1], [2, 2]) is None  # no word ends


def test_en_postprocess_case_repair():
    # distinct lowercase 'a' at height 10; 'O' at height 10 should lower to
    # 'o' (within margin); 'w' at height 50 should upper to 'W'
    line = "aOw"
    heights = [10.0, 10.5, 55.0]
    bottoms = [20.0, 20.0, 20.0]
    out = en_postprocess(line, [1], heights, bottoms, anchor_margin=0.2)
    # word end at idx 1 -> "a Ow"; case repair: O->o (similar height),
    # w -> W (10x the anchor height > margin*4)
    assert out == "a oW"


def test_en_postprocess_dash_to_period():
    # '-' sitting on the baseline of lowercase letters becomes '.'
    line = "an-"
    heights = [10.0, 10.0, 10.0]
    bottoms = [20.0, 20.0, 20.5]
    out = en_postprocess(line, [1], heights, bottoms, anchor_margin=0.3)
    assert out.endswith(".")


def test_jp_preprocess():
    chars = [box(0, 30, 10, 40), box(0, 0, 10, 10)]
    assert jp_preprocess(chars, vertical=True)[0][1] == 0
    chars = [box(30, 0, 40, 10), box(0, 0, 10, 10)]
    assert jp_preprocess(chars, vertical=False)[0][0] == 0


def test_word_end_indices_matches_en_preprocess():
    """Vectorized hot-path variant == en_preprocess golden, including the
    carried-closest-idx quirk for words with no qualifying char."""
    import numpy as np

    from effocr_tpu.pipelines.lang import en_preprocess, word_end_indices

    rng = np.random.default_rng(9)
    for _ in range(50):
        n_c = int(rng.integers(1, 40))
        n_w = int(rng.integers(1, 12))
        x0 = rng.uniform(0, 600, n_c)
        cb = np.stack([x0, rng.uniform(0, 5, n_c), x0 + rng.uniform(2, 20, n_c),
                       rng.uniform(10, 30, n_c)], axis=1).astype(np.float32)
        wx0 = rng.uniform(-20, 640, n_w)
        wb = np.stack([wx0, rng.uniform(0, 5, n_w), wx0 + rng.uniform(5, 80, n_w),
                       rng.uniform(10, 30, n_w)], axis=1).astype(np.float32)
        _, want = en_preprocess(cb.tolist(), wb.tolist())
        got = word_end_indices(cb, wb)
        assert got == want
        # vertical too
        _, want_v = en_preprocess(cb.tolist(), wb.tolist(), vertical=True)
        assert word_end_indices(cb, wb, vertical=True) == want_v
