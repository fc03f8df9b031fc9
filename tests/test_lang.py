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


def test_batch_word_ends_matches_word_end_indices():
    """Segment-batched word ends == per-line word_end_indices on ragged
    random lines (device layout: reading-order sorted, valid-prefix word
    slots)."""
    import numpy as np

    from effocr_tpu.pipelines.lang import batch_word_ends, word_end_indices

    rng = np.random.default_rng(11)
    for trial in range(20):
        n = int(rng.integers(1, 9))
        w = int(rng.integers(1, 8))
        n_chars = rng.integers(0, 30, n)
        lines_cb = []
        flat_rights = []
        word_lefts = np.zeros((n, w), np.float32)
        word_valid = np.zeros((n, w), bool)
        per_line_wb = []
        for i in range(n):
            k = int(n_chars[i])
            x0 = np.sort(rng.uniform(0, 600, k)).astype(np.float32)
            cb = np.stack(
                [x0, np.full(k, 5, np.float32),
                 x0 + rng.uniform(2, 20, k).astype(np.float32),
                 np.full(k, 30, np.float32)], axis=1,
            ) if k else np.zeros((0, 4), np.float32)
            lines_cb.append(cb)
            flat_rights.extend(cb[:, 2].tolist())
            nw = int(rng.integers(0, w + 1))
            wx0 = np.sort(rng.uniform(-20, 640, nw)).astype(np.float32)
            wb = np.stack(
                [wx0, np.full(nw, 5, np.float32), wx0 + 40,
                 np.full(nw, 30, np.float32)], axis=1,
            ) if nw else np.zeros((0, 4), np.float32)
            per_line_wb.append(wb)
            word_lefts[i, :nw] = wx0
            word_valid[i, :nw] = True
        got = batch_word_ends(
            np.asarray(flat_rights, np.float32), n_chars, word_lefts,
            word_valid,
        )
        for i in range(n):
            nw = int(word_valid[i].sum())
            if n_chars[i] == 0 or nw == 0:
                continue
            want = word_end_indices(lines_cb[i], per_line_wb[i])
            assert got[i, :nw].tolist() == want, (trial, i)


def test_insert_spaces_matches_en_postprocess():
    import numpy as np

    from effocr_tpu.pipelines.lang import en_postprocess, insert_spaces

    rng = np.random.default_rng(12)
    for _ in range(40):
        k = int(rng.integers(0, 30))
        text = "".join(
            rng.choice(list("abcXYZ-.,123"), k)
        )
        n_w = int(rng.integers(0, 8))
        wei = rng.integers(0, max(k, 1), n_w).tolist()
        want = en_postprocess(
            text, wei, [10.0] * k, [20.0] * k, anchor_margin=None
        )
        got = insert_spaces(text, wei)
        assert got == want, (text, wei, got, want)
