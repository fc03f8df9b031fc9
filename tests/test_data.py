"""Data layer tests: samplers, charsets, COCO tools, coco_map."""

import numpy as np
import pytest

from effocr_tpu.data.charsets import harmonize_charset
from effocr_tpu.data.coco import (
    combine_coco_jsons,
    create_coco_anno_entry,
    create_coco_image_entry,
    split_coco_json,
    subset_coco_json,
    COCO_JSON_SKELETON,
)
from effocr_tpu.data.samplers import (
    HardNegativeClassSampler,
    NoReplacementMPerClassSampler,
    batch_iterator,
)
from effocr_tpu.eval.coco_map import coco_map


def test_m_per_class_sampler_properties():
    labels = np.repeat(np.arange(20), 10)  # 20 classes x 10 samples
    sampler = NoReplacementMPerClassSampler(labels, m=4, batch_size=16,
                                            num_passes=1, seed=0)
    idx = list(iter(sampler))
    assert len(idx) == len(sampler)
    assert len(idx) % 16 == 0
    # every 4 consecutive samples share a class, 4 distinct classes per batch
    for s in range(0, len(idx), 16):
        batch = idx[s : s + 16]
        for g in range(0, 16, 4):
            group_labels = {labels[i] for i in batch[g : g + 4]}
            assert len(group_labels) == 1
        batch_classes = [labels[batch[g]] for g in range(0, 16, 4)]
        assert len(set(batch_classes)) == 4


def test_m_per_class_sampler_no_replacement_until_exhausted():
    # samples of a class must stay distinct until its supply is used up
    # (the epoch may wrap classes after the shuffle cycle, like the
    # reference's restart at recognizer_samplers.py:45-47)
    labels = np.repeat(np.arange(8), 12)
    sampler = NoReplacementMPerClassSampler(labels, m=4, batch_size=8,
                                            num_passes=1, seed=1)
    idx = list(iter(sampler))
    per_class = {}
    for i in idx:
        per_class.setdefault(labels[i], []).append(i)
    for c, items in per_class.items():
        n_groups = len(items) // 4
        expected_distinct = min(n_groups * 4, 12)
        assert len(set(items)) >= expected_distinct - 3  # last group may pad


def test_hard_negative_sampler_splices_sets():
    labels = np.repeat(np.arange(16), 8)
    class_to_idx = {str(ord(chr(97 + i))): i for i in range(16)}  # a..p
    hns = ["abcdefgh", "ijklmnop"]
    sampler = HardNegativeClassSampler(
        labels, class_to_idx, hns, m=4, batch_size=16, hns_set_size=8,
        num_passes=1, seed=0,
    )
    idx = list(iter(sampler))
    base = NoReplacementMPerClassSampler(labels, m=4, batch_size=16,
                                         num_passes=1, seed=0)
    assert len(idx) == len(base) + 2 * 8 * 4  # two sets x 8 classes x m


def test_harmonize_charset_jp():
    chars = harmonize_charset(["あ", "ッ"], "jp")
    assert "あ" in chars and "ッ" not in chars
    assert "0" in chars and "A" in chars and "々" in chars


def test_coco_split_combine_subset():
    coco = dict(COCO_JSON_SKELETON)
    coco["images"] = [
        create_coco_image_entry(f"im{i}.png", 32, 100, i, text="x")
        for i in range(10)
    ]
    coco["annotations"] = [
        create_coco_anno_entry(0, 0, 5, 5, i, i % 10) for i in range(30)
    ]
    tr, va, te = split_coco_json(coco, 0.8, 0.1)
    assert len(tr["images"]) == 8 and len(va["images"]) == 1
    ids = {im["id"] for s in (tr, va, te) for im in s["images"]}
    assert len(ids) == 10
    # annotations follow their images
    for s in (tr, va, te):
        img_ids = {im["id"] for im in s["images"]}
        assert all(a["image_id"] in img_ids for a in s["annotations"])

    merged = combine_coco_jsons(tr, va)
    assert len(merged["images"]) == 9
    assert len({im["id"] for im in merged["images"]}) == 9

    sub = subset_coco_json(coco, 3)
    assert len(sub["images"]) == 3


def test_coco_map_perfect_predictions():
    gt = [{"boxes": [[0, 0, 10, 10], [20, 20, 40, 40]], "classes": [0, 1]}]
    pred = [{
        "boxes": [[0, 0, 10, 10], [20, 20, 40, 40]],
        "classes": [0, 1], "scores": [0.9, 0.8],
    }]
    result = coco_map(pred, gt, num_classes=2)
    assert result["bbox/AP"] == pytest.approx(1.0)
    assert result["bbox/AP50"] == pytest.approx(1.0)


def test_coco_map_false_positive_lowers_precision():
    gt = [{"boxes": [[0, 0, 10, 10]], "classes": [0]}]
    pred = [{
        "boxes": [[0, 0, 10, 10], [50, 50, 60, 60]],
        "classes": [0, 0], "scores": [0.5, 0.9],  # FP scored higher
    }]
    result = coco_map(pred, gt, num_classes=1)
    assert 0.0 < result["bbox/AP50"] < 1.0


def test_coco_map_miss():
    gt = [{"boxes": [[0, 0, 10, 10]], "classes": [0]}]
    pred = [{"boxes": np.zeros((0, 4)), "classes": [], "scores": []}]
    result = coco_map(pred, gt, num_classes=1)
    assert result["bbox/AP"] == 0.0


def test_builtin_charsets(tmp_path):
    from effocr_tpu.data.builtin_charsets import write_charset_dir
    from effocr_tpu.data.charsets import load_charset_dir

    write_charset_dir(str(tmp_path))
    chars = load_charset_dir(str(tmp_path))
    assert "a" in chars and "Z" in chars and "9" in chars and "." in chars


def test_augment_crop_sim_geometry():
    """crop_sim warps a render into paired-crop geometry (deterministic
    check of the warp itself: scale s about the center then shift so the
    content anchors to the top edge for jp vertical lines); and paired
    samples bypass augmentation entirely."""
    import jax
    import jax.numpy as jnp

    from effocr_tpu.core.config import IMAGENET_MEAN, IMAGENET_STD
    from effocr_tpu.data.transforms import (
        _affine_matrix,
        _apply_affine,
        augment_batch,
    )

    size = 64
    img = np.full((size, size, 3), 255, np.uint8)
    img[8 : size - 8, 8 : size - 8] = 0  # centered dark glyph
    x = jnp.asarray(img[None]).astype(jnp.float32) / 255.0

    s = jnp.array([0.5])
    off = (1.0 - s) * (size / 2.0)
    a_y, a_x = _affine_matrix(size, s, jnp.zeros((1,)), -off)
    out = np.asarray(_apply_affine(x, a_y, a_x))
    rows = np.where((out[0].mean(-1) < 0.5).any(axis=1))[0]
    cols = np.where((out[0].mean(-1) < 0.5).any(axis=0))[0]
    # top-anchored, x-centered, ~half-size content
    assert rows[0] <= 5, rows[0]
    assert abs((rows[-1] - rows[0] + 1) - 24) <= 3
    assert abs((cols[0] + cols[-1]) / 2 - (size - 1) / 2) <= 2

    # paired samples bypass augmentation entirely (incl. crop_sim)
    batch = jnp.asarray(np.stack([img, img]))
    is_paired = jnp.asarray(np.array([True, True]))
    out2 = augment_batch(batch, is_paired, jax.random.PRNGKey(0),
                         lang="jp", crop_sim=1.0)
    out2 = np.asarray(out2) * np.array(IMAGENET_STD) + np.array(IMAGENET_MEAN)
    dark_rows = np.where((out2[0].mean(-1) < 0.5).any(axis=1))[0]
    assert dark_rows[0] == 8 and dark_rows[-1] == size - 9


def test_adjacent_chars_augmentation():
    """AddAdjacentChars equivalent (utils/datasets_utils.py:93-144): the
    bank renders flush-edge glyphs; _compose_adjacent puts ink ONLY in the
    peek band at active edges; paired crops bypass it entirely."""
    import jax
    import jax.numpy as jnp

    from effocr_tpu.core.config import IMAGENET_MEAN, IMAGENET_STD
    from effocr_tpu.data.fonts import render_adjacent_bank
    from effocr_tpu.data.transforms import _compose_adjacent, augment_batch

    font = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
    size = 64
    bank = render_adjacent_bank(font, size, lang="en")
    assert bank.shape[0] == 2 and bank.dtype == np.uint8
    assert bank.shape[2:] == (size, size)
    # left-peek variant is flush right (rightmost ink column near the
    # right edge for every glyph); right-peek variant mirrored.  Wide
    # glyphs may span the whole canvas, so only the flush edge is pinned.
    for g in range(bank.shape[1]):
        ink0 = np.where((bank[0, g] < 128).any(axis=0))[0]
        ink1 = np.where((bank[1, g] < 128).any(axis=0))[0]
        assert len(ink0) and ink0[-1] >= size - 8, (g, ink0)
        assert len(ink1) and ink1[0] < 8, (g, ink1)

    jp_bank = render_adjacent_bank(font, size, lang="jp")
    assert jp_bank.shape[0] == 4  # l, r, t, b
    # DejaVu covers none of the CJK neighbor chars but does cover HOXELI
    assert jp_bank.shape[1] >= 6

    # composite: white batch -> ink appears only inside the edge bands
    b = 64
    white = jnp.ones((b, size, size, 3), jnp.float32)
    out = np.asarray(
        _compose_adjacent(white, jnp.asarray(bank), jax.random.PRNGKey(0),
                          "en")
    )
    offx = size // 8
    interior = out[:, :, offx:size - offx, :]
    assert (interior > 0.99).all(), "ink outside the peek bands"
    edges = np.concatenate([out[:, :, :offx], out[:, :, size - offx:]], 2)
    n_with_ink = int((edges < 0.5).any(axis=(1, 2, 3)).sum())
    # p(>=1 side) = 0.5; over 64 samples this is ~32 +- a few
    assert 15 <= n_with_ink <= 50, n_with_ink

    # full augment_batch path: paired crops stay un-augmented
    img = np.full((size, size, 3), 255, np.uint8)
    batch = jnp.asarray(np.stack([img] * 4))
    paired = jnp.asarray(np.array([True, True, True, True]))
    out2 = augment_batch(batch, paired, jax.random.PRNGKey(1), lang="en",
                         adjacent_bank=jnp.asarray(bank))
    out2 = np.asarray(out2) * np.array(IMAGENET_STD) + np.array(IMAGENET_MEAN)
    assert (out2 > 0.99).all()


def test_jp_charset_asset_ships():
    """The CJK charset asset (japan_charsets/ role) is present, parses in
    the reference's tab-separated format, and covers kana + kanji."""
    from effocr_tpu.data.builtin_charsets import jp_charset_path
    from effocr_tpu.data.charsets import load_chars

    rows = load_chars(jp_charset_path())
    chars = {r[-1] for r in rows}
    assert len(chars) > 13000
    assert {"あ", "ア", "漢", "字"} <= chars


def test_paired_jitter_augmentation():
    """paired_jitter applies a small affine to PAIRED crops only; 0 keeps
    the reference's clean paired transform."""
    import jax
    import jax.numpy as jnp

    from effocr_tpu.data.transforms import augment_batch

    size = 64
    img = np.full((size, size, 3), 255, np.uint8)
    img[8 : size - 8, 8 : size - 8] = 0
    batch = jnp.asarray(np.stack([img, img]))
    paired = jnp.asarray(np.array([True, True]))

    base = np.asarray(augment_batch(batch, paired, jax.random.PRNGKey(0)))
    jit0 = np.asarray(augment_batch(batch, paired, jax.random.PRNGKey(0),
                                    paired_jitter=0.0))
    np.testing.assert_array_equal(base, jit0)

    jit1 = np.asarray(augment_batch(batch, paired, jax.random.PRNGKey(0),
                                    paired_jitter=1.0))
    assert not np.array_equal(base, jit1)
    # the jitter is SMALL: content moves a few px, not wholesale
    dark = (jit1[0].mean(-1) < jit1[0].mean()) 
    rows = np.where(dark.any(axis=1))[0]
    assert abs(int(rows[0]) - 8) <= 6
