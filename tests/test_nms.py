"""NMS kernel goldens vs. a straightforward numpy greedy reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from effocr_tpu.kernels.nms import batched_nms, nms_mask, pairwise_iou


def greedy_nms_ref(boxes, scores, iou_thresh):
    """Plain greedy NMS (torchvision semantics): returns kept indices."""
    order = np.argsort(-scores, kind="stable")
    kept = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        kept.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            if iou_np(boxes[i], boxes[j]) > iou_thresh:
                # only lower-ranked boxes can be suppressed
                if scores[j] < scores[i] or (scores[j] == scores[i] and j > i):
                    suppressed[j] = True
    return sorted(kept)


def iou_np(a, b):
    lt = np.maximum(a[:2], b[:2])
    rb = np.minimum(a[2:], b[2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[0] * wh[1]
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / (area_a + area_b - inter + 1e-7)


def random_boxes(rng, n, size=640):
    xy = rng.uniform(0, size * 0.9, (n, 2))
    wh = rng.uniform(4, size * 0.3, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_pairwise_iou_matches_numpy(rng):
    boxes = random_boxes(rng, 32)
    got = np.asarray(pairwise_iou(jnp.asarray(boxes)))
    for i in range(32):
        for j in range(32):
            assert got[i, j] == pytest.approx(iou_np(boxes[i], boxes[j]), abs=1e-5)


@pytest.mark.parametrize("iou_thresh", [0.01, 0.45, 0.9])
@pytest.mark.parametrize("n", [1, 17, 100])
def test_nms_mask_matches_greedy(rng, n, iou_thresh):
    boxes = random_boxes(rng, n)
    scores = rng.uniform(0.1, 1.0, (n,)).astype(np.float32)
    valid = np.ones((n,), dtype=bool)
    keep = np.asarray(
        nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), iou_thresh)
    )
    expected = greedy_nms_ref(boxes, scores, iou_thresh)
    assert sorted(np.nonzero(keep)[0].tolist()) == expected


def test_nms_dense_overlaps_chain(rng):
    # a horizontal chain of heavily overlapping boxes: suppression chains
    n = 50
    boxes = np.stack(
        [
            np.arange(n) * 3.0,
            np.zeros(n),
            np.arange(n) * 3.0 + 20.0,
            np.full(n, 20.0),
        ],
        axis=1,
    ).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, (n,)).astype(np.float32)
    valid = np.ones((n,), dtype=bool)
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.3))
    expected = greedy_nms_ref(boxes, scores, 0.3)
    assert sorted(np.nonzero(keep)[0].tolist()) == expected


def test_nms_respects_valid_mask(rng):
    boxes = random_boxes(rng, 20)
    scores = rng.uniform(0.1, 1.0, (20,)).astype(np.float32)
    valid = np.zeros((20,), dtype=bool)
    valid[:10] = True
    keep = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5))
    assert not keep[10:].any()
    expected = greedy_nms_ref(boxes[:10], scores[:10], 0.5)
    assert sorted(np.nonzero(keep[:10])[0].tolist()) == expected


def test_batched_nms_per_class_offset(rng):
    # identical boxes, different classes -> both kept with per-class NMS
    boxes = np.tile(np.array([[10, 10, 50, 50]], dtype=np.float32), (2, 1))
    scores = np.array([0.9, 0.8], dtype=np.float32)
    classes = np.array([0, 1], dtype=np.int32)
    valid = np.ones((2,), dtype=bool)
    b, s, c, v = batched_nms(
        jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
        jnp.asarray(classes)[None], jnp.asarray(valid)[None],
        iou_thresh=0.5, max_det=8,
    )
    assert int(np.asarray(v).sum()) == 2
    # class-agnostic: one survives
    b, s, c, v = batched_nms(
        jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
        jnp.asarray(classes)[None], jnp.asarray(valid)[None],
        iou_thresh=0.5, max_det=8, class_agnostic=True,
    )
    assert int(np.asarray(v).sum()) == 1


def test_batched_nms_output_sorted_and_padded(rng):
    n = 64
    boxes = random_boxes(rng, n)
    scores = rng.uniform(0.1, 1.0, (n,)).astype(np.float32)
    classes = np.zeros((n,), dtype=np.int32)
    valid = np.ones((n,), dtype=bool)
    b, s, c, v = batched_nms(
        jnp.asarray(boxes)[None], jnp.asarray(scores)[None],
        jnp.asarray(classes)[None], jnp.asarray(valid)[None],
        iou_thresh=0.45, max_det=128,
    )
    s, v = np.asarray(s)[0], np.asarray(v)[0]
    nk = int(v.sum())
    assert v[:nk].all() and not v[nk:].any()
    assert (np.diff(s[:nk]) <= 1e-6).all()


@pytest.mark.parametrize("iou_thresh", [0.01, 0.45])
def test_batched_nms_presorted_matches_default(rng, iou_thresh):
    """presorted mode (iota ranks + cumsum/scatter compaction) is exact:
    identical valid-slot outputs to the sort-based default on inputs in
    top_k order (descending score, index-ascending ties, valid prefix)."""
    bsz, n = 3, 96
    boxes_l, scores_l, classes_l, valid_l = [], [], [], []
    for _ in range(bsz):
        nv = int(rng.integers(5, n))
        sc = np.sort(rng.uniform(0.1, 1.0, nv).astype(np.float32))[::-1]
        sc[1::7] = sc[0::7][: len(sc[1::7])]  # inject score ties
        sc = np.sort(sc)[::-1]
        scores_l.append(np.concatenate([sc, np.zeros(n - nv, np.float32)]))
        boxes_l.append(random_boxes(rng, n))
        classes_l.append((rng.uniform(size=n) < 0.2).astype(np.int32))
        v = np.zeros(n, bool)
        v[:nv] = True
        valid_l.append(v)
    args = (
        jnp.asarray(np.stack(boxes_l)), jnp.asarray(np.stack(scores_l)),
        jnp.asarray(np.stack(classes_l)), jnp.asarray(np.stack(valid_l)),
    )
    for max_det in (8, 64, 128):
        ref = batched_nms(*args, iou_thresh=iou_thresh, max_det=max_det)
        got = batched_nms(*args, iou_thresh=iou_thresh, max_det=max_det,
                          presorted=True)
        vref, vgot = np.asarray(ref[3]), np.asarray(got[3])
        np.testing.assert_array_equal(vref, vgot)
        for r, g in zip(ref[:3], got[:3]):
            np.testing.assert_array_equal(
                np.asarray(r)[vref], np.asarray(g)[vref]
            )


def test_nms_mask_presorted_matches_default(rng):
    n = 40
    boxes = random_boxes(rng, n)
    scores = np.sort(rng.uniform(0.1, 1.0, n).astype(np.float32))[::-1].copy()
    valid = np.ones(n, bool)
    a = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                            jnp.asarray(valid), 0.3))
    b = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                            jnp.asarray(valid), 0.3, presorted=True))
    np.testing.assert_array_equal(a, b)


# ---- pallas whole-image-in-VMEM kernel (interpret mode on CPU) ----

def _presorted_batch(rng, bsz, n, tie_frac=0.15, invalid_frac=0.2):
    """Random top_k-shaped batch: descending scores, valid prefix."""
    boxes, scores, classes, valid = [], [], [], []
    for _ in range(bsz):
        nv = int(rng.integers(max(1, n // 4), n))
        sc = np.sort(rng.uniform(0.1, 1.0, nv).astype(np.float32))[::-1]
        k = int(nv * tie_frac)
        if k:
            sc[1:k + 1] = sc[:k]  # runs of exact ties
            sc = np.sort(sc)[::-1]
        scores.append(np.concatenate([sc, np.zeros(n - nv, np.float32)]))
        boxes.append(random_boxes(rng, n))
        classes.append((rng.uniform(size=n) < 0.2).astype(np.int32))
        v = np.zeros(n, bool)
        v[:nv] = True
        valid.append(v)
    return (np.stack(boxes), np.stack(scores), np.stack(classes),
            np.stack(valid))


@pytest.mark.parametrize("n", [128, 300, 512])
@pytest.mark.parametrize("iou_thresh", [0.01, 0.45])
def test_pallas_nms_mask_matches_xla(rng, n, iou_thresh):
    """The pallas keep mask is bit-identical to nms_mask(presorted=True),
    including non-multiple-of-128 N (padding) and invalid slots."""
    from effocr_tpu.kernels.pallas_nms import pallas_nms_mask

    b, s, c, v = _presorted_batch(rng, 3, n)
    got = np.asarray(pallas_nms_mask(
        jnp.asarray(b), jnp.asarray(v), iou_thresh, interpret=True
    ))
    for i in range(3):
        ref = np.asarray(nms_mask(
            jnp.asarray(b[i]), jnp.asarray(s[i]), jnp.asarray(v[i]),
            iou_thresh, presorted=True,
        ))
        np.testing.assert_array_equal(got[i], ref)


def test_pallas_nms_cross_tile_chains(rng):
    """Suppression chains that span the 128-box tile boundary: a dense
    horizontal chain (each box overlaps its neighbours) laid out so
    kept/suppressed decisions in tile 0 gate boxes in tiles 1-2."""
    from effocr_tpu.kernels.pallas_nms import pallas_nms_mask

    n = 384
    boxes = np.stack([
        np.arange(n) * 2.5,
        np.zeros(n),
        np.arange(n) * 2.5 + 20.0,
        np.full(n, 20.0),
    ], axis=1).astype(np.float32)
    scores = np.sort(rng.uniform(0.1, 1.0, n).astype(np.float32))[::-1]
    valid = np.ones(n, bool)
    got = np.asarray(pallas_nms_mask(
        jnp.asarray(boxes)[None], jnp.asarray(valid)[None], 0.3,
        interpret=True,
    ))[0]
    ref = np.asarray(nms_mask(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.3,
        presorted=True,
    ))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("iou_thresh", [0.01, 0.45])
def test_batched_nms_pallas_kernel_matches_xla(rng, iou_thresh):
    """batched_nms(kernel='pallas') end to end: identical valid-slot
    outputs to the XLA presorted path (per-class offsets included)."""
    b, s, c, v = _presorted_batch(rng, 3, 256)
    args = (jnp.asarray(b), jnp.asarray(s), jnp.asarray(c), jnp.asarray(v))
    for max_det in (16, 128):
        ref = batched_nms(*args, iou_thresh=iou_thresh, max_det=max_det,
                          presorted=True)
        got = batched_nms(*args, iou_thresh=iou_thresh, max_det=max_det,
                          presorted=True, kernel="pallas", interpret=True)
        vref, vgot = np.asarray(ref[3]), np.asarray(got[3])
        np.testing.assert_array_equal(vref, vgot)
        for r, g in zip(ref[:3], got[:3]):
            np.testing.assert_array_equal(
                np.asarray(r)[vref], np.asarray(g)[vref]
            )
