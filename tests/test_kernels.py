"""Kernel goldens: letterbox, median-pad transform, ROI crops, retrieval,
morphology, yolo decode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from effocr_tpu.kernels.image_ops import (
    letterbox_host,
    letterbox_params,
    median_pad_square,
    normalize_imagenet,
    paired_transform_host,
)
from effocr_tpu.kernels.morphology import dilate, erode
from effocr_tpu.kernels.retrieval import knn_topk, l2_normalize
from effocr_tpu.kernels.roi import crop_lines_to_squares, full_height_rects
from effocr_tpu.kernels.yolo_decode import decode_and_nms, xywh2xyxy
from effocr_tpu.core.config import IMAGENET_MEAN, IMAGENET_STD


# ------------------------------------------------------------------ letterbox

def test_letterbox_params_wide_line():
    # 1000x50 line -> ratio 0.64, width 640, height 32, vertical pad 304s
    r, (nw, nh), (top, bottom, left, right) = letterbox_params(50, 1000)
    assert r == pytest.approx(0.64)
    assert (nw, nh) == (640, 32)
    assert top + bottom + nh == 640
    assert left + right + nw == 640


def test_letterbox_host_shapes_and_fill(rng):
    im = (rng.uniform(0, 255, (50, 1000, 3))).astype(np.uint8)
    out, r, (dw, dh) = letterbox_host(im)
    assert out.shape == (640, 640, 3)
    assert r == pytest.approx(0.64)
    # padding rows are the fill color
    assert (out[0] == 114).all() and (out[-1] == 114).all()


# ------------------------------------------------------- median pad transform

def test_median_pad_square_white():
    img = np.zeros((10, 30, 3), dtype=np.uint8)
    sq = median_pad_square(img)
    assert sq.shape == (30, 30, 3)
    assert (sq[:10, :30] == 0).all()
    assert (sq[10:, :] == 255).all()


def test_median_pad_square_median_border():
    img = np.full((20, 10, 3), 7, dtype=np.uint8)
    sq = median_pad_square(img, override=None)
    assert sq.shape == (20, 20, 3)
    assert (sq == 7).all()


def test_paired_transform_host_range():
    img = np.full((32, 16, 3), 255, dtype=np.uint8)
    out = paired_transform_host(img, size=224)
    assert out.shape == (224, 224, 3)
    # all-white input -> normalized white everywhere
    expected = (1.0 - np.array(IMAGENET_MEAN)) / np.array(IMAGENET_STD)
    np.testing.assert_allclose(out[0, 0], expected, atol=1e-5)
    np.testing.assert_allclose(out[-1, -1], expected, atol=1e-5)


# ------------------------------------------------------------------ ROI crops

def test_roi_crop_matches_host_transform(rng):
    """Device ROI kernel == host median-pad+resize+normalize on same content."""
    h, w = 64, 256
    img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    images = img[None]  # [1, H, W, 3]
    # a char box: x in [40, 72), full height
    rect = np.array([[40, 0, 72, 64]], dtype=np.int32)
    crops = crop_lines_to_squares(
        jnp.asarray(images), jnp.asarray(rect), jnp.zeros((1,), jnp.int32),
        jnp.ones((1,), bool), out_size=224, window=128,
    )
    crop_u8 = (img[0:64, 40:72] * 255).round().astype(np.uint8)
    expected = paired_transform_host(crop_u8, size=224)
    got = np.asarray(crops[0])
    # uint8 quantization in the host path dominates the tolerance
    np.testing.assert_allclose(got, expected, atol=2.5 / 255 / min(IMAGENET_STD))


def test_roi_crop_invalid_slots_white():
    images = jnp.zeros((1, 32, 32, 3))
    rect = jnp.asarray([[0, 0, 16, 32]], dtype=jnp.int32)
    crops = crop_lines_to_squares(
        images, rect, jnp.zeros((1,), jnp.int32), jnp.zeros((1,), bool),
        out_size=32, window=64,
    )
    expected = (1.0 - np.array(IMAGENET_MEAN)) / np.array(IMAGENET_STD)
    np.testing.assert_allclose(np.asarray(crops[0][0, 0]), expected, atol=1e-5)


def test_full_height_rects_horizontal():
    boxes = jnp.asarray([[[100.2, 300.0, 120.7, 330.0]]])  # [1,1,4]
    rects = full_height_rects(
        boxes,
        (jnp.asarray([32.0]), jnp.asarray([640.0])),
        (jnp.asarray([304.0]), jnp.asarray([0.0])),
        vertical=False,
    )
    x0, y0, x1, y1 = np.asarray(rects)[0, 0]
    assert (x0, x1) == (100, 121)
    assert (y0, y1) == (304, 336)  # full content height


# ------------------------------------------------------------------ retrieval

def test_knn_topk_exact(rng):
    protos = l2_normalize(jnp.asarray(rng.normal(size=(100, 32)).astype(np.float32)))
    q = protos[17] * 3.0 + 0.01 * rng.normal(size=(32,)).astype(np.float32)
    scores, idx = knn_topk(q[None], protos, k=3)
    assert int(idx[0, 0]) == 17

    # brute force check
    sims = np.asarray(protos) @ np.asarray(l2_normalize(q))
    np.testing.assert_array_equal(
        np.asarray(idx[0]), np.argsort(-sims)[:3]
    )


def test_knn_blacklist(rng):
    protos = l2_normalize(jnp.asarray(rng.normal(size=(50, 16)).astype(np.float32)))
    q = np.asarray(protos[5])[None]
    mask = np.ones((50,), dtype=bool)
    mask[5] = False  # blacklist the true match
    _, idx = knn_topk(jnp.asarray(q), protos, k=1, row_mask=jnp.asarray(mask))
    assert int(idx[0, 0]) != 5


# ----------------------------------------------------------------- morphology

def test_erode_dilate():
    x = np.ones((8, 8, 1), dtype=np.float32)
    x[4, 4] = 0.0  # single dark pixel
    er = np.asarray(erode(jnp.asarray(x), 3, 3))
    di = np.asarray(dilate(jnp.asarray(x), 3, 3))
    assert (er[3:6, 3:6] == 0).all()  # dark grows under min-filter
    assert (di == 1).all()            # dark vanishes under max-filter


# ---------------------------------------------------------------- yolo decode

def test_xywh2xyxy():
    x = jnp.asarray([[10.0, 20.0, 4.0, 8.0]])
    np.testing.assert_allclose(np.asarray(xywh2xyxy(x)), [[8, 16, 12, 24]])


def test_decode_and_nms_picks_confident_boxes():
    # two anchors: one confident char, one below threshold
    a = np.zeros((1, 8, 7), dtype=np.float32)  # nc=2
    a[0, 0] = [100, 320, 20, 40, 0.9, 0.99, 0.01]   # char
    a[0, 1] = [300, 320, 30, 40, 0.8, 0.01, 0.99]   # word
    a[0, 2] = [500, 320, 20, 40, 0.1, 0.99, 0.01]   # below conf
    boxes, scores, classes, valid = decode_and_nms(
        jnp.asarray(a), conf_thresh=0.35, iou_thresh=0.5, max_nms=8, max_det=4
    )
    v = np.asarray(valid)[0]
    assert v.sum() == 2
    c = np.asarray(classes)[0][v]
    assert set(c.tolist()) == {0, 1}
    b = np.asarray(boxes)[0][v]
    # first output (highest conf) is the char box
    np.testing.assert_allclose(b[0], [90, 300, 110, 340], atol=1e-4)


def test_decode_and_nms_suppresses_duplicates():
    a = np.zeros((1, 4, 6), dtype=np.float32)  # nc=1
    a[0, 0] = [100, 320, 20, 40, 0.9, 0.99]
    a[0, 1] = [101, 320, 20, 40, 0.85, 0.99]  # heavy overlap -> suppressed
    _, _, _, valid = decode_and_nms(
        jnp.asarray(a), conf_thresh=0.35, iou_thresh=0.45, max_nms=4, max_det=4
    )
    assert int(np.asarray(valid).sum()) == 1


def test_roi_single_axis_gather_matches_general(rng):
    """The single-axis row-gather fast paths (canvas fits the window along
    one axis — every rectangular-canvas config) must match the general 2-D
    dynamic-window path pixel for pixel.  Crop sides are kept within both
    windows so the clamp semantics agree."""
    b, h, w = 3, 32, 128
    images = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32))
    n = 17
    x0 = rng.integers(0, w - 24, n).astype(np.int32)
    y0 = rng.integers(0, h - 18, n).astype(np.int32)
    rects = np.stack(
        [x0, y0, x0 + rng.integers(4, 18, n),
         y0 + rng.integers(4, 18, n)], 1).astype(np.int32)
    idx = rng.integers(0, b, n).astype(np.int32)
    valid = rng.random(n) > 0.2

    # window 20 < min(h, w) -> general path; window 32 >= h -> x-gather
    general = crop_lines_to_squares(
        images, jnp.asarray(rects), jnp.asarray(idx), jnp.asarray(valid),
        out_size=48, window=20,
    )
    fast = crop_lines_to_squares(
        images, jnp.asarray(rects), jnp.asarray(idx), jnp.asarray(valid),
        out_size=48, window=32,
    )
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(general), atol=1e-5
    )

    # vertical: tall-narrow canvas -> y-gather vs general
    bt, ht, wt = 2, 128, 24
    imgs_v = jnp.asarray(rng.uniform(0, 1, (bt, ht, wt, 3)).astype(np.float32))
    yv = rng.integers(0, ht - 30, n).astype(np.int32)
    xv = rng.integers(0, wt - 16, n).astype(np.int32)
    rects_v = np.stack(
        [xv, yv, xv + rng.integers(4, 16, n),
         yv + rng.integers(4, 16, n)], 1).astype(np.int32)
    idx_v = rng.integers(0, bt, n).astype(np.int32)
    general_v = crop_lines_to_squares(
        imgs_v, jnp.asarray(rects_v), jnp.asarray(idx_v),
        jnp.ones((n,), bool), out_size=48, window=16,
    )
    fast_v = crop_lines_to_squares(
        imgs_v, jnp.asarray(rects_v), jnp.asarray(idx_v),
        jnp.ones((n,), bool), out_size=48, window=24,
    )
    np.testing.assert_allclose(
        np.asarray(fast_v), np.asarray(general_v), atol=1e-5
    )


def test_dither_offsets_properties(rng):
    """Bayer dither offsets: exact 4x4 tiling, zero mean, one
    reconstruction-step span; dithered nearest-level quantization
    preserves average intensity on flats in the device's v*85
    reconstruction space."""
    from effocr_tpu.kernels.image_ops import dither_offsets, quantize_2bit

    d = dither_offsets(64, 640)
    assert d.shape == (64, 640) and d.dtype == np.int16
    # exact tiling of the 4x4 cell
    np.testing.assert_array_equal(d[:4, :4], d[4:8, 8:12])
    # offsets span one reconstruction step (85), zero-mean
    assert d.min() == -40 and d.max() == 40
    assert abs(float(d[:4, :4].mean())) < 0.2
    # non-multiple-of-4 shapes crop the tile
    d2 = dither_offsets(6, 10)
    np.testing.assert_array_equal(d2, d[:6, :10])

    # flat fields: reconstruction (level * 85) preserves the mean to a
    # fraction of a step; undithered nearest-level quantization snaps the
    # whole field to one level (error up to 42)
    for gray in (114, 60, 150, 200):
        img = np.full((64, 640), gray, np.uint8)
        rec_dith = quantize_2bit(img, d).astype(np.float64) * 85
        rec_flat = quantize_2bit(img, np.zeros_like(d)).astype(
            np.float64
        ) * 85
        assert abs(rec_dith.mean() - gray) <= abs(rec_flat.mean() - gray), gray
        assert abs(rec_dith.mean() - gray) < 12, (gray, rec_dith.mean())
    # saturated black/white stay exact
    for gray in (0, 255):
        img = np.full((16, 16), gray, np.uint8)
        rec = quantize_2bit(img, dither_offsets(16, 16)).astype(
            np.float64
        ) * 85
        assert rec.min() == rec.max() == gray
