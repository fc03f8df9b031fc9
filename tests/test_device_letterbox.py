"""Device letterbox kernel vs. the host reference."""

import numpy as np
import jax.numpy as jnp
import pytest

from effocr_tpu.kernels.image_ops import (
    letterbox_device,
    letterbox_host,
    letterbox_params,
)


def test_device_letterbox_matches_host(rng):
    h, w = 50, 500
    img = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    out_h, out_w = 128, 512
    ref, r, (dw, dh) = letterbox_host(img, (out_h, out_w))
    _, (nw, nh), (top, bottom, left, right) = letterbox_params(
        h, w, (out_h, out_w)
    )

    hb, wb = 64, 512
    bucket = np.full((1, hb, wb, 3), 0, np.uint8)
    bucket[0, :h, :w] = img
    src_rect = np.array([[0, 0, h, w]], np.int32)
    dst_params = np.array([[top, left, nh, nw]], np.int32)
    got = np.asarray(
        letterbox_device(
            jnp.asarray(bucket.astype(np.float32) / 255.0),
            jnp.asarray(src_rect), jnp.asarray(dst_params), out_h, out_w,
        )
    )[0]
    got_u8 = (got * 255).round().astype(int)
    diff = np.abs(got_u8 - ref.astype(int))
    # bilinear rounding differences vs cv2; geometry must match
    assert (diff <= 3).mean() > 0.98
    # pad rows are the fill color
    assert (got_u8[:top] == 114).all()
    assert (got_u8[top + nh :] == 114).all()


def test_device_letterbox_identity(rng):
    # content already at canvas scale: pure placement
    img = rng.integers(0, 255, (32, 100, 1)).astype(np.uint8)
    bucket = np.zeros((1, 64, 128, 1), np.uint8)
    bucket[0, :32, :100] = img
    got = np.asarray(
        letterbox_device(
            jnp.asarray(bucket.astype(np.float32) / 255.0),
            jnp.asarray([[0, 0, 32, 100]], np.int32),
            jnp.asarray([[10, 14, 32, 100]], np.int32),
            64, 128,
        )
    )[0]
    np.testing.assert_allclose(
        (got[10:42, 14:114, 0] * 255).round(), img[:, :, 0], atol=1
    )
