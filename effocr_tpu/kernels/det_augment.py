"""On-device detection training augmentation.

Capability parity with the reference's detection-train augmentations
(train_effocr_localizer_d2.py:149-166 --alt_augs RandomFlip +
multi-scale ResizeShortestEdge; D2's default COCO mapper likewise flips
and rescales).  TPU-native design: the reference resizes variable-shape
images on the host per sample; here the canvas is fixed-shape, so scale
jitter is a per-sample affine re-letterbox of the canvas onto itself —
two batched interpolation matmuls on the MXU (kernels/image_ops.py
letterbox_device, which crops for free when the jittered rect overflows
the canvas) — and runs identically for streamed batches and HBM-resident
banks (where the host never touches pixels again after upload).

All randomness comes from one JAX key; boxes ride the same rounded
geometry as the pixels so targets never skew off the image.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from effocr_tpu.kernels.image_ops import letterbox_device


def augment_detection_batch(
    images: jnp.ndarray,
    targets: jnp.ndarray,
    mask: jnp.ndarray,
    key: jax.Array,
    *,
    flip_p: float = 0.5,
    scale: float = 0.25,
    translate: float = 0.1,
    brightness: float = 0.2,
    contrast: float = 0.2,
    noise_std: float = 0.02,
    pad_val: float = 114.0 / 255.0,
    min_box_px: float = 2.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """images [B,H,W,C] float32 in [0,1]; targets [B,T,5]
    (cls, cx, cy, w, h) in canvas pixels; mask [B,T] valid flags.

    Per sample: scale jitter in [1-scale, 1+scale] about the canvas
    center + translation of up to ±translate·(W,H) (content falling off
    the canvas is cropped; vacated area is letterbox gray), horizontal
    flip with probability flip_p, then brightness/contrast jitter and
    Gaussian noise.  Boxes follow the same transform; boxes clipped
    below min_box_px on either side are masked out.
    """
    b, h, w, _ = images.shape
    k_s, k_tx, k_ty, k_f, k_b, k_c, k_n = jax.random.split(key, 7)

    s = jax.random.uniform(k_s, (b,), minval=1.0 - scale,
                           maxval=1.0 + scale)
    # rounded placement (matches letterbox rounding so boxes and pixels
    # share the exact same geometry)
    nh = jnp.round(h * s)
    nw = jnp.round(w * s)
    ty = jnp.round((h - nh) / 2.0 + jax.random.uniform(
        k_ty, (b,), minval=-translate * h, maxval=translate * h))
    tx = jnp.round((w - nw) / 2.0 + jax.random.uniform(
        k_tx, (b,), minval=-translate * w, maxval=translate * w))

    src_rect = jnp.stack(
        [jnp.zeros((b,)), jnp.zeros((b,)),
         jnp.full((b,), float(h)), jnp.full((b,), float(w))], axis=1
    ).astype(jnp.int32)
    dst_params = jnp.stack([ty, tx, nh, nw], axis=1).astype(jnp.int32)
    out = letterbox_device(images, src_rect, dst_params, h, w,
                           pad_val=pad_val)

    # boxes: p' = p * (n/size) + offset (exactly the pixel mapping above)
    ry = (nh / h)[:, None]
    rx = (nw / w)[:, None]
    cx = targets[:, :, 1] * rx + tx[:, None]
    cy = targets[:, :, 2] * ry + ty[:, None]
    bw = targets[:, :, 3] * rx
    bh = targets[:, :, 4] * ry

    # horizontal flip
    flip = jax.random.bernoulli(k_f, flip_p, (b,))
    out = jnp.where(flip[:, None, None, None], jnp.flip(out, axis=2), out)
    cx = jnp.where(flip[:, None], w - cx, cx)

    # clip boxes to the canvas; drop the ones that got cropped away
    x0 = jnp.clip(cx - bw / 2, 0.0, float(w))
    x1 = jnp.clip(cx + bw / 2, 0.0, float(w))
    y0 = jnp.clip(cy - bh / 2, 0.0, float(h))
    y1 = jnp.clip(cy + bh / 2, 0.0, float(h))
    new_t = jnp.stack(
        [targets[:, :, 0], (x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0],
        axis=2,
    )
    new_mask = mask & (x1 - x0 >= min_box_px) & (y1 - y0 >= min_box_px)

    # photometric: per-sample brightness/contrast + pixel noise
    c_mul = 1.0 + jax.random.uniform(k_c, (b, 1, 1, 1), minval=-contrast,
                                     maxval=contrast)
    b_off = jax.random.uniform(k_b, (b, 1, 1, 1), minval=-brightness,
                               maxval=brightness)
    out = (out - 0.5) * c_mul + 0.5 + b_off
    if noise_std > 0:
        out = out + noise_std * jax.random.normal(k_n, out.shape)
    return jnp.clip(out, 0.0, 1.0), new_t, new_mask
