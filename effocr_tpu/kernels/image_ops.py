"""Image preprocessing ops: letterbox, normalize, median-pad square transform.

Reference semantics being matched:

- letterbox: resize keeping aspect, pad to (640,640) with gray 114
  (onnx_engines/localizer_engine.py:107-138, auto=False scaleup=True).
- paired/char transform: MedianPad(override=white) -> ToTensor ->
  Resize(224,224) bilinear -> ImageNet normalize
  (utils/datasets_utils.py:69-90,166-172).  MedianPad pads only right/bottom
  to a square; override white is what every call site uses (:159,168); the
  true median-of-border path is provided as an option.

Host variants (numpy/cv2) are bit-faithful to the reference for dataset
preparation; device variants (jnp) are the fused XLA path used in the
inference pipeline.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from effocr_tpu.core.config import IMAGENET_MEAN, IMAGENET_STD


# ---------------------------------------------------------------------------
# letterbox
# ---------------------------------------------------------------------------

def letterbox_params(
    h: int, w: int, new_shape: Tuple[int, int] = (640, 640), scaleup: bool = True
) -> Tuple[float, Tuple[int, int], Tuple[int, int, int, int]]:
    """Compute (ratio, (new_w, new_h), (top, bottom, left, right)) padding.

    Mirrors localizer_engine.py:107-138 with auto=False, scaleFill=False.
    """
    r = min(new_shape[0] / h, new_shape[1] / w)
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = int(round(w * r)), int(round(h * r))
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    dw /= 2
    dh /= 2
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    return r, new_unpad, (top, bottom, left, right)


def letterbox_host(
    im: np.ndarray,
    new_shape: Tuple[int, int] = (640, 640),
    color: int = 114,
    scaleup: bool = True,
) -> Tuple[np.ndarray, float, Tuple[float, float]]:
    """Host letterbox (cv2), reference-exact. im: HWC uint8 RGB."""
    import cv2

    h, w = im.shape[:2]
    channels = im.shape[2] if im.ndim == 3 else 1
    r, new_unpad, (top, bottom, left, right) = letterbox_params(
        h, w, new_shape, scaleup
    )
    if (w, h) != new_unpad:
        im = cv2.resize(im, new_unpad, interpolation=cv2.INTER_LINEAR)
    im = cv2.copyMakeBorder(
        im, top, bottom, left, right, cv2.BORDER_CONSTANT,
        value=(color,) * 3,
    )
    if im.ndim == 2 and channels == 1:
        # cv2 drops the channel dim of single-channel images
        im = im[:, :, None]
    dw = (new_shape[1] - new_unpad[0]) / 2
    dh = (new_shape[0] - new_unpad[1]) / 2
    return im, r, (dw, dh)


# ---------------------------------------------------------------------------
# device-side resize / normalize
# ---------------------------------------------------------------------------

def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize (align_corners=False), matching T.Resize on tensors.

    x: [..., H, W, C] float.
    """
    shape = x.shape[:-3] + (out_h, out_w, x.shape[-1])
    return jax.image.resize(x, shape, method="linear", antialias=False)


def normalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    """x in [0,1] NHWC -> ImageNet-normalized.  Single-channel input uses
    the channel-averaged constants (grayscale pipelines)."""
    if x.shape[-1] == 1:
        mean = jnp.asarray([sum(IMAGENET_MEAN) / 3], dtype=x.dtype)
        std = jnp.asarray([sum(IMAGENET_STD) / 3], dtype=x.dtype)
    else:
        mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype)
        std = jnp.asarray(IMAGENET_STD, dtype=x.dtype)
    return (x - mean) / std


def unnormalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=x.dtype)
    return x * std + mean


def letterbox_device(
    images: jnp.ndarray,
    src_rect: jnp.ndarray,
    dst_params: jnp.ndarray,
    out_h: int,
    out_w: int,
    pad_val: float = 114.0 / 255.0,
) -> jnp.ndarray:
    """Per-image letterbox on device via separable interpolation matmuls.

    Lets the host ship raw-size line images in a small padded bucket and
    resize on the MXU instead of uploading full letterboxed canvases (the
    host->device link is the pipeline bottleneck).

    images:     [B, Hb, Wb, C] float in [0,1] (bucketed raw images).
    src_rect:   [B, 4] int32 (y0, x0, h, w) content rect inside the bucket.
    dst_params: [B, 4] int32 (top, left, new_h, new_w) placement on the
                canvas (host-computed with the reference rounding,
                letterbox_params).
    Returns [B, out_h, out_w, C].
    """
    b, hb, wb, _ = images.shape
    images = images.astype(jnp.float32)

    def axis_matrix(dst_size, src_size_total, d0, dn, s0, sn):
        # [B, dst_size, src_size_total]: canvas position -> source weight
        d = jnp.arange(dst_size, dtype=jnp.float32)[None, :]
        rel = (d - d0[:, None] + 0.5) * (
            sn[:, None] / jnp.maximum(dn[:, None], 1)
        ) - 0.5
        rel = jnp.clip(rel, 0.0, jnp.maximum(sn[:, None] - 1.0, 0.0))
        src = rel + s0[:, None]
        in_dst = (d >= d0[:, None]) & (d < d0[:, None] + dn[:, None])
        s = jnp.arange(src_size_total, dtype=jnp.float32)[None, None, :]
        w = jnp.maximum(0.0, 1.0 - jnp.abs(src[:, :, None] - s))
        return jnp.where(in_dst[:, :, None], w, 0.0)

    y0 = src_rect[:, 0].astype(jnp.float32)
    x0 = src_rect[:, 1].astype(jnp.float32)
    sh = src_rect[:, 2].astype(jnp.float32)
    sw = src_rect[:, 3].astype(jnp.float32)
    top = dst_params[:, 0].astype(jnp.float32)
    left = dst_params[:, 1].astype(jnp.float32)
    nh = dst_params[:, 2].astype(jnp.float32)
    nw = dst_params[:, 3].astype(jnp.float32)

    a_y = axis_matrix(out_h, hb, top, nh, y0, sh)
    a_x = axis_matrix(out_w, wb, left, nw, x0, sw)
    t = jnp.einsum("bih,bhwc->biwc", a_y, images)
    out = jnp.einsum("bjw,biwc->bijc", a_x, t)
    mass = jnp.einsum("bi,bj->bij", a_y.sum(2), a_x.sum(2))
    return out + (1.0 - mass)[..., None] * pad_val


# 4x4 Bayer ordered-dither thresholds for 2-bit transfer quantization:
# position-dependent offsets spanning one RECONSTRUCTION step (the
# device unpacks level v to v*85, so the step is 85, not 256/4), so
# antialiased glyph edges keep their average intensity instead of
# snapping to the nearest of 4 levels (which shifts apparent edges and
# costs detector box accuracy).  Quantization must likewise pick the
# nearest reconstruction level — quantize_2bit below, thresholds
# ~42/128/213 — or flat mid-grays bias dark by up to a half-step.
# Same matrix + formula in the native packer (native/preproc.cpp);
# outputs are bit-identical.
_BAYER4 = np.array(
    [[0, 8, 2, 10], [12, 4, 14, 6], [3, 11, 1, 9], [15, 7, 13, 5]],
    np.int16,
)
_BAYER4_OFFSETS = (((_BAYER4 + 0.5) / 16.0 - 0.5) * 85.0).round().astype(
    np.int16
)


def dither_offsets(h: int, w: int) -> np.ndarray:
    """[h, w] int16 ordered-dither offsets (add, then quantize_2bit)."""
    reps = (-(-h // 4), -(-w // 4))
    return np.tile(_BAYER4_OFFSETS, reps)[:h, :w]


def quantize_2bit(img_u8: np.ndarray, d: np.ndarray) -> np.ndarray:
    """uint8 image + broadcastable dither offsets -> levels 0..3, each the
    nearest device reconstruction value v*85 ((q*3 + 128) >> 8 thresholds
    at ~42.7/128/213.3)."""
    q = np.clip(img_u8.astype(np.int16) + d, 0, 255).astype(np.int32)
    return ((q * 3 + 128) >> 8).astype(np.uint8)


# ---------------------------------------------------------------------------
# MedianPad square + resize + normalize (the "paired transform")
# ---------------------------------------------------------------------------

def _median_border_color(img: np.ndarray) -> Tuple[int, ...]:
    """Median of the 4 border rows/cols (utils/datasets_utils.py:83-88)."""
    h, w = img.shape[:2]
    rightb, leftb = img[:, w - 1, :], img[:, 0, :]
    topb, bottomb = img[0, :, :], img[h - 1, :, :]
    border = np.concatenate([rightb, leftb, topb, bottomb], axis=0)
    return tuple(int(v) for v in np.median(border, axis=0))


def median_pad_square(
    img: np.ndarray, override: Optional[Tuple[int, int, int]] = (255, 255, 255)
) -> np.ndarray:
    """Pad right/bottom to a square with override (or median-border) color.

    Host (numpy) reference-exact implementation of MedianPad
    (utils/datasets_utils.py:69-90): content stays at the top-left.
    """
    h, w = img.shape[:2]
    side = max(h, w)
    fill = override if override is not None else _median_border_color(img)
    out = np.empty((side, side, img.shape[2]), dtype=img.dtype)
    out[...] = np.asarray(fill, dtype=img.dtype)
    out[:h, :w] = img
    return out


def paired_transform_host(img: np.ndarray, size: int = 224) -> np.ndarray:
    """Host version of create_paired_transform (utils/datasets_utils.py:166-172).

    img: HWC uint8 RGB crop -> [size,size,3] float32 ImageNet-normalized.
    Uses the same op order as the reference: pad-to-square (white), scale to
    [0,1], bilinear resize without antialias, normalize.
    """
    sq = median_pad_square(img).astype(np.float32) / 255.0
    t = jax.image.resize(
        jnp.asarray(sq), (size, size, 3), method="linear", antialias=False
    )
    return np.asarray(normalize_imagenet(t), dtype=np.float32)
