"""On-device character-crop extraction: box -> white-padded square -> 224².

Fuses the reference's host loop of
    crop from image (infer_effocr_onnx_multi.py:307-318)
    -> MedianPad(override=white) -> Resize(224) -> ImageNet normalize
       (utils/datasets_utils.py:166-172)
into one XLA program over all detections of a line batch.

TPU design: bilinear resize of a dynamic window is expressed as two small
matmuls with per-crop interpolation matrices (each row is a 2-tap hat
function), so the hot loop runs on the MXU instead of per-pixel gathers:

    crop[n] = A_y[n] @ window[n] @ A_x[n]^T          # [224,S] [S,S,3] [S,224]

``window[n]`` is a static-size SxS dynamic_slice around the (integer) crop
rect; pixels right/below the rect are whited, reproducing MedianPad's
top-left-anchored square pad.  Samples past the square's edge clamp to the
edge, matching bilinear resize with align_corners=False.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from effocr_tpu.kernels.image_ops import normalize_imagenet


def _interp_matrix(side: jnp.ndarray, out_size: int, window: int,
                   offset: jnp.ndarray | float = 0.0) -> jnp.ndarray:
    """[out_size, window] bilinear weights resampling [0, side) -> out_size.

    side: scalar (float) crop side length.  Rows are hat functions around
    src = offset + clip((i+0.5)*side/out - 0.5, 0, side-1); columns >= the
    content get no weight via the clip (white content handles the rest).
    offset shifts the sample positions — the single-axis gather paths fold
    the crop's start coordinate into the matrix instead of slicing.
    """
    i = jnp.arange(out_size, dtype=jnp.float32)
    src = (i + 0.5) * (side / out_size) - 0.5
    src = offset + jnp.clip(src, 0.0, jnp.maximum(side - 1.0, 0.0))
    s = jnp.arange(window, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - s[None, :]))


@partial(jax.jit, static_argnames=("out_size", "window", "white"))
def crop_lines_to_squares(
    images: jnp.ndarray,
    rects: jnp.ndarray,
    img_idx: jnp.ndarray,
    valid: jnp.ndarray,
    out_size: int = 224,
    window: int = 256,
    white: float = 1.0,
) -> jnp.ndarray:
    """Extract normalized square crops from a batch of line images.

    images:  [B, H, W, 3] float in [0,1] (letterboxed lines).
    rects:   [N, 4] int32 (x0, y0, x1, y1) pixel rects, already expanded to
             full line height/width by the caller (the reference's
             "double-clipped" crops, infer_effocr_onnx_multi.py:313-316).
    img_idx: [N] int32 source line index for each crop.
    valid:   [N] bool; invalid slots produce all-white crops.
    window:  static slice size; must be >= max crop side (crop sides are
             bounded by the letterbox line height / char width).

    Returns [N, out_size, out_size, 3] ImageNet-normalized crops.
    """
    b, h, w, _ = images.shape
    rects = rects.astype(jnp.int32)
    x0 = jnp.clip(rects[:, 0], 0, w - 1)
    y0 = jnp.clip(rects[:, 1], 0, h - 1)
    # clamp the crop extent to the static window: an oversized rect loses
    # its far edge rather than sampling zero-weight (black) rows beyond the
    # slice — callers should size `window` >= the max expected crop side
    x1 = jnp.clip(rects[:, 2], x0 + 1, jnp.minimum(w, x0 + window))
    y1 = jnp.clip(rects[:, 3], y0 + 1, jnp.minimum(h, y0 + window))
    cw = (x1 - x0).astype(jnp.float32)
    ch = (y1 - y0).astype(jnp.float32)
    side = jnp.maximum(cw, ch)

    n_channels = images.shape[-1]
    n = rects.shape[0]
    img_idx = img_idx.astype(jnp.int32)

    # ---- window extraction ------------------------------------------------
    # The general 2-D case vmaps a dynamic_slice per crop; XLA:TPU lowers
    # that patch gather to a sequential while loop (~44 us per crop — it
    # dominated the fused OCR program at 6k crops/chunk).  When the canvas
    # fits the window along one axis — every rectangular-canvas config:
    # horizontal lines are height-bound, vertical lines width-bound — only
    # the OTHER axis needs dynamic indexing, and a flat row-gather (the
    # fast embedding-lookup path) fetches all windows at once; the
    # static-axis start offset folds into that axis's interpolation matrix.
    if h <= window:
        # dynamic in x only: wins[n, i, j] = padded[b_n, i, x0_n + j]
        pad_x = jnp.pad(
            images, ((0, 0), (0, 0), (0, window), (0, 0)),
            constant_values=white,
        )  # [B, H, W+S, C]
        wp = w + window
        flat = pad_x.transpose(0, 2, 1, 3).reshape(b * wp, h * n_channels)
        row_idx = (img_idx * wp + x0)[:, None] + jnp.arange(window)[None, :]
        cols = jnp.take(flat, row_idx.reshape(-1), axis=0)
        wins = (
            cols.reshape(n, window, h, n_channels).transpose(0, 2, 1, 3)
        )  # [N, H, S, C]
        rows = jnp.arange(h, dtype=jnp.float32)
        iy = jnp.arange(window, dtype=jnp.float32)
        in_content = (
            (rows[None, :, None] >= y0[:, None, None].astype(jnp.float32))
            & (rows[None, :, None]
               < (y0[:, None, None].astype(jnp.float32) + ch[:, None, None]))
            & (iy[None, None, :] < cw[:, None, None])
        )  # [N, H, S]
        wins = jnp.where(in_content[..., None], wins, white)
        # absolute row positions never exceed y0 + side - 1 < h + window
        wins = jnp.pad(
            wins, ((0, 0), (0, window), (0, 0), (0, 0)),
            constant_values=white,
        )
        a_y = jax.vmap(
            lambda s, o: _interp_matrix(s, out_size, h + window, o)
        )(side, y0.astype(jnp.float32))
        a_x = jax.vmap(lambda s: _interp_matrix(s, out_size, window))(side)
    elif w <= window:
        # dynamic in y only (vertical canvases): wins[n,i,j] =
        # padded[b_n, y0_n + i, j]
        pad_y = jnp.pad(
            images, ((0, 0), (0, window), (0, 0), (0, 0)),
            constant_values=white,
        )  # [B, H+S, W, C]
        hp = h + window
        flat = pad_y.reshape(b * hp, w * n_channels)
        row_idx = (img_idx * hp + y0)[:, None] + jnp.arange(window)[None, :]
        rows_g = jnp.take(flat, row_idx.reshape(-1), axis=0)
        wins = rows_g.reshape(n, window, w, n_channels)  # [N, S, W, C]
        cols = jnp.arange(w, dtype=jnp.float32)
        iy = jnp.arange(window, dtype=jnp.float32)
        in_content = (
            (iy[None, :, None] < ch[:, None, None])
            & (cols[None, None, :] >= x0[:, None, None].astype(jnp.float32))
            & (cols[None, None, :]
               < (x0[:, None, None].astype(jnp.float32) + cw[:, None, None]))
        )  # [N, S, W]
        wins = jnp.where(in_content[..., None], wins, white)
        wins = jnp.pad(
            wins, ((0, 0), (0, 0), (0, window), (0, 0)),
            constant_values=white,
        )
        a_y = jax.vmap(lambda s: _interp_matrix(s, out_size, window))(side)
        a_x = jax.vmap(
            lambda s, o: _interp_matrix(s, out_size, w + window, o)
        )(side, x0.astype(jnp.float32))
    else:
        # general 2-D dynamic window (square canvases with window smaller
        # than both axes); pad right/bottom with white so any window
        # starting inside the image fits
        padded = jnp.pad(
            images,
            ((0, 0), (0, window), (0, window), (0, 0)),
            constant_values=white,
        )

        def _slice(bi, yi, xi):
            return jax.lax.dynamic_slice(
                padded, (bi, yi, xi, 0), (1, window, window, n_channels)
            )[0]

        wins = jax.vmap(_slice)(img_idx, y0, x0)  # [N,S,S,C]

        iy = jnp.arange(window, dtype=jnp.float32)
        in_content = (
            (iy[None, :, None] < ch[:, None, None])
            & (iy[None, None, :] < cw[:, None, None])
        )  # [N,S,S]
        wins = jnp.where(in_content[..., None], wins, white)
        a_y = jax.vmap(lambda s: _interp_matrix(s, out_size, window))(side)
        a_x = a_y  # square target: same mapping both axes

    wins = wins.astype(jnp.float32)
    t = jnp.einsum("nis,nswc->niwc", a_y, wins)          # rows
    crops = jnp.einsum("njw,niwc->nijc", a_x, t)          # cols
    crops = jnp.where(valid[:, None, None, None], crops, white)
    return normalize_imagenet(crops)


def full_height_rects(
    boxes: jnp.ndarray,
    content_hw: Tuple[jnp.ndarray, jnp.ndarray],
    content_offset: Tuple[jnp.ndarray, jnp.ndarray],
    vertical: bool,
) -> jnp.ndarray:
    """Expand char boxes to full line height (or width, if vertical).

    Mirrors the reference's crop clipping (infer_effocr_onnx_multi.py:313-316):
    horizontal text keeps the box's x-extent and takes the full line height;
    vertical text keeps the y-extent and takes the full line width.  Inputs
    are in letterbox space; content_offset/hw delimit the actual line pixels
    inside the 640x640 canvas.

    boxes [B,K,4] xyxy float; content_hw = (h, w) [B]; offset = (top, left) [B].
    Returns int32 rects [B,K,4].
    """
    top, left = content_offset
    ch, cw = content_hw
    top = top[:, None]
    left = left[:, None]
    ch = ch[:, None]
    cw = cw[:, None]
    x0, y0, x1, y1 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    rx0 = jnp.where(vertical, left, jnp.round(x0))
    rx1 = jnp.where(vertical, left + cw, jnp.round(x1))
    ry0 = jnp.where(vertical, jnp.round(y0), top)
    ry1 = jnp.where(vertical, jnp.round(y1), top + ch)
    return jnp.stack([rx0, ry0, rx1, ry1], axis=-1).astype(jnp.int32)
