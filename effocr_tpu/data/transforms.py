"""On-device render augmentation: the TPU equivalent of
create_render_transform (utils/datasets_utils.py:147-163).

The reference augments per-sample on 32 CPU dataloader workers; here the
whole batch is augmented inside the jitted train step on the VPU, keyed by
the step PRNG.  Components and probabilities match the reference:

  random affine (p=.7; en: translate .1 / scale .9-1.1, jp: .2 / .8-1.0,
      white fill)                                    -> separable matmul warp
  color_shift (p=.25): pixels >= 0.8 per channel -> random color
  color jitter (p=.5): brightness .5, contrast .3, saturation .3, hue .3
  random erode/dilate (p=.5, en only), kernels {3,4}x{2,3}  -> reduce_window
  gaussian noise (p=.25, var 10-150 on the uint8 scale)
  gaussian blur (p=.3; sigma U(0.1,2) k=11, high_blur: U(1,4) k=15)
      -> separable shifted-add conv with per-sample taps
  random grayscale (p=.2)
  (MedianPad is a no-op here: inputs are already white-padded squares)
  ImageNet normalize

Paired (real) crops bypass augmentation (recognizer_datasets.py:54-57):
pass is_paired to select the plain normalize path per sample.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from effocr_tpu.kernels.image_ops import normalize_imagenet
from effocr_tpu.kernels.morphology import dilate, erode


def _affine_matrix(size: int, scale: jnp.ndarray, tx: jnp.ndarray,
                   ty: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sample separable warp matrices A_y [B,S,S], A_x [B,S,S].

    Inverse map about the center: src = (dst - c - t)/scale + c.
    Out-of-range weight mass is later refilled with white.
    """
    s = jnp.arange(size, dtype=jnp.float32)
    c = (size - 1) / 2.0

    def one_axis(sc, t):
        src = (s[None, :] - c - t[:, None]) / sc[:, None] + c  # [B,S]
        w = jnp.maximum(
            0.0, 1.0 - jnp.abs(src[:, :, None] - s[None, None, :])
        )  # [B, S_dst, S_src]
        return w

    return one_axis(scale, ty), one_axis(scale, tx)


def _apply_affine(img: jnp.ndarray, a_y: jnp.ndarray, a_x: jnp.ndarray,
                  fill: float = 1.0) -> jnp.ndarray:
    """img [B,S,S,3]; white-fill where warp samples outside."""
    t = jnp.einsum("bis,bswc->biwc", a_y, img)
    out = jnp.einsum("bjw,biwc->bijc", a_x, t)
    mass = jnp.einsum(
        "bi,bj->bij", jnp.sum(a_y, axis=2), jnp.sum(a_x, axis=2)
    )
    return out + (1.0 - mass)[..., None] * fill


def _rgb_to_gray(x: jnp.ndarray) -> jnp.ndarray:
    w = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    return jnp.sum(x * w, axis=-1, keepdims=True)


def _adjust_hue(x: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """Hue rotation in YIQ space (delta in turns, [-0.5, 0.5]); per-sample."""
    yiq_from_rgb = jnp.asarray(
        [[0.299, 0.587, 0.114],
         [0.5959, -0.2746, -0.3213],
         [0.2115, -0.5227, 0.3112]], x.dtype,
    )
    rgb_from_yiq = jnp.linalg.inv(yiq_from_rgb)
    theta = (2.0 * jnp.pi * delta)[:, None, None, None]
    yiq = jnp.einsum("bhwc,dc->bhwd", x, yiq_from_rgb)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    i = yiq[..., 1:2] * cos - yiq[..., 2:3] * sin
    q = yiq[..., 1:2] * sin + yiq[..., 2:3] * cos
    yiq = jnp.concatenate([yiq[..., :1], i, q], axis=-1)
    return jnp.einsum("bhwd,cd->bhwc", yiq, rgb_from_yiq)


def _separable_blur(x: jnp.ndarray, sigma: jnp.ndarray, ksize: int
                    ) -> jnp.ndarray:
    """Per-sample gaussian blur via shifted adds. x [B,S,S,3], sigma [B]."""
    r = ksize // 2
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    taps = jnp.exp(-0.5 * (offs[None, :] / sigma[:, None]) ** 2)
    taps = taps / jnp.sum(taps, axis=1, keepdims=True)  # [B,k]

    def pass_axis(y, axis):
        pad = [(0, 0)] * 4
        pad[axis] = (r, r)
        yp = jnp.pad(y, pad, mode="edge")
        out = jnp.zeros_like(y)
        for j in range(ksize):
            sl = [slice(None)] * 4
            sl[axis] = slice(j, j + y.shape[axis])
            out = out + yp[tuple(sl)] * taps[:, j][:, None, None, None]
        return out

    return pass_axis(pass_axis(x, 1), 2)


def _random_erode_dilate(x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """kornia-equivalent morphology with random {3,4}x{2,3} kernel, random
    erode-vs-dilate per sample (utils/datasets_utils.py:29-36)."""
    b = x.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    variant = jax.random.randint(k1, (b,), 0, 4)      # kernel choice
    do_dilate = jax.random.bernoulli(k2, 0.5, (b,))

    kernels = [(3, 2), (3, 3), (4, 2), (4, 3)]
    er = jnp.stack([erode(x, kh, kw) for kh, kw in kernels])   # [4,B,S,S,3]
    di = jnp.stack([dilate(x, kh, kw) for kh, kw in kernels])
    er_sel = jnp.take_along_axis(
        er, variant[None, :, None, None, None], axis=0
    )[0]
    di_sel = jnp.take_along_axis(
        di, variant[None, :, None, None, None], axis=0
    )[0]
    return jnp.where(do_dilate[:, None, None, None], di_sel, er_sel)


def _compose_adjacent(x: jnp.ndarray, bank: jnp.ndarray, key: jax.Array,
                      lang: str) -> jnp.ndarray:
    """AddAdjacentChars / AddAdjacentCharsEng on device
    (utils/datasets_utils.py:93-144): composite neighbor-glyph slivers at
    the crop edges so the encoder learns to ignore bleed-through from
    adjacent characters.

    bank: uint8 [V, N, S, S] from data/fonts.py render_adjacent_bank —
    each glyph pre-rendered flush against the edge it peeks in from.
    Per sample: n_sides ~ the reference's categorical (jp p=[.7,.2,.05,
    .05,0] over 0-4 of l/r/t/b; en p=[.5,.25,.25] over 0-2 of l/r),
    sides chosen without replacement, one uniform glyph per side,
    composited with min() (dark ink on white).
    """
    b, size = x.shape[0], x.shape[1]
    v, n = bank.shape[0], bank.shape[1]
    if lang == "jp":
        probs = jnp.asarray([0.7, 0.2, 0.05, 0.05, 0.0])
        offx = size // 10
        peek = [offx, offx, max(offx // 2, 1), max(offx // 2, 1)]
    else:
        probs = jnp.asarray([0.5, 0.25, 0.25])
        offx = size // 8
        peek = [offx, offx]
    k_n, k_perm, k_glyph = jax.random.split(key, 3)
    n_sides = jax.random.choice(k_n, probs.shape[0], (b,), p=probs)
    ranks = jnp.argsort(
        jnp.argsort(jax.random.uniform(k_perm, (b, v)), axis=1), axis=1
    )
    active = ranks < n_sides[:, None]                       # [B, V]
    gidx = jax.random.randint(k_glyph, (b, v), 0, n)
    for s_i in range(v):
        g = jnp.take(bank[s_i], gidx[:, s_i], axis=0)
        g = g.astype(jnp.float32) / 255.0                   # [B, S, S]
        p = peek[s_i]
        sliver = jnp.ones((b, size, size), jnp.float32)
        if s_i == 0:    # left edge <- rightmost p cols of flush-right glyph
            sliver = sliver.at[:, :, :p].set(g[:, :, size - p:])
        elif s_i == 1:  # right edge <- leftmost p cols of flush-left glyph
            sliver = sliver.at[:, :, size - p:].set(g[:, :, :p])
        elif s_i == 2:  # top edge <- bottom p rows of flush-bottom glyph
            sliver = sliver.at[:, :p, :].set(g[:, size - p:, :])
        else:           # bottom edge <- top p rows of flush-top glyph
            sliver = sliver.at[:, size - p:, :].set(g[:, :p, :])
        merged = jnp.minimum(x, sliver[..., None])
        x = jnp.where(active[:, s_i][:, None, None, None], merged, x)
    return x


def _per_sample_apply(p: float, key: jax.Array, x_new: jnp.ndarray,
                      x_old: jnp.ndarray) -> jnp.ndarray:
    b = x_old.shape[0]
    apply = jax.random.bernoulli(key, p, (b,))
    return jnp.where(apply[:, None, None, None], x_new, x_old)


@partial(jax.jit, static_argnames=("lang", "high_blur", "no_aug",
                                   "crop_sim", "paired_jitter",
                                   "out_channels"))
def augment_batch(
    images_u8: jnp.ndarray,
    is_paired: jnp.ndarray,
    key: jax.Array,
    lang: str = "en",
    high_blur: bool = False,
    no_aug: bool = False,
    crop_sim: float = 0.0,
    adjacent_bank: Optional[jnp.ndarray] = None,
    paired_jitter: float = 0.0,
    out_channels: int = 3,
) -> jnp.ndarray:
    """uint8 [B,S,S,3] white-padded squares -> normalized float32 crops.

    Renders get the full augmentation stack; paired crops (is_paired=True)
    only get normalize.  no_aug turns augmentation off for everyone
    (train_effocr_recognizer.py --no_aug).  adjacent_bank (uint8
    [V,N,S,S], render_adjacent_bank) enables the AddAdjacentChars
    neighbor-glyph composite — applied first, so the slivers ride through
    the affine/noise stack like real crop bleed-through would.

    out_channels=1 trains grayscale-native encoders: the augmentation
    stack still runs in RGB (color shift/jitter survive as luminance
    perturbations), and the result is channel-averaged to one plane just
    before normalize — matching the inference pipeline's gray canvas
    (pipelines/infer.py input_channels == 1).
    """
    x = images_u8.astype(jnp.float32) / 255.0
    if no_aug:
        return normalize_imagenet(_to_channels(x, out_channels))

    plain = x
    b, size = x.shape[0], x.shape[1]
    keys = jax.random.split(key, 19)

    if adjacent_bank is not None:
        x = _compose_adjacent(x, adjacent_bank, keys[17], lang)

    # crop-geometry simulation: renders are full-frame centered glyphs,
    # but real PAIRED crops hold the glyph at roughly 0.45-0.85x scale
    # anchored to the line edge (crops are clipped to the full line
    # height/width — format_effocr_recognizer_dataset.py:112-118 — then
    # MedianPad pads right/bottom, so the glyph sits top-anchored for
    # vertical jp lines and left-anchored for horizontal en lines).
    # With p=crop_sim, warp a render into that geometry so classes with
    # no paired data still embed near the crop distribution.
    if crop_sim > 0.0:
        cs = jax.random.uniform(keys[15], (b,), minval=0.45, maxval=0.85)
        off = (1.0 - cs) * (size / 2.0)
        zero = jnp.zeros((b,), jnp.float32)
        if lang == "jp":
            cs_tx, cs_ty = zero, -off      # x-centered, top-anchored
        else:
            cs_tx, cs_ty = -off, zero      # left-anchored, y-centered
        b_y, b_x = _affine_matrix(size, cs, cs_tx, cs_ty)
        x = _per_sample_apply(
            crop_sim, keys[16], _apply_affine(x, b_y, b_x), x
        )

    # random affine
    if lang == "en":
        tmax, smin, smax = 0.1, 0.9, 1.1
    else:
        tmax, smin, smax = 0.2, 0.8, 1.0
    scale = jax.random.uniform(keys[0], (b,), minval=smin, maxval=smax)
    tx = jax.random.uniform(keys[1], (b,), minval=-tmax, maxval=tmax) * size
    ty = jax.random.uniform(keys[2], (b,), minval=-tmax, maxval=tmax) * size
    a_y, a_x = _affine_matrix(size, scale, tx, ty)
    x = _per_sample_apply(0.7, keys[3], _apply_affine(x, a_y, a_x), x)

    # color shift: bright pixels -> random color (apply mask drawn from its
    # own key — sharing a key with the color would correlate them)
    color = jax.random.uniform(keys[4], (b, 1, 1, 3))
    shifted = jnp.where(x >= 0.8, jnp.broadcast_to(color, x.shape), x)
    x = _per_sample_apply(0.25, keys[12], shifted, x)

    # color jitter
    jk = jax.random.split(keys[5], 5)
    bf = jax.random.uniform(jk[0], (b, 1, 1, 1), minval=0.5, maxval=1.5)
    cf = jax.random.uniform(jk[1], (b, 1, 1, 1), minval=0.7, maxval=1.3)
    sf = jax.random.uniform(jk[2], (b, 1, 1, 1), minval=0.7, maxval=1.3)
    hd = jax.random.uniform(jk[3], (b,), minval=-0.3, maxval=0.3)
    j = jnp.clip(x * bf, 0.0, 1.0)
    gray_mean = jnp.mean(_rgb_to_gray(j), axis=(1, 2), keepdims=True)
    j = jnp.clip((j - gray_mean) * cf + gray_mean, 0.0, 1.0)
    j = jnp.clip(_rgb_to_gray(j) + (j - _rgb_to_gray(j)) * sf, 0.0, 1.0)
    j = jnp.clip(_adjust_hue(j, hd), 0.0, 1.0)
    x = _per_sample_apply(0.5, jk[4], j, x)

    # erode/dilate (en only)
    if lang == "en":
        x = _per_sample_apply(
            0.5, keys[6], _random_erode_dilate(x, keys[7]), x
        )

    # gaussian noise (uint8-scale variance 10..150)
    var = jax.random.uniform(keys[8], (b, 1, 1, 1), minval=10.0, maxval=150.0)
    noise = jax.random.normal(keys[13], x.shape) * jnp.sqrt(var) / 255.0
    x = _per_sample_apply(0.25, keys[9], jnp.clip(x + noise, 0.0, 1.0), x)

    # gaussian blur (sigma and apply mask on independent keys).  The
    # reference blurs at its 224-px transform resolution; sigma scales with
    # the actual image size so smaller training inputs (e.g. 96-px CJK
    # glyphs whose strokes are ~2 px) aren't relatively over-blurred.
    sscale = size / 224.0
    if high_blur:
        sig = jax.random.uniform(keys[10], (b,), minval=1.0, maxval=4.0)
        blurred = _separable_blur(x, sig * sscale, 15)
    else:
        sig = jax.random.uniform(keys[10], (b,), minval=0.1, maxval=2.0)
        blurred = _separable_blur(x, sig * sscale, 11)
    x = _per_sample_apply(0.3, keys[14], blurred, x)

    # random grayscale
    x = _per_sample_apply(
        0.2, keys[11], jnp.broadcast_to(_rgb_to_gray(x), x.shape), x
    )

    # paired crops bypass the render augmentation stack.  Optionally they
    # get a SMALL affine jitter instead (paired_jitter = per-sample
    # probability): detected boxes at inference jitter by ~a pixel around
    # the GT geometry the crops were cut with, and the box_pad sweep
    # (BENCH_ACCURACY.md) shows the encoder is sensitive to exactly that
    # mismatch — training with simulated jitter buys invariance the clean
    # paired transform cannot.
    paired_x = plain
    if paired_jitter > 0.0:
        pk = jax.random.split(keys[18], 4)
        js = jax.random.uniform(pk[0], (b,), minval=0.94, maxval=1.06)
        jtx = jax.random.uniform(pk[1], (b,), minval=-0.05,
                                 maxval=0.05) * size
        jty = jax.random.uniform(pk[2], (b,), minval=-0.05,
                                 maxval=0.05) * size
        p_y, p_x = _affine_matrix(size, js, jtx, jty)
        paired_x = _per_sample_apply(
            paired_jitter, pk[3], _apply_affine(plain, p_y, p_x), plain
        )
    x = jnp.where(is_paired[:, None, None, None], paired_x, x)
    return normalize_imagenet(_to_channels(x, out_channels))


def _to_channels(x: jnp.ndarray, out_channels: int) -> jnp.ndarray:
    """Reduce RGB float crops to the requested channel count (mean over
    channels, the same reduction the inference host prep uses)."""
    if out_channels == 1 and x.shape[-1] != 1:
        return jnp.mean(x, axis=-1, keepdims=True)
    return x
