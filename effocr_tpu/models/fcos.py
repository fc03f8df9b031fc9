"""Anchor-free (FCOS-style) detector — the alternate localizer family.

The reference offers alternate localizer backends (Detectron2/MMDetection
R-CNNs, infer_effocr.py:121-173) behind the same pipeline; here the
alternate family is anchor-free per-pixel regression on the same CSP+PAN
trunk as the YOLO family (models/yolo.py): each cell of each FPN level
predicts (l, t, r, b) distances, a centerness logit, and class logits.

The decode emits the SAME [B, A, 5+nc] layout as YOLO (xywh, obj=centerness,
cls), so decode_and_nms and the fused pipeline work unchanged — swapping
detector families is a registry entry, not a pipeline rewrite.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from effocr_tpu.models.layers import ConvBnAct
from effocr_tpu.models.yolo import C3, SPPF, _upsample2

Dtype = Any

STRIDES = (8, 16, 32)
# per-level max(ltrb) regression ranges (FCOS defaults, scaled down for
# character-size objects)
SIZE_RANGES = ((0.0, 64.0), (64.0, 128.0), (128.0, 1e8))


class FCOS(nn.Module):
    """Returns (decoded [B, A, 5+nc], raw per-scale [B,H,W,5+nc])."""

    num_classes: int = 2
    depth_multiple: float = 0.33
    width_multiple: float = 0.50
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    def _w(self, f: int) -> int:
        return int(np.ceil(f * self.width_multiple / 8) * 8)

    def _d(self, n: int) -> int:
        return max(round(n * self.depth_multiple), 1)

    @nn.compact
    def __call__(self, x, train: bool = False, decode: bool = True):
        x = x.astype(self.dtype)
        w, d = self._w, self._d
        cba = lambda f, k, s, nm, p=None: ConvBnAct(
            w(f), k, s, padding=p, dtype=self.dtype,
            param_dtype=self.param_dtype, name=nm,
        )
        c3 = lambda f, n, sc, nm: C3(
            w(f), d(n), sc, dtype=self.dtype, param_dtype=self.param_dtype,
            name=nm,
        )

        # same backbone/neck topology as models/yolo.py
        x = cba(64, 6, 2, "stem", p=2)(x, train)
        x = cba(128, 3, 2, "down1")(x, train)
        x = c3(128, 3, True, "c3_1")(x, train)
        x = cba(256, 3, 2, "down2")(x, train)
        p3 = c3(256, 6, True, "c3_2")(x, train)
        x = cba(512, 3, 2, "down3")(p3, train)
        p4 = c3(512, 9, True, "c3_3")(x, train)
        x = cba(1024, 3, 2, "down4")(p4, train)
        x = c3(1024, 3, True, "c3_4")(x, train)
        p5 = SPPF(w(1024), dtype=self.dtype, param_dtype=self.param_dtype,
                  name="sppf")(x, train)

        t5 = cba(512, 1, 1, "lat5")(p5, train)
        x = jnp.concatenate([_upsample2(t5), p4], axis=-1)
        n4 = c3(512, 3, False, "neck4")(x, train)
        t4 = cba(256, 1, 1, "lat4")(n4, train)
        x = jnp.concatenate([_upsample2(t4), p3], axis=-1)
        o3 = c3(256, 3, False, "neck3")(x, train)
        x = cba(256, 3, 2, "pan3")(o3, train)
        x = jnp.concatenate([x, t4], axis=-1)
        o4 = c3(512, 3, False, "neck4b")(x, train)
        x = cba(512, 3, 2, "pan4")(o4, train)
        x = jnp.concatenate([x, t5], axis=-1)
        o5 = c3(1024, 3, False, "neck5")(x, train)

        # anchor-free heads: 4 (ltrb) + 1 (centerness) + nc
        no = 5 + self.num_classes
        raw = []
        for i, feat in enumerate((o3, o4, o5)):
            h = cba(256, 3, 1, f"head{i}_a")(feat, train)
            y = nn.Conv(no, (1, 1), dtype=jnp.float32,
                        param_dtype=self.param_dtype,
                        name=f"head{i}_out")(h)
            raw.append(y)

        if not decode:
            return raw
        return decode_fcos(raw), raw


def decode_fcos(raw: Sequence[jnp.ndarray],
                strides: Tuple[int, ...] = STRIDES) -> jnp.ndarray:
    """Per-scale [B,H,W,5+nc] -> [B, A, 5+nc] in the YOLO decoded layout
    (cx, cy, w, h, obj=centerness, cls-probs)."""
    outs = []
    for y, stride in zip(raw, strides):
        b, gh, gw, no = y.shape
        y = y.astype(jnp.float32)
        cx = (jnp.arange(gw, dtype=jnp.float32)[None, :] + 0.5) * stride
        cy = (jnp.arange(gh, dtype=jnp.float32)[:, None] + 0.5) * stride
        ltrb = jax.nn.softplus(y[..., :4]) * stride
        x0 = cx[None, :, :] - ltrb[..., 0]
        y0 = cy[None, :, :] - ltrb[..., 1]
        x1 = cx[None, :, :] + ltrb[..., 2]
        y1 = cy[None, :, :] + ltrb[..., 3]
        boxes = jnp.stack(
            [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
        )
        obj = jax.nn.sigmoid(y[..., 4:5])
        cls = jax.nn.sigmoid(y[..., 5:])
        out = jnp.concatenate([boxes, obj, cls], axis=-1)
        outs.append(out.reshape(b, gh * gw, no))
    return jnp.concatenate(outs, axis=1)


def fcos_loss(
    raw: Sequence[jnp.ndarray],
    targets: jnp.ndarray,
    target_mask: jnp.ndarray,
    num_classes: int = 2,
    strides: Tuple[int, ...] = STRIDES,
    size_ranges: Tuple[Tuple[float, float], ...] = SIZE_RANGES,
    center_radius: float = 1.5,
    cls_gain: float = 1.0,
    box_gain: float = 1.0,
    ctr_gain: float = 1.0,
):
    """FCOS objective: BCE cls + GIoU box + BCE centerness, with
    center-sampled, size-range-bucketed assignment.

    targets [B, T, 5] = (cls, cx, cy, w, h) pixels; target_mask [B, T].
    """

    def bce(logits, t):
        return jax.nn.softplus(logits) - logits * t

    total_cls, total_box, total_ctr = 0.0, 0.0, 0.0
    total_pos = 0.0
    b, tmax = targets.shape[:2]
    gt_x0 = targets[..., 1] - targets[..., 3] / 2
    gt_y0 = targets[..., 2] - targets[..., 4] / 2
    gt_x1 = targets[..., 1] + targets[..., 3] / 2
    gt_y1 = targets[..., 2] + targets[..., 4] / 2
    gt_area = jnp.where(target_mask, targets[..., 3] * targets[..., 4],
                        jnp.inf)

    for y, stride, (lo, hi) in zip(raw, strides, size_ranges):
        _, gh, gw, no = y.shape
        y = y.astype(jnp.float32)
        cx = ((jnp.arange(gw, dtype=jnp.float32) + 0.5) * stride)
        cy = ((jnp.arange(gh, dtype=jnp.float32) + 0.5) * stride)
        ccx = jnp.broadcast_to(cx[None, :], (gh, gw)).reshape(-1)
        ccy = jnp.broadcast_to(cy[:, None], (gh, gw)).reshape(-1)
        # distances [B, HW, T]
        l = ccx[None, :, None] - gt_x0[:, None, :]
        t = ccy[None, :, None] - gt_y0[:, None, :]
        r = gt_x1[:, None, :] - ccx[None, :, None]
        bo = gt_y1[:, None, :] - ccy[None, :, None]
        min_ltrb = jnp.minimum(jnp.minimum(l, t), jnp.minimum(r, bo))
        max_ltrb = jnp.maximum(jnp.maximum(l, t), jnp.maximum(r, bo))
        inside = min_ltrb > 0
        in_range = (max_ltrb >= lo) & (max_ltrb <= hi)
        near_center = (
            (jnp.abs(ccx[None, :, None] - targets[..., 1][:, None, :])
             < center_radius * stride)
            & (jnp.abs(ccy[None, :, None] - targets[..., 2][:, None, :])
               < center_radius * stride)
        )
        cand = inside & in_range & near_center & target_mask[:, None, :]
        # pick min-area gt per cell
        area = jnp.where(cand, gt_area[:, None, :], jnp.inf)
        best = jnp.argmin(area, axis=2)                       # [B, HW]
        pos = jnp.take_along_axis(cand, best[..., None], axis=2)[..., 0]

        def take(arr):
            return jnp.take_along_axis(arr, best[..., None], axis=2)[..., 0]

        tl, tt, tr, tb = take(l), take(t), take(r), take(bo)
        tcls = jnp.take_along_axis(
            targets[..., 0][:, None, :].repeat(gh * gw, 1).astype(jnp.int32),
            best[..., None], axis=2,
        )[..., 0]

        yf = y.reshape(b, gh * gw, no)
        # classification: one-hot at positives, zeros elsewhere
        onehot = jax.nn.one_hot(tcls, num_classes) * pos[..., None]
        cls_l = bce(yf[..., 5:], onehot).sum(-1)
        total_cls += jnp.sum(cls_l) / (gh * gw)

        # box GIoU at positives
        pl = jax.nn.softplus(yf[..., 0]) * stride
        pt = jax.nn.softplus(yf[..., 1]) * stride
        pr = jax.nn.softplus(yf[..., 2]) * stride
        pb = jax.nn.softplus(yf[..., 3]) * stride
        inter = (jnp.minimum(pl, tl) + jnp.minimum(pr, tr)) * (
            jnp.minimum(pt, tt) + jnp.minimum(pb, tb)
        )
        union = (pl + pr) * (pt + pb) + (tl + tr) * (tt + tb) - inter
        enclose = (jnp.maximum(pl, tl) + jnp.maximum(pr, tr)) * (
            jnp.maximum(pt, tt) + jnp.maximum(pb, tb)
        )
        iou = inter / jnp.maximum(union, 1e-9)
        giou = iou - (enclose - union) / jnp.maximum(enclose, 1e-9)
        total_box += jnp.sum(jnp.where(pos, 1.0 - giou, 0.0))

        # centerness
        ctr_t = jnp.sqrt(
            jnp.clip(jnp.minimum(tl, tr) / jnp.maximum(
                jnp.maximum(tl, tr), 1e-9), 0, 1)
            * jnp.clip(jnp.minimum(tt, tb) / jnp.maximum(
                jnp.maximum(tt, tb), 1e-9), 0, 1)
        )
        ctr_l = bce(yf[..., 4], jnp.where(pos, ctr_t, 0.0))
        total_ctr += jnp.sum(jnp.where(pos, ctr_l, ctr_l * 0.1)) / (gh * gw)
        total_pos += jnp.sum(pos)

    npos = jnp.maximum(total_pos, 1.0)
    loss = (cls_gain * total_cls + ctr_gain * total_ctr) + \
        box_gain * total_box / npos
    metrics = {
        "loss/box": box_gain * total_box / npos,
        "loss/obj": ctr_gain * total_ctr,
        "loss/cls": cls_gain * total_cls,
    }
    return loss, metrics


def fcos_s(**kw):
    return FCOS(depth_multiple=0.33, width_multiple=0.50, **kw)


def fcos_n(**kw):
    return FCOS(depth_multiple=0.33, width_multiple=0.25, **kw)
