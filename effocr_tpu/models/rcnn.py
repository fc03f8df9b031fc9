"""Two-stage (Faster R-CNN-style) detector — the D2/MMDet-parity localizer
family (reference: Detectron2 LazyConfig R-CNNs in train_effocr_localizer_d2.py
and infer_effocr.py:121-173, anchor overrides :200-202).

TPU-first design — every stage is fixed-shape and jit-compiled:

* same CSP backbone + PAN neck as models/yolo.py, with 1x1 laterals
  projecting all levels to a common FPN width;
* RPN: 3 anchors/cell (aspect 0.5/1/2) on strides 8/16/32, box-delta decode,
  per-level top-k, then the fixed-shape greedy NMS (kernels/nms.py) over a
  padded candidate set -> exactly P proposals per image with validity mask
  (replaces D2's dynamic proposal lists);
* ROIAlign: 7x7 bilinear sampling as gathers + masked level-select over the
  three FPN levels (replaces the CUDA ROIAlign op);
* box head: 2-layer MLP -> softmax classes (+background) and per-class box
  deltas.

decode=True emits the SAME [B, P, 5+nc] layout as the YOLO/FCOS decode
(xywh, obj, cls-probs), so decode_and_nms and the fused pipeline work
unchanged — the two-stage family is a registry entry, not a pipeline fork.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from effocr_tpu.kernels.nms import nms_mask
from effocr_tpu.models.layers import ConvBnAct
from effocr_tpu.models.yolo import C3, SPPF, _upsample2

Dtype = Any

STRIDES = (8, 16, 32)
ANCHOR_SIZES = (32.0, 64.0, 128.0)        # one size per level
ANCHOR_ASPECTS = (0.5, 1.0, 2.0)          # h/w
DELTA_CLIP = 4.0                          # log-space wh delta clip


def level_anchors(gh: int, gw: int, stride: int, size: float) -> jnp.ndarray:
    """[gh*gw*3, 4] xyxy anchors for one level."""
    cx = (jnp.arange(gw, dtype=jnp.float32) + 0.5) * stride
    cy = (jnp.arange(gh, dtype=jnp.float32) + 0.5) * stride
    ccx = jnp.broadcast_to(cx[None, :], (gh, gw))
    ccy = jnp.broadcast_to(cy[:, None], (gh, gw))
    boxes = []
    for ar in ANCHOR_ASPECTS:
        w = size / np.sqrt(ar)
        h = size * np.sqrt(ar)
        boxes.append(jnp.stack(
            [ccx - w / 2, ccy - h / 2, ccx + w / 2, ccy + h / 2], axis=-1
        ))
    # [gh*gw*3, 4], cell-major / anchor-minor — matches the rpn head's
    # [B, gh, gw, na*5] -> [B, gh*gw*na, 5] reshape
    return jnp.stack(boxes, axis=2).reshape(-1, 4)


def apply_deltas(anchors: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Standard R-CNN box-delta decode: anchors [N,4] xyxy, deltas [...,N,4]
    (dx, dy, dw, dh) -> xyxy."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    acx = anchors[..., 0] + aw / 2
    acy = anchors[..., 1] + ah / 2
    cx = deltas[..., 0] * aw + acx
    cy = deltas[..., 1] * ah + acy
    w = jnp.exp(jnp.clip(deltas[..., 2], -DELTA_CLIP, DELTA_CLIP)) * aw
    h = jnp.exp(jnp.clip(deltas[..., 3], -DELTA_CLIP, DELTA_CLIP)) * ah
    return jnp.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )


def boxes_to_deltas(anchors: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Inverse of apply_deltas (regression targets).  Both xyxy."""
    aw = jnp.maximum(anchors[..., 2] - anchors[..., 0], 1e-6)
    ah = jnp.maximum(anchors[..., 3] - anchors[..., 1], 1e-6)
    acx = anchors[..., 0] + aw / 2
    acy = anchors[..., 1] + ah / 2
    bw = jnp.maximum(boxes[..., 2] - boxes[..., 0], 1e-6)
    bh = jnp.maximum(boxes[..., 3] - boxes[..., 1], 1e-6)
    bcx = boxes[..., 0] + bw / 2
    bcy = boxes[..., 1] + bh / 2
    return jnp.stack(
        [(bcx - acx) / aw, (bcy - acy) / ah,
         jnp.log(bw / aw), jnp.log(bh / ah)], axis=-1
    )


def roi_align(feats: Sequence[jnp.ndarray], boxes: jnp.ndarray,
              out: int = 7, strides: Tuple[int, ...] = STRIDES
              ) -> jnp.ndarray:
    """Multi-level ROIAlign: feats per level [H,W,C] (single image),
    boxes [P,4] xyxy pixels -> [P, out, out, C].

    Each proposal samples a 2x-oversampled bilinear grid on EVERY level and
    a level mask (FPN assignment by box scale) selects one — fixed shapes,
    gathers + weighted sums only (no CUDA ROIAlign).
    """
    p = boxes.shape[0]
    s = out * 2  # 2x2 samples per bin, average-pooled
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bw = jnp.maximum(x1 - x0, 1.0)
    bh = jnp.maximum(y1 - y0, 1.0)
    # FPN level assignment: sqrt(area) < 64 -> P3, < 128 -> P4, else P5
    scale = jnp.sqrt(bw * bh)
    lvl = (scale >= 64.0).astype(jnp.int32) + (scale >= 128.0).astype(
        jnp.int32
    )

    # sample grid in pixel coords [P, s, s, 2]
    fx = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    gx = x0[:, None] + fx[None, :] * bw[:, None]           # [P, s]
    gy = y0[:, None] + fx[None, :] * bh[:, None]

    outs = []
    for li, (feat, stride) in enumerate(zip(feats, strides)):
        h, w, c = feat.shape
        xs = gx / stride - 0.5
        ys = gy / stride - 0.5
        x0i = jnp.clip(jnp.floor(xs), 0, w - 1)
        y0i = jnp.clip(jnp.floor(ys), 0, h - 1)
        x1i = jnp.clip(x0i + 1, 0, w - 1)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        wx = jnp.clip(xs - x0i, 0.0, 1.0)                   # [P, s]
        wy = jnp.clip(ys - y0i, 0.0, 1.0)

        flat = feat.reshape(h * w, c)

        def gather(yi, xi):
            idx = (yi[:, :, None] * w + xi[:, None, :]).astype(jnp.int32)
            return jnp.take(flat, idx.reshape(p, -1), axis=0).reshape(
                p, s, s, c
            )

        v00 = gather(y0i, x0i)
        v01 = gather(y0i, x1i)
        v10 = gather(y1i, x0i)
        v11 = gather(y1i, x1i)
        wxx = wx[:, None, :, None]
        wyy = wy[:, :, None, None]
        val = ((v00 * (1 - wxx) + v01 * wxx) * (1 - wyy)
               + (v10 * (1 - wxx) + v11 * wxx) * wyy)       # [P, s, s, C]
        # 2x2 average pool -> [P, out, out, C]
        val = val.reshape(p, out, 2, out, 2, c).mean(axis=(2, 4))
        outs.append(val * (lvl == li)[:, None, None, None])
    return outs[0] + outs[1] + outs[2]


class FasterRCNN(nn.Module):
    """Two-stage detector.  __call__ returns:

    decode=True  -> (decoded [B, P, 5+nc] in the YOLO layout, aux dict)
    decode=False -> aux dict (training: rpn raw, anchors, proposals, roi
                    head outputs) — consumed by rcnn_loss.
    """

    num_classes: int = 2
    depth_multiple: float = 0.33
    width_multiple: float = 0.50
    num_proposals: int = 256
    pre_nms_topk: int = 256           # per level
    rpn_nms_iou: float = 0.7
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    def _w(self, f: int) -> int:
        return int(np.ceil(f * self.width_multiple / 8) * 8)

    def _d(self, n: int) -> int:
        return max(round(n * self.depth_multiple), 1)

    @nn.compact
    def __call__(self, x, train: bool = False, decode: bool = True):
        img_h, img_w = x.shape[1], x.shape[2]
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

        # ---- same backbone/neck topology as models/yolo.py --------------
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

        # ---- FPN: common width for shared RPN head + ROIAlign -----------
        fdim = w(256)
        fpn = [
            nn.Conv(fdim, (1, 1), dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"fpn{i}")(o)
            for i, o in enumerate((o3, o4, o5))
        ]

        # ---- RPN: shared 3x3 conv -> (3 anchors) x (1 obj + 4 deltas) ---
        na = len(ANCHOR_ASPECTS)
        rpn_conv = ConvBnAct(fdim, 3, 1, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="rpn_conv")
        rpn_out = nn.Conv(na * 5, (1, 1), dtype=jnp.float32,
                          param_dtype=self.param_dtype, name="rpn_out")

        rpn_raw, anchors, cand_boxes, cand_scores = [], [], [], []
        for feat, stride, size in zip(fpn, STRIDES, ANCHOR_SIZES):
            b, gh, gw, _ = feat.shape
            r = rpn_out(rpn_conv(feat, train))              # [B,gh,gw,na*5]
            r = r.reshape(b, gh * gw * na, 5)
            anc = level_anchors(gh, gw, stride, size)       # [gh*gw*na, 4]
            rpn_raw.append(r)
            anchors.append(anc)
            # per-level top-k proposal candidates
            boxes = apply_deltas(anc[None], r[..., 1:])
            boxes = jnp.stack([
                jnp.clip(boxes[..., 0], 0, img_w),
                jnp.clip(boxes[..., 1], 0, img_h),
                jnp.clip(boxes[..., 2], 0, img_w),
                jnp.clip(boxes[..., 3], 0, img_h),
            ], axis=-1)
            k = min(self.pre_nms_topk, r.shape[1])
            sc, idx = jax.lax.top_k(r[..., 0], k)
            cand_boxes.append(
                jnp.take_along_axis(boxes, idx[..., None], axis=1)
            )
            cand_scores.append(sc)

        cand_b = jax.lax.stop_gradient(
            jnp.concatenate(cand_boxes, axis=1)
        )                                                    # [B, K, 4]
        cand_s = jax.lax.stop_gradient(
            jnp.concatenate(cand_scores, axis=1)
        )

        # class-agnostic greedy NMS -> exactly P proposals (+ valid mask)
        p_eff = min(self.num_proposals, cand_b.shape[1])

        def _select(bx, sc):
            degenerate = ((bx[:, 2] - bx[:, 0]) < 1.0) | (
                (bx[:, 3] - bx[:, 1]) < 1.0
            )
            keep = nms_mask(bx, sc, ~degenerate, self.rpn_nms_iou)
            key = jnp.where(keep, sc, -jnp.inf)
            top, idx = jax.lax.top_k(key, p_eff)
            if p_eff < self.num_proposals:
                pad = self.num_proposals - p_eff
                top = jnp.pad(top, (0, pad), constant_values=-jnp.inf)
                idx = jnp.pad(idx, (0, pad))
            return jnp.take(bx, idx, axis=0), top > -jnp.inf

        proposals, prop_valid = jax.vmap(_select)(cand_b, cand_s)

        # ---- ROIAlign + box head ----------------------------------------
        feats32 = [f.astype(jnp.float32) for f in fpn]
        rois = jax.vmap(
            lambda f3, f4, f5, bx: roi_align((f3, f4, f5), bx)
        )(*feats32, proposals)                                # [B,P,7,7,C]
        bsz, p = rois.shape[0], rois.shape[1]
        h = rois.reshape(bsz, p, -1).astype(self.dtype)
        h = nn.relu(nn.Dense(1024, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="fc1")(h))
        h = nn.relu(nn.Dense(1024, dtype=self.dtype,
                             param_dtype=self.param_dtype, name="fc2")(h))
        roi_cls = nn.Dense(self.num_classes + 1, dtype=jnp.float32,
                           param_dtype=self.param_dtype, name="cls")(h)
        roi_deltas = nn.Dense(self.num_classes * 4, dtype=jnp.float32,
                              param_dtype=self.param_dtype, name="reg")(h)

        aux: Dict[str, Any] = {
            "rpn_raw": rpn_raw, "anchors": anchors,
            "proposals": proposals, "prop_valid": prop_valid,
            "roi_cls": roi_cls, "roi_deltas": roi_deltas,
        }
        if not decode:
            return aux

        # ---- decode into the YOLO [B, P, 5+nc] layout --------------------
        probs = jax.nn.softmax(roi_cls, axis=-1)              # [B,P,nc+1]
        cls_probs = probs[..., 1:]
        best = jnp.argmax(cls_probs, axis=-1)                 # [B,P]
        deltas = jnp.take_along_axis(
            roi_deltas.reshape(bsz, p, self.num_classes, 4),
            best[..., None, None], axis=2,
        )[..., 0, :]
        refined = apply_deltas(proposals, deltas)             # xyxy
        refined = jnp.stack([
            jnp.clip(refined[..., 0], 0, img_w),
            jnp.clip(refined[..., 1], 0, img_h),
            jnp.clip(refined[..., 2], 0, img_w),
            jnp.clip(refined[..., 3], 0, img_h),
        ], axis=-1)
        xywh = jnp.stack([
            (refined[..., 0] + refined[..., 2]) / 2,
            (refined[..., 1] + refined[..., 3]) / 2,
            refined[..., 2] - refined[..., 0],
            refined[..., 3] - refined[..., 1],
        ], axis=-1)
        obj = (1.0 - probs[..., 0:1]) * prop_valid[..., None]
        # conf in decode_and_nms = obj * cls; normalize so that
        # obj * max(cls) == best-class softmax prob
        denom = jnp.maximum(1.0 - probs[..., 0:1], 1e-9)
        decoded = jnp.concatenate([xywh, obj, cls_probs / denom], axis=-1)
        return decoded, aux


# --------------------------------------------------------------------- loss

def _smooth_l1(x: jnp.ndarray, beta: float = 1.0 / 9.0) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def rcnn_loss(
    aux: Dict[str, Any],
    targets: jnp.ndarray,
    target_mask: jnp.ndarray,
    num_classes: int = 2,
    rpn_pos_iou: float = 0.7,
    rpn_neg_iou: float = 0.3,
    roi_pos_iou: float = 0.5,
    rpn_gain: float = 1.0,
    roi_gain: float = 1.0,
    box_gain: float = 2.0,
):
    """Faster R-CNN objective with fixed-shape assignment.

    targets [B, T, 5] = (cls, cx, cy, w, h) pixels; target_mask [B, T].
    RPN: BCE obj (pos IoU>0.7 or per-gt argmax; neg IoU<0.3) + smooth-L1
    deltas at positives.  ROI head: softmax CE with background at all valid
    proposals + smooth-L1 class-specific deltas at positives (IoU>0.5).
    """

    def bce(logits, t):
        return jax.nn.softplus(logits) - logits * t

    gt_xyxy = jnp.stack([
        targets[..., 1] - targets[..., 3] / 2,
        targets[..., 2] - targets[..., 4] / 2,
        targets[..., 1] + targets[..., 3] / 2,
        targets[..., 2] + targets[..., 4] / 2,
    ], axis=-1)                                               # [B,T,4]
    gt_cls = targets[..., 0].astype(jnp.int32)

    def pair_iou(boxes, gts, gmask):
        """boxes [N,4], gts [T,4] -> [N,T] IoU (masked gts get 0)."""
        lt = jnp.maximum(boxes[:, None, :2], gts[None, :, :2])
        rb = jnp.minimum(boxes[:, None, 2:], gts[None, :, 2:])
        wh = jnp.clip(rb - lt, 0.0)
        inter = wh[..., 0] * wh[..., 1]
        a1 = jnp.clip(boxes[:, 2] - boxes[:, 0], 0.0) * jnp.clip(
            boxes[:, 3] - boxes[:, 1], 0.0
        )
        a2 = jnp.clip(gts[:, 2] - gts[:, 0], 0.0) * jnp.clip(
            gts[:, 3] - gts[:, 1], 0.0
        )
        iou = inter / jnp.maximum(a1[:, None] + a2[None, :] - inter, 1e-9)
        return iou * gmask[None, :]

    # ------------------------------ RPN ---------------------------------
    anchors = jnp.concatenate(aux["anchors"], axis=0)         # [A,4]
    rpn = jnp.concatenate(aux["rpn_raw"], axis=1)             # [B,A,5]

    def rpn_one(r, gts, gmask):
        iou = pair_iou(anchors, gts, gmask)                   # [A,T]
        best_iou = jnp.max(iou, axis=1)
        best_gt = jnp.argmax(iou, axis=1)
        # per-gt argmax anchors are positive too (low-IoU small objects)
        gt_best_anchor = jnp.argmax(iou, axis=0)              # [T]
        force_pos = jnp.zeros(anchors.shape[0], bool).at[gt_best_anchor].max(
            gmask > 0
        )
        pos = (best_iou > rpn_pos_iou) | force_pos
        neg = (best_iou < rpn_neg_iou) & ~pos
        obj_t = pos.astype(jnp.float32)
        obj_w = (pos | neg).astype(jnp.float32)
        obj_l = jnp.sum(bce(r[:, 0], obj_t) * obj_w) / jnp.maximum(
            jnp.sum(obj_w), 1.0
        )
        tgt_deltas = boxes_to_deltas(anchors, gts[best_gt])
        box_l = jnp.sum(
            _smooth_l1(r[:, 1:] - tgt_deltas).sum(-1) * pos
        ) / jnp.maximum(jnp.sum(pos), 1.0)
        return obj_l, box_l

    rpn_obj, rpn_box = jax.vmap(rpn_one)(
        rpn, gt_xyxy, target_mask.astype(jnp.float32)
    )

    # ------------------------------ ROI head ----------------------------
    proposals = aux["proposals"]                               # [B,P,4]
    prop_valid = aux["prop_valid"]

    def roi_one(props, pvalid, cls_logits, deltas, gts, gcls, gmask):
        iou = pair_iou(props, gts, gmask)                      # [P,T]
        best_iou = jnp.max(iou, axis=1)
        best_gt = jnp.argmax(iou, axis=1)
        pos = (best_iou > roi_pos_iou) & pvalid
        # label: gt class + 1 at positives, 0 (background) otherwise
        label = jnp.where(pos, gcls[best_gt] + 1, 0)
        logp = jax.nn.log_softmax(cls_logits, axis=-1)
        ce = -jnp.take_along_axis(logp, label[:, None], axis=1)[:, 0]
        vw = pvalid.astype(jnp.float32)
        cls_l = jnp.sum(ce * vw) / jnp.maximum(jnp.sum(vw), 1.0)

        tgt_deltas = boxes_to_deltas(props, gts[best_gt])      # [P,4]
        d = deltas.reshape(props.shape[0], num_classes, 4)
        d_sel = jnp.take_along_axis(
            d, jnp.maximum(label - 1, 0)[:, None, None], axis=1
        )[:, 0]
        box_l = jnp.sum(
            _smooth_l1(d_sel - tgt_deltas).sum(-1) * pos
        ) / jnp.maximum(jnp.sum(pos), 1.0)
        return cls_l, box_l

    roi_cls_l, roi_box_l = jax.vmap(roi_one)(
        proposals, prop_valid, aux["roi_cls"], aux["roi_deltas"],
        gt_xyxy, gt_cls, target_mask.astype(jnp.float32),
    )

    rpn_l = rpn_gain * (jnp.mean(rpn_obj) + box_gain * jnp.mean(rpn_box))
    roi_l = roi_gain * (jnp.mean(roi_cls_l) + box_gain * jnp.mean(roi_box_l))
    loss = rpn_l + roi_l
    metrics = {
        "loss/box": box_gain * (jnp.mean(rpn_box) + jnp.mean(roi_box_l)),
        "loss/obj": jnp.mean(rpn_obj),
        "loss/cls": jnp.mean(roi_cls_l),
    }
    return loss, metrics


def rcnn_s(**kw):
    return FasterRCNN(depth_multiple=0.33, width_multiple=0.50, **kw)


def rcnn_n(**kw):
    return FasterRCNN(depth_multiple=0.33, width_multiple=0.25, **kw)
