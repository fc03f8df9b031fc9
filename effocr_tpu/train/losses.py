"""Training losses: SupCon (metric learning), cross-entropy (classifier
mode), and the YOLOv5-style detection loss.

- supcon_loss matches pytorch_metric_learning SupConLoss(temperature=0.1)
  as used by train_effocr_recognizer.py:327: cosine similarities over the
  global batch, per-anchor mean log-prob over positives, averaged over
  anchors that have positives.  Under pjit with a batch sharded over the
  data axis, XLA all-gathers the [B, D] embeddings over ICI — the global-
  batch semantics of the reference's DataParallel gather for free.
- yolo_loss reimplements the YOLOv5 objective (CIoU box + BCE obj with IoU
  targets and per-scale balance + BCE cls) with fixed-shape scatter-based
  target assignment (wh-ratio anchor match < 4, 3-cell neighbor assignment).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from effocr_tpu.kernels.retrieval import l2_normalize


# ----------------------------------------------------------------- supcon

def supcon_loss(
    embeddings: jnp.ndarray,
    labels: jnp.ndarray,
    temperature: float = 0.1,
    valid: jnp.ndarray = None,
) -> jnp.ndarray:
    """Supervised contrastive loss over one batch view.

    embeddings [B, D] (unnormalized), labels [B] int, valid [B] bool
    (padding slots excluded from anchors, positives, and denominators).
    """
    b = embeddings.shape[0]
    if valid is None:
        valid = jnp.ones((b,), bool)
    z = l2_normalize(embeddings.astype(jnp.float32))
    # full-precision similarity logits: the TPU MXU defaults to bf16 inputs,
    # which visibly shifts the contrastive loss; this matmul is tiny [B,B]
    sims = jax.lax.dot_general(
        z, z, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ) / temperature
    eye = jnp.eye(b, dtype=bool)
    pair_valid = valid[:, None] & valid[None, :] & ~eye

    pos = (labels[:, None] == labels[None, :]) & pair_valid

    # log-softmax over each anchor's candidates (all valid non-self)
    sims = jnp.where(pair_valid, sims, -jnp.inf)
    logz = jax.nn.logsumexp(sims, axis=1, keepdims=True)
    logp = sims - logz

    n_pos = jnp.sum(pos, axis=1)
    per_anchor = jnp.sum(jnp.where(pos, logp, 0.0), axis=1) / jnp.maximum(
        n_pos, 1
    )
    has_pos = (n_pos > 0) & valid
    return -jnp.sum(jnp.where(has_pos, per_anchor, 0.0)) / jnp.maximum(
        jnp.sum(has_pos), 1
    )


def cosine_classifier_loss(
    embeddings: jnp.ndarray,
    weights: jnp.ndarray,
    labels: jnp.ndarray,
    temperature: float = 0.07,
    valid: jnp.ndarray = None,
) -> jnp.ndarray:
    """NormFace-style proxy cross-entropy: CE over cosine similarities to a
    learnable per-class weight matrix.

    embeddings [B, D] (unnormalized), weights [C, D] (unnormalized class
    proxies), labels [B] int.  Directly optimizes the cosine geometry that
    the 1-NN prototype retrieval decodes in — the from-scratch complement
    to SupCon's batch-relative objective.
    """
    z = l2_normalize(embeddings.astype(jnp.float32))
    w = l2_normalize(weights.astype(jnp.float32))
    logits = jax.lax.dot_general(
        z, w, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ) / temperature
    return cross_entropy_loss(logits, labels, valid)


def cross_entropy_loss(
    logits: jnp.ndarray, labels: jnp.ndarray, valid: jnp.ndarray = None
) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if valid is None:
        return jnp.mean(nll)
    return jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(
        jnp.sum(valid), 1
    )


# ------------------------------------------------------------- yolo loss

def _bce(logits, targets):
    """Elementwise binary cross-entropy with logits (softplus form: smooth
    gradient sigma(x) - t everywhere, unlike the |x| formulation whose
    subgradient vanishes at exactly-zero logits)."""
    return jax.nn.softplus(logits) - logits * targets


def _ciou(box1, box2, eps: float = 1e-7):
    """Complete IoU between xywh boxes [..., 4] (YOLOv5 box regression)."""
    b1x, b1y, b1w, b1h = box1[..., 0], box1[..., 1], box1[..., 2], box1[..., 3]
    b2x, b2y, b2w, b2h = box2[..., 0], box2[..., 1], box2[..., 2], box2[..., 3]
    b1x1, b1x2 = b1x - b1w / 2, b1x + b1w / 2
    b1y1, b1y2 = b1y - b1h / 2, b1y + b1h / 2
    b2x1, b2x2 = b2x - b2w / 2, b2x + b2w / 2
    b2y1, b2y2 = b2y - b2h / 2, b2y + b2h / 2

    inter = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0) * \
        jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0)
    union = b1w * b1h + b2w * b2h - inter + eps
    iou = inter / union

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    c2 = cw**2 + ch**2 + eps
    rho2 = (b2x - b1x) ** 2 + (b2y - b1y) ** 2
    v = (4 / jnp.pi**2) * jnp.square(
        jnp.arctan(b2w / (b2h + eps)) - jnp.arctan(b1w / (b1h + eps))
    )
    alpha = v / (v - iou + (1 + eps))
    alpha = jax.lax.stop_gradient(alpha)
    return iou - (rho2 / c2 + v * alpha)


def yolo_loss(
    raw: Sequence[jnp.ndarray],
    targets: jnp.ndarray,
    target_mask: jnp.ndarray,
    anchors: Sequence[Sequence[float]],
    strides: Sequence[int] = (8, 16, 32),
    num_classes: int = 2,
    box_gain: float = 0.05,
    obj_gain: float = 1.0,
    cls_gain: float = 0.5,
    anchor_t: float = 4.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """YOLOv5 loss with fixed-shape target assignment.

    raw: per-scale logits [B, G, G, na, 5+nc] (model(..., decode=False)).
    targets: [B, T, 5] = (cls, cx, cy, w, h) in *pixels* of the input image.
    target_mask: [B, T] bool.
    """
    balance = (4.0, 1.0, 0.4)
    b, t = targets.shape[:2]
    total_box, total_obj, total_cls = 0.0, 0.0, 0.0

    batch_ids = jnp.broadcast_to(jnp.arange(b)[:, None], (b, t))

    for si, (y, anc, stride) in enumerate(zip(raw, anchors, strides)):
        _, gh, gw, na, no = y.shape
        anc_wh = jnp.asarray(anc, jnp.float32).reshape(na, 2) / stride

        # gt in grid units
        gxy = targets[..., 1:3] / stride            # [B,T,2]
        gwh = targets[..., 3:5] / stride
        cls = targets[..., 0].astype(jnp.int32)

        # anchor match: max wh ratio < anchor_t        [B,T,na]
        r = gwh[:, :, None, :] / anc_wh[None, None, :, :]
        ratio = jnp.maximum(r, 1.0 / jnp.maximum(r, 1e-9)).max(axis=-1)
        anc_ok = (ratio < anchor_t) & target_mask[:, :, None]

        # neighbor-cell offsets (center + 2 nearest cells, g=0.5)
        gxi, gyi = gxy[..., 0], gxy[..., 1]
        fx, fy = gxi % 1.0, gyi % 1.0
        off_x = jnp.where(fx < 0.5, -1, 1)           # [B,T]
        off_y = jnp.where(fy < 0.5, -1, 1)
        # candidate offsets: (0,0), (ox,0), (0,oy)
        offsets = jnp.stack(
            [
                jnp.zeros_like(off_x), jnp.zeros_like(off_y),
                off_x, jnp.zeros_like(off_y),
                jnp.zeros_like(off_x), off_y,
            ],
            axis=-1,
        ).reshape(b, t, 3, 2)                        # [B,T,3,2] (dx, dy)

        cell_x = jnp.floor(gxi)[:, :, None] + offsets[..., 0]
        cell_y = jnp.floor(gyi)[:, :, None] + offsets[..., 1]
        in_grid = (
            (cell_x >= 0) & (cell_x < gw) & (cell_y >= 0) & (cell_y < gh)
        )
        # neighbor validity mirrors YOLOv5: x-neighbor only if 0<fx center
        # cells always valid; keep all three (edges masked by in_grid)
        cand_ok = (
            anc_ok[:, :, :, None] & in_grid[:, :, None, :]
        )                                            # [B,T,na,3]

        # scatter gt index into assignment grid [B, gh, gw, na]
        assign = jnp.full((b, gh, gw, na), -1, jnp.int32)
        bb = jnp.broadcast_to(batch_ids[:, :, None, None], cand_ok.shape)
        tt = jnp.broadcast_to(
            jnp.arange(t)[None, :, None, None], cand_ok.shape
        )
        aa = jnp.broadcast_to(
            jnp.arange(na)[None, None, :, None], cand_ok.shape
        )
        cy = jnp.broadcast_to(
            cell_y[:, :, None, :], cand_ok.shape
        ).astype(jnp.int32)
        cx = jnp.broadcast_to(
            cell_x[:, :, None, :], cand_ok.shape
        ).astype(jnp.int32)
        # invalid candidates scatter to a dump cell
        flat_b = jnp.where(cand_ok, bb, 0).reshape(-1)
        flat_y = jnp.where(cand_ok, cy, 0).reshape(-1)
        flat_x = jnp.where(cand_ok, cx, 0).reshape(-1)
        flat_a = jnp.where(cand_ok, aa, 0).reshape(-1)
        flat_t = jnp.where(cand_ok, tt, -1).reshape(-1)
        # use max-scatter so a real target beats the -1 default and
        # collisions resolve deterministically (highest t wins)
        assign = assign.at[flat_b, flat_y, flat_x, flat_a].max(flat_t)

        matched = assign >= 0                         # [B,gh,gw,na]
        safe_t = jnp.maximum(assign, 0)

        # gather gt per cell
        g_xy = gxy[jnp.arange(b)[:, None, None, None], safe_t]   # [B,gh,gw,na,2]
        g_wh = gwh[jnp.arange(b)[:, None, None, None], safe_t]
        g_cls = cls[jnp.arange(b)[:, None, None, None], safe_t]

        # predicted box per cell (YOLOv5 decode in grid units)
        ps = y.astype(jnp.float32)
        grid_x = jnp.arange(gw, dtype=jnp.float32)[None, None, :, None]
        grid_y = jnp.arange(gh, dtype=jnp.float32)[None, :, None, None]
        pxy = jax.nn.sigmoid(ps[..., :2]) * 2.0 - 0.5
        pxy = pxy + jnp.stack(
            [jnp.broadcast_to(grid_x, pxy[..., 0].shape),
             jnp.broadcast_to(grid_y, pxy[..., 1].shape)], axis=-1
        )
        pwh = jnp.square(jax.nn.sigmoid(ps[..., 2:4]) * 2.0) * anc_wh
        pbox = jnp.concatenate([pxy, pwh], axis=-1)
        tbox = jnp.concatenate([g_xy, g_wh], axis=-1)

        iou = _ciou(pbox, tbox)
        n_matched = jnp.maximum(jnp.sum(matched), 1)
        box_l = jnp.sum(jnp.where(matched, 1.0 - iou, 0.0)) / n_matched

        # objectness: target = clipped detached IoU at matched cells
        obj_t = jnp.where(
            matched, jnp.clip(jax.lax.stop_gradient(iou), 0.0), 0.0
        )
        obj_l = jnp.mean(_bce(ps[..., 4], obj_t)) * balance[si]

        # classification
        if num_classes > 1:
            one_hot = jax.nn.one_hot(g_cls, num_classes)
            cls_bce = _bce(ps[..., 5:], one_hot)
            cls_l = jnp.sum(
                jnp.where(matched[..., None], cls_bce, 0.0)
            ) / (n_matched * num_classes)
        else:
            cls_l = 0.0

        total_box += box_l
        total_obj += obj_l
        total_cls += cls_l

    loss = box_gain * total_box + obj_gain * total_obj + cls_gain * total_cls
    metrics = {
        "loss/box": box_gain * total_box,
        "loss/obj": obj_gain * total_obj,
        "loss/cls": cls_gain * total_cls,
    }
    return loss * targets.shape[0], metrics
