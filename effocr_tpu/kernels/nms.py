"""Fixed-shape greedy NMS for TPU.

Replaces torchvision.ops.nms inside the reference's YOLO decode
(onnx_engines/localizer_engine.py:259-263).  Exact greedy semantics — box j
survives iff no *kept* higher-scoring box overlaps it above the IoU threshold
— but computed without a length-N sequential loop:

1. sort by score (invalid slots get -inf),
2. S[i, j] = 1 where i < j (i outranks j) and IoU(i, j) > thresh,
3. iterate a resolve step until fixpoint: a box is KEPT when no kept-or-
   undecided outranking box suppresses it; a box is SUPPRESSED when a kept
   box suppresses it.  Each iteration resolves at least the top undecided
   box; suppression chains in text detection are shallow, so this converges
   in a handful of [N,N] vector-ops iterations (VPU-friendly) instead of N
   scalar steps.

Per-class NMS uses the class-offset trick (localizer_engine.py:260-261):
boxes are shifted by class_id * MAX_WH so different classes never overlap.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

MAX_WH = 7680.0  # reference max box coordinate (localizer_engine.py:200)
NEG_INF = -1e30


def pairwise_iou(boxes: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """IoU matrix [N, N] for xyxy boxes [N, 4] (cf. localizer_engine.py:150-169)."""
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area = jnp.clip(boxes[:, 2] - boxes[:, 0], 0.0) * jnp.clip(
        boxes[:, 3] - boxes[:, 1], 0.0
    )
    union = area[:, None] + area[None, :] - inter
    return inter / (union + eps)


def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
    presorted: bool = False,
) -> jnp.ndarray:
    """Greedy-NMS keep mask, same order as inputs.

    boxes [N,4] xyxy (already class-offset if per-class), scores [N],
    valid [N] bool.  Inputs need NOT be sorted unless ``presorted``:
    then the caller guarantees valid boxes appear in descending-score,
    index-ascending-tie order (exactly what lax.top_k emits) and the two
    rank argsorts are skipped — sorts are the expensive primitive on TPU,
    and the fused pipeline calls this on [B, max_nms] every chunk.
    """
    n = boxes.shape[0]
    if presorted:
        rank = jnp.arange(n, dtype=jnp.int32)
    else:
        score_key = jnp.where(valid, scores, NEG_INF)
        # Rank: position of each box in score-descending order, with stable
        # index tie-break (matches torch sort semantics closely enough:
        # equal scores keep input order).
        order = jnp.argsort(-score_key, stable=True)
        rank = jnp.argsort(order, stable=True)  # rank[i] = position of box i

    iou = pairwise_iou(boxes)
    outranks = rank[:, None] < rank[None, :]  # i outranks j
    both_valid = valid[:, None] & valid[None, :]
    S = outranks & both_valid & (iou > iou_thresh)  # i can suppress j

    def cond(state):
        kept, suppressed, undecided = state
        return jnp.any(undecided)

    def body(state):
        kept, suppressed, undecided = state
        contested = kept | undecided  # outrankers that might suppress
        sup_by_contested = jnp.any(S & contested[:, None], axis=0)
        sup_by_kept = jnp.any(S & kept[:, None], axis=0)
        newly_kept = undecided & ~sup_by_contested
        newly_sup = undecided & sup_by_kept
        kept = kept | newly_kept
        suppressed = suppressed | newly_sup
        undecided = undecided & ~(newly_kept | newly_sup)
        return kept, suppressed, undecided

    kept0 = jnp.zeros((n,), dtype=bool)
    sup0 = jnp.zeros((n,), dtype=bool)
    kept, _, _ = jax.lax.while_loop(cond, body, (kept0, sup0, valid))
    return kept


@partial(jax.jit, static_argnames=("iou_thresh", "max_det", "class_agnostic",
                                   "presorted", "kernel", "interpret"))
def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
    max_det: int,
    class_agnostic: bool = False,
    presorted: bool = False,
    kernel: str = "xla",
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-image NMS over a batch, fixed output [B, max_det, ...].

    boxes [B,N,4], scores [B,N], classes [B,N] (int), valid [B,N].
    Returns (boxes [B,max_det,4], scores [B,max_det], classes [B,max_det],
    valid [B,max_det]), score-sorted, padded slots have valid=False.

    ``presorted`` (see nms_mask): additionally replaces the top_k
    compaction of kept boxes with a cumsum+scatter stable compaction —
    kept boxes in input order are already score-sorted, so the result is
    identical without another [N]-sort per image.  Box/class values in
    valid=False slots are unspecified in both modes (consumers mask).

    ``kernel="pallas"`` (requires ``presorted``): computes the keep mask
    with kernels/pallas_nms.py — whole-image-in-VMEM, bit-identical
    result; ``interpret`` runs that kernel in interpreter mode (CPU
    tests).
    """

    n = boxes.shape[1]
    k_eff = min(max_det, n)

    keep_pre = None
    if kernel == "pallas":
        if not presorted:
            raise ValueError("kernel='pallas' requires presorted inputs "
                             "(the fused decode path always is)")
        from effocr_tpu.kernels.pallas_nms import pallas_nms_mask

        offs = (
            jnp.zeros_like(boxes[..., :1])
            if class_agnostic
            else classes.astype(boxes.dtype)[..., None] * MAX_WH
        )
        keep_pre = pallas_nms_mask(
            boxes + offs, valid, iou_thresh, interpret=interpret
        )

    def _one(b, s, c, v, kp=None):
        if kp is None:
            offset = (0.0 if class_agnostic
                      else c.astype(b.dtype)[:, None] * MAX_WH)
            keep = nms_mask(b + offset, s, v, iou_thresh,
                            presorted=presorted)
        else:
            keep = kp
        if presorted:
            pos = jnp.cumsum(keep) - 1  # position among kept, input order
            n_kept = pos[-1] + 1
            idx = jnp.zeros((max_det,), jnp.int32).at[
                jnp.where(keep, pos, max_det)
            ].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
            out_valid = jnp.arange(max_det) < jnp.minimum(n_kept, max_det)
            return (
                jnp.take(b, idx, axis=0),
                jnp.where(out_valid, jnp.take(s, idx), 0.0),
                jnp.take(c, idx, axis=0),
                out_valid,
            )
        key = jnp.where(keep, s, NEG_INF)
        top_scores, idx = jax.lax.top_k(key, k_eff)
        if k_eff < max_det:
            pad = max_det - k_eff
            top_scores = jnp.pad(top_scores, (0, pad), constant_values=NEG_INF)
            idx = jnp.pad(idx, (0, pad))
        out_valid = top_scores > NEG_INF / 2
        return (
            jnp.take(b, idx, axis=0),
            jnp.where(out_valid, top_scores, 0.0),
            jnp.take(c, idx, axis=0),
            out_valid,
        )

    if keep_pre is not None:
        return jax.vmap(_one)(boxes, scores, classes, valid, keep_pre)
    return jax.vmap(_one)(boxes, scores, classes, valid)
