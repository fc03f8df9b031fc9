"""YOLO prediction decode + NMS as one fixed-shape XLA program.

Reference behavior (onnx_engines/localizer_engine.py:171-276,
non_max_suppression): candidates by obj_conf > conf_thres; conf = obj * cls;
best class only; xywh -> xyxy; score-sorted cap at max_nms; per-class NMS via
class offset; cap at max_det.

TPU-native differences: no Python filtering — a masked lax.top_k picks the
top ``max_nms`` candidates, the rest is identical math.  Returns padded
[B, max_det, 6] (xyxy, conf, cls) plus a validity mask.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from effocr_tpu.kernels.nms import NEG_INF, batched_nms


def xywh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] center-xywh -> corner-xyxy (localizer_engine.py:140-148)."""
    cx, cy, w, h = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    return jnp.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1
    )


@partial(
    jax.jit,
    static_argnames=("conf_thresh", "iou_thresh", "max_nms", "max_det",
                     "class_agnostic", "nms_kernel", "interpret"),
)
def decode_and_nms(
    prediction: jnp.ndarray,
    conf_thresh: float = 0.35,
    iou_thresh: float = 0.01,
    max_nms: int = 4096,
    max_det: int = 1000,
    class_agnostic: bool = False,
    nms_kernel: str = "xla",
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """prediction [B, A, 5+nc] -> (boxes, scores, classes, valid), [B, max_det].

    Matches non_max_suppression(conf_thres, iou_thres, max_det) with
    multi_label=False, agnostic=False, merge=False.
    """
    prediction = prediction.astype(jnp.float32)
    b, a, no = prediction.shape
    nc = no - 5
    obj = prediction[..., 4]
    cls_scores = prediction[..., 5:] * obj[..., None]  # conf = obj * cls
    conf = jnp.max(cls_scores, axis=-1)
    cls = jnp.argmax(cls_scores, axis=-1)

    # candidate gate: obj > thresh AND best conf > thresh
    # (localizer_engine.py:192 then :240)
    cand = (obj > conf_thresh) & (conf > conf_thresh)

    k = min(max_nms, a)
    key = jnp.where(cand, conf, NEG_INF)
    top_conf, idx = jax.lax.top_k(key, k)  # [B, k]
    valid = top_conf > NEG_INF / 2

    # NB: explicitly broadcast the gather index — relying on take_along_axis
    # index broadcasting miscompiles under nested jit on some backends
    # (observed on jax 0.9 CPU: components 1..3 gathered from row 0).
    idx4 = jnp.broadcast_to(idx[..., None], idx.shape + (4,))
    boxes_xywh = jnp.take_along_axis(prediction[..., :4], idx4, axis=1)
    boxes = xywh2xyxy(boxes_xywh)
    classes = jnp.take_along_axis(cls, idx, axis=1)
    scores = jnp.where(valid, top_conf, 0.0)

    # top_k emits descending-score, index-ascending-tie order, which is
    # exactly batched_nms's presorted contract — skips three more
    # [B, max_nms] sorts inside the NMS (sorts dominate this stage on TPU).
    return batched_nms(
        boxes, scores, classes, valid, iou_thresh, max_det, class_agnostic,
        presorted=True, kernel=nms_kernel, interpret=interpret,
    )
