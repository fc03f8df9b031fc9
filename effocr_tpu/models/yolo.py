"""YOLOv5-style single-stage detector in Flax (the localizer).

Capability parity with the reference's yolov5s localizer
(onnx_engines/infer_ocr_yolo.py:273, best_bbox_mAP.onnx in
infer_effocr_onnx_multi.py:476): CSP backbone + SPPF + PAN neck + 3-scale
anchor head.  The decode (sigmoid grid/anchor transform producing
[B, A, 5+nc]) reproduces the math behind the ONNX export consumed by
localizer_engine.py:61-63; NMS lives in effocr_tpu.kernels (decode_and_nms).

NHWC, bf16 compute, fp32 BatchNorm/params.  Default anchors are the YOLOv5
COCO priors; character detection typically retrains them (the reference's
D2 config likewise overrides anchor scales, train_effocr_localizer_d2.py:200-202).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from effocr_tpu.models.layers import ConvBnAct

Dtype = Any

DEFAULT_ANCHORS: Tuple[Tuple[float, ...], ...] = (
    (10, 13, 16, 30, 33, 23),       # P3/8
    (30, 61, 62, 45, 59, 119),      # P4/16
    (116, 90, 156, 198, 373, 326),  # P5/32
)
STRIDES = (8, 16, 32)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    expansion: float = 0.5
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.expansion)
        y = ConvBnAct(hidden, 1, dtype=self.dtype,
                      param_dtype=self.param_dtype)(x, train)
        y = ConvBnAct(self.features, 3, dtype=self.dtype,
                      param_dtype=self.param_dtype)(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = x + y
        return y


class C3(nn.Module):
    """CSP bottleneck with 3 convolutions."""

    features: int
    n: int = 1
    shortcut: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.features // 2
        a = ConvBnAct(hidden, 1, dtype=self.dtype,
                      param_dtype=self.param_dtype)(x, train)
        for i in range(self.n):
            a = Bottleneck(hidden, self.shortcut, 1.0, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           name=f"m{i}")(a, train)
        b = ConvBnAct(hidden, 1, dtype=self.dtype,
                      param_dtype=self.param_dtype)(x, train)
        return ConvBnAct(self.features, 1, dtype=self.dtype,
                         param_dtype=self.param_dtype)(
            jnp.concatenate([a, b], axis=-1), train
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5x5 max pools."""

    features: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = x.shape[-1] // 2
        x = ConvBnAct(hidden, 1, dtype=self.dtype,
                      param_dtype=self.param_dtype)(x, train)

        def pool(y):
            return nn.max_pool(y, (5, 5), strides=(1, 1), padding="SAME")

        p1 = pool(x)
        p2 = pool(p1)
        p3 = pool(p2)
        return ConvBnAct(self.features, 1, dtype=self.dtype,
                         param_dtype=self.param_dtype)(
            jnp.concatenate([x, p1, p2, p3], axis=-1), train
        )


def _upsample2(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest-neighbor upsample, NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class YOLOv5(nn.Module):
    """Returns (decoded [B, A, 5+nc], raw per-scale grids) — decoded has
    sigmoid grid/anchor transform applied; raw grids feed the training loss."""

    num_classes: int = 2
    depth_multiple: float = 0.33   # yolov5s
    width_multiple: float = 0.50   # yolov5s
    anchors: Tuple[Tuple[float, ...], ...] = DEFAULT_ANCHORS
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

        # backbone
        x = cba(64, 6, 2, "stem", p=2)(x, train)         # /2
        x = cba(128, 3, 2, "down1")(x, train)            # /4
        x = c3(128, 3, True, "c3_1")(x, train)
        x = cba(256, 3, 2, "down2")(x, train)            # /8
        p3 = c3(256, 6, True, "c3_2")(x, train)
        x = cba(512, 3, 2, "down3")(p3, train)           # /16
        p4 = c3(512, 9, True, "c3_3")(x, train)
        x = cba(1024, 3, 2, "down4")(p4, train)          # /32
        x = c3(1024, 3, True, "c3_4")(x, train)
        p5 = SPPF(w(1024), dtype=self.dtype, param_dtype=self.param_dtype,
                  name="sppf")(x, train)

        # PAN neck
        t5 = cba(512, 1, 1, "lat5")(p5, train)
        x = jnp.concatenate([_upsample2(t5), p4], axis=-1)
        n4 = c3(512, 3, False, "neck4")(x, train)
        t4 = cba(256, 1, 1, "lat4")(n4, train)
        x = jnp.concatenate([_upsample2(t4), p3], axis=-1)
        o3 = c3(256, 3, False, "neck3")(x, train)        # P3 out
        x = cba(256, 3, 2, "pan3")(o3, train)
        x = jnp.concatenate([x, t4], axis=-1)
        o4 = c3(512, 3, False, "neck4b")(x, train)       # P4 out
        x = cba(512, 3, 2, "pan4")(o4, train)
        x = jnp.concatenate([x, t5], axis=-1)
        o5 = c3(1024, 3, False, "neck5")(x, train)       # P5 out

        # detect head
        na = len(self.anchors[0]) // 2
        no = 5 + self.num_classes
        raw = []
        for i, feat in enumerate((o3, o4, o5)):
            y = nn.Conv(na * no, (1, 1), dtype=jnp.float32,
                        param_dtype=self.param_dtype, name=f"detect{i}")(feat)
            b, gh, gw, _ = y.shape
            raw.append(y.reshape(b, gh, gw, na, no))

        if not decode:
            return raw
        return decode_predictions(raw, self.anchors), raw


def decode_predictions(
    raw: Sequence[jnp.ndarray],
    anchors: Tuple[Tuple[float, ...], ...] = DEFAULT_ANCHORS,
    strides: Tuple[int, ...] = STRIDES,
) -> jnp.ndarray:
    """Per-scale raw grids [B,H,W,na,5+nc] -> decoded [B, A, 5+nc] (xywh,
    obj, cls in pixel/probability space) — the YOLOv5 export transform:
    xy = (2*sig(t)-0.5+grid)*stride, wh = (2*sig(t))^2 * anchor.
    """
    outs = []
    for y, anc, stride in zip(raw, anchors, strides):
        b, gh, gw, na, no = y.shape
        y = jax.nn.sigmoid(y.astype(jnp.float32))
        gy = jnp.arange(gh, dtype=jnp.float32)[:, None]
        gx = jnp.arange(gw, dtype=jnp.float32)[None, :]
        grid = jnp.stack(
            [jnp.broadcast_to(gx, (gh, gw)), jnp.broadcast_to(gy, (gh, gw))],
            axis=-1,
        )[:, :, None, :]  # [gh, gw, 1, 2]
        anc_wh = jnp.asarray(anc, jnp.float32).reshape(na, 2)
        xy = (y[..., :2] * 2.0 - 0.5 + grid) * stride
        wh = jnp.square(y[..., 2:4] * 2.0) * anc_wh
        out = jnp.concatenate([xy, wh, y[..., 4:]], axis=-1)
        outs.append(out.reshape(b, gh * gw * na, no))
    return jnp.concatenate(outs, axis=1)


def yolov5n(**kw):
    return YOLOv5(depth_multiple=0.33, width_multiple=0.25, **kw)


def yolov5s(**kw):
    return YOLOv5(depth_multiple=0.33, width_multiple=0.50, **kw)


def yolov5m(**kw):
    return YOLOv5(depth_multiple=0.67, width_multiple=0.75, **kw)
