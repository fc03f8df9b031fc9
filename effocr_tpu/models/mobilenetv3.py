"""MobileNetV3 encoder family (the reference's fast recognizer backbone,
`mobilenetv3_small_050` — README.md:133-135).

Inverted-residual blocks with optional squeeze-excite and hard-swish, NHWC,
bf16 compute.  Returns the pooled pre-classifier embedding (timm
num_classes=0 semantics: global pool then the 1x1 "conv head" features).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from effocr_tpu.models.layers import SqueezeExcite, global_avg_pool

Dtype = Any


def hard_swish(x):
    return x * (jnp.clip(x + 3.0, 0.0, 6.0) / 6.0)


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class BlockSpecMNV3(NamedTuple):
    kernel: int
    exp: int      # expansion features (at multiplier 1.0)
    out: int      # output features (at multiplier 1.0)
    se: bool
    act: str      # "relu" | "hswish"
    stride: int


# MobileNetV3-Small (paper Table 2)
SMALL_SPECS: Tuple[BlockSpecMNV3, ...] = (
    BlockSpecMNV3(3, 16, 16, True, "relu", 2),
    BlockSpecMNV3(3, 72, 24, False, "relu", 2),
    BlockSpecMNV3(3, 88, 24, False, "relu", 1),
    BlockSpecMNV3(5, 96, 40, True, "hswish", 2),
    BlockSpecMNV3(5, 240, 40, True, "hswish", 1),
    BlockSpecMNV3(5, 240, 40, True, "hswish", 1),
    BlockSpecMNV3(5, 120, 48, True, "hswish", 1),
    BlockSpecMNV3(5, 144, 48, True, "hswish", 1),
    BlockSpecMNV3(5, 288, 96, True, "hswish", 2),
    BlockSpecMNV3(5, 576, 96, True, "hswish", 1),
    BlockSpecMNV3(5, 576, 96, True, "hswish", 1),
)


class InvertedResidual(nn.Module):
    spec: BlockSpecMNV3
    multiplier: float
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = nn.relu if self.spec.act == "relu" else hard_swish
        in_f = x.shape[-1]
        exp_f = _make_divisible(self.spec.exp * self.multiplier)
        out_f = _make_divisible(self.spec.out * self.multiplier)
        shortcut = x

        def bn(y, name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, param_dtype=self.param_dtype, name=name,
            )(y)

        y = x
        if exp_f != in_f:
            y = nn.Conv(exp_f, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="expand")(y)
            y = act(bn(y, "expand_bn")).astype(self.dtype)
        k, s = self.spec.kernel, self.spec.stride
        p = k // 2
        y = nn.Conv(exp_f, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                    feature_group_count=exp_f, use_bias=False,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="dw")(y)
        y = act(bn(y, "dw_bn")).astype(self.dtype)
        if self.spec.se:
            y = SqueezeExcite(_make_divisible(exp_f / 4), dtype=self.dtype,
                              param_dtype=self.param_dtype)(y)
        y = nn.Conv(out_f, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="project")(y)
        y = bn(y, "project_bn").astype(self.dtype)
        if s == 1 and in_f == out_f:
            y = y + shortcut
        return y


class MobileNetV3Small(nn.Module):
    """Returns pooled embeddings [B, head_features]."""

    multiplier: float = 0.5           # _050 variant
    head_features: int = 1024
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        stem_f = _make_divisible(16 * self.multiplier)
        x = nn.Conv(stem_f, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="stem")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="stem_bn")(x)
        x = hard_swish(x).astype(self.dtype)
        for i, spec in enumerate(SMALL_SPECS):
            x = InvertedResidual(spec, self.multiplier, dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name=f"block{i}")(x, train=train)
        last_f = _make_divisible(576 * self.multiplier)
        x = nn.Conv(last_f, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="last_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="last_bn")(x)
        x = hard_swish(x)
        x = global_avg_pool(x.astype(jnp.float32))
        # timm conv_head equivalent (acts on pooled features)
        x = nn.Dense(self.head_features, dtype=jnp.float32,
                     param_dtype=self.param_dtype, name="head")(x)
        return hard_swish(x)


def mobilenetv3_small_050(**kw):
    return MobileNetV3Small(multiplier=0.5, **kw)


def mobilenetv3_small_100(**kw):
    return MobileNetV3Small(multiplier=1.0, **kw)
