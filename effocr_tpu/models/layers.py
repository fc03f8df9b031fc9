"""Shared Flax building blocks (NHWC, bf16-compute friendly)."""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def autopad(k: int, p: Optional[int] = None) -> int:
    return k // 2 if p is None else p


class ConvBnAct(nn.Module):
    """Conv2D + BatchNorm + activation (YOLOv5's `Conv` block shape)."""

    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    padding: Optional[int] = None
    act: Callable = nn.silu
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = autopad(self.kernel, self.padding)
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.97,
            epsilon=1e-3,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
        )(x)
        return self.act(x).astype(self.dtype)


class SqueezeExcite(nn.Module):
    """SE block (MobileNetV3 style, hard-sigmoid gate)."""

    reduce_features: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduce_features, (1, 1), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="reduce")(s)
        s = nn.relu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="expand")(s)
        gate = jnp.clip(s + 3.0, 0.0, 6.0) / 6.0  # hard sigmoid
        return x * gate


class DropPath(nn.Module):
    """Stochastic depth: drop the residual branch per sample."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        if det or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC -> [B, C]."""
    return jnp.mean(x, axis=(1, 2))
