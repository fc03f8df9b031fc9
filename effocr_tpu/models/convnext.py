"""ConvNeXt encoder family (flagship recognizer backbone).

Capability parity with the reference's timm `convnext_tiny` encoder
(README.md:133-135, models/encoders.py:50-70): patchify stem, four stages of
7x7-depthwise + pointwise-MLP blocks, LayerNorm, GELU, global-pool head that
returns the pooled embedding (num_classes=0 semantics).

TPU notes: NHWC layout; depthwise 7x7 via feature_group_count; compute in
bfloat16 with float32 params and float32 LayerNorm; LayerScale as in the
paper.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from effocr_tpu.models.layers import DropPath, global_avg_pool

Dtype = Any


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float = 0.0
    layer_scale_init: float = 1e-6
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        x = nn.Conv(
            self.dim, (7, 7), padding=((3, 3), (3, 3)),
            feature_group_count=self.dim,
            dtype=self.dtype, param_dtype=self.param_dtype, name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=self.param_dtype)(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp_up")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="mlp_down")(x)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init),
            (self.dim,), self.param_dtype,
        )
        x = x * gamma
        x = DropPath(self.drop_path)(x, deterministic=not train)
        return (shortcut + x).astype(self.dtype)


class ConvNeXt(nn.Module):
    """Returns pooled embeddings [B, dims[-1]]."""

    depths: Sequence[int] = (3, 3, 9, 3)      # tiny
    dims: Sequence[int] = (96, 192, 384, 768) # tiny
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        # host-side numpy: a jnp.linspace here would become a tracer under
        # jit and break the static drop-path probability
        dp_rates = [
            float(r) for r in
            np.linspace(0, self.drop_path_rate, sum(self.depths))
        ]
        cur = 0
        for i, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if i == 0:
                x = nn.Conv(dim, (4, 4), strides=(4, 4), dtype=self.dtype,
                            param_dtype=self.param_dtype, name="stem")(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                 param_dtype=self.param_dtype,
                                 name="stem_norm")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                 param_dtype=self.param_dtype,
                                 name=f"downsample_norm{i}")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                            param_dtype=self.param_dtype,
                            name=f"downsample{i}")(x)
            for j in range(depth):
                x = ConvNeXtBlock(
                    dim, drop_path=dp_rates[cur + j], dtype=self.dtype,
                    param_dtype=self.param_dtype, name=f"stage{i}_block{j}",
                )(x, train=train)
            cur += depth
        x = global_avg_pool(x.astype(jnp.float32))
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="head_norm")(x)
        return x


def convnext_atto(**kw):
    return ConvNeXt(depths=(2, 2, 6, 2), dims=(40, 80, 160, 320), **kw)


def convnext_femto(**kw):
    return ConvNeXt(depths=(2, 2, 6, 2), dims=(48, 96, 192, 384), **kw)


def convnext_nano(**kw):
    return ConvNeXt(depths=(2, 2, 8, 2), dims=(80, 160, 320, 640), **kw)


def convnext_tiny(**kw):
    return ConvNeXt(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), **kw)


def convnext_small(**kw):
    return ConvNeXt(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768), **kw)
