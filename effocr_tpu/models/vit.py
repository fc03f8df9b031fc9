"""ViT and XCiT encoders.

Parity targets: the reference's HF/timm transformer encoders — CLS-token
embedding (models/encoders.py:84) and `xcit_small_12_p8_224` (the paper's
strongest recognizer, models/encoders.py:9).  XCiT uses cross-covariance
attention (attention across channels with token-normalized Q/K), local patch
interaction (depthwise 3x3), and class-attention layers — all MXU/VPU
friendly ops.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out, dtype=self.dtype,
                        param_dtype=self.param_dtype)(x)


class SelfAttention(nn.Module):
    dim: int
    heads: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, _ = x.shape
        hd = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(hd).astype(x.dtype)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="proj")(out)


class ViTBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype)(x)
        x = x + SelfAttention(self.dim, self.heads, self.dtype,
                              self.param_dtype)(h.astype(self.dtype))
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype)(x)
        x = x + Mlp(int(self.dim * self.mlp_ratio), self.dim, self.dtype,
                    self.param_dtype)(h.astype(self.dtype))
        return x


class ViT(nn.Module):
    """Classic ViT; returns the CLS embedding [B, dim]."""

    patch: int = 16
    dim: int = 384
    depth: int = 12
    heads: int = 6
    image_size: int = 224
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        b = x.shape[0]
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="patch_embed")(x)
        n = x.shape[1] * x.shape[2]
        x = x.reshape(b, n, self.dim)
        cls = self.param("cls", nn.initializers.truncated_normal(0.02),
                         (1, 1, self.dim), self.param_dtype)
        pos = self.param("pos", nn.initializers.truncated_normal(0.02),
                         (1, n + 1, self.dim), self.param_dtype)
        x = jnp.concatenate([jnp.tile(cls.astype(self.dtype), (b, 1, 1)), x],
                            axis=1) + pos.astype(self.dtype)
        for i in range(self.depth):
            x = ViTBlock(self.dim, self.heads, dtype=self.dtype,
                         param_dtype=self.param_dtype, name=f"block{i}")(x)
        x = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="norm")(x)
        return x[:, 0].astype(jnp.float32)


# ---------------------------------------------------------------------- XCiT

class XCA(nn.Module):
    """Cross-covariance attention: softmax over channel-channel similarities
    of token-L2-normalized Q/K, with a learned temperature per head."""

    dim: int
    heads: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, _ = x.shape
        hd = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [b,n,h,d]
        temp = self.param("temperature", nn.initializers.ones,
                          (self.heads, 1, 1), self.param_dtype)
        qn = q / jnp.maximum(
            jnp.linalg.norm(q.astype(jnp.float32), axis=1, keepdims=True), 1e-6
        ).astype(q.dtype)
        kn = k / jnp.maximum(
            jnp.linalg.norm(k.astype(jnp.float32), axis=1, keepdims=True), 1e-6
        ).astype(k.dtype)
        attn = jnp.einsum("bnhd,bnhe->bhde", qn, kn) * temp.astype(qn.dtype)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhde,bnhe->bnhd", attn, v).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="proj")(out)


class LPI(nn.Module):
    """Local patch interaction: two depthwise 3x3 convs over the 2D grid."""

    dim: int
    hw: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, d = x.shape
        g = x.reshape(b, self.hw, self.hw, d)
        g = nn.Conv(d, (3, 3), padding="SAME", feature_group_count=d,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv1")(g)
        g = nn.gelu(g, approximate=False)
        g = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                         param_dtype=self.param_dtype, name="bn")(g)
        g = nn.Conv(d, (3, 3), padding="SAME", feature_group_count=d,
                    dtype=self.dtype, param_dtype=self.param_dtype,
                    name="conv2")(g.astype(self.dtype))
        return g.reshape(b, n, d)


class XCiTBlock(nn.Module):
    dim: int
    heads: int
    hw: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def ls(name):
            return self.param(name, nn.initializers.constant(1.0),
                              (self.dim,), self.param_dtype)

        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype)(x)
        x = x + ls("gamma1").astype(x.dtype) * XCA(
            self.dim, self.heads, self.dtype, self.param_dtype
        )(h.astype(self.dtype))
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype)(x)
        x = x + ls("gamma3").astype(x.dtype) * LPI(
            self.dim, self.hw, self.dtype, self.param_dtype
        )(h.astype(self.dtype), train=train)
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype)(x)
        x = x + ls("gamma2").astype(x.dtype) * Mlp(
            4 * self.dim, self.dim, self.dtype, self.param_dtype
        )(h.astype(self.dtype))
        return x


class ClassAttentionBlock(nn.Module):
    """CaiT-style class-attention block, timm/facebook XCiT semantics.

    Matches timm xcit.py ClassAttentionBlock op for op so imported
    checkpoints (interop/reference_artifacts.convert_timm_xcit; reference
    models/encoders.py:6-29) are numerically exact, including two upstream
    quirks we deliberately reproduce: (1) the attention residual adds the
    *norm1-ed* non-CLS tokens back (scaled by gamma1), and (2) the MLP
    residual re-adds the token stream to itself, doubling non-CLS tokens
    each block — harmless because every later consumer LayerNorms first."""

    dim: int
    heads: int
    tokens_norm: bool = True      # timm xcit_* models all set True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # attention of CLS (query) over all tokens
        b, n, d = x.shape
        hd = self.dim // self.heads
        h = nn.LayerNorm(dtype=jnp.float32,
                         param_dtype=self.param_dtype)(x).astype(self.dtype)
        q = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="q")(h[:, :1])
        k = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="k")(h)
        v = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="v")(h)
        q = q.reshape(b, 1, self.heads, hd)
        k = k.reshape(b, n, self.heads, hd)
        v = v.reshape(b, n, self.heads, hd)
        attn = jnp.einsum("bqhd,bnhd->bhqn", q, k) / jnp.sqrt(hd).astype(q.dtype)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        cls = jnp.einsum("bhqn,bnhd->bqhd", attn, v).reshape(b, 1, self.dim)
        cls = nn.Dense(self.dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="proj")(cls)
        gamma = self.param("gamma1", nn.initializers.constant(1.0),
                           (self.dim,), self.param_dtype)
        # residual adds gamma1 * [cls_attn; norm1(x)[:, 1:]]
        x = x + gamma.astype(x.dtype) * jnp.concatenate(
            [cls, h[:, 1:]], axis=1
        )
        if self.tokens_norm:
            x = nn.LayerNorm(dtype=jnp.float32,
                             param_dtype=self.param_dtype)(x).astype(self.dtype)
        else:
            x = jnp.concatenate(
                [nn.LayerNorm(dtype=jnp.float32,
                              param_dtype=self.param_dtype)(
                    x[:, :1]).astype(self.dtype), x[:, 1:]],
                axis=1,
            )
        gamma2 = self.param("gamma2", nn.initializers.constant(1.0),
                            (self.dim,), self.param_dtype)
        cls2 = gamma2.astype(x.dtype) * Mlp(4 * self.dim, self.dim, self.dtype,
                                            self.param_dtype)(x[:, :1])
        # upstream quirk (2): x_res + cat(cls_mlp, tokens) doubles tokens
        return x + jnp.concatenate([cls2, x[:, 1:]], axis=1)


class XCiT(nn.Module):
    """XCiT; returns the CLS embedding [B, dim]."""

    patch: int = 8
    dim: int = 384
    depth: int = 12
    heads: int = 8
    cls_depth: int = 2
    image_size: int = 224
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        b = x.shape[0]
        # conv patch embed: 3x3 stride-2 convs (p8 -> three of them)
        n_convs = {4: 2, 8: 3, 16: 4}[self.patch]
        f = self.dim // (2 ** (n_convs - 1))
        for i in range(n_convs):
            # explicit (1,1) padding: torch Conv2d(padding=1) semantics —
            # "SAME" at stride 2 would pad (0,1) and shift every window
            # one pixel versus timm checkpoints
            x = nn.Conv(min(f * 2**i, self.dim), (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        param_dtype=self.param_dtype,
                        name=f"patch_conv{i}")(x)
            if i < n_convs - 1:
                x = nn.gelu(x, approximate=False)
        hw = x.shape[1]
        n = hw * hw
        x = x.reshape(b, n, self.dim)
        pos = self.param("pos", nn.initializers.truncated_normal(0.02),
                         (1, n, self.dim), self.param_dtype)
        x = x + pos.astype(self.dtype)
        for i in range(self.depth):
            x = XCiTBlock(self.dim, self.heads, hw, dtype=self.dtype,
                          param_dtype=self.param_dtype,
                          name=f"block{i}")(x, train=train)
        cls = self.param("cls", nn.initializers.truncated_normal(0.02),
                         (1, 1, self.dim), self.param_dtype)
        x = jnp.concatenate([jnp.tile(cls.astype(self.dtype), (b, 1, 1)), x],
                            axis=1)
        for i in range(self.cls_depth):
            x = ClassAttentionBlock(self.dim, self.heads, dtype=self.dtype,
                                    param_dtype=self.param_dtype,
                                    name=f"cls_block{i}")(x)
        x = nn.LayerNorm(dtype=jnp.float32, param_dtype=self.param_dtype,
                         name="norm")(x)
        return x[:, 0].astype(jnp.float32)


def vit_small_patch16(**kw):
    return ViT(patch=16, dim=384, depth=12, heads=6, **kw)


def vit_tiny_patch16(**kw):
    return ViT(patch=16, dim=192, depth=12, heads=3, **kw)


def xcit_small_12_p8(**kw):
    return XCiT(patch=8, dim=384, depth=12, heads=8, **kw)


def xcit_tiny_12_p8(**kw):
    return XCiT(patch=8, dim=192, depth=12, heads=4, **kw)
