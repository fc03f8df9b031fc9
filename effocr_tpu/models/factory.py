"""Model registry — the AutoEncoderFactory / AutoClassifierFactory equivalent.

The reference resolves encoders by timm/HF name (models/encoders.py:50-97)
and classifiers by stacking a head (models/classifiers.py:35-83).  Here the
zoo is first-party Flax; names mirror the timm names used in the paper
(README.md:132-135) so configs read the same.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from effocr_tpu.models import convnext, fcos, mobilenetv3, rcnn, vit, yolo

Dtype = Any

ENCODER_REGISTRY: Dict[str, Callable] = {
    "convnext_atto": convnext.convnext_atto,
    "convnext_femto": convnext.convnext_femto,
    "convnext_nano": convnext.convnext_nano,
    "convnext_tiny": convnext.convnext_tiny,
    "convnext_small": convnext.convnext_small,
    "mobilenetv3_small_050": mobilenetv3.mobilenetv3_small_050,
    "mobilenetv3_small_100": mobilenetv3.mobilenetv3_small_100,
    "vit_tiny_patch16_224": vit.vit_tiny_patch16,
    "vit_small_patch16_224": vit.vit_small_patch16,
    "xcit_tiny_12_p8_224": vit.xcit_tiny_12_p8,
    "xcit_small_12_p8_224": vit.xcit_small_12_p8,
}

LOCALIZER_REGISTRY: Dict[str, Callable] = {
    "yolov5n": yolo.yolov5n,
    "yolov5s": yolo.yolov5s,
    "yolov5m": yolo.yolov5m,
    # anchor-free family (the alternate-backend capability; the reference's
    # D2/MMDet role) — same decoded layout, drop-in for the pipeline
    "fcos_n": fcos.fcos_n,
    "fcos_s": fcos.fcos_s,
    # two-stage (Faster R-CNN) family — D2/MMDet-parity alternate backend
    "rcnn_n": rcnn.rcnn_n,
    "rcnn_s": rcnn.rcnn_s,
}


class Classifier(nn.Module):
    """Encoder + linear head (FFNN-classifier mode, --N_classes).

    Mirrors models/classifiers.py:35-83: same backbone, logits out.
    """

    encoder: nn.Module
    num_classes: int
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        emb = self.encoder(x, train=train)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        param_dtype=self.param_dtype, name="head")(emb)


class ProjectionHead(nn.Module):
    """Optional metric head (models/encoders.py:32-47): 768->512->128."""

    hidden_dim: int = 512
    output_dim: int = 128
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, param_dtype=self.param_dtype)(x)
        x = nn.LayerNorm(param_dtype=self.param_dtype)(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.output_dim, use_bias=False,
                        param_dtype=self.param_dtype)(x)


def create_encoder(name: str, dtype=jnp.bfloat16, **kw) -> nn.Module:
    if name not in ENCODER_REGISTRY:
        raise KeyError(
            f"unknown encoder '{name}'; have {sorted(ENCODER_REGISTRY)}"
        )
    return ENCODER_REGISTRY[name](dtype=dtype, **kw)


def create_classifier(name: str, num_classes: int, dtype=jnp.bfloat16,
                      **kw) -> nn.Module:
    return Classifier(create_encoder(name, dtype=dtype, **kw), num_classes)


def create_localizer(name: str, num_classes: int = 2, dtype=jnp.bfloat16,
                     **kw) -> nn.Module:
    if name not in LOCALIZER_REGISTRY:
        raise KeyError(
            f"unknown localizer '{name}'; have {sorted(LOCALIZER_REGISTRY)}"
        )
    return LOCALIZER_REGISTRY[name](num_classes=num_classes, dtype=dtype, **kw)
