"""Pretrained-encoder weight import (HF torch checkpoints -> Flax zoo).

The reference's recognizer quality rests on ImageNet-pretrained timm/HF
encoders (models/encoders.py:58 ``pretrained=True``, :84 HF AutoModel).
This module is the TPU-native equivalent of that capability: convert an
HF ConvNeXt (``ConvNextModel``, the checkpoint format of
facebook/convnext-*) or ViT (``ViTModel``, google/vit-*) state dict into
the exact parameter tree of our Flax encoders (models/convnext.py,
models/vit.py), producing a variables msgpack that
``train-recognizer --checkpoint`` warm-starts from.

Parity is architectural, verified by tests/test_import_encoder.py: our
ConvNeXt forward == HF pooler_output and our ViT CLS == HF
last_hidden_state[:, 0] on random weights.  Known, accepted numerical
difference: our LayerNorms use the timm-convention eps=1e-6 while HF ViT
configs default to 1e-12; for trained checkpoints this perturbs outputs
by <0.1% (it only matters when feature variance approaches eps), which
is immaterial for retrieval embeddings and finetuning warm starts.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def _t(w) -> np.ndarray:
    """torch Linear [out, in] -> Flax Dense kernel [in, out]."""
    return np.ascontiguousarray(np.asarray(w, np.float32).T)


def _conv(w) -> np.ndarray:
    """torch Conv2d OIHW -> Flax HWIO."""
    return np.ascontiguousarray(
        np.asarray(w, np.float32).transpose(2, 3, 1, 0))


def _ln(sd, key) -> Dict[str, np.ndarray]:
    return {"scale": np.asarray(sd[f"{key}.weight"], np.float32),
            "bias": np.asarray(sd[f"{key}.bias"], np.float32)}


def convert_hf_convnext(sd: Mapping[str, Any], depths, dims
                        ) -> Dict[str, Any]:
    """HF ConvNextModel state dict -> our ConvNeXt params tree."""
    sd = dict(sd)
    p: Dict[str, Any] = {
        "stem": {"kernel": _conv(sd["embeddings.patch_embeddings.weight"]),
                 "bias": np.asarray(sd["embeddings.patch_embeddings.bias"],
                                    np.float32)},
        "stem_norm": _ln(sd, "embeddings.layernorm"),
        "head_norm": _ln(sd, "layernorm"),
    }
    for i, depth in enumerate(depths):
        if i > 0:
            base = f"encoder.stages.{i}.downsampling_layer"
            p[f"downsample_norm{i}"] = _ln(sd, f"{base}.0")
            p[f"downsample{i}"] = {
                "kernel": _conv(sd[f"{base}.1.weight"]),
                "bias": np.asarray(sd[f"{base}.1.bias"], np.float32),
            }
        for j in range(depth):
            b = f"encoder.stages.{i}.layers.{j}"
            # torch depthwise [dim, 1, 7, 7] -> flax [7, 7, 1, dim]
            dw = np.asarray(sd[f"{b}.dwconv.weight"], np.float32)
            p[f"stage{i}_block{j}"] = {
                "dwconv": {
                    "kernel": np.ascontiguousarray(
                        dw.transpose(2, 3, 1, 0)),
                    "bias": np.asarray(sd[f"{b}.dwconv.bias"], np.float32),
                },
                "LayerNorm_0": _ln(sd, f"{b}.layernorm"),
                "mlp_up": {"kernel": _t(sd[f"{b}.pwconv1.weight"]),
                           "bias": np.asarray(sd[f"{b}.pwconv1.bias"],
                                              np.float32)},
                "mlp_down": {"kernel": _t(sd[f"{b}.pwconv2.weight"]),
                             "bias": np.asarray(sd[f"{b}.pwconv2.bias"],
                                                np.float32)},
                "gamma": np.asarray(sd[f"{b}.layer_scale_parameter"],
                                    np.float32),
            }
    return p


def convert_hf_vit(sd: Mapping[str, Any], depth: int) -> Dict[str, Any]:
    """HF ViTModel state dict -> our ViT params tree (fused qkv)."""
    sd = dict(sd)
    p: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _conv(
                sd["embeddings.patch_embeddings.projection.weight"]),
            "bias": np.asarray(
                sd["embeddings.patch_embeddings.projection.bias"],
                np.float32),
        },
        "cls": np.asarray(sd["embeddings.cls_token"], np.float32),
        "pos": np.asarray(sd["embeddings.position_embeddings"], np.float32),
        "norm": _ln(sd, "layernorm"),
    }
    for i in range(depth):
        b = f"encoder.layer.{i}"
        att = f"{b}.attention.attention"
        qkv_w = np.concatenate(
            [_t(sd[f"{att}.query.weight"]), _t(sd[f"{att}.key.weight"]),
             _t(sd[f"{att}.value.weight"])], axis=1)
        qkv_b = np.concatenate(
            [np.asarray(sd[f"{att}.query.bias"], np.float32),
             np.asarray(sd[f"{att}.key.bias"], np.float32),
             np.asarray(sd[f"{att}.value.bias"], np.float32)])
        p[f"block{i}"] = {
            "LayerNorm_0": _ln(sd, f"{b}.layernorm_before"),
            "SelfAttention_0": {
                "qkv": {"kernel": qkv_w, "bias": qkv_b},
                "proj": {
                    "kernel": _t(sd[f"{b}.attention.output.dense.weight"]),
                    "bias": np.asarray(
                        sd[f"{b}.attention.output.dense.bias"], np.float32),
                },
            },
            "LayerNorm_1": _ln(sd, f"{b}.layernorm_after"),
            "Mlp_0": {
                "Dense_0": {
                    "kernel": _t(sd[f"{b}.intermediate.dense.weight"]),
                    "bias": np.asarray(sd[f"{b}.intermediate.dense.bias"],
                                       np.float32),
                },
                "Dense_1": {
                    "kernel": _t(sd[f"{b}.output.dense.weight"]),
                    "bias": np.asarray(sd[f"{b}.output.dense.bias"],
                                       np.float32),
                },
            },
        }
    return p


def _load_hf_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    st = os.path.join(model_dir, "model.safetensors")
    bn = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(st):
        from safetensors.numpy import load_file

        sd = load_file(st)
    elif os.path.exists(bn):
        import torch

        sd = {k: v.numpy() for k, v in
              torch.load(bn, map_location="cpu", weights_only=True).items()}
    else:
        raise FileNotFoundError(
            f"no model.safetensors or pytorch_model.bin in {model_dir}")
    # bare-model checkpoints may carry the model-type prefix
    for prefix in ("convnext.", "vit."):
        if any(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):] if k.startswith(prefix) else k: v
                  for k, v in sd.items()}
    return sd


def import_hf_encoder(model_dir: str, arch: Optional[str] = None
                      ) -> Tuple[Any, str, int]:
    """HF checkpoint dir -> (variables, registry arch name, image_size).

    The converted tree is substituted into a fresh ``create_encoder``
    init, which validates structure and shapes (flax raises on any
    mismatch when the trainer later restores by template).
    """
    import jax
    import jax.numpy as jnp

    from effocr_tpu.models.factory import create_encoder

    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    sd = _load_hf_state_dict(model_dir)
    model_type = cfg.get("model_type", "")

    if model_type == "convnext":
        depths = list(cfg["depths"])
        dims = list(cfg["hidden_sizes"])
        presets = {
            ((2, 2, 6, 2), (40, 80, 160, 320)): "convnext_atto",
            ((2, 2, 6, 2), (48, 96, 192, 384)): "convnext_femto",
            ((2, 2, 8, 2), (80, 160, 320, 640)): "convnext_nano",
            ((3, 3, 9, 3), (96, 192, 384, 768)): "convnext_tiny",
            ((3, 3, 27, 3), (96, 192, 384, 768)): "convnext_small",
        }
        name = arch or presets.get((tuple(depths), tuple(dims)))
        if name is None:
            raise ValueError(
                f"no registry preset for ConvNeXt depths={depths} "
                f"dims={dims}; pass --arch to override")
        params = convert_hf_convnext(sd, depths, dims)
        image_size = int(cfg.get("image_size", 224))
    elif model_type == "vit":
        depth = int(cfg["num_hidden_layers"])
        key = (int(cfg["hidden_size"]), depth,
               int(cfg["num_attention_heads"]), int(cfg["patch_size"]))
        presets = {(192, 12, 3, 16): "vit_tiny_patch16_224",
                   (384, 12, 6, 16): "vit_small_patch16_224"}
        name = arch or presets.get(key)
        if name is None:
            raise ValueError(
                f"no registry preset for ViT (dim, depth, heads, patch)="
                f"{key}; pass --arch to override")
        params = convert_hf_vit(sd, depth)
        image_size = int(cfg.get("image_size", 224))
    else:
        raise ValueError(
            f"unsupported model_type {model_type!r} (have: convnext, vit)")

    model = create_encoder(name)
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, image_size, image_size, 3), jnp.float32),
        train=False)
    # shape/structure validation against the live module
    import flax

    ref_shapes = flax.core.unfreeze(
        jax.tree.map(lambda a: a.shape, init["params"]))
    got_shapes = jax.tree.map(lambda a: a.shape, params)
    if ref_shapes != got_shapes:
        raise ValueError(
            "converted tree does not match the registry module:\n"
            f"expected {ref_shapes}\ngot {got_shapes}")
    variables = dict(init)
    variables["params"] = jax.tree.map(jnp.asarray, params)
    return variables, name, image_size
