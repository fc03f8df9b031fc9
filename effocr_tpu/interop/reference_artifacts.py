"""Importers for the reference's trained-artifact formats.

The reference's artifact contract (infer_effocr_onnx_multi.py:401-419,
496-510) is a ``recognizer_dir`` holding:

- ``enc_best.pth``  — torch state dict of a timm encoder
  (models/encoders.py:58 ``timm.create_model(..., num_classes=0)``,
  saved at train_effocr_recognizer.py:364-366),
- ``ref.index``     — FAISS ``IndexFlatIP`` over L2-normalized glyph
  prototype embeddings (train_effocr_recognizer.py:47-62),
- ``ref.txt``       — newline-separated char per index row.

This module converts that directory into our native artifact layout
(enc_best.msgpack + model.json + ref.npz/ref.txt) WITHOUT faiss, timm, or
onnxruntime installed: the FAISS flat-index binary format is parsed
directly, and timm state-dict naming is mapped onto our Flax trees.
``cli/infer.py`` auto-converts reference dirs on first use.

Supported encoders: timm ConvNeXt family (convnext_atto..small), timm
MobileNetV3-Small (050/100), and timm/facebook XCiT p8 (tiny/small — the
paper's strongest encoder, models/encoders.py:6-29; patch-embed BNs are
folded and the Fourier positional encoding is baked into our table).
``enc_best.onnx``-only dirs are parsed by interop/onnx_import.py (a
first-party protobuf walk; no onnxruntime needed).
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Dict, List, Mapping, Optional, Tuple

import numpy as np

from effocr_tpu.models.import_weights import _conv, _ln, _t

# --------------------------------------------------------------------- faiss

_FLAT_FOURCC = {b"IxFI": "ip", b"IxF2": "l2", b"IxFl": "flat"}


def read_faiss_flat_index(path: str) -> Tuple[np.ndarray, str]:
    """Parse a serialized FAISS ``IndexFlat`` (``faiss.write_index`` file).

    Layout (faiss/impl/index_write.cpp): fourcc (4 bytes, IxFI = inner
    product / IxF2 = L2 / IxFl = other), then the index header — int32 d,
    int64 ntotal, two int64 dummies, bool is_trained, int32 metric_type —
    then the vector blob: uint64 element count + raw data.  Modern faiss
    stores ``codes`` as a byte vector (count == ntotal*d*4); pre-1.7
    stored ``xb`` as a float vector (count == ntotal*d).  Both are read.

    Returns (embeddings [ntotal, d] float32, metric name).
    """
    with open(path, "rb") as f:
        blob = f.read()
    if len(blob) < 33:
        raise ValueError(f"{path}: too short to be a FAISS flat index")
    fourcc = blob[:4]
    if fourcc not in _FLAT_FOURCC:
        raise ValueError(
            f"{path}: fourcc {fourcc!r} is not a flat index "
            f"(IndexFlatIP/IndexFlatL2); other index types are not "
            f"supported — rebuild with IndexFlatIP like the reference "
            f"(train_effocr_recognizer.py:49)")
    off = 4
    d, = struct.unpack_from("<i", blob, off); off += 4
    ntotal, = struct.unpack_from("<q", blob, off); off += 8
    off += 16                       # two idx_t dummies (1 << 20 each)
    off += 1                        # is_trained (bool)
    metric_type, = struct.unpack_from("<i", blob, off); off += 4
    if metric_type > 1:             # metric_arg only written for metric > 1
        off += 4
    count, = struct.unpack_from("<Q", blob, off); off += 8
    need_f32 = d * ntotal
    if count == need_f32 * 4:       # codes: byte vector
        raw = blob[off : off + count]
    elif count == need_f32:         # legacy xb: float vector
        raw = blob[off : off + count * 4]
    else:
        raise ValueError(
            f"{path}: vector count {count} inconsistent with "
            f"d={d} ntotal={ntotal}")
    if len(raw) < need_f32 * 4:
        raise ValueError(f"{path}: truncated vector data")
    emb = np.frombuffer(raw, dtype="<f4").reshape(ntotal, d).copy()
    metric = {0: "ip", 1: "l2"}.get(metric_type, "other")
    return emb, metric


def load_reference_ref_txt(path: str) -> List[str]:
    """Char per index row; line-based like our retrieval/index.py loader
    (``.split()`` would swallow whitespace chars that font-coverage
    charsets contain and shift every later row)."""
    chars: List[str] = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if line:
                chars.append(line[0] if len(line) > 1 else line)
    return chars


# ----------------------------------------------------------- timm state dicts

def _bn(sd: Mapping[str, Any], key: str
        ) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """torch BatchNorm -> (params {scale, bias}, stats {mean, var})."""
    return (
        {"scale": np.asarray(sd[f"{key}.weight"], np.float32),
         "bias": np.asarray(sd[f"{key}.bias"], np.float32)},
        {"mean": np.asarray(sd[f"{key}.running_mean"], np.float32),
         "var": np.asarray(sd[f"{key}.running_var"], np.float32)},
    )


def detect_timm_arch(sd: Mapping[str, Any]) -> str:
    """Registry arch name from a timm state dict's keys/shapes."""
    if "stem.0.weight" in sd and "stages.0.blocks.0.conv_dw.weight" in sd:
        dims = tuple(
            int(sd[f"stages.{i}.blocks.0.conv_dw.weight"].shape[0])
            for i in range(4)
        )
        depths = tuple(
            sum(1 for k in sd
                if k.startswith(f"stages.{i}.blocks.")
                and k.endswith(".conv_dw.weight"))
            for i in range(4)
        )
        presets = {
            ((2, 2, 6, 2), (40, 80, 160, 320)): "convnext_atto",
            ((2, 2, 6, 2), (48, 96, 192, 384)): "convnext_femto",
            ((2, 2, 8, 2), (80, 160, 320, 640)): "convnext_nano",
            ((3, 3, 9, 3), (96, 192, 384, 768)): "convnext_tiny",
            ((3, 3, 27, 3), (96, 192, 384, 768)): "convnext_small",
        }
        name = presets.get((depths, dims))
        if name is None:
            raise ValueError(
                f"unrecognized timm ConvNeXt depths={depths} dims={dims}")
        return name
    if "conv_stem.weight" in sd:
        stem = int(sd["conv_stem.weight"].shape[0])
        if stem == 8:
            return "mobilenetv3_small_050"
        if stem == 16:
            return "mobilenetv3_small_100"
        raise ValueError(f"unrecognized MobileNetV3 stem width {stem}")
    if "cls_token" in sd and "blocks.0.attn.temperature" in sd:
        dim = int(np.shape(sd["cls_token"])[-1])
        heads = int(np.shape(sd["blocks.0.attn.temperature"])[0])
        depth = sum(1 for k in sd if k.endswith(".attn.temperature")
                    and k.startswith("blocks."))
        n_convs = sum(
            1 for k in range(0, 8, 2)
            if f"patch_embed.proj.{k}.0.weight" in sd
        )
        patch = 2 ** n_convs
        presets = {
            (384, 12, 8, 8): "xcit_small_12_p8_224",
            (192, 12, 4, 8): "xcit_tiny_12_p8_224",
        }
        name = presets.get((dim, depth, heads, patch))
        if name is None:
            raise ValueError(
                f"unrecognized XCiT dim={dim} depth={depth} heads={heads} "
                f"patch={patch}")
        return name
    raise ValueError(
        "state dict is neither timm ConvNeXt (stages.*.blocks.*), timm "
        "MobileNetV3 (conv_stem.*), nor XCiT (cls_token + "
        "blocks.*.attn.temperature); pass --arch and use import-encoder "
        "for HF-layout checkpoints")


def convert_timm_convnext(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """timm ConvNeXt state dict -> our ConvNeXt params tree.

    timm naming: stem.{0 conv,1 norm}, stages.{i}.downsample.{0 norm,
    1 conv} (i>0), stages.{i}.blocks.{j}.{conv_dw,norm,mlp.fc1,mlp.fc2,
    gamma}, head.norm (num_classes=0 keeps head.norm, drops head.fc).
    """
    sd = dict(sd)
    head_norm = "head.norm" if "head.norm.weight" in sd else "norm"
    p: Dict[str, Any] = {
        "stem": {"kernel": _conv(sd["stem.0.weight"]),
                 "bias": np.asarray(sd["stem.0.bias"], np.float32)},
        "stem_norm": _ln(sd, "stem.1"),
        "head_norm": _ln(sd, head_norm),
    }
    n_stages = sum(
        1 for i in range(8) if f"stages.{i}.blocks.0.conv_dw.weight" in sd
    )
    for i in range(n_stages):
        if i > 0:
            p[f"downsample_norm{i}"] = _ln(sd, f"stages.{i}.downsample.0")
            p[f"downsample{i}"] = {
                "kernel": _conv(sd[f"stages.{i}.downsample.1.weight"]),
                "bias": np.asarray(sd[f"stages.{i}.downsample.1.bias"],
                                   np.float32),
            }
        j = 0
        while f"stages.{i}.blocks.{j}.conv_dw.weight" in sd:
            b = f"stages.{i}.blocks.{j}"
            dw = np.asarray(sd[f"{b}.conv_dw.weight"], np.float32)
            gamma_key = (f"{b}.gamma" if f"{b}.gamma" in sd
                         else f"{b}.weight")  # timm >=0.9 renamed
            p[f"stage{i}_block{j}"] = {
                "dwconv": {
                    "kernel": np.ascontiguousarray(dw.transpose(2, 3, 1, 0)),
                    "bias": np.asarray(sd[f"{b}.conv_dw.bias"], np.float32),
                },
                "LayerNorm_0": _ln(sd, f"{b}.norm"),
                "mlp_up": {"kernel": _t(sd[f"{b}.mlp.fc1.weight"]),
                           "bias": np.asarray(sd[f"{b}.mlp.fc1.bias"],
                                              np.float32)},
                "mlp_down": {"kernel": _t(sd[f"{b}.mlp.fc2.weight"]),
                             "bias": np.asarray(sd[f"{b}.mlp.fc2.bias"],
                                                np.float32)},
                "gamma": np.asarray(sd[gamma_key], np.float32),
            }
            j += 1
    return p


def convert_timm_mobilenetv3(sd: Mapping[str, Any]
                             ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """timm MobileNetV3-Small state dict -> (params, batch_stats).

    timm naming (efficientnet builder): conv_stem/bn1; blocks.{stage}.{j}
    where block 0.0 is DepthwiseSeparable (conv_dw/bn1/se/conv_pw/bn2),
    inverted residuals are conv_pw(expand)/bn1/conv_dw/bn2/se/conv_pwl
    (project)/bn3, and the trailing ConvBnAct stage is conv/bn1; then
    global pool and conv_head (1x1 with bias, timm applies it after
    pooling like our Dense head).  SE convs: se.conv_reduce/se.conv_expand.
    """
    sd = dict(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["stem"] = {"kernel": _conv(sd["conv_stem.weight"])}
    params["stem_bn"], stats["stem_bn"] = _bn(sd, "bn1")

    def se_tree(prefix: str) -> Dict[str, Any]:
        return {
            "reduce": {
                "kernel": _conv(sd[f"{prefix}.conv_reduce.weight"]),
                "bias": np.asarray(sd[f"{prefix}.conv_reduce.bias"],
                                   np.float32),
            },
            "expand": {
                "kernel": _conv(sd[f"{prefix}.conv_expand.weight"]),
                "bias": np.asarray(sd[f"{prefix}.conv_expand.bias"],
                                   np.float32),
            },
        }

    flat = 0
    stage = 0
    while any(k.startswith(f"blocks.{stage}.") for k in sd):
        j = 0
        while any(k.startswith(f"blocks.{stage}.{j}.") for k in sd):
            b = f"blocks.{stage}.{j}"
            if f"{b}.conv.weight" in sd:        # trailing ConvBnAct
                params["last_conv"] = {"kernel": _conv(sd[f"{b}.conv.weight"])}
                params["last_bn"], stats["last_bn"] = _bn(sd, f"{b}.bn1")
                j += 1
                continue
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            if f"{b}.conv_pwl.weight" in sd:    # InvertedResidual (expand)
                bp["expand"] = {"kernel": _conv(sd[f"{b}.conv_pw.weight"])}
                bp["expand_bn"], bs["expand_bn"] = _bn(sd, f"{b}.bn1")
                dw_bn, pr_bn, project = f"{b}.bn2", f"{b}.bn3", "conv_pwl"
            else:                               # DepthwiseSeparable
                dw_bn, pr_bn, project = f"{b}.bn1", f"{b}.bn2", "conv_pw"
            dw = np.asarray(sd[f"{b}.conv_dw.weight"], np.float32)
            bp["dw"] = {
                "kernel": np.ascontiguousarray(dw.transpose(2, 3, 1, 0))
            }
            bp["dw_bn"], bs["dw_bn"] = _bn(sd, dw_bn)
            if f"{b}.se.conv_reduce.weight" in sd:
                bp["SqueezeExcite_0"] = se_tree(f"{b}.se")
            bp["project"] = {"kernel": _conv(sd[f"{b}.{project}.weight"])}
            bp["project_bn"], bs["project_bn"] = _bn(sd, pr_bn)
            params[f"block{flat}"] = bp
            stats[f"block{flat}"] = bs
            flat += 1
            j += 1
        stage += 1

    params["head"] = {
        "kernel": np.ascontiguousarray(
            np.asarray(sd["conv_head.weight"], np.float32)[:, :, 0, 0].T),
        "bias": np.asarray(sd["conv_head.bias"], np.float32),
    }
    return params, stats


def _xcit_fourier_pos(sd, prefix: str, hw: int, dim: int) -> np.ndarray:
    """Bake timm's PositionalEncodingFourier output into a [1, hw*hw, dim]
    table (timm xcit.py: sinusoidal features of normalized grid coords
    through the learned 1x1 ``token_projection``).  Our XCiT stores the
    positional encoding as a table, so at a fixed grid size the baked
    values are exactly timm's."""
    proj_w = np.asarray(sd[f"{prefix}.token_projection.weight"], np.float32)
    proj_b = np.asarray(sd[f"{prefix}.token_projection.bias"], np.float32)
    hidden = proj_w.shape[1] // 2
    scale = 2.0 * np.pi
    eps = 1e-6
    coord = (np.arange(1, hw + 1, dtype=np.float32) / (hw + eps)) * scale
    y_embed = np.broadcast_to(coord[:, None], (hw, hw))
    x_embed = np.broadcast_to(coord[None, :], (hw, hw))
    dim_t = np.arange(hidden, dtype=np.float32)
    dim_t = 10000.0 ** (2.0 * (dim_t // 2) / hidden)

    def feats(embed):
        p = embed[:, :, None] / dim_t                       # [hw, hw, hidden]
        return np.stack(
            [np.sin(p[:, :, 0::2]), np.cos(p[:, :, 1::2])], axis=3
        ).reshape(hw, hw, hidden)

    pos = np.concatenate([feats(y_embed), feats(x_embed)], axis=2)
    out = pos @ proj_w[:, :, 0, 0].T + proj_b               # [hw, hw, dim]
    return out.reshape(1, hw * hw, dim).astype(np.float32)


def convert_timm_xcit(sd: Mapping[str, Any], image_size: int = 224
                      ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """timm/facebook XCiT state dict -> (params, batch_stats) for our XCiT.

    timm naming (xcit.py; the facebook DINO repo the reference wraps at
    models/encoders.py:6-29 differs only in the positional-encoder
    attribute name): patch_embed.proj.{0,2,4}.{0 conv,1 bn} with GELU
    between stages, pos_embed.token_projection, cls_token,
    blocks.{i}.{norm1,attn.{qkv,proj,temperature},norm3,
    local_mp.{conv1,bn,conv2},norm2,mlp.{fc1,fc2},gamma1,gamma2,gamma3},
    cls_attn_blocks.{i}.{norm1,attn.{q,k,v,proj},norm2,mlp,gamma1,gamma2},
    norm.  Patch-embed BatchNorms are folded into the convs (exact in
    eval); the Fourier positional encoding is baked at ``image_size``.
    """
    sd = dict(sd)
    dim = int(np.shape(sd["cls_token"])[-1])
    heads = int(np.shape(sd["blocks.0.attn.temperature"])[0])
    n_convs = sum(1 for k in range(0, 8, 2)
                  if f"patch_embed.proj.{k}.0.weight" in sd)
    patch = 2 ** n_convs
    hw = image_size // patch
    pos_prefix = ("pos_embed" if "pos_embed.token_projection.weight" in sd
                  else "pos_embeder")

    def dense(key):
        return {"kernel": _t(sd[f"{key}.weight"]),
                "bias": np.asarray(sd[f"{key}.bias"], np.float32)}

    def dwconv(key):
        w = np.asarray(sd[f"{key}.weight"], np.float32)     # [d, 1, 3, 3]
        return {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
                "bias": np.asarray(sd[f"{key}.bias"], np.float32)}

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(n_convs):
        k = 2 * i
        w = np.asarray(sd[f"patch_embed.proj.{k}.0.weight"], np.float32)
        bn_w = np.asarray(sd[f"patch_embed.proj.{k}.1.weight"], np.float32)
        bn_b = np.asarray(sd[f"patch_embed.proj.{k}.1.bias"], np.float32)
        mean = np.asarray(sd[f"patch_embed.proj.{k}.1.running_mean"],
                          np.float32)
        var = np.asarray(sd[f"patch_embed.proj.{k}.1.running_var"],
                         np.float32)
        s = bn_w / np.sqrt(var + 1e-5)                       # BN2d eps
        conv_b = np.asarray(
            sd.get(f"patch_embed.proj.{k}.0.bias", np.zeros(w.shape[0])),
            np.float32)
        params[f"patch_conv{i}"] = {
            "kernel": _conv(w * s[:, None, None, None]),
            "bias": (conv_b - mean) * s + bn_b,
        }
    params["pos"] = _xcit_fourier_pos(sd, pos_prefix, hw, dim)
    params["cls"] = np.asarray(sd["cls_token"], np.float32)

    i = 0
    while f"blocks.{i}.attn.temperature" in sd:
        b = f"blocks.{i}"
        params[f"block{i}"] = {
            "LayerNorm_0": _ln(sd, f"{b}.norm1"),
            "XCA_0": {
                "qkv": dense(f"{b}.attn.qkv"),
                "proj": dense(f"{b}.attn.proj"),
                "temperature": np.asarray(sd[f"{b}.attn.temperature"],
                                          np.float32),
            },
            "LayerNorm_1": _ln(sd, f"{b}.norm3"),
            "LPI_0": {
                "conv1": dwconv(f"{b}.local_mp.conv1"),
                "bn": {
                    "scale": np.asarray(sd[f"{b}.local_mp.bn.weight"],
                                        np.float32),
                    "bias": np.asarray(sd[f"{b}.local_mp.bn.bias"],
                                       np.float32),
                },
                "conv2": dwconv(f"{b}.local_mp.conv2"),
            },
            "LayerNorm_2": _ln(sd, f"{b}.norm2"),
            "Mlp_0": {"Dense_0": dense(f"{b}.mlp.fc1"),
                      "Dense_1": dense(f"{b}.mlp.fc2")},
            "gamma1": np.asarray(sd[f"{b}.gamma1"], np.float32),
            "gamma2": np.asarray(sd[f"{b}.gamma2"], np.float32),
            "gamma3": np.asarray(sd[f"{b}.gamma3"], np.float32),
        }
        stats[f"block{i}"] = {"LPI_0": {"bn": {
            "mean": np.asarray(sd[f"{b}.local_mp.bn.running_mean"],
                               np.float32),
            "var": np.asarray(sd[f"{b}.local_mp.bn.running_var"],
                              np.float32),
        }}}
        i += 1

    i = 0
    while (f"cls_attn_blocks.{i}.norm1.weight" in sd):
        b = f"cls_attn_blocks.{i}"
        if f"{b}.attn.qkv.weight" in sd:     # merged-qkv variants: split
            qkv_w = np.asarray(sd[f"{b}.attn.qkv.weight"], np.float32)
            qkv_b = np.asarray(sd[f"{b}.attn.qkv.bias"], np.float32)
            for j, nm in enumerate(("q", "k", "v")):
                sd[f"{b}.attn.{nm}.weight"] = qkv_w[j * dim:(j + 1) * dim]
                sd[f"{b}.attn.{nm}.bias"] = qkv_b[j * dim:(j + 1) * dim]
        params[f"cls_block{i}"] = {
            "LayerNorm_0": _ln(sd, f"{b}.norm1"),
            "q": dense(f"{b}.attn.q"),
            "k": dense(f"{b}.attn.k"),
            "v": dense(f"{b}.attn.v"),
            "proj": dense(f"{b}.attn.proj"),
            "LayerNorm_1": _ln(sd, f"{b}.norm2"),
            "Mlp_0": {"Dense_0": dense(f"{b}.mlp.fc1"),
                      "Dense_1": dense(f"{b}.mlp.fc2")},
            "gamma1": np.asarray(sd[f"{b}.gamma1"], np.float32),
            "gamma2": np.asarray(sd[f"{b}.gamma2"], np.float32),
        }
        i += 1

    params["norm"] = _ln(sd, "norm")
    return params, stats


# ------------------------------------------------------------- directory glue

def import_reference_recognizer_dir(
    src_dir: str,
    out_dir: Optional[str] = None,
    arch: Optional[str] = None,
    image_size: int = 224,
) -> str:
    """Convert a reference-format recognizer_dir into our artifact layout.

    Reads enc_best.pth (timm state dict) + ref.index (FAISS IndexFlatIP) +
    ref.txt; writes enc_best.msgpack, model.json, ref.npz, ref.txt into
    ``out_dir`` (default: <src_dir>/tpu_converted).  Returns out_dir.
    """
    import jax
    import jax.numpy as jnp
    import torch

    from effocr_tpu.models.factory import create_encoder
    from effocr_tpu.retrieval.index import PrototypeIndex
    from effocr_tpu.train import checkpoint as ckpt

    pth = os.path.join(src_dir, "enc_best.pth")
    onnx_path = os.path.join(src_dir, "enc_best.onnx")
    if os.path.exists(pth):
        sd = torch.load(pth, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        # reference saves via nn.DataParallel at >1 GPU -> "module." prefix
        sd = {k[7:] if k.startswith("module.") else k: v
              for k, v in sd.items()}
        sd = {k: np.asarray(v, np.float32) if hasattr(v, "numpy") else v
              for k, v in sd.items()}
    elif os.path.exists(onnx_path):
        # ONNX-only dirs are a valid reference layout
        # (infer_effocr_onnx_multi.py:416-419); first-party protobuf walk,
        # no onnx/onnxruntime needed
        from effocr_tpu.interop.onnx_import import onnx_to_state_dict

        sd = onnx_to_state_dict(onnx_path)
    else:
        raise FileNotFoundError(
            f"{src_dir}: neither enc_best.pth nor enc_best.onnx")

    name = arch or detect_timm_arch(sd)
    if name.startswith("convnext"):
        params = convert_timm_convnext(sd)
        batch_stats: Dict[str, Any] = {}
    elif name.startswith("mobilenetv3"):
        params, batch_stats = convert_timm_mobilenetv3(sd)
    elif name.startswith("xcit"):
        params, batch_stats = convert_timm_xcit(sd, image_size)
    else:
        raise ValueError(f"unsupported arch {name!r} for timm import")

    kw: Dict[str, Any] = {}
    if name.startswith("mobilenetv3"):
        # timm's conv_head width is a checkpoint property (1024 for the
        # stock smalls, but reduced-width exports exist)
        kw["head_features"] = int(np.shape(params["head"]["bias"])[0])
    model = create_encoder(name, **kw)
    init = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, image_size, image_size, 3), jnp.float32), train=False)
    import flax

    ref_shapes = flax.core.unfreeze(
        jax.tree.map(lambda a: a.shape, init["params"]))
    got_shapes = jax.tree.map(lambda a: np.shape(a), params)
    if ref_shapes != got_shapes:
        raise ValueError(
            "converted tree does not match the registry module:\n"
            f"expected {ref_shapes}\ngot {got_shapes}")
    variables: Dict[str, Any] = {"params": jax.tree.map(jnp.asarray, params)}
    if batch_stats:
        variables["batch_stats"] = jax.tree.map(jnp.asarray, batch_stats)

    out_dir = out_dir or os.path.join(src_dir, "tpu_converted")
    os.makedirs(out_dir, exist_ok=True)
    ckpt.save_variables(variables, ckpt.best_checkpoint_path(out_dir))
    with open(os.path.join(out_dir, "model.json"), "w") as f:
        json.dump({"arch": name, "image_size": image_size,
                   "num_classes": None, "input_channels": 3,
                   # reference inference always cuts full-line-height
                   # crops (infer_effocr_onnx_multi.py:313-316), so a
                   # working reference artifact implies line geometry
                   "crop_geometry": "line",
                   "imported_from": os.path.abspath(src_dir)}, f)

    idx_path = os.path.join(src_dir, "ref.index")
    txt_path = os.path.join(src_dir, "ref.txt")
    if os.path.exists(idx_path) and os.path.exists(txt_path):
        emb, metric = read_faiss_flat_index(idx_path)
        if metric == "l2":
            raise ValueError(
                f"{idx_path} is an L2 index; the reference builds "
                "IndexFlatIP over L2-normalized embeddings "
                "(train_effocr_recognizer.py:49)")
        chars = load_reference_ref_txt(txt_path)
        if len(chars) != emb.shape[0]:
            raise ValueError(
                f"ref.txt rows ({len(chars)}) != index rows "
                f"({emb.shape[0]})")
        PrototypeIndex(emb, chars).save(out_dir)
    return out_dir


def maybe_convert_reference_dir(recognizer_dir: str) -> str:
    """infer's auto-convert hook: if the dir is reference-format (no
    enc_best.msgpack, has enc_best.pth), convert once into
    <dir>/tpu_converted and return that; otherwise return the dir."""
    from effocr_tpu.train import checkpoint as ckpt

    if os.path.exists(ckpt.best_checkpoint_path(recognizer_dir)):
        return recognizer_dir
    if (os.path.exists(os.path.join(recognizer_dir, "enc_best.pth"))
            or os.path.exists(os.path.join(recognizer_dir,
                                           "enc_best.onnx"))):
        out = os.path.join(recognizer_dir, "tpu_converted")
        if not os.path.exists(ckpt.best_checkpoint_path(out)):
            print(f"converting reference-format recognizer_dir "
                  f"{recognizer_dir} -> {out}")
            import_reference_recognizer_dir(recognizer_dir, out)
        return out
    return recognizer_dir
