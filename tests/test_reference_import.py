"""Reference-artifact import parity (interop/reference_artifacts.py).

The reference's artifact contract: recognizer_dir with enc_best.pth (timm
state dict, train_effocr_recognizer.py:364-366) + FAISS ref.index +
ref.txt (infer_effocr_onnx_multi.py:401-419,496-510).

timm parity is checked against independent torch mirrors of the timm
forward passes (timm itself is not installed here), built from the same
state dicts the converter reads — the torch conv/LN/BN ops are an
implementation independent of our Flax stack.
"""

import os
import struct

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from effocr_tpu.interop.reference_artifacts import (  # noqa: E402
    convert_timm_convnext,
    convert_timm_mobilenetv3,
    detect_timm_arch,
    import_reference_recognizer_dir,
    load_reference_ref_txt,
    maybe_convert_reference_dir,
    read_faiss_flat_index,
)

# ------------------------------------------------------------------ helpers


def write_faiss_flat(path, emb, metric=0, legacy=False):
    """Serialize [n, d] float32 the way faiss write_index does for
    IndexFlat (faiss/impl/index_write.cpp): fourcc, header, vector blob.
    legacy=True writes the pre-1.7 float-count layout."""
    n, d = emb.shape
    fourcc = b"IxFI" if metric == 0 else b"IxF2"
    buf = bytearray()
    buf += fourcc
    buf += struct.pack("<i", d)
    buf += struct.pack("<q", n)
    buf += struct.pack("<qq", 1 << 20, 1 << 20)
    buf += b"\x01"                      # is_trained
    buf += struct.pack("<i", metric)
    data = np.ascontiguousarray(emb, dtype="<f4").tobytes()
    buf += struct.pack("<Q", n * d if legacy else n * d * 4)
    buf += data
    with open(path, "wb") as f:
        f.write(bytes(buf))


def _r(rng, *shape):
    return (rng.normal(size=shape) * 0.05).astype(np.float32)


def make_timm_convnext_sd(rng, depths, dims):
    sd = {
        "stem.0.weight": _r(rng, dims[0], 3, 4, 4),
        "stem.0.bias": _r(rng, dims[0]),
        "stem.1.weight": 1 + _r(rng, dims[0]),
        "stem.1.bias": _r(rng, dims[0]),
        "head.norm.weight": 1 + _r(rng, dims[-1]),
        "head.norm.bias": _r(rng, dims[-1]),
    }
    for i, (depth, d) in enumerate(zip(depths, dims)):
        if i > 0:
            sd[f"stages.{i}.downsample.0.weight"] = 1 + _r(rng, dims[i - 1])
            sd[f"stages.{i}.downsample.0.bias"] = _r(rng, dims[i - 1])
            sd[f"stages.{i}.downsample.1.weight"] = _r(rng, d, dims[i - 1],
                                                       2, 2)
            sd[f"stages.{i}.downsample.1.bias"] = _r(rng, d)
        for j in range(depth):
            b = f"stages.{i}.blocks.{j}"
            sd[f"{b}.conv_dw.weight"] = _r(rng, d, 1, 7, 7)
            sd[f"{b}.conv_dw.bias"] = _r(rng, d)
            sd[f"{b}.norm.weight"] = 1 + _r(rng, d)
            sd[f"{b}.norm.bias"] = _r(rng, d)
            sd[f"{b}.mlp.fc1.weight"] = _r(rng, 4 * d, d)
            sd[f"{b}.mlp.fc1.bias"] = _r(rng, 4 * d)
            sd[f"{b}.mlp.fc2.weight"] = _r(rng, d, 4 * d)
            sd[f"{b}.mlp.fc2.bias"] = _r(rng, d)
            sd[f"{b}.gamma"] = np.full(d, 0.5, np.float32)
    return sd


def timm_convnext_forward(sd, x):
    """Independent torch mirror of timm ConvNeXt (num_classes=0)."""
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

    def ln(y, key):                      # channels-last LN, eps 1e-6
        y = y.permute(0, 2, 3, 1)
        y = F.layer_norm(y, y.shape[-1:], t[f"{key}.weight"],
                         t[f"{key}.bias"], eps=1e-6)
        return y.permute(0, 3, 1, 2)

    y = F.conv2d(x, t["stem.0.weight"], t["stem.0.bias"], stride=4)
    y = ln(y, "stem.1")
    i = 0
    while f"stages.{i}.blocks.0.conv_dw.weight" in t:
        if i > 0:
            y = ln(y, f"stages.{i}.downsample.0")
            y = F.conv2d(y, t[f"stages.{i}.downsample.1.weight"],
                         t[f"stages.{i}.downsample.1.bias"], stride=2)
        j = 0
        while f"stages.{i}.blocks.{j}.conv_dw.weight" in t:
            b = f"stages.{i}.blocks.{j}"
            s = y
            y = F.conv2d(y, t[f"{b}.conv_dw.weight"], t[f"{b}.conv_dw.bias"],
                         padding=3, groups=y.shape[1])
            y = y.permute(0, 2, 3, 1)
            y = F.layer_norm(y, y.shape[-1:], t[f"{b}.norm.weight"],
                             t[f"{b}.norm.bias"], eps=1e-6)
            y = F.linear(y, t[f"{b}.mlp.fc1.weight"], t[f"{b}.mlp.fc1.bias"])
            y = F.gelu(y)
            y = F.linear(y, t[f"{b}.mlp.fc2.weight"], t[f"{b}.mlp.fc2.bias"])
            y = (y * t[f"{b}.gamma"]).permute(0, 3, 1, 2)
            y = s + y
            j += 1
        i += 1
    y = y.mean(dim=(2, 3))
    return F.layer_norm(y, y.shape[-1:], t["head.norm.weight"],
                        t["head.norm.bias"], eps=1e-6)


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


MNV3_SPECS = [  # kernel, exp, out, se, act, stride (models/mobilenetv3.py)
    (3, 16, 16, True, "relu", 2),
    (3, 72, 24, False, "relu", 2),
    (3, 88, 24, False, "relu", 1),
    (5, 96, 40, True, "hswish", 2),
    (5, 240, 40, True, "hswish", 1),
    (5, 240, 40, True, "hswish", 1),
    (5, 120, 48, True, "hswish", 1),
    (5, 144, 48, True, "hswish", 1),
    (5, 288, 96, True, "hswish", 2),
    (5, 576, 96, True, "hswish", 1),
    (5, 576, 96, True, "hswish", 1),
]
# timm stage grouping for mobilenetv3_small_*: blocks.{stage}.{j}
MNV3_STAGES = [(0,), (1, 2), (3, 4, 5), (6, 7), (8, 9, 10)]


def make_timm_mnv3_sd(rng, multiplier=0.5, head=1024):
    md = _make_divisible
    stem = md(16 * multiplier)
    sd = {
        "conv_stem.weight": _r(rng, stem, 3, 3, 3),
        "bn1.weight": 1 + _r(rng, stem), "bn1.bias": _r(rng, stem),
        "bn1.running_mean": _r(rng, stem),
        "bn1.running_var": 1 + np.abs(_r(rng, stem)),
    }

    def bn(key, c):
        sd[f"{key}.weight"] = 1 + _r(rng, c)
        sd[f"{key}.bias"] = _r(rng, c)
        sd[f"{key}.running_mean"] = _r(rng, c)
        sd[f"{key}.running_var"] = 1 + np.abs(_r(rng, c))

    def se(key, c):
        r = md(c / 4)
        sd[f"{key}.conv_reduce.weight"] = _r(rng, r, c, 1, 1)
        sd[f"{key}.conv_reduce.bias"] = _r(rng, r)
        sd[f"{key}.conv_expand.weight"] = _r(rng, c, r, 1, 1)
        sd[f"{key}.conv_expand.bias"] = _r(rng, c)

    in_c = stem
    for stage, idxs in enumerate(MNV3_STAGES):
        for j, flat in enumerate(idxs):
            k, exp, out, use_se, act, stride = MNV3_SPECS[flat]
            exp_c, out_c = md(exp * multiplier), md(out * multiplier)
            b = f"blocks.{stage}.{j}"
            if exp_c == in_c:            # DepthwiseSeparable
                sd[f"{b}.conv_dw.weight"] = _r(rng, exp_c, 1, k, k)
                bn(f"{b}.bn1", exp_c)
                if use_se:
                    se(f"{b}.se", exp_c)
                sd[f"{b}.conv_pw.weight"] = _r(rng, out_c, exp_c, 1, 1)
                bn(f"{b}.bn2", out_c)
            else:                        # InvertedResidual
                sd[f"{b}.conv_pw.weight"] = _r(rng, exp_c, in_c, 1, 1)
                bn(f"{b}.bn1", exp_c)
                sd[f"{b}.conv_dw.weight"] = _r(rng, exp_c, 1, k, k)
                bn(f"{b}.bn2", exp_c)
                if use_se:
                    se(f"{b}.se", exp_c)
                sd[f"{b}.conv_pwl.weight"] = _r(rng, out_c, exp_c, 1, 1)
                bn(f"{b}.bn3", out_c)
            in_c = out_c
    last = md(576 * multiplier)
    sd[f"blocks.{len(MNV3_STAGES)}.0.conv.weight"] = _r(rng, last, in_c, 1, 1)
    bn(f"blocks.{len(MNV3_STAGES)}.0.bn1", last)
    sd["conv_head.weight"] = _r(rng, head, last, 1, 1)
    sd["conv_head.bias"] = _r(rng, head)
    return sd


def timm_mnv3_forward(sd, x, multiplier=0.5):
    """Independent torch mirror of timm MobileNetV3 (num_classes=0)."""
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}
    hswish = lambda v: v * F.relu6(v + 3.0) / 6.0  # noqa: E731
    hsig = lambda v: F.relu6(v + 3.0) / 6.0        # noqa: E731

    def bn(y, key):
        return F.batch_norm(
            y, t[f"{key}.running_mean"], t[f"{key}.running_var"],
            t[f"{key}.weight"], t[f"{key}.bias"], training=False, eps=1e-5)

    def se(y, key):
        s = y.mean(dim=(2, 3), keepdim=True)
        s = F.relu(F.conv2d(s, t[f"{key}.conv_reduce.weight"],
                            t[f"{key}.conv_reduce.bias"]))
        s = F.conv2d(s, t[f"{key}.conv_expand.weight"],
                     t[f"{key}.conv_expand.bias"])
        return y * hsig(s)

    y = F.conv2d(x, t["conv_stem.weight"], stride=2, padding=1)
    y = hswish(bn(y, "bn1"))
    flat = 0
    for stage, idxs in enumerate(MNV3_STAGES):
        for j, _ in enumerate(idxs):
            k_, exp, out, use_se, act_name, stride = MNV3_SPECS[flat]
            act = F.relu if act_name == "relu" else hswish
            b = f"blocks.{stage}.{j}"
            s_in = y
            if f"{b}.conv_pwl.weight" in t:  # InvertedResidual
                y = act(bn(F.conv2d(y, t[f"{b}.conv_pw.weight"]),
                           f"{b}.bn1"))
                y = F.conv2d(y, t[f"{b}.conv_dw.weight"], stride=stride,
                             padding=k_ // 2, groups=y.shape[1])
                y = act(bn(y, f"{b}.bn2"))
                if use_se:
                    y = se(y, f"{b}.se")
                y = bn(F.conv2d(y, t[f"{b}.conv_pwl.weight"]), f"{b}.bn3")
            else:                            # DepthwiseSeparable
                y = F.conv2d(y, t[f"{b}.conv_dw.weight"], stride=stride,
                             padding=k_ // 2, groups=y.shape[1])
                y = act(bn(y, f"{b}.bn1"))
                if use_se:
                    y = se(y, f"{b}.se")
                y = bn(F.conv2d(y, t[f"{b}.conv_pw.weight"]), f"{b}.bn2")
            if stride == 1 and s_in.shape[1] == y.shape[1]:
                y = y + s_in
            flat += 1
    b = f"blocks.{len(MNV3_STAGES)}.0"
    y = hswish(bn(F.conv2d(y, t[f"{b}.conv.weight"]), f"{b}.bn1"))
    y = y.mean(dim=(2, 3), keepdim=True)
    y = F.conv2d(y, t["conv_head.weight"], t["conv_head.bias"])
    return hswish(y).flatten(1)


# -------------------------------------------------------------------- tests


def test_faiss_flat_reader_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(17, 12)).astype(np.float32)
    for legacy in (False, True):
        p = str(tmp_path / f"ref_{legacy}.index")
        write_faiss_flat(p, emb, metric=0, legacy=legacy)
        got, metric = read_faiss_flat_index(p)
        assert metric == "ip"
        np.testing.assert_array_equal(got, emb)


def test_faiss_reader_rejects_non_flat(tmp_path):
    p = str(tmp_path / "bad.index")
    with open(p, "wb") as f:
        f.write(b"IwFl" + b"\x00" * 64)
    with pytest.raises(ValueError, match="fourcc"):
        read_faiss_flat_index(p)


def test_ref_txt_whitespace_rows(tmp_path):
    p = str(tmp_path / "ref.txt")
    with open(p, "w", encoding="utf-8") as f:
        f.write("a\n \nb\n")          # space char is a real row
    assert load_reference_ref_txt(p) == ["a", " ", "b"]


def test_timm_convnext_parity():
    """Converted timm state dict: our Flax forward == torch mirror."""
    from effocr_tpu.models.convnext import ConvNeXt

    depths, dims = (1, 1, 2, 1), (8, 16, 24, 32)
    rng = np.random.default_rng(3)
    sd = make_timm_convnext_sd(rng, depths, dims)
    params = convert_timm_convnext(sd)
    model = ConvNeXt(depths=depths, dims=dims, dtype=jnp.float32)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                 train=False))
    with torch.no_grad():
        ref = timm_convnext_forward(
            sd, torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_timm_mobilenetv3_parity():
    from effocr_tpu.models.mobilenetv3 import MobileNetV3Small

    rng = np.random.default_rng(4)
    sd = make_timm_mnv3_sd(rng, multiplier=0.5, head=64)
    params, stats = convert_timm_mobilenetv3(sd)
    model = MobileNetV3Small(multiplier=0.5, head_features=64,
                             dtype=jnp.float32)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        train=False))
    with torch.no_grad():
        ref = timm_mnv3_forward(
            sd, torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_detect_timm_arch():
    rng = np.random.default_rng(5)
    assert detect_timm_arch(
        make_timm_convnext_sd(rng, (2, 2, 6, 2), (40, 80, 160, 320))
    ) == "convnext_atto"
    assert detect_timm_arch(make_timm_mnv3_sd(rng)) == (
        "mobilenetv3_small_050")


def test_import_reference_dir_end_to_end(tmp_path):
    """Full reference dir -> our layout; infer's auto-convert hook finds
    and reuses it; prototype chars/embeddings round-trip."""
    from effocr_tpu.models.factory import create_encoder
    from effocr_tpu.retrieval.index import PrototypeIndex
    from effocr_tpu.train import checkpoint as ckpt

    rng = np.random.default_rng(6)
    depths, dims = (2, 2, 6, 2), (40, 80, 160, 320)   # convnext_atto
    sd = make_timm_convnext_sd(rng, depths, dims)
    src = tmp_path / "reference_rec"
    src.mkdir()
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               src / "enc_best.pth")
    emb = rng.normal(size=(5, dims[-1])).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    write_faiss_flat(str(src / "ref.index"), emb)
    with open(src / "ref.txt", "w", encoding="utf-8") as f:
        f.write("\n".join("abcde") + "\n")

    out = import_reference_recognizer_dir(str(src), image_size=64)
    assert out == str(src / "tpu_converted")
    # the auto-convert hook resolves to the converted dir and is idempotent
    assert maybe_convert_reference_dir(str(src)) == out

    index = PrototypeIndex.load(out)
    assert index.chars == list("abcde")
    np.testing.assert_allclose(index.embeddings, emb, rtol=1e-6)

    model = create_encoder("convnext_atto", dtype=jnp.float32)
    import jax

    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    restored = ckpt.load_variables(init, ckpt.best_checkpoint_path(out))
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(model.apply(restored, jnp.asarray(x), train=False))
    with torch.no_grad():
        ref = timm_convnext_forward(
            sd, torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


# ------------------------------------------------------------------- xcit

def make_timm_xcit_sd(rng, dim=16, depth=2, heads=2, cls_depth=2,
                      n_convs=3, hidden=8):
    """Synthetic timm-format XCiT state dict (timm xcit.py naming)."""
    sd = {
        "cls_token": _r(rng, 1, 1, dim),
        "pos_embed.token_projection.weight": _r(rng, dim, 2 * hidden, 1, 1),
        "pos_embed.token_projection.bias": _r(rng, dim),
        "norm.weight": 1 + _r(rng, dim),
        "norm.bias": _r(rng, dim),
    }
    f = dim // 2 ** (n_convs - 1)
    chans = [3] + [min(f * 2 ** i, dim) for i in range(n_convs)]
    for i in range(n_convs):
        k = 2 * i
        sd[f"patch_embed.proj.{k}.0.weight"] = _r(rng, chans[i + 1],
                                                  chans[i], 3, 3)
        sd[f"patch_embed.proj.{k}.1.weight"] = 1 + _r(rng, chans[i + 1])
        sd[f"patch_embed.proj.{k}.1.bias"] = _r(rng, chans[i + 1])
        sd[f"patch_embed.proj.{k}.1.running_mean"] = _r(rng, chans[i + 1])
        sd[f"patch_embed.proj.{k}.1.running_var"] = (
            1 + np.abs(_r(rng, chans[i + 1])))
    for i in range(depth):
        b = f"blocks.{i}"
        for nm in ("norm1", "norm2", "norm3"):
            sd[f"{b}.{nm}.weight"] = 1 + _r(rng, dim)
            sd[f"{b}.{nm}.bias"] = _r(rng, dim)
        sd[f"{b}.attn.qkv.weight"] = _r(rng, 3 * dim, dim)
        sd[f"{b}.attn.qkv.bias"] = _r(rng, 3 * dim)
        sd[f"{b}.attn.temperature"] = 1 + _r(rng, heads, 1, 1)
        sd[f"{b}.attn.proj.weight"] = _r(rng, dim, dim)
        sd[f"{b}.attn.proj.bias"] = _r(rng, dim)
        for c in ("conv1", "conv2"):
            sd[f"{b}.local_mp.{c}.weight"] = _r(rng, dim, 1, 3, 3)
            sd[f"{b}.local_mp.{c}.bias"] = _r(rng, dim)
        sd[f"{b}.local_mp.bn.weight"] = 1 + _r(rng, dim)
        sd[f"{b}.local_mp.bn.bias"] = _r(rng, dim)
        sd[f"{b}.local_mp.bn.running_mean"] = _r(rng, dim)
        sd[f"{b}.local_mp.bn.running_var"] = 1 + np.abs(_r(rng, dim))
        sd[f"{b}.mlp.fc1.weight"] = _r(rng, 4 * dim, dim)
        sd[f"{b}.mlp.fc1.bias"] = _r(rng, 4 * dim)
        sd[f"{b}.mlp.fc2.weight"] = _r(rng, dim, 4 * dim)
        sd[f"{b}.mlp.fc2.bias"] = _r(rng, dim)
        for g in ("gamma1", "gamma2", "gamma3"):
            sd[f"{b}.{g}"] = np.full(dim, 0.5, np.float32)
    for i in range(cls_depth):
        b = f"cls_attn_blocks.{i}"
        for nm in ("norm1", "norm2"):
            sd[f"{b}.{nm}.weight"] = 1 + _r(rng, dim)
            sd[f"{b}.{nm}.bias"] = _r(rng, dim)
        for nm in ("q", "k", "v", "proj"):
            sd[f"{b}.attn.{nm}.weight"] = _r(rng, dim, dim)
            sd[f"{b}.attn.{nm}.bias"] = _r(rng, dim)
        sd[f"{b}.mlp.fc1.weight"] = _r(rng, 4 * dim, dim)
        sd[f"{b}.mlp.fc1.bias"] = _r(rng, 4 * dim)
        sd[f"{b}.mlp.fc2.weight"] = _r(rng, dim, 4 * dim)
        sd[f"{b}.mlp.fc2.bias"] = _r(rng, dim)
        sd[f"{b}.gamma1"] = np.full(dim, 0.5, np.float32)
        sd[f"{b}.gamma2"] = np.full(dim, 0.5, np.float32)
    return sd


def timm_xcit_forward(sd, x, heads=2, tokens_norm=True):
    """Independent torch mirror of timm XCiT (num_classes=0, eval).

    Follows timm xcit.py forward_features/forward_head op for op:
    ConvPatchEmbed (conv-BN(-GELU) x n), PositionalEncodingFourier via
    cumsum-normalized grid coords, XCA blocks (token-normalized Q/K
    cross-covariance attention + LPI + MLP with gamma scales), cls-token
    append, ClassAttentionBlocks (incl. the norm1-token residual and the
    token-doubling residual quirk), final norm, CLS pooling."""
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

    def ln(y, key):
        return F.layer_norm(y, y.shape[-1:], t[f"{key}.weight"],
                            t[f"{key}.bias"], eps=1e-6)

    n_convs = sum(1 for k in range(0, 8, 2)
                  if f"patch_embed.proj.{k}.0.weight" in sd)
    y = x
    for i in range(n_convs):
        k = 2 * i
        y = F.conv2d(y, t[f"patch_embed.proj.{k}.0.weight"], None,
                     stride=2, padding=1)
        y = F.batch_norm(
            y, t[f"patch_embed.proj.{k}.1.running_mean"],
            t[f"patch_embed.proj.{k}.1.running_var"],
            t[f"patch_embed.proj.{k}.1.weight"],
            t[f"patch_embed.proj.{k}.1.bias"], False, 0.1, 1e-5)
        if i < n_convs - 1:
            y = F.gelu(y)
    B, C, H, W = y.shape
    tok = y.flatten(2).transpose(1, 2)                      # [B, N, C]

    # PositionalEncodingFourier (timm xcit.py): cumsum over an all-ones
    # mask, normalized to 2*pi, sin/cos interleave, 1x1 projection
    hidden = t["pos_embed.token_projection.weight"].shape[1] // 2
    not_mask = torch.ones(1, H, W)
    y_embed = not_mask.cumsum(1)
    x_embed = not_mask.cumsum(2)
    scale = 2 * np.pi
    eps = 1e-6
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(hidden, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                        / hidden)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack([pos_x[:, :, :, 0::2].sin(),
                         pos_x[:, :, :, 1::2].cos()], dim=4).flatten(3)
    pos_y = torch.stack([pos_y[:, :, :, 0::2].sin(),
                         pos_y[:, :, :, 1::2].cos()], dim=4).flatten(3)
    pos = torch.cat((pos_y, pos_x), dim=3).permute(0, 3, 1, 2)
    pos = F.conv2d(pos, t["pos_embed.token_projection.weight"],
                   t["pos_embed.token_projection.bias"])
    tok = tok + pos.flatten(2).transpose(1, 2)

    i = 0
    while f"blocks.{i}.attn.temperature" in sd:
        b = f"blocks.{i}"
        hd = C // heads
        # XCA
        h = ln(tok, f"{b}.norm1")
        qkv = F.linear(h, t[f"{b}.attn.qkv.weight"], t[f"{b}.attn.qkv.bias"])
        qkv = qkv.reshape(B, -1, 3, heads, hd).permute(2, 0, 3, 4, 1)
        q, k, v = qkv[0], qkv[1], qkv[2]                    # [B, h, d, N]
        q = F.normalize(q, dim=-1)
        k = F.normalize(k, dim=-1)
        attn = (q @ k.transpose(-2, -1)) * t[f"{b}.attn.temperature"]
        attn = attn.softmax(dim=-1)
        out = (attn @ v).permute(0, 3, 1, 2).reshape(B, -1, C)
        out = F.linear(out, t[f"{b}.attn.proj.weight"],
                       t[f"{b}.attn.proj.bias"])
        tok = tok + t[f"{b}.gamma1"] * out
        # LPI
        h = ln(tok, f"{b}.norm3")
        g = h.transpose(1, 2).reshape(B, C, H, W)
        g = F.conv2d(g, t[f"{b}.local_mp.conv1.weight"],
                     t[f"{b}.local_mp.conv1.bias"], padding=1, groups=C)
        g = F.gelu(g)
        g = F.batch_norm(g, t[f"{b}.local_mp.bn.running_mean"],
                         t[f"{b}.local_mp.bn.running_var"],
                         t[f"{b}.local_mp.bn.weight"],
                         t[f"{b}.local_mp.bn.bias"], False, 0.1, 1e-5)
        g = F.conv2d(g, t[f"{b}.local_mp.conv2.weight"],
                     t[f"{b}.local_mp.conv2.bias"], padding=1, groups=C)
        tok = tok + t[f"{b}.gamma3"] * g.flatten(2).transpose(1, 2)
        # MLP
        h = ln(tok, f"{b}.norm2")
        h = F.linear(h, t[f"{b}.mlp.fc1.weight"], t[f"{b}.mlp.fc1.bias"])
        h = F.gelu(h)
        h = F.linear(h, t[f"{b}.mlp.fc2.weight"], t[f"{b}.mlp.fc2.bias"])
        tok = tok + t[f"{b}.gamma2"] * h
        i += 1

    z = torch.cat([t["cls_token"].expand(B, -1, -1), tok], dim=1)
    i = 0
    while f"cls_attn_blocks.{i}.norm1.weight" in sd:
        b = f"cls_attn_blocks.{i}"
        hd = C // heads
        zn = ln(z, f"{b}.norm1")
        N1 = zn.shape[1]
        q = F.linear(zn[:, 0:1], t[f"{b}.attn.q.weight"],
                     t[f"{b}.attn.q.bias"])
        k = F.linear(zn, t[f"{b}.attn.k.weight"], t[f"{b}.attn.k.bias"])
        v = F.linear(zn, t[f"{b}.attn.v.weight"], t[f"{b}.attn.v.bias"])
        q = q.reshape(B, 1, heads, hd).permute(0, 2, 1, 3) * hd ** -0.5
        k = k.reshape(B, N1, heads, hd).permute(0, 2, 1, 3)
        v = v.reshape(B, N1, heads, hd).permute(0, 2, 1, 3)
        attn = (q @ k.transpose(-2, -1)).softmax(dim=-1)
        cls = (attn @ v).transpose(1, 2).reshape(B, 1, C)
        cls = F.linear(cls, t[f"{b}.attn.proj.weight"],
                       t[f"{b}.attn.proj.bias"])
        z_attn = torch.cat([cls, zn[:, 1:]], dim=1)
        z = z + t[f"{b}.gamma1"] * z_attn
        if tokens_norm:
            z = ln(z, f"{b}.norm2")
        else:
            z = torch.cat([ln(z[:, 0:1], f"{b}.norm2"), z[:, 1:]], dim=1)
        z_res = z
        cls2 = z[:, 0:1]
        cls2 = F.linear(cls2, t[f"{b}.mlp.fc1.weight"],
                        t[f"{b}.mlp.fc1.bias"])
        cls2 = F.gelu(cls2)
        cls2 = F.linear(cls2, t[f"{b}.mlp.fc2.weight"],
                        t[f"{b}.mlp.fc2.bias"])
        cls2 = t[f"{b}.gamma2"] * cls2
        z = torch.cat([cls2, z[:, 1:]], dim=1)
        z = z_res + z
        i += 1
    return ln(z, "norm")[:, 0]


def test_timm_xcit_parity():
    """Converted timm XCiT state dict: our Flax forward == torch mirror,
    including folded patch-embed BNs and the baked Fourier pos table."""
    from effocr_tpu.interop.reference_artifacts import convert_timm_xcit
    from effocr_tpu.models.vit import XCiT

    rng = np.random.default_rng(11)
    dim, heads, depth, cls_depth = 16, 2, 2, 2
    sd = make_timm_xcit_sd(rng, dim=dim, depth=depth, heads=heads,
                           cls_depth=cls_depth)
    params, stats = convert_timm_xcit(sd, image_size=32)
    model = XCiT(patch=8, dim=dim, depth=depth, heads=heads,
                 cls_depth=cls_depth, image_size=32, dtype=jnp.float32)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        train=False))
    with torch.no_grad():
        ref = timm_xcit_forward(
            sd, torch.from_numpy(x).permute(0, 3, 1, 2),
            heads=heads).numpy()
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_detect_timm_arch_xcit():
    rng = np.random.default_rng(12)
    sd = make_timm_xcit_sd(rng, dim=384, depth=12, heads=8, cls_depth=2)
    assert detect_timm_arch(sd) == "xcit_small_12_p8_224"


# ------------------------------------------------------------------- onnx

def _pb_varint(n):
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pb_len(field, payload):
    return _pb_varint((field << 3) | 2) + _pb_varint(len(payload)) + payload


def _pb_int(field, val):
    return _pb_varint(field << 3) + _pb_varint(val)


def make_onnx_bytes(inits, nodes=()):
    """Serialize a minimal ModelProto: graph(7) holding initializer
    TensorProtos (5) and NodeProtos (1) — the writer-side mirror of
    interop/onnx_import.read_onnx_graph."""
    graph = b""
    for op_type, inputs, outputs in nodes:
        node = b""
        for i in inputs:
            node += _pb_len(1, i.encode())
        for o in outputs:
            node += _pb_len(2, o.encode())
        node += _pb_len(4, op_type.encode())
        graph += _pb_len(1, node)
    for name, arr in inits.items():
        arr = np.asarray(arr)
        tp = b""
        for d in arr.shape:
            tp += _pb_int(1, d)
        code = {np.dtype("float32"): 1, np.dtype("int64"): 7}[arr.dtype]
        tp += _pb_int(2, code)
        tp += _pb_len(8, name.encode())
        tp += _pb_len(9, arr.astype(arr.dtype.newbyteorder("<")).tobytes())
        graph += _pb_len(5, tp)
    return _pb_len(7, graph)   # ModelProto.graph


def test_onnx_initializer_roundtrip(tmp_path):
    from effocr_tpu.interop.onnx_import import onnx_to_state_dict

    rng = np.random.default_rng(21)
    sd = {"net.conv_stem.weight": _r(rng, 8, 3, 3, 3),
          "net.bn1.weight": 1 + _r(rng, 8)}
    p = tmp_path / "enc_best.onnx"
    p.write_bytes(make_onnx_bytes(sd))
    got = onnx_to_state_dict(str(p))
    assert set(got) == {"conv_stem.weight", "bn1.weight"}
    np.testing.assert_array_equal(got["conv_stem.weight"],
                                  sd["net.conv_stem.weight"])


def test_onnx_matmul_weight_recovery(tmp_path):
    """torch Linear on rank>2 input: anonymous transposed MatMul weight +
    named Add bias -> recovered '<stem>.weight'."""
    from effocr_tpu.interop.onnx_import import onnx_to_state_dict

    rng = np.random.default_rng(22)
    w = _r(rng, 12, 7)                      # torch [out, in]
    b = _r(rng, 12)
    inits = {"onnx::MatMul_123": np.ascontiguousarray(w.T),
             "net.blocks.0.mlp.fc1.bias": b}
    nodes = [("MatMul", ["x", "onnx::MatMul_123"], ["h"]),
             ("Add", ["h", "net.blocks.0.mlp.fc1.bias"], ["y"])]
    p = tmp_path / "enc_best.onnx"
    p.write_bytes(make_onnx_bytes(inits, nodes))
    got = onnx_to_state_dict(str(p))
    np.testing.assert_allclose(got["blocks.0.mlp.fc1.weight"], w,
                               rtol=1e-6)
    np.testing.assert_allclose(got["blocks.0.mlp.fc1.bias"], b, rtol=1e-6)


def test_import_onnx_only_dir(tmp_path):
    """ONNX-only recognizer_dir (infer_effocr_onnx_multi.py:416-419):
    full conversion -> our forward matches the torch mirror."""
    import jax

    from effocr_tpu.models.factory import create_encoder
    from effocr_tpu.retrieval.index import PrototypeIndex
    from effocr_tpu.train import checkpoint as ckpt

    rng = np.random.default_rng(23)
    sd = make_timm_mnv3_sd(rng, multiplier=0.5, head=64)
    src = tmp_path / "ref_dir"
    src.mkdir()
    (src / "enc_best.onnx").write_bytes(
        make_onnx_bytes({f"net.{k}": v for k, v in sd.items()}))
    emb = rng.normal(size=(4, 64)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    write_faiss_flat(str(src / "ref.index"), emb)
    with open(src / "ref.txt", "w", encoding="utf-8") as f:
        f.write("\n".join("wxyz") + "\n")

    out = maybe_convert_reference_dir(str(src))
    assert out == str(src / "tpu_converted")
    index = PrototypeIndex.load(out)
    assert index.chars == list("wxyz")

    model = create_encoder("mobilenetv3_small_050", dtype=jnp.float32,
                           head_features=64)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    restored = ckpt.load_variables(init, ckpt.best_checkpoint_path(out))
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    got = np.asarray(model.apply(restored, jnp.asarray(x), train=False))
    with torch.no_grad():
        ref = timm_mnv3_forward(
            sd, torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)
