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
