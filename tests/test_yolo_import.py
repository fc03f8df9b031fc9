"""Ultralytics YOLOv5 state-dict import parity (interop/yolo_import.py).

Builds a random state dict with ultralytics v6.0 naming (yolov5n shapes),
runs an independent torch mirror of the ultralytics forward, and asserts
our Flax YOLOv5 with the converted weights matches all three raw head
grids.  Also anchors-unit conversion (stride units -> pixels) and the
localizer-dir round trip.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from effocr_tpu.interop.yolo_import import (  # noqa: E402
    convert_ultralytics_yolov5,
    detect_yolov5_variant,
    import_ultralytics_localizer,
)

# (our width fn for yolov5n: ceil(f * 0.25 / 8) * 8)
W = {64: 16, 128: 32, 256: 64, 512: 128, 1024: 256}
D = {3: 1, 6: 2, 9: 3}
NC = 2
NA = 3
ANCHORS_GRID = np.array(  # stride units, like the ultralytics buffer
    [[[1.25, 1.6], [2.0, 3.75], [4.1, 2.9]],
     [[1.9, 3.8], [3.9, 2.8], [3.7, 7.4]],
     [[3.6, 2.8], [4.9, 6.2], [11.7, 10.2]]], np.float32)


def _r(rng, *shape):
    return (rng.normal(size=shape) * 0.05).astype(np.float32)


def make_ultralytics_sd(rng):
    sd = {}

    def conv(key, cin, cout, k):
        sd[f"{key}.conv.weight"] = _r(rng, cout, cin, k, k)
        sd[f"{key}.bn.weight"] = 1 + _r(rng, cout)
        sd[f"{key}.bn.bias"] = _r(rng, cout)
        sd[f"{key}.bn.running_mean"] = _r(rng, cout)
        sd[f"{key}.bn.running_var"] = 1 + np.abs(_r(rng, cout))

    def c3(key, cin, cout, n):
        h = cout // 2
        conv(f"{key}.cv1", cin, h, 1)
        conv(f"{key}.cv2", cin, h, 1)
        conv(f"{key}.cv3", 2 * h, cout, 1)
        for j in range(n):
            conv(f"{key}.m.{j}.cv1", h, h, 1)
            conv(f"{key}.m.{j}.cv2", h, h, 3)

    conv("model.0", 3, W[64], 6)
    conv("model.1", W[64], W[128], 3)
    c3("model.2", W[128], W[128], D[3])
    conv("model.3", W[128], W[256], 3)
    c3("model.4", W[256], W[256], D[6])
    conv("model.5", W[256], W[512], 3)
    c3("model.6", W[512], W[512], D[9])
    conv("model.7", W[512], W[1024], 3)
    c3("model.8", W[1024], W[1024], D[3])
    conv("model.9.cv1", W[1024], W[1024] // 2, 1)          # SPPF
    conv("model.9.cv2", W[1024] * 2, W[1024], 1)
    conv("model.10", W[1024], W[512], 1)                   # lat5
    c3("model.13", W[1024], W[512], D[3])                  # neck4
    conv("model.14", W[512], W[256], 1)                    # lat4
    c3("model.17", W[512], W[256], D[3])                   # neck3 / o3
    conv("model.18", W[256], W[256], 3)                    # pan3
    c3("model.20", W[512], W[512], D[3])                   # neck4b / o4
    conv("model.21", W[512], W[512], 3)                    # pan4
    c3("model.23", W[1024], W[1024], D[3])                 # neck5 / o5
    no = 5 + NC
    for i, cin in enumerate((W[256], W[512], W[1024])):
        sd[f"model.24.m.{i}.weight"] = _r(rng, NA * no, cin, 1, 1)
        sd[f"model.24.m.{i}.bias"] = _r(rng, NA * no)
    sd["model.24.anchors"] = ANCHORS_GRID
    return sd


def ultralytics_forward(sd, x):
    """Independent torch mirror of the yolov5 v6.0 graph (raw heads)."""
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

    def conv(y, key, stride=1, pad=None):
        w = t[f"{key}.conv.weight"]
        k = w.shape[-1]
        y = F.conv2d(y, w, stride=stride,
                     padding=k // 2 if pad is None else pad)
        y = F.batch_norm(y, t[f"{key}.bn.running_mean"],
                         t[f"{key}.bn.running_var"], t[f"{key}.bn.weight"],
                         t[f"{key}.bn.bias"], training=False, eps=1e-3)
        return F.silu(y)

    def c3(y, key, n, shortcut):
        a = conv(y, f"{key}.cv1")
        for j in range(n):
            s = a
            a = conv(a, f"{key}.m.{j}.cv1")
            a = conv(a, f"{key}.m.{j}.cv2")
            if shortcut:
                a = a + s
        b = conv(y, f"{key}.cv2")
        return conv(torch.cat([a, b], dim=1), f"{key}.cv3")

    y = conv(x, "model.0", 2, pad=2)
    y = conv(y, "model.1", 2)
    y = c3(y, "model.2", D[3], True)
    y = conv(y, "model.3", 2)
    p3 = c3(y, "model.4", D[6], True)
    y = conv(p3, "model.5", 2)
    p4 = c3(y, "model.6", D[9], True)
    y = conv(p4, "model.7", 2)
    y = c3(y, "model.8", D[3], True)
    z = conv(y, "model.9.cv1")
    m1 = F.max_pool2d(z, 5, 1, 2)
    m2 = F.max_pool2d(m1, 5, 1, 2)
    m3 = F.max_pool2d(m2, 5, 1, 2)
    p5 = conv(torch.cat([z, m1, m2, m3], dim=1), "model.9.cv2")
    t5 = conv(p5, "model.10")
    y = torch.cat([F.interpolate(t5, scale_factor=2, mode="nearest"), p4], 1)
    n4 = c3(y, "model.13", D[3], False)
    t4 = conv(n4, "model.14")
    y = torch.cat([F.interpolate(t4, scale_factor=2, mode="nearest"), p3], 1)
    o3 = c3(y, "model.17", D[3], False)
    y = torch.cat([conv(o3, "model.18", 2), t4], 1)
    o4 = c3(y, "model.20", D[3], False)
    y = torch.cat([conv(o4, "model.21", 2), t5], 1)
    o5 = c3(y, "model.23", D[3], False)
    heads = []
    for i, o in enumerate((o3, o4, o5)):
        heads.append(F.conv2d(o, t[f"model.24.m.{i}.weight"],
                              t[f"model.24.m.{i}.bias"]))
    return heads


def test_yolov5_import_parity():
    from effocr_tpu.models import create_localizer

    rng = np.random.default_rng(11)
    sd = make_ultralytics_sd(rng)
    assert detect_yolov5_variant(sd) == "yolov5n"
    params, stats, anchors_px, nc = convert_ultralytics_yolov5(sd)
    assert nc == NC
    np.testing.assert_allclose(
        np.asarray(anchors_px[0]).reshape(3, 2), ANCHORS_GRID[0] * 8)
    np.testing.assert_allclose(
        np.asarray(anchors_px[2]).reshape(3, 2), ANCHORS_GRID[2] * 32)

    model = create_localizer("yolov5n", num_classes=NC, anchors=anchors_px,
                             dtype=jnp.float32)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    raw = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), train=False, decode=False)
    with torch.no_grad():
        ref = ultralytics_forward(
            sd, torch.from_numpy(x).permute(0, 3, 1, 2))
    for i, (got, r) in enumerate(zip(raw, ref)):
        b, gh, gw, na, no = got.shape
        # theirs: [B, na*no, H, W] -> [B, H, W, na, no]
        want = r.reshape(1, na, no, gh, gw).permute(0, 3, 4, 1, 2).numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-4, err_msg=f"scale {i}")


def test_import_localizer_dir_roundtrip(tmp_path):
    from effocr_tpu.train import checkpoint as ckpt

    rng = np.random.default_rng(12)
    sd = make_ultralytics_sd(rng)
    pt = tmp_path / "best_state.pt"
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               pt)
    out = import_ultralytics_localizer(str(pt), str(tmp_path / "loc"),
                                       input_size=64)
    import json

    with open(f"{out}/model.json") as f:
        meta = json.load(f)
    assert meta["arch"] == "yolov5n" and meta["num_classes"] == NC
    assert len(meta["anchors"]) == 3
    import os

    assert os.path.exists(
        ckpt.best_checkpoint_path(out, "best_bbox_mAP"))


def test_full_checkpoint_dict_rejected(tmp_path):
    # a checkpoint dict whose "model" holds no module tree falls through
    # the plain-state-dict path AND the full-pickle extractor
    pt = tmp_path / "full.pt"
    torch.save({"model": {"not": "a state dict"}, "epoch": 3}, pt)
    with pytest.raises(ValueError, match="no parameters found"):
        import_ultralytics_localizer(str(pt), str(tmp_path / "loc2"))


def test_full_pickle_extraction(tmp_path):
    """Full ultralytics-style checkpoint (foreign Model class pickled
    whole): the permissive unpickler extracts the exact state dict
    without the foreign package importable."""
    import sys
    import types

    import numpy as np
    import torch

    from effocr_tpu.interop.torch_pickle import (
        load_module_pickle_state_dict,
    )

    # fake "ultralytics" package, present only while SAVING
    pkg = types.ModuleType("fake_ultra")
    mod = types.ModuleType("fake_ultra.models")

    class Conv(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = torch.nn.Conv2d(3, 4, 3, bias=False)
            self.bn = torch.nn.BatchNorm2d(4)

    class Model(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.model = torch.nn.Sequential(Conv(), Conv())

    Conv.__module__ = Model.__module__ = "fake_ultra.models"
    Conv.__qualname__, Model.__qualname__ = "Conv", "Model"
    mod.Conv, mod.Model = Conv, Model
    sys.modules["fake_ultra"] = pkg
    sys.modules["fake_ultra.models"] = mod
    try:
        m = Model().half()           # ultralytics saves fp16
        want = {k: v.float().numpy() for k, v in m.state_dict().items()
                if "num_batches_tracked" not in k}
        torch.save({"model": m, "epoch": 3}, tmp_path / "best.pt")
    finally:
        del sys.modules["fake_ultra"], sys.modules["fake_ultra.models"]

    got = load_module_pickle_state_dict(str(tmp_path / "best.pt"))
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6)
