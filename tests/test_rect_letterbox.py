"""Rectangular letterbox bucket: native/host parity and pipeline flow."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from effocr_tpu import native
from effocr_tpu.kernels.image_ops import letterbox_host, letterbox_params


def test_letterbox_params_rect():
    r, (nw, nh), (top, bottom, left, right) = letterbox_params(
        50, 1000, (192, 640)
    )
    assert r == pytest.approx(0.64)
    assert (nw, nh) == (640, 32)
    assert top + bottom + nh == 192


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_rect_letterbox_matches_host(rng):
    im = rng.integers(0, 255, (50, 1000, 3)).astype(np.uint8)
    out, ratios, tops, lefts = native.letterbox_batch([im], 640, out_h=192)
    assert out.shape == (1, 192, 640, 3)
    ref, r, (dw, dh) = letterbox_host(im, (192, 640))
    assert ratios[0] == pytest.approx(r, rel=1e-5)
    assert tops[0] == int(round(dh - 0.1))
    diff = np.abs(out[0].astype(int) - ref.astype(int))
    assert (diff <= 2).mean() > 0.99


def test_pipeline_rect_bucket(rng):
    """Full fused pipeline with a 128x512 bucket on synthetic content."""
    import sys
    sys.path.insert(0, "tests")
    from test_pipeline_e2e import (
        CHARS, StubLocalizer, TinyEncoder, make_line,
    )
    from effocr_tpu.core.config import (
        EncoderConfig, LocalizerConfig, PipelineConfig,
    )
    from effocr_tpu.kernels.image_ops import paired_transform_host
    from effocr_tpu.pipelines.infer import EffOCRInference
    from effocr_tpu.retrieval.index import PrototypeIndex

    encoder = TinyEncoder()
    enc_vars = encoder.init(jax.random.PRNGKey(3), jnp.zeros((1, 224, 224, 3)))
    embed = jax.jit(lambda x: encoder.apply(enc_vars, x, train=False))
    protos = []
    for c in CHARS:
        img, boxes, _ = make_line(c)
        x0, _, x1, _ = boxes[0]
        protos.append(paired_transform_host(img[:, x0:x1]))
    index = PrototypeIndex(
        np.asarray(embed(jnp.asarray(np.stack(protos)))), CHARS
    )

    text = "AbX oT"
    img, boxes, words = make_line(text)
    h, w = img.shape[:2]
    r, _, (top, _, left, _) = letterbox_params(h, w, (128, 512))

    def to_lb(bs):
        return [[b[0] * r + left, b[1] * r + top,
                 b[2] * r + left, b[3] * r + top] for b in bs]

    a = 64
    pred = np.zeros((1, a, 7), np.float32)
    slot = 0
    for x0, y0, x1, y1 in to_lb(boxes):
        pred[0, slot] = [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0,
                         0.95, 0.99, 0.01]
        slot += 1
    for x0, y0, x1, y1 in to_lb(words):
        pred[0, slot] = [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0,
                         0.9, 0.01, 0.99]
        slot += 1

    cfg = PipelineConfig(
        lang="en",
        localizer=LocalizerConfig(input_size=512, input_height=128,
                                  conf_thresh=0.35, iou_thresh=0.1,
                                  max_det=64, max_nms=64),
        line_batch=1, crop_batch=32, crop_window=128,
    )
    engine = EffOCRInference(cfg, StubLocalizer(pred), {}, encoder,
                             enc_vars, index)
    results = engine.run([img])
    assert results[0] == text
