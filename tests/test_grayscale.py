"""Grayscale (1-channel) pipeline: 3x fewer host->device bytes."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "tests")

from effocr_tpu.core.config import (
    EncoderConfig,
    LocalizerConfig,
    PipelineConfig,
)
from effocr_tpu.kernels.image_ops import letterbox_params, normalize_imagenet
from effocr_tpu.pipelines.infer import EffOCRInference
from effocr_tpu.retrieval.index import PrototypeIndex


def test_normalize_single_channel():
    x = jnp.ones((1, 4, 4, 1))
    out = np.asarray(normalize_imagenet(x))
    # white normalizes to (1 - mean)/std with channel-averaged constants
    assert out.shape == (1, 4, 4, 1)
    assert out[0, 0, 0, 0] == pytest.approx((1 - 0.449) / (0.226), rel=0.01)


def test_pipeline_grayscale(rng):
    from test_pipeline_e2e import StubLocalizer, make_line
    from test_pipeline_e2e import CHARS
    from flax import linen as nn

    class GrayEncoder(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            g = nn.avg_pool(x, (8, 8), strides=(8, 8))
            return nn.Dense(64, use_bias=False)(g.reshape(g.shape[0], -1))

    encoder = GrayEncoder()
    enc_vars = encoder.init(jax.random.PRNGKey(3),
                            jnp.zeros((1, 224, 224, 1)))
    embed = jax.jit(lambda x: encoder.apply(enc_vars, x, train=False))

    def gray_transform(img):
        from effocr_tpu.kernels.image_ops import median_pad_square
        g = img.mean(-1, keepdims=True).astype(np.uint8)
        sq = median_pad_square(g, override=(255,)).astype(np.float32) / 255.0
        t = jax.image.resize(jnp.asarray(sq), (224, 224, 1), "linear")
        return np.asarray(normalize_imagenet(t))

    protos = []
    for c in CHARS:
        img, boxes, _ = make_line(c)
        x0, _, x1, _ = boxes[0]
        protos.append(gray_transform(img[:, x0:x1]))
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
        line_batch=1, crop_batch=32, crop_window=128, input_channels=1,
    )
    engine = EffOCRInference(cfg, StubLocalizer(pred), {}, encoder,
                             enc_vars, index)
    results = engine.run([img])
    assert results[0] == text
