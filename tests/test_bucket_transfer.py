"""Bucket transfer mode: raw-size upload + device letterbox, full pipeline."""

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
from effocr_tpu.kernels.image_ops import letterbox_params, paired_transform_host
from effocr_tpu.pipelines.infer import EffOCRInference
from effocr_tpu.retrieval.index import PrototypeIndex


def test_pipeline_bucket_transfer(rng):
    from test_pipeline_e2e import (
        CHARS, StubLocalizer, TinyEncoder, make_line,
    )

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
    # canvas 128x512; image fits the (96, 512) bucket directly (r0 = 1)
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
        transfer="bucket", bucket_hw=(96, 512),
    )
    engine = EffOCRInference(cfg, StubLocalizer(pred), {}, encoder,
                             enc_vars, index)
    results = engine.run([img])
    assert results[0] == text


def test_pipeline_bucket_oversize_line(rng):
    """A line larger than the bucket takes the host pre-resize path."""
    from test_pipeline_e2e import (
        CHARS, StubLocalizer, TinyEncoder, make_line,
    )
    from PIL import Image

    encoder = TinyEncoder()
    enc_vars = encoder.init(jax.random.PRNGKey(3), jnp.zeros((1, 224, 224, 3)))
    embed = jax.jit(lambda x: encoder.apply(enc_vars, x, train=False))

    text = "XoT"
    img, boxes, words = make_line(text)
    # upscale 3x so it exceeds the bucket
    big = np.asarray(
        Image.fromarray(img).resize((img.shape[1] * 3, img.shape[0] * 3))
    )
    boxes = [[v * 3 for v in b] for b in boxes]
    words = [[v * 3 for v in b] for b in words]
    h, w = big.shape[:2]
    r, _, (top, _, left, _) = letterbox_params(h, w, (128, 512))
    protos = []
    for c in CHARS:
        limg, lboxes, _ = make_line(c)
        x0, _, x1, _ = lboxes[0]
        protos.append(paired_transform_host(limg[:, x0:x1]))
    index = PrototypeIndex(
        np.asarray(embed(jnp.asarray(np.stack(protos)))), CHARS
    )

    def to_lb(bs):
        return [[b[0] * r + left, b[1] * r + top,
                 b[2] * r + left, b[3] * r + top] for b in bs]

    pred = np.zeros((1, 64, 7), np.float32)
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
        transfer="bucket", bucket_hw=(96, 512),
    )
    engine = EffOCRInference(cfg, StubLocalizer(pred), {}, encoder,
                             enc_vars, index)
    results = engine.run([big])
    assert results[0] == text
