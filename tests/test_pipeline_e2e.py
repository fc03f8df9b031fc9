"""End-to-end pipeline test on a synthetic rendered-font corpus.

Builds text-line images by pasting DejaVu glyphs at known positions, a
prototype index from glyph renders, and runs the full EffOCRInference
pipeline (NMS -> ordering -> on-device ROI crops -> encoder -> retrieval ->
postprocess).  The localizer is a stub emitting ground-truth-quality
predictions so the test isolates pipeline correctness (crop geometry,
reading order, spaces, decode) from detector training.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn
from PIL import Image, ImageDraw, ImageFont

from effocr_tpu.core.config import (
    EncoderConfig,
    LocalizerConfig,
    PipelineConfig,
)
from effocr_tpu.kernels.image_ops import letterbox_params, paired_transform_host
from effocr_tpu.pipelines.infer import EffOCRInference
from effocr_tpu.retrieval.index import PrototypeIndex

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"

CHARS = list("AbXoTk")


class TinyEncoder(nn.Module):
    """Deterministic cheap embedding: 8x8-avg-pooled grayscale, flattened,
    projected.  Similar crops -> similar embeddings; enough for 1-NN."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = jnp.mean(x, axis=-1, keepdims=True)
        g = nn.avg_pool(g, (8, 8), strides=(8, 8))
        g = g.reshape(g.shape[0], -1)
        return nn.Dense(64, use_bias=False)(g)


class StubLocalizer:
    """Emits fixed decoded predictions [B, A, 5+nc] fed from test state."""

    def __init__(self, decoded):
        self.decoded = jnp.asarray(decoded)

    def apply(self, variables, imgs, train=False):
        b = imgs.shape[0]
        return self.decoded[:b], None


def render_char(ch, size=48):
    font = ImageFont.truetype(FONT, size)
    img = Image.new("RGB", (size * 3, size * 3), (255, 255, 255))
    d = ImageDraw.Draw(img)
    d.text((size, size), ch, (0, 0, 0), font=font)
    bbox = Image.eval(img.convert("L"), lambda p: 255 - p).getbbox()
    return img.crop(bbox)


def make_line(text, char_h=48, pad=6):
    """White canvas with glyphs side by side; returns (image, char boxes,
    word boxes) in original pixel space."""
    glyphs = [None if c == " " else render_char(c, char_h) for c in text]
    width = sum((g.width if g else char_h // 2) + pad for g in glyphs) + pad
    height = char_h + 2 * pad
    canvas = Image.new("RGB", (width, height), (255, 255, 255))
    boxes, words = [], []
    x = pad
    word_start = None
    for c, g in zip(text, glyphs):
        if g is None:
            if word_start is not None:
                words.append([word_start, 0, x, height])
            word_start = None
            x += char_h // 2 + pad
            continue
        if word_start is None:
            word_start = x
        y = pad + (char_h - g.height) // 2
        canvas.paste(g, (x, y))
        boxes.append([x, y, x + g.width, y + g.height])
        x += g.width + pad
    if word_start is not None:
        words.append([word_start, 0, x, height])
    return np.asarray(canvas), boxes, words


def to_letterbox_space(boxes, h, w, size=640):
    r, _, (top, _, left, _) = letterbox_params(h, w, (size, size))
    out = []
    for x0, y0, x1, y1 in boxes:
        out.append([x0 * r + left, y0 * r + top, x1 * r + left, y1 * r + top])
    return out


def make_decoded_predictions(lines_boxes, lines_words, metas, a=64, nc=2):
    """Fake YOLO decoded output: one confident anchor per GT box."""
    b = len(lines_boxes)
    pred = np.zeros((b, a, 5 + nc), np.float32)
    for i, (boxes, words, meta) in enumerate(
        zip(lines_boxes, lines_words, metas)
    ):
        slot = 0
        for (x0, y0, x1, y1) in boxes:
            cx, cy, w, h = (x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0
            pred[i, slot] = [cx, cy, w, h, 0.95, 0.99] + [0.01] * (nc - 1)
            slot += 1
        for (x0, y0, x1, y1) in words:
            cx, cy, w, h = (x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0
            pred[i, slot] = [cx, cy, w, h, 0.9, 0.01] + [0.99] * (nc - 1)
            slot += 1
    return pred


@pytest.fixture(scope="module")
def engine_parts():
    encoder = TinyEncoder()
    variables = encoder.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 224, 224, 3))
    )
    embed = jax.jit(lambda x: encoder.apply(variables, x, train=False))
    # prototypes share the pipeline's crop geometry: full line height around
    # each glyph (an untrained toy encoder has no scale invariance)
    protos = []
    for c in CHARS:
        img, boxes, _ = make_line(c)
        x0, _, x1, _ = boxes[0]
        protos.append(paired_transform_host(img[:, x0:x1]))
    index = PrototypeIndex(
        np.asarray(embed(jnp.asarray(np.stack(protos)))), CHARS
    )
    return encoder, variables, index


@pytest.mark.parametrize("crop_source", ["letterbox", "original"])
def test_pipeline_reads_synthetic_lines(engine_parts, crop_source):
    encoder, enc_vars, index = engine_parts
    texts = ["AbX oT", "kXo bA"]
    lines = [make_line(t) for t in texts]
    imgs = [l[0] for l in lines]
    metas = [None] * len(lines)
    lb_char_boxes = [
        to_letterbox_space(l[1], im.shape[0], im.shape[1])
        for l, im in zip(lines, imgs)
    ]
    lb_word_boxes = [
        to_letterbox_space(l[2], im.shape[0], im.shape[1])
        for l, im in zip(lines, imgs)
    ]
    decoded = make_decoded_predictions(lb_char_boxes, lb_word_boxes, metas)

    cfg = PipelineConfig(
        lang="en",
        localizer=LocalizerConfig(conf_thresh=0.35, iou_thresh=0.1,
                                  max_det=64, max_nms=64),
        encoder=EncoderConfig(arch="tiny"),
        line_batch=2,
        crop_batch=32,
        crop_source=crop_source,
    )
    engine = EffOCRInference(
        cfg, StubLocalizer(decoded), {}, encoder, enc_vars, index
    )
    results = engine.run(imgs)
    for i, t in enumerate(texts):
        assert results[i] == t, (crop_source, results[i], t)


@pytest.mark.parametrize("crop_source", ["letterbox", "original"])
def test_pipeline_tight_crop_geometry(crop_source):
    """crop_geometry='tight' cuts the detected box itself (both axes), not
    the reference's full-line-height crops — the mode matching trees built
    without --clip_to_top_and_bottom.  Prototypes here are TIGHT glyph
    crops, so with the toy scale-sensitive encoder the text only decodes
    if the pipeline's crop rects are tight too (regression: a
    geometry mismatch took en CER from 0.06 to 0.85 on trained
    artifacts)."""
    encoder = TinyEncoder()
    enc_vars = encoder.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 224, 224, 3))
    )
    embed = jax.jit(lambda x: encoder.apply(enc_vars, x, train=False))
    protos = []
    for c in CHARS:
        img, boxes, _ = make_line(c)
        x0, y0, x1, y1 = boxes[0]
        protos.append(paired_transform_host(img[y0:y1, x0:x1]))
    index = PrototypeIndex(
        np.asarray(embed(jnp.asarray(np.stack(protos)))), CHARS
    )
    texts = ["AbX oT", "kXo bA"]
    lines = [make_line(t) for t in texts]
    imgs = [l[0] for l in lines]
    lb_char_boxes = [
        to_letterbox_space(l[1], im.shape[0], im.shape[1])
        for l, im in zip(lines, imgs)
    ]
    lb_word_boxes = [
        to_letterbox_space(l[2], im.shape[0], im.shape[1])
        for l, im in zip(lines, imgs)
    ]
    decoded = make_decoded_predictions(
        lb_char_boxes, lb_word_boxes, [None] * len(lines)
    )
    cfg = PipelineConfig(
        lang="en",
        localizer=LocalizerConfig(conf_thresh=0.35, iou_thresh=0.1,
                                  max_det=64, max_nms=64),
        encoder=EncoderConfig(arch="tiny"),
        line_batch=2,
        crop_batch=32,
        crop_source=crop_source,
        crop_geometry="tight",
    )
    engine = EffOCRInference(
        cfg, StubLocalizer(decoded), {}, encoder, enc_vars, index
    )
    results = engine.run(imgs)
    for i, t in enumerate(texts):
        assert results[i] == t, (crop_source, results[i], t)


def test_pipeline_4bit_transfer_matches(engine_parts):
    """transfer_bits=4/2 (sub-byte packed upload + on-device unpack)
    decode the same text as the raw uint8 path on near-binary printed
    lines."""
    encoder, enc_vars, index = engine_parts
    texts = ["AbX oT", "kXo bA"]
    lines = [make_line(t) for t in texts]
    imgs = [l[0] for l in lines]
    lb_char_boxes = [
        to_letterbox_space(l[1], im.shape[0], im.shape[1])
        for l, im in zip(lines, imgs)
    ]
    lb_word_boxes = [
        to_letterbox_space(l[2], im.shape[0], im.shape[1])
        for l, im in zip(lines, imgs)
    ]
    decoded = make_decoded_predictions(
        lb_char_boxes, lb_word_boxes, [None] * len(lines)
    )
    for bits in (8, 4, 2):
        cfg = PipelineConfig(
            lang="en",
            localizer=LocalizerConfig(conf_thresh=0.35, iou_thresh=0.1,
                                      max_det=64, max_nms=64),
            encoder=EncoderConfig(arch="tiny"),
            line_batch=2, crop_batch=32, transfer_bits=bits,
        )
        engine = EffOCRInference(
            cfg, StubLocalizer(decoded), {}, encoder, enc_vars, index
        )
        results = engine.run(imgs)
        for i, t in enumerate(texts):
            assert results[i] == t, (bits, results[i], t)


def test_pipeline_crop_batch_exceeds_candidates(engine_parts):
    """crop_batch > line_batch*max_det: the device ships only
    line_batch*max_det crop slots (argsort over that many candidate keys),
    and the host unpack must size its slices accordingly instead of
    assuming crop_batch rows (regression: fixed-size packed-buffer
    unpack crashed for this config class)."""
    encoder, enc_vars, index = engine_parts
    texts = ["AbX oT", "kXo bA"]
    lines = [make_line(t) for t in texts]
    imgs = [l[0] for l in lines]
    lb_char_boxes = [
        to_letterbox_space(l[1], im.shape[0], im.shape[1])
        for l, im in zip(lines, imgs)
    ]
    lb_word_boxes = [
        to_letterbox_space(l[2], im.shape[0], im.shape[1])
        for l, im in zip(lines, imgs)
    ]
    decoded = make_decoded_predictions(
        lb_char_boxes, lb_word_boxes, [None] * len(lines)
    )
    cfg = PipelineConfig(
        lang="en",
        localizer=LocalizerConfig(conf_thresh=0.35, iou_thresh=0.1,
                                  max_det=64, max_nms=64),
        encoder=EncoderConfig(arch="tiny"),
        line_batch=2, crop_batch=512,  # > 2 * 64 candidate slots
    )
    engine = EffOCRInference(
        cfg, StubLocalizer(decoded), {}, encoder, enc_vars, index
    )
    results = engine.run(imgs)
    for i, t in enumerate(texts):
        assert results[i] == t, (results[i], t)


def make_vertical_line(text, char_h=48):
    glyphs = [render_char(c, char_h) for c in text]
    width = max(g.width for g in glyphs) + 12
    height = sum(g.height + 8 for g in glyphs) + 8
    canvas = Image.new("RGB", (width, height), (255, 255, 255))
    boxes = []
    y = 8
    for g in glyphs:
        x = (width - g.width) // 2
        canvas.paste(g, (x, y))
        boxes.append([x, y, x + g.width, y + g.height])
        y += g.height + 8
    return np.asarray(canvas), boxes


def test_pipeline_jp_vertical(engine_parts):
    encoder, enc_vars, _ = engine_parts
    embed = jax.jit(lambda x: encoder.apply(enc_vars, x, train=False))
    # vertical-geometry prototypes: full line width around each glyph
    protos = []
    for c in CHARS:
        vimg, vboxes = make_vertical_line(c)
        _, y0, _, y1 = vboxes[0]
        protos.append(paired_transform_host(vimg[y0:y1, :]))
    index = PrototypeIndex(
        np.asarray(embed(jnp.asarray(np.stack(protos)))), CHARS
    )
    # vertical "line": glyphs stacked top to bottom
    char_h = 48
    glyphs = [render_char(c, char_h) for c in "XoT"]
    width = max(g.width for g in glyphs) + 12
    height = sum(g.height + 8 for g in glyphs) + 8
    canvas = Image.new("RGB", (width, height), (255, 255, 255))
    boxes = []
    y = 8
    for g in glyphs:
        x = (width - g.width) // 2
        canvas.paste(g, (x, y))
        boxes.append([x, y, x + g.width, y + g.height])
        y += g.height + 8
    img = np.asarray(canvas)
    lb_boxes = to_letterbox_space(boxes, img.shape[0], img.shape[1])
    decoded = make_decoded_predictions([lb_boxes], [[]], [None], nc=1)

    cfg = PipelineConfig(
        lang="jp", vertical=True,
        localizer=LocalizerConfig(num_classes=1, conf_thresh=0.35,
                                  iou_thresh=0.1, max_det=64, max_nms=64),
        line_batch=1, crop_batch=32,
    )
    engine = EffOCRInference(
        cfg, StubLocalizer(decoded), {}, encoder, enc_vars, index
    )
    results = engine.run([img])
    assert results[0] == "XoT"


def test_pipeline_empty_line(engine_parts):
    encoder, enc_vars, index = engine_parts
    img = np.full((64, 512, 3), 255, np.uint8)
    decoded = np.zeros((1, 64, 7), np.float32)
    cfg = PipelineConfig(line_batch=1, crop_batch=32)
    engine = EffOCRInference(
        cfg, StubLocalizer(decoded), {}, encoder, enc_vars, index
    )
    results = engine.run([img])
    assert results[0] in (None, "")


def test_pipeline_overflow_spill(engine_parts):
    """A chunk whose chars exceed crop_batch must spill the undecoded tail
    lines into a fresh dispatch, not silently truncate them
    (pipelines/infer.py _finish_fused)."""
    encoder, enc_vars, index = engine_parts
    text = "AbX oT"  # 5 chars, 2 words
    img, boxes, words = make_line(text)
    lb_b = to_letterbox_space(boxes, img.shape[0], img.shape[1])
    lb_w = to_letterbox_space(words, img.shape[0], img.shape[1])
    n_lines = 8
    # identical lines, so the stub's decoded[:b] rows are right for any
    # suffix re-dispatch
    decoded = make_decoded_predictions(
        [lb_b] * n_lines, [lb_w] * n_lines, [None] * n_lines
    )
    cfg = PipelineConfig(
        lang="en",
        localizer=LocalizerConfig(conf_thresh=0.35, iou_thresh=0.1,
                                  max_det=64, max_nms=64),
        encoder=EncoderConfig(arch="tiny"),
        line_batch=n_lines,
        crop_batch=12,  # < 8 lines x 5 chars: forces repeated spill
    )
    engine = EffOCRInference(
        cfg, StubLocalizer(decoded), {}, encoder, enc_vars, index
    )
    results = engine.run([img] * n_lines)
    assert len(results) == n_lines
    for i in range(n_lines):
        assert results[i] == text, (i, results[i], text)


def test_reading_order_subpixel_late_line(engine_parts):
    """Two boxes 0.125 canvas-px apart on line 63 must decode in x order.

    A float32 composite key (line*1e5 + x) has 0.5-px resolution at line 63
    and collapses the two keys, letting anchor-slot order (here deliberately
    reversed) win; the int32 key keeps 1/16-px resolution."""
    encoder, enc_vars, index = engine_parts
    n_lines = 64
    a = 8
    decoded = np.zeros((n_lines, a, 7), np.float32)
    for i in range(n_lines - 1):
        decoded[i, 0] = [55, 32, 10, 20, 0.95, 0.99, 0.01]
    # line 63: slot 0 holds the RIGHT box (x0=200.125), slot 1 the LEFT
    # (x0=200.0) so a key collision emits them right-before-left
    for slot, x0 in ((0, 200.125), (1, 200.0)):
        w, y0, h = 10.0, 22.0, 20.0
        decoded[n_lines - 1, slot] = [
            x0 + w / 2, y0 + h / 2, w, h, 0.95, 0.99, 0.01,
        ]
    cfg = PipelineConfig(
        lang="en",
        localizer=LocalizerConfig(conf_thresh=0.35, iou_thresh=0.99,
                                  max_det=8, max_nms=64),
        encoder=EncoderConfig(arch="tiny"),
        line_batch=n_lines,
        crop_batch=128,
    )
    engine = EffOCRInference(
        cfg, StubLocalizer(decoded), {}, encoder, enc_vars, index
    )
    imgs = [np.full((64, 512, 3), 255, np.uint8)] * n_lines
    results, coco = engine.run(imgs, return_coco=True)
    last = [im for im in coco["images"] if im["id"] == n_lines - 1]
    assert last, coco["images"]
    annos = [x for x in coco["annotations"]
             if x["image_id"] == n_lines - 1]
    assert len(annos) == 2, annos
    x_order = [x["bbox"][0] for x in annos]
    assert x_order[0] < x_order[1], x_order


def test_pipeline_adaptive_canvas_height(engine_parts):
    """adaptive_height shrinks the canvas to the chunk's content tier with
    unchanged letterbox geometry, so decode stays exact."""
    encoder, enc_vars, index = engine_parts
    texts = ["AbX oT", "kXo bA"]
    lines = [make_line(t) for t in texts]
    imgs = [l[0] for l in lines]
    # expected tier (mirrors EffOCRInference._chunk_canvas_height)
    need = max(
        min(192, int(np.ceil(im.shape[0] * 640 / im.shape[1])))
        for im in imgs
    )
    tier = min(192, -(-max(need, 32) // 32) * 32)
    lb = lambda boxes, im: [
        [x0 * r + left, y0 * r + top, x1 * r + left, y1 * r + top]
        for (x0, y0, x1, y1) in boxes
        for r, _, (top, _, left, _) in
        [letterbox_params(im.shape[0], im.shape[1], (tier, 640))]
    ]
    decoded = make_decoded_predictions(
        [lb(l[1], im) for l, im in zip(lines, imgs)],
        [lb(l[2], im) for l, im in zip(lines, imgs)],
        [None] * len(lines),
    )
    cfg = PipelineConfig(
        lang="en",
        localizer=LocalizerConfig(conf_thresh=0.35, iou_thresh=0.1,
                                  max_det=64, max_nms=64,
                                  input_height=192),
        encoder=EncoderConfig(arch="tiny"),
        adaptive_height=True,
        line_batch=2,
        crop_batch=32,
    )
    engine = EffOCRInference(
        cfg, StubLocalizer(decoded), {}, encoder, enc_vars, index
    )
    results = engine.run(imgs)
    for i, t in enumerate(texts):
        assert results[i] == t, (tier, results[i], t)


def test_adaptive_height_floor_and_cap(engine_parts):
    """Tier selection stays inside [floor, cap] = the detector's trained
    height range: short lines don't drop below the floor, and lines whose
    width-bound content height exceeds the cap letterbox down at the cap
    tier instead of escalating to a canvas the detector never saw."""
    encoder, enc_vars, index = engine_parts
    cfg = PipelineConfig(
        lang="en",
        localizer=LocalizerConfig(input_size=1024, input_height=None),
        encoder=EncoderConfig(arch="tiny"),
        adaptive_height=True,
        adaptive_height_floor=64,
        adaptive_height_cap=96,
    )
    engine = EffOCRInference(
        cfg, StubLocalizer(np.zeros((2, 4, 7), np.float32)), {},
        encoder, enc_vars, index
    )
    # 65-px-tall, 532-px-wide line: width-bound content height would be
    # ceil(65*1024/532)=126 -> tier 128 without the cap
    tall = [np.zeros((65, 532, 3), np.uint8)]
    assert engine._chunk_canvas_height(tall) == 96
    # tiny line: need < floor -> floor tier
    short = [np.zeros((10, 1024, 3), np.uint8)]
    assert engine._chunk_canvas_height(short) == 64
    # no cap -> escalates as before
    cfg_uncapped = PipelineConfig(
        lang="en",
        localizer=LocalizerConfig(input_size=1024, input_height=None),
        encoder=EncoderConfig(arch="tiny"),
        adaptive_height=True,
        adaptive_height_floor=64,
    )
    engine2 = EffOCRInference(
        cfg_uncapped, StubLocalizer(np.zeros((2, 4, 7), np.float32)), {},
        encoder, enc_vars, index
    )
    assert engine2._chunk_canvas_height(tall) == 128


def test_pipeline_box_pad(engine_parts):
    """box_pad plumbs through the fused path; pad 0 matches default, and
    a huge pad changes crops (merging neighbors) without crashing."""
    encoder, enc_vars, index = engine_parts
    texts = ["AbX oT"]
    lines = [make_line(t) for t in texts]
    imgs = [l[0] for l in lines]
    lb_chars = [to_letterbox_space(l[1], i.shape[0], i.shape[1])
                for l, i in zip(lines, imgs)]
    lb_words = [to_letterbox_space(l[2], i.shape[0], i.shape[1])
                for l, i in zip(lines, imgs)]
    decoded = make_decoded_predictions(lb_chars, lb_words, [None])

    def run(pad):
        cfg = PipelineConfig(
            lang="en",
            localizer=LocalizerConfig(conf_thresh=0.35, iou_thresh=0.1,
                                      max_det=64, max_nms=64),
            encoder=EncoderConfig(arch="tiny"),
            line_batch=1, crop_batch=32, box_pad=pad,
        )
        return EffOCRInference(cfg, StubLocalizer(decoded), {}, encoder,
                               enc_vars, index).run(imgs)

    assert run(0.0)[0] == texts[0]
    out = run(40.0)[0]          # merges neighbor glyphs into each crop
    assert isinstance(out, str) and out != texts[0]


def test_pipeline_mesh_data_parallel_matches_single(engine_parts):
    """Data-parallel fused inference over a 2-device mesh (jax.shard_map,
    lines sharded over 'data') produces the exact results of the
    single-device engine — the serving scale-out behind the v5e-8
    north-star (BASELINE.md).  Uses a real random-init yolov5n so each
    shard genuinely detects on its own slice (output text is junk; the
    assertion is bit-level agreement, including COCO boxes)."""
    from jax.sharding import Mesh

    from effocr_tpu.models import create_localizer

    encoder, enc_vars, index = engine_parts
    loc = create_localizer("yolov5n", num_classes=2, dtype=jnp.float32)
    lvars = loc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                     train=False)

    texts = ["AbX oT", "kXo bA", "TA bX", "oXk A"]
    imgs = [make_line(t)[0] for t in texts]
    cfg = PipelineConfig(
        lang="en",
        localizer=LocalizerConfig(arch="yolov5n", input_size=64,
                                  conf_thresh=0.05, iou_thresh=0.45,
                                  max_det=16, max_nms=64),
        encoder=EncoderConfig(arch="tiny"),
        line_batch=4,
        crop_batch=128,
    )
    single, single_coco = EffOCRInference(
        cfg, loc, lvars, encoder, enc_vars, index
    ).run(imgs, return_coco=True)

    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    sharded, sharded_coco = EffOCRInference(
        cfg, loc, lvars, encoder, enc_vars, index, mesh=mesh
    ).run(imgs, return_coco=True)

    assert sharded == single
    assert json.dumps(sharded_coco, sort_keys=True) == json.dumps(
        single_coco, sort_keys=True)


def test_prototype_index_roundtrip_whitespace_chars(tmp_path):
    """ref.txt round-trip keeps whitespace characters (U+3000 etc.) that
    font-coverage charsets contain — row i must decode to chars[i] even
    when some char IS whitespace (the reference's .split() parse swallows
    them and shifts every later row)."""
    import numpy as np

    chars = ["あ", "　", "ん", " "]
    embs = np.eye(4, 8, dtype=np.float32)
    index = PrototypeIndex(embs, chars)
    index.save(str(tmp_path))
    loaded = PrototypeIndex.load(str(tmp_path))
    assert loaded.chars == chars
    assert loaded.embeddings.shape == (4, 8)


def test_pipeline_wide_line_tiling(engine_parts):
    """A line too wide for the canvas decodes exactly when tiled: the
    pipeline splits it into overlapping windows, each window rides the
    fused path as a normal line, and the per-tile decodes merge by
    ownership span (pipelines/tiling.py).  The stub detector sees each
    tile's GT boxes (clipped at the cuts, duplicated in the overlaps),
    so the test exercises ownership filtering and cross-tile dedup."""
    from effocr_tpu.pipelines.tiling import plan_tiles

    encoder, enc_vars, index = engine_parts
    text = "AbXoTk XoTkAb TkAbXo oTkAbX bAXoTk kToXbA AbXoTk XoTkAb"
    img, boxes, words = make_line(text)
    h, w = img.shape[:2]
    min_h = 48
    plan = plan_tiles(w, h, 640, 640, min_h)
    assert plan is not None and len(plan) >= 2, (w, h)

    # per-tile stub predictions: GT boxes intersecting the tile, shifted
    # and clipped to the tile, in the tile's letterbox space
    tile_char_boxes, tile_word_boxes = [], []
    for t in plan:
        tw = t.stop - t.start

        def in_tile(bs):
            out = []
            for x0, y0, x1, y1 in bs:
                cx0 = max(x0 - t.start, 0)
                cx1 = min(x1 - t.start, tw)
                if cx1 - cx0 > 2:
                    out.append([cx0, y0, cx1, y1])
            return out

        tile_char_boxes.append(
            to_letterbox_space(in_tile(boxes), h, tw)
        )
        tile_word_boxes.append(
            to_letterbox_space(in_tile(words), h, tw)
        )
    decoded = make_decoded_predictions(
        tile_char_boxes, tile_word_boxes, [None] * len(plan)
    )

    cfg = PipelineConfig(
        lang="en",
        localizer=LocalizerConfig(conf_thresh=0.35, iou_thresh=0.1,
                                  max_det=64, max_nms=64),
        encoder=EncoderConfig(arch="tiny"),
        line_batch=len(plan),
        crop_batch=64 * len(plan),
        tile_min_content_h=min_h,
    )
    engine = EffOCRInference(
        cfg, StubLocalizer(decoded), {}, encoder, enc_vars, index
    )
    results, coco = engine.run([img], return_coco=True)
    assert results[0] == text, (results[0], text)
    # merged coco boxes: one per char, in parent coordinates
    ents = coco["images"]
    assert len(ents) == 1 and ents[0]["width"] == w


def test_pipeline_tall_vertical_tiling(engine_parts):
    """Vertical variant of wide-line tiling: a vertical line far taller
    than the canvas splits into y-axis tiles and merges exactly."""
    from effocr_tpu.pipelines.tiling import plan_tiles

    encoder, enc_vars, _ = engine_parts
    embed = jax.jit(lambda x: encoder.apply(enc_vars, x, train=False))
    protos = []
    for c in CHARS:
        vimg, vboxes = make_vertical_line(c)
        _, y0, _, y1 = vboxes[0]
        protos.append(paired_transform_host(vimg[y0:y1, :]))
    index = PrototypeIndex(
        np.asarray(embed(jnp.asarray(np.stack(protos)))), CHARS
    )

    # XoTk only: the toy encoder can't split A/b on vertical full-width
    # crop geometry even untiled — keep the test about tiling, not it
    text = "XoTk" * 11  # ~2,400 px tall at char_h=48
    img, boxes = make_vertical_line(text)
    h, w = img.shape[:2]
    min_w = 48
    plan = plan_tiles(h, w, 640, 640, min_w)
    assert plan is not None and len(plan) >= 2, (h, w)

    tile_boxes = []
    for t in plan:
        th = t.stop - t.start
        sub = []
        for x0, y0, x1, y1 in boxes:
            cy0 = max(y0 - t.start, 0)
            cy1 = min(y1 - t.start, th)
            if cy1 - cy0 > 2:
                sub.append([x0, cy0, x1, cy1])
        tile_boxes.append(to_letterbox_space(sub, th, w))
    decoded = make_decoded_predictions(
        tile_boxes, [[]] * len(plan), [None] * len(plan), nc=1
    )

    cfg = PipelineConfig(
        lang="jp", vertical=True,
        localizer=LocalizerConfig(num_classes=1, conf_thresh=0.35,
                                  iou_thresh=0.1, max_det=64, max_nms=64),
        line_batch=len(plan), crop_batch=64 * len(plan),
        tile_min_content_h=min_w,
    )
    engine = EffOCRInference(
        cfg, StubLocalizer(decoded), {}, encoder, enc_vars, index
    )
    results = engine.run([img])
    assert results[0] == text, (results[0], text)


def test_pipeline_adaptive_width_and_chunk_sort(engine_parts):
    """adaptive_width trims the canvas reading axis at the UNCHANGED
    letterbox scale (r computed against the full input_size), and
    chunk_sort='width' reorders lines before chunking while results stay
    keyed by input index — decode is exact under both."""
    encoder, enc_vars, index = engine_parts
    texts = ["AbX oT", "kXobAkXobA bXoT", "bA X"]
    lines = [make_line(t) for t in texts]
    imgs = [l[0] for l in lines]

    cfg = PipelineConfig(
        lang="en",
        localizer=LocalizerConfig(conf_thresh=0.35, iou_thresh=0.1,
                                  max_det=64, max_nms=64,
                                  input_size=1024, input_height=96),
        encoder=EncoderConfig(arch="tiny"),
        adaptive_width=True,
        adaptive_width_stride=64,
        chunk_sort="width",
        line_batch=3,
        crop_batch=64,
    )
    # mirror the engine: sorted by width desc, then trimmed canvas dims
    order = sorted(range(len(imgs)), key=lambda i: imgs[i].shape[1],
                   reverse=True)
    s_imgs = [imgs[i] for i in order]
    probe = EffOCRInference(
        cfg, StubLocalizer(np.zeros((4, 4, 7), np.float32)), {},
        encoder, enc_vars, index,
    )
    size_h, trim_w = probe._chunk_canvas_dims(s_imgs)
    assert trim_w < 1024, "test corpus should actually trim"
    # scale must match the full-width canvas for every line
    for im in s_imgs:
        h, w = im.shape[:2]
        r_full, _, _ = letterbox_params(h, w, (size_h, 1024))
        r_trim, _, _ = letterbox_params(h, w, (size_h, trim_w))
        assert r_full == pytest.approx(r_trim), (r_full, r_trim)

    lb = lambda boxes, im: [
        [x0 * r + left, y0 * r + top, x1 * r + left, y1 * r + top]
        for (x0, y0, x1, y1) in boxes
        for r, _, (top, _, left, _) in
        [letterbox_params(im.shape[0], im.shape[1], (size_h, trim_w))]
    ]
    # decoded rows follow the SORTED order (that is what the device sees)
    decoded = make_decoded_predictions(
        [lb(lines[i][1], imgs[i]) for i in order],
        [lb(lines[i][2], imgs[i]) for i in order],
        [None] * len(order),
    )
    engine = EffOCRInference(
        cfg, StubLocalizer(decoded), {}, encoder, enc_vars, index
    )
    results = engine.run(imgs)
    for i, t in enumerate(texts):
        assert results[i] == t, (i, results[i], t)


def test_chunk_canvas_dims_unit(engine_parts):
    """_chunk_canvas_dims: exact-scale trim math, horizontal + vertical."""
    encoder, enc_vars, index = engine_parts
    stub = StubLocalizer(np.zeros((2, 4, 7), np.float32))

    cfg = PipelineConfig(
        lang="en",
        localizer=LocalizerConfig(input_size=1024, input_height=96),
        adaptive_width=True, adaptive_width_stride=128,
    )
    eng = EffOCRInference(cfg, stub, {}, encoder, enc_vars, index)
    # 65-px line, 532 wide: r = min(1024/532, 96/65) = 96/65; content
    # width = ceil(532*96/65) = 786 -> +32 slack -> tier 896
    (h, w) = eng._chunk_canvas_dims([np.zeros((65, 532, 3), np.uint8)])
    assert (h, w) == (96, 896), (h, w)
    # width-bound wide line: full canvas, no trim
    (h, w) = eng._chunk_canvas_dims([np.zeros((65, 1600, 3), np.uint8)])
    assert w == 1024, (h, w)

    # vertical: trim the canvas height (the reading axis)
    cfg_v = PipelineConfig(
        lang="jp", vertical=True,
        localizer=LocalizerConfig(input_size=96, input_height=640,
                                  num_classes=1),
        adaptive_width=True, adaptive_width_stride=128,
    )
    eng_v = EffOCRInference(cfg_v, stub, {}, encoder, enc_vars, index)
    # 70-px-wide, 300-tall: r = min(96/70, 640/300) = 96/70; content
    # height = ceil(300*96/70) = 412 -> +32 -> tier 512
    (h, w) = eng_v._chunk_canvas_dims([np.zeros((300, 70, 3), np.uint8)])
    assert (h, w) == (512, 96), (h, w)

    # native height mode: tier nearest the raw height, clamped
    cfg_n = PipelineConfig(
        lang="en",
        localizer=LocalizerConfig(input_size=1024, input_height=96),
        adaptive_height=True, adaptive_height_mode="native",
        adaptive_height_floor=64, adaptive_height_cap=96,
    )
    eng_n = EffOCRInference(cfg_n, stub, {}, encoder, enc_vars, index)
    assert eng_n._chunk_canvas_height(
        [np.zeros((65, 532, 3), np.uint8)]) == 64
    assert eng_n._chunk_canvas_height(
        [np.zeros((90, 532, 3), np.uint8)]) == 96


def test_pipeline_max_words_cap(engine_parts):
    """--max_words shrinks the packed word payload; reading-order slice
    keeps the first N words, so a cap >= the true word count is lossless
    and an overflowing cap drops only TRAILING spaces."""
    encoder, enc_vars, index = engine_parts
    text = "Ab X oT kX"                      # 4 words -> 3 word boxes? no: 4
    line = make_line(text)
    imgs = [line[0]]
    lb_c = [to_letterbox_space(line[1], imgs[0].shape[0], imgs[0].shape[1])]
    lb_w = [to_letterbox_space(line[2], imgs[0].shape[0], imgs[0].shape[1])]
    decoded = make_decoded_predictions(lb_c, lb_w, [None])

    def run(max_words):
        cfg = PipelineConfig(
            lang="en",
            localizer=LocalizerConfig(conf_thresh=0.35, iou_thresh=0.1,
                                      max_det=64, max_nms=64),
            encoder=EncoderConfig(arch="tiny"),
            line_batch=1,
            crop_batch=32,
            max_words_per_line=max_words,
        )
        engine = EffOCRInference(
            cfg, StubLocalizer(decoded), {}, encoder, enc_vars, index
        )
        return engine.run(imgs)[0]

    assert run(8) == text                     # cap >= word count: lossless
    assert run(4) == text
    capped = run(2)                           # fewer slots than words
    assert capped.replace(" ", "") == text.replace(" ", "")
    # the kept spaces are the leading ones (reading-order slice)
    assert capped.split(" ")[0] == text.split(" ")[0]


def test_pipeline_out_quant_u16_matches_i32(engine_parts):
    """out_quant='u16' (1/16-px fixed-point d2h packing, half the bytes)
    decodes the same text as the exact i32 buffer, including word spacing
    and multi-chunk runs."""
    encoder, enc_vars, index = engine_parts
    texts = ["AbX oT", "kXo bA"]
    lines = [make_line(t) for t in texts]
    imgs = [l[0] for l in lines]
    lb_c = [
        to_letterbox_space(l[1], im.shape[0], im.shape[1])
        for l, im in zip(lines, imgs)
    ]
    lb_w = [
        to_letterbox_space(l[2], im.shape[0], im.shape[1])
        for l, im in zip(lines, imgs)
    ]
    decoded = make_decoded_predictions(lb_c, lb_w, [None] * len(lines))

    def run(out_quant):
        cfg = PipelineConfig(
            lang="en",
            localizer=LocalizerConfig(conf_thresh=0.35, iou_thresh=0.1,
                                      max_det=64, max_nms=64),
            encoder=EncoderConfig(arch="tiny"),
            line_batch=2,
            crop_batch=32,
            out_quant=out_quant,
        )
        engine = EffOCRInference(
            cfg, StubLocalizer(decoded), {}, encoder, enc_vars, index
        )
        return engine.run(imgs, return_coco=True)

    res_exact, coco_exact = run("i32")
    res_q, coco_q = run("u16")
    for i, t in enumerate(texts):
        assert res_exact[i] == t, (res_exact[i], t)
        assert res_q[i] == t, (res_q[i], t)
    # COCO boxes agree to the fixed-point step (1/16 canvas px -> <= 1 px
    # after inverse letterbox on these small test lines)
    for a, b in zip(coco_exact["annotations"], coco_q["annotations"]):
        assert a["text"] == b["text"]
        np.testing.assert_allclose(a["bbox"], b["bbox"], atol=1.0)


def test_pipeline_bf16_compute(engine_parts):
    """compute_dtype='bf16' (detector+encoder convs at the MXU bf16 rate)
    decodes the same text on the synthetic corpus — retrieval margins are
    wide, and decode/NMS/retrieval stay f32."""
    encoder, enc_vars, index = engine_parts
    texts = ["AbX oT", "kXo bA"]
    lines = [make_line(t) for t in texts]
    imgs = [l[0] for l in lines]
    lb_c = [
        to_letterbox_space(l[1], im.shape[0], im.shape[1])
        for l, im in zip(lines, imgs)
    ]
    lb_w = [
        to_letterbox_space(l[2], im.shape[0], im.shape[1])
        for l, im in zip(lines, imgs)
    ]
    decoded = make_decoded_predictions(lb_c, lb_w, [None] * len(lines))
    cfg = PipelineConfig(
        lang="en",
        localizer=LocalizerConfig(conf_thresh=0.35, iou_thresh=0.1,
                                  max_det=64, max_nms=64),
        encoder=EncoderConfig(arch="tiny"),
        line_batch=2, crop_batch=32, compute_dtype="bf16",
    )
    engine = EffOCRInference(
        cfg, StubLocalizer(decoded), {}, encoder, enc_vars, index
    )
    results = engine.run(imgs)
    for i, t in enumerate(texts):
        assert results[i] == t, (results[i], t)
