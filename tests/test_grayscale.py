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


# ---------------------------------------------------------------------------
# grayscale-native TRAINING (--input_channels 1): the fast-config path —
# models whose first conv takes one channel, trained on the same gray
# reduction the inference host prep applies
# ---------------------------------------------------------------------------

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"
TRAIN_CHARS = list("AXo")


@pytest.fixture(scope="module")
def gray_char_tree(tmp_path_factory):
    from PIL import Image, ImageDraw, ImageFont

    root = tmp_path_factory.mktemp("gray_chars")
    font = ImageFont.truetype(FONT, 40)
    for c in TRAIN_CHARS:
        d = root / str(ord(c))
        d.mkdir()
        img = Image.new("RGB", (64, 64), (255, 255, 255))
        ImageDraw.Draw(img).text((12, 8), c, (0, 0, 0), font=font)
        img.save(d / f"{hex(ord(c))}_0_TestFont-Regular.png")
        for li in range(2):
            img2 = Image.new("RGB", (60, 62), (255, 255, 255))
            ImageDraw.Draw(img2).text((10, 8), c, (20, 20, 20), font=font)
            img2.save(d / f"PAIRED_line{li}_{li}_{hex(ord(c))}_{li}.png")
    return str(root)


def _assert_param_shapes_match_channels(model, params, sample_shape):
    """The trainer's params must have exactly the shapes a fresh init on a
    sample of `sample_shape` produces (architecture-agnostic check that the
    stem consumed the requested channel count)."""
    import jax

    ref = jax.eval_shape(
        lambda k, x: model.init(k, x, train=False),
        jax.random.PRNGKey(0), jnp.zeros(sample_shape, jnp.float32),
    )["params"]
    got = jax.tree.map(lambda a: a.shape, params)
    want = jax.tree.map(lambda a: a.shape, ref)
    assert got == want


def test_recognizer_trainer_grayscale(gray_char_tree, tmp_path):
    """fit + index build with input_channels=1 end to end (stream mode);
    the trained artifact embeds 1-channel crops."""
    from effocr_tpu.core.config import RecognizerTrainConfig
    from effocr_tpu.data.folder import CharFolderDataset, split_indices
    from effocr_tpu.models import create_encoder
    from effocr_tpu.train.recognizer import RecognizerTrainer

    ds = CharFolderDataset(gray_char_tree)
    idx_train, idx_val, _ = split_indices(ds, ["line0"], ["line1"],
                                          ["line1"])
    cfg = RecognizerTrainConfig(
        encoder=EncoderConfig(arch="convnext_atto", image_size=64,
                              input_channels=1),
        batch_size=6, m_per_class=2, num_epochs=1, lr=1e-4, lang="en",
    )
    model = create_encoder("convnext_atto", dtype=jnp.float32)
    trainer = RecognizerTrainer(cfg, model, str(tmp_path / "gray_run"))
    trainer.init_state(jax.random.PRNGKey(0))
    _assert_param_shapes_match_channels(
        model, trainer.state["params"], (2, 64, 64, 1)
    )
    acc = trainer.fit(ds, idx_train, idx_val, ds.render_indices())
    assert 0.0 <= acc <= 1.0
    index = trainer.build_ref_index(ds, ds.render_indices())
    assert sorted(index.chars) == sorted(TRAIN_CHARS)


def test_recognizer_trainer_grayscale_resident(gray_char_tree, tmp_path):
    """Resident gray bank + input_channels=1: bank rows feed the encoder
    as single-channel planes (no RGB broadcast)."""
    from effocr_tpu.core.config import RecognizerTrainConfig
    from effocr_tpu.data.folder import CharFolderDataset, split_indices
    from effocr_tpu.models import create_encoder
    from effocr_tpu.train.recognizer import RecognizerTrainer

    ds = CharFolderDataset(gray_char_tree)
    idx_train, idx_val, _ = split_indices(ds, ["line0"], ["line1"],
                                          ["line1"])
    cfg = RecognizerTrainConfig(
        encoder=EncoderConfig(arch="convnext_atto", image_size=64,
                              input_channels=1),
        batch_size=6, m_per_class=2, num_epochs=1, lr=1e-4, lang="en",
        data_device="resident", aux_ce_weight=1.0, ref_source="centroid",
        centroid_cap=4,
    )
    model = create_encoder("convnext_atto", dtype=jnp.float32)
    trainer = RecognizerTrainer(cfg, model, str(tmp_path / "gray_bank"))
    trainer.init_state(jax.random.PRNGKey(0))
    acc = trainer.fit(ds, idx_train, idx_val, ds.render_indices())
    assert 0.0 <= acc <= 1.0
    assert trainer.bank is not None
    # bank-path embeddings == streamed-path embeddings on the same weights
    probe = idx_train[:4]
    e_bank, l_bank = trainer.embed_indices(ds, probe)
    bank, trainer.bank = trainer.bank, None
    e_stream, l_stream = trainer.embed_indices(ds, probe)
    trainer.bank = bank
    np.testing.assert_array_equal(l_bank, l_stream)
    np.testing.assert_allclose(e_bank, e_stream, rtol=2e-2, atol=2e-2)


def test_localizer_trainer_grayscale(tmp_path):
    """One detector train step + eval on 1-channel canvases."""
    from effocr_tpu.core.config import LocalizerTrainConfig
    from effocr_tpu.models import create_localizer
    from effocr_tpu.train.localizer import LocalizerTrainer

    cfg = LocalizerTrainConfig(
        localizer=LocalizerConfig(arch="yolov5n", num_classes=2,
                                  input_size=128, max_det=32, max_nms=128,
                                  input_channels=1),
        batch_size=2,
    )
    model = create_localizer("yolov5n", num_classes=2, dtype=jnp.float32)
    trainer = LocalizerTrainer(cfg, model, str(tmp_path / "gray_loc"),
                               total_steps=10)
    trainer.init_state(jax.random.PRNGKey(0), 128)
    _assert_param_shapes_match_channels(
        model, trainer.state["params"], (1, 128, 128, 1)
    )

    imgs = np.zeros((2, 128, 128, 1), np.float32)
    imgs[:, 40:80, 30:60] = 0.2
    tgts = np.zeros((2, 8, 5), np.float32)
    tgts[:, 0] = [0, 45, 60, 30, 40]
    masks = np.zeros((2, 8), bool)
    masks[:, 0] = True
    loss, parts = trainer.train_step(
        jnp.asarray(imgs), jnp.asarray(tgts), jnp.asarray(masks)
    )
    assert np.isfinite(loss)
    gts = [{"boxes": np.array([[30.0, 40, 60, 80]]), "classes": [0]}] * 2
    result = trainer.evaluate([(imgs, gts)])
    assert set(result) == {"bbox/AP", "bbox/AP50", "bbox/AP75"}


def test_detection_dataset_grayscale(tmp_path):
    """channels=1: canvases come out [H, W, 1] with the truncating channel
    mean (the inference host-prep reduction)."""
    import json

    from PIL import Image as PILImage

    from effocr_tpu.data.detection import DetectionDataset

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    arr = np.full((50, 800, 3), 255, np.uint8)
    arr[10:40, 100:140] = [10, 20, 40]   # chroma exercises the mean
    PILImage.fromarray(arr).save(img_dir / "l0.png")
    coco = {
        "images": [{"id": 0, "file_name": "l0.png", "width": 800,
                    "height": 50, "text": "x"}],
        "annotations": [{"id": 0, "image_id": 0, "category_id": 0,
                         "bbox": [100, 10, 40, 30], "area": 1200,
                         "iscrowd": 0}],
        "categories": [{"id": 0, "name": "char"}],
    }
    cj = tmp_path / "c.json"
    cj.write_text(json.dumps(coco))

    ds = DetectionDataset(str(cj), str(img_dir), input_size=512,
                          input_height=64, channels=1)
    x, targets, mask, gt = ds.load(0)
    assert x.shape == (64, 512, 1)
    assert mask[0]
    imgs, t, m, gts = next(iter(ds.batches(1, shuffle=False,
                                           drop_last=False)))
    assert imgs.shape == (1, 64, 512, 1)
    # dark block pixels carry the (10+20+40)//3 = 23 truncating mean
    # (letterbox resampling blurs edges; check the block interior)
    assert abs(int(x[x.shape[0] // 2, 512 * 120 // 800, 0]) - 23) <= 2
