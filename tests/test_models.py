"""Model shape/compile tests on CPU with tiny inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from effocr_tpu.models import (
    ENCODER_REGISTRY,
    create_classifier,
    create_encoder,
    create_localizer,
)
from effocr_tpu.models.yolo import decode_predictions


EXPECTED_DIM = {
    "convnext_atto": 320,
    "convnext_femto": 384,
    "mobilenetv3_small_050": 1024,
    "vit_tiny_patch16_224": 192,
    "xcit_tiny_12_p8_224": 192,
}


@pytest.mark.parametrize("name", sorted(EXPECTED_DIM))
def test_encoder_forward(name):
    # tiny image size keeps CPU compile fast; all archs accept any mult-of-32
    size = 64
    model = create_encoder(name, dtype=jnp.float32, image_size=size) \
        if "vit" in name or "xcit" in name else \
        create_encoder(name, dtype=jnp.float32)
    x = jnp.zeros((2, size, size, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, EXPECTED_DIM[name])
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_classifier_logits():
    model = create_classifier("convnext_atto", num_classes=11,
                              dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 11)


def test_yolo_forward_and_decode():
    model = create_localizer("yolov5n", num_classes=2, dtype=jnp.float32)
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    (decoded, raw), _ = model.apply(
        variables, x, train=False, mutable=["batch_stats"]
    )
    # strides 8/16/32 on 128 -> 16²+8²+4² cells, 3 anchors each
    a = 3 * (16 * 16 + 8 * 8 + 4 * 4)
    assert decoded.shape == (1, a, 7)
    assert len(raw) == 3
    assert raw[0].shape == (1, 16, 16, 3, 7)
    # decoded objectness/cls are probabilities
    assert (np.asarray(decoded[..., 4:]) >= 0).all()
    assert (np.asarray(decoded[..., 4:]) <= 1).all()


def test_decode_predictions_grid_math():
    # one scale, one anchor; zero logits -> sigmoid 0.5
    raw = [jnp.zeros((1, 2, 2, 1, 6))]
    out = np.asarray(decode_predictions(raw, anchors=((16, 16),), strides=(8,)))
    # xy = (2*0.5 - 0.5 + grid)*8 = (0.5 + grid)*8
    np.testing.assert_allclose(out[0, 0, :2], [4.0, 4.0])
    np.testing.assert_allclose(out[0, 3, :2], [12.0, 12.0])
    # wh = (2*0.5)^2 * anchor = anchor
    np.testing.assert_allclose(out[0, 0, 2:4], [16.0, 16.0])


def test_batchnorm_train_mode_updates_stats():
    model = create_localizer("yolov5n", num_classes=1, dtype=jnp.float32)
    x = jnp.ones((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, mutated = model.apply(
        variables, x, train=True, decode=False, mutable=["batch_stats"]
    )
    assert "batch_stats" in mutated
