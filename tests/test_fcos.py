"""FCOS alternate detector family: shapes, decode layout compatibility,
loss gradient flow / overfit."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from effocr_tpu.kernels.yolo_decode import decode_and_nms
from effocr_tpu.models import create_localizer
from effocr_tpu.models.fcos import decode_fcos, fcos_loss


def test_fcos_forward_decode_layout():
    model = create_localizer("fcos_n", num_classes=2, dtype=jnp.float32)
    x = jnp.zeros((1, 128, 128, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    (decoded, raw), _ = model.apply(
        variables, x, train=False, mutable=["batch_stats"]
    )
    a = 16 * 16 + 8 * 8 + 4 * 4
    assert decoded.shape == (1, a, 7)
    # scores are probabilities; downstream decode_and_nms works unchanged
    assert (np.asarray(decoded[..., 4:]) >= 0).all()
    assert (np.asarray(decoded[..., 4:]) <= 1).all()
    boxes, scores, classes, valid = decode_and_nms(
        decoded, conf_thresh=0.01, iou_thresh=0.5, max_nms=64, max_det=16
    )
    assert boxes.shape == (1, 16, 4)


def test_decode_fcos_geometry():
    # one scale stride 8, zero logits: softplus(0)*8 = 5.545 each side
    raw = [jnp.zeros((1, 2, 2, 6))]
    out = np.asarray(decode_fcos(raw, strides=(8,)))
    d = np.log(2.0) * 8
    np.testing.assert_allclose(out[0, 0, :2], [4.0, 4.0], atol=1e-5)  # center
    np.testing.assert_allclose(out[0, 0, 2], 2 * d, rtol=1e-5)        # width


def test_fcos_loss_assigns_and_overfits():
    targets = jnp.asarray([[[0, 32.0, 32.0, 24.0, 24.0]]])
    mask = jnp.ones((1, 1), bool)
    raws = [jnp.zeros((1, 8, 8, 6)), jnp.zeros((1, 4, 4, 6)),
            jnp.zeros((1, 2, 2, 6))]

    def loss_fn(rs):
        loss, _ = fcos_loss(rs, targets, mask, num_classes=1)
        return loss

    loss0, parts = fcos_loss(raws, targets, mask, num_classes=1)
    assert np.isfinite(float(loss0))
    assert float(parts["loss/box"]) > 0  # the gt was assigned somewhere

    tx = optax.adam(0.05)
    opt = tx.init(raws)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    for _ in range(120):
        loss, g = grad_fn(raws)
        updates, opt = tx.update(g, opt)
        raws = optax.apply_updates(raws, updates)
    assert float(loss) < 0.25 * float(loss0)


def test_localizer_trainer_with_fcos(tmp_path):
    from effocr_tpu.core.config import LocalizerConfig, LocalizerTrainConfig
    from effocr_tpu.train.localizer import LocalizerTrainer

    cfg = LocalizerTrainConfig(
        localizer=LocalizerConfig(arch="fcos_n", num_classes=2,
                                  input_size=128, max_det=32, max_nms=128),
        batch_size=2,
    )
    model = create_localizer("fcos_n", num_classes=2, dtype=jnp.float32)
    trainer = LocalizerTrainer(cfg, model, str(tmp_path / "fcos"),
                               total_steps=10)
    trainer.init_state(jax.random.PRNGKey(0), 128)
    imgs = np.zeros((2, 128, 128, 3), np.float32)
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
    assert "bbox/AP" in result
