"""On-device detection augmentation (kernels/det_augment.py) — the
reference's D2 mapper augs / --alt_augs equivalent
(train_effocr_localizer_d2.py:149-166)."""

import jax
import jax.numpy as jnp
import numpy as np

from effocr_tpu.kernels.det_augment import augment_detection_batch


def _canvas(b=2, h=32, w=64):
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0.2, 0.8, (b, h, w, 3)).astype(np.float32)
    targets = np.zeros((b, 8, 5), np.float32)
    mask = np.zeros((b, 8), bool)
    # one box per image, comfortably inside
    targets[:, 0] = [0, 30.0, 16.0, 12.0, 10.0]
    mask[:, 0] = True
    return jnp.asarray(imgs), jnp.asarray(targets), jnp.asarray(mask)


def test_identity_when_disabled():
    imgs, t, m = _canvas()
    out, t2, m2 = augment_detection_batch(
        imgs, t, m, jax.random.PRNGKey(0), flip_p=0.0, scale=0.0,
        translate=0.0, brightness=0.0, contrast=0.0, noise_std=0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-4)
    assert np.array_equal(np.asarray(m2), np.asarray(m))


def test_flip_exact():
    imgs, t, m = _canvas()
    out, t2, m2 = augment_detection_batch(
        imgs, t, m, jax.random.PRNGKey(0), flip_p=1.0, scale=0.0,
        translate=0.0, brightness=0.0, contrast=0.0, noise_std=0.0)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(jnp.flip(imgs, axis=2)),
        rtol=1e-5, atol=1e-5)
    # cx mirrored, everything else unchanged
    w = imgs.shape[2]
    np.testing.assert_allclose(np.asarray(t2)[:, 0, 1],
                               w - np.asarray(t)[:, 0, 1], atol=1e-4)
    np.testing.assert_allclose(np.asarray(t2)[:, 0, 2:],
                               np.asarray(t)[:, 0, 2:], atol=1e-4)
    assert np.array_equal(np.asarray(m2), np.asarray(m))


def test_scale_moves_boxes_with_pixels():
    """Paint a bright block inside the box; after random scale+translate
    the box must still cover the block's new pixel location."""
    b, h, w = 1, 32, 64
    imgs = np.zeros((b, h, w, 3), np.float32)
    imgs[0, 12:22, 24:36] = 1.0   # block == the box
    targets = np.zeros((b, 4, 5), np.float32)
    targets[0, 0] = [0, 30.0, 17.0, 12.0, 10.0]
    mask = np.zeros((b, 4), bool)
    mask[0, 0] = True
    out, t2, m2 = augment_detection_batch(
        jnp.asarray(imgs), jnp.asarray(targets), jnp.asarray(mask),
        jax.random.PRNGKey(3), flip_p=0.0, scale=0.3, translate=0.1,
        brightness=0.0, contrast=0.0, noise_std=0.0)
    out = np.asarray(out)
    assert bool(np.asarray(m2)[0, 0])
    cls, cx, cy, bw, bh = np.asarray(t2)[0, 0]
    ys, xs = np.nonzero(out[0, :, :, 0] > 0.6)
    assert len(xs) > 0
    # bright pixel centroid inside the transformed box (generous margin
    # for bilinear edges)
    mx, my = xs.mean(), ys.mean()
    assert cx - bw / 2 - 1.5 <= mx <= cx + bw / 2 + 1.5
    assert cy - bh / 2 - 1.5 <= my <= cy + bh / 2 + 1.5


def test_deterministic_per_key():
    imgs, t, m = _canvas()
    a = augment_detection_batch(imgs, t, m, jax.random.PRNGKey(9))
    b = augment_detection_batch(imgs, t, m, jax.random.PRNGKey(9))
    c = augment_detection_batch(imgs, t, m, jax.random.PRNGKey(10))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert not np.array_equal(np.asarray(a[0]), np.asarray(c[0]))


def test_train_step_with_augment():
    """Trainer step with cfg.augment: runs, loss finite, different
    aug_step values produce different losses on identical data."""
    from effocr_tpu.core.config import (
        LocalizerConfig,
        LocalizerTrainConfig,
    )
    from effocr_tpu.models import create_localizer
    from effocr_tpu.train.localizer import LocalizerTrainer

    cfg = LocalizerTrainConfig(
        localizer=LocalizerConfig(arch="yolov5n", input_size=64,
                                  num_classes=2),
        batch_size=2, num_epochs=1, augment=True,
    )
    model = create_localizer("yolov5n", num_classes=2)
    trainer = LocalizerTrainer(cfg, model, "/tmp/det_aug_test", 10)
    trainer.init_state(jax.random.PRNGKey(0), 64)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    targets = np.zeros((2, 8, 5), np.float32)
    targets[:, 0] = [0, 32, 32, 20, 16]
    masks = np.zeros((2, 8), bool)
    masks[:, 0] = True

    # call the jitted step directly on copied state so the only
    # difference between runs is the aug_step PRNG fold (the trainer's
    # step donates its state buffer)
    def run(aug_step):
        state = jax.tree.map(jnp.copy, trainer.state)
        _, loss, _ = trainer._step_fn(
            state, jnp.asarray(imgs), jnp.asarray(targets),
            jnp.asarray(masks), jnp.int32(aug_step))
        return float(loss)

    l0, l0b, l1 = run(0), run(0), run(1)
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l0 == l0b          # deterministic per aug_step
    assert l0 != l1           # fold changes the augmentation

    # and the trainer-level wrapper advances the counter by itself
    la, _ = trainer.train_step(jnp.asarray(imgs), jnp.asarray(targets),
                               jnp.asarray(masks))
    assert np.isfinite(la)
    assert trainer._aug_step == 1
