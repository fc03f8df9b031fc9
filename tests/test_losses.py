"""Loss tests: SupCon vs naive numpy, CE, YOLO loss sanity + overfit."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from effocr_tpu.train.losses import (
    cross_entropy_loss,
    supcon_loss,
    yolo_loss,
)


def naive_supcon(emb, labels, temp):
    z = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sims = z @ z.T / temp
    n = len(labels)
    losses = []
    for i in range(n):
        pos = [j for j in range(n) if j != i and labels[j] == labels[i]]
        if not pos:
            continue
        cand = [j for j in range(n) if j != i]
        denom = np.log(np.sum(np.exp(sims[i, cand])))
        losses.append(-np.mean([sims[i, p] - denom for p in pos]))
    return float(np.mean(losses))


def test_supcon_matches_naive(rng):
    emb = rng.normal(size=(16, 8)).astype(np.float32)
    labels = rng.integers(0, 4, size=(16,))
    got = float(supcon_loss(jnp.asarray(emb), jnp.asarray(labels), 0.1))
    assert got == pytest.approx(naive_supcon(emb, labels, 0.1), rel=1e-4)


def test_supcon_ignores_padding(rng):
    emb = rng.normal(size=(8, 4)).astype(np.float32)
    labels = np.array([0, 0, 1, 1, 2, 2, 3, 3])
    full = float(supcon_loss(jnp.asarray(emb[:6]), jnp.asarray(labels[:6]), 0.1))
    valid = np.array([True] * 6 + [False] * 2)
    padded = float(
        supcon_loss(jnp.asarray(emb), jnp.asarray(labels), 0.1,
                    valid=jnp.asarray(valid))
    )
    assert padded == pytest.approx(full, rel=1e-5)


def test_supcon_separable_clusters_lower_loss(rng):
    labels = np.repeat(np.arange(4), 4)
    clustered = np.eye(4)[labels] * 10 + rng.normal(size=(16, 4)) * 0.01
    random = rng.normal(size=(16, 4))
    l_c = float(supcon_loss(jnp.asarray(clustered, jnp.float32),
                            jnp.asarray(labels), 0.1))
    l_r = float(supcon_loss(jnp.asarray(random, jnp.float32),
                            jnp.asarray(labels), 0.1))
    assert l_c < l_r


def test_cross_entropy(rng):
    logits = jnp.asarray([[10.0, 0.0], [0.0, 10.0]])
    labels = jnp.asarray([0, 1])
    assert float(cross_entropy_loss(logits, labels)) < 1e-3


def test_yolo_loss_finite_and_assigns(rng):
    b, t, nc = 2, 8, 2
    gh = 8
    anchors = ((10, 13, 16, 30, 33, 23),)
    raw = [jnp.asarray(rng.normal(size=(b, gh, gh, 3, 5 + nc)) * 0.1,
                       jnp.float32)]
    targets = np.zeros((b, t, 5), np.float32)
    targets[0, 0] = [0, 32, 32, 16, 24]   # one char box
    targets[1, 0] = [1, 20, 40, 30, 20]
    mask = np.zeros((b, t), bool)
    mask[0, 0] = mask[1, 0] = True
    loss, parts = yolo_loss(
        raw, jnp.asarray(targets), jnp.asarray(mask), anchors, strides=(8,),
        num_classes=nc,
    )
    assert np.isfinite(float(loss))
    assert float(parts["loss/box"]) > 0  # something was assigned


def test_yolo_loss_overfits_tiny_case(rng):
    """Direct gradient descent on raw logits should drive the loss down —
    validates gradients flow through assignment/CIoU/obj/cls."""
    anchors = ((16, 16),)
    gh, nc = 8, 1
    targets = jnp.asarray([[[0, 28.0, 36.0, 14.0, 18.0]]])
    mask = jnp.ones((1, 1), bool)

    def loss_fn(raw0):
        loss, _ = yolo_loss([raw0], targets, mask, anchors, strides=(8,),
                            num_classes=nc)
        return loss

    raw0 = jnp.zeros((1, gh, gh, 1, 5 + nc))
    tx = optax.adam(0.1)
    opt_state = tx.init(raw0)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    loss0 = None
    for i in range(100):
        loss, g = grad_fn(raw0)
        if loss0 is None:
            loss0 = float(loss)
        updates, opt_state = tx.update(g, opt_state)
        raw0 = optax.apply_updates(raw0, updates)
    assert float(loss) < 0.2 * loss0
