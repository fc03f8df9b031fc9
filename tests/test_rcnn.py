"""Two-stage (Faster R-CNN) localizer family: ROIAlign correctness, decode
layout contract, loss finiteness + descent, trainer dispatch."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from effocr_tpu.models.rcnn import (
    FasterRCNN,
    apply_deltas,
    boxes_to_deltas,
    level_anchors,
    rcnn_loss,
    rcnn_n,
    roi_align,
)


def test_delta_roundtrip(rng):
    anchors = jnp.asarray(rng.uniform(10, 100, (16, 4)), jnp.float32)
    anchors = anchors.at[:, 2:].set(anchors[:, :2] + anchors[:, 2:])
    boxes = anchors + jnp.asarray(rng.normal(0, 3, (16, 4)), jnp.float32)
    deltas = boxes_to_deltas(anchors, boxes)
    rec = apply_deltas(anchors, deltas)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(boxes),
                               rtol=1e-4, atol=1e-3)


def test_level_anchors_layout():
    anc = np.asarray(level_anchors(2, 3, 8, 32.0))
    assert anc.shape == (2 * 3 * 3, 4)
    # cell-major, anchor-minor: first three rows share a center
    c0 = (anc[0, :2] + anc[0, 2:]) / 2
    c1 = (anc[1, :2] + anc[1, 2:]) / 2
    c3 = (anc[3, :2] + anc[3, 2:]) / 2
    np.testing.assert_allclose(c0, c1, atol=1e-5)
    assert not np.allclose(c0, c3)
    # aspect 1.0 anchor (middle) is square
    w = anc[1, 2] - anc[1, 0]
    h = anc[1, 3] - anc[1, 1]
    np.testing.assert_allclose(w, h, rtol=1e-5)


def test_roi_align_constant_and_ramp():
    # constant feature -> constant crop regardless of box
    f3 = jnp.full((16, 16, 4), 3.0)
    f4 = jnp.zeros((8, 8, 4))
    f5 = jnp.zeros((4, 4, 4))
    boxes = jnp.asarray([[8.0, 8.0, 40.0, 40.0]])  # scale 32 -> level P3
    out = roi_align((f3, f4, f5), boxes)
    assert out.shape == (1, 7, 7, 4)
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)

    # x-ramp feature: sampled values increase along crop x
    xs = jnp.broadcast_to(jnp.arange(16.0)[None, :, None], (16, 16, 1))
    out = roi_align((xs, f4[..., :1], f5[..., :1]),
                    jnp.asarray([[16.0, 16.0, 48.0, 48.0]]))
    vals = np.asarray(out)[0, 3, :, 0]
    assert (np.diff(vals) > 0).all()
    # center bin of the crop ~ center of the box in feature coords
    np.testing.assert_allclose(vals[3], 32.0 / 8 - 0.5 + 0.0, atol=1.0)


@pytest.fixture(scope="module")
def tiny_rcnn():
    model = FasterRCNN(num_classes=2, depth_multiple=0.33,
                       width_multiple=0.25, num_proposals=32,
                       pre_nms_topk=32, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=False
    )
    return model, variables


def test_rcnn_decode_contract(tiny_rcnn):
    model, variables = tiny_rcnn
    x = jnp.zeros((2, 128, 128, 3))
    decoded, aux = model.apply(variables, x, train=False)
    assert decoded.shape == (2, 32, 5 + 2)
    d = np.asarray(decoded)
    # xywh within canvas, obj/cls in [0, 1]
    assert (d[..., 2] >= 0).all() and (d[..., 3] >= 0).all()
    assert (d[..., 4] >= 0).all() and (d[..., 4] <= 1).all()
    assert (d[..., 5:] >= 0).all() and (d[..., 5:] <= 1 + 1e-5).all()
    assert aux["proposals"].shape == (2, 32, 4)
    assert aux["roi_cls"].shape == (2, 32, 3)


def test_rcnn_loss_descends(tiny_rcnn):
    model, variables = tiny_rcnn
    imgs = np.zeros((2, 128, 128, 3), np.float32)
    imgs[:, 40:80, 30:60] = 0.6
    imgs = jnp.asarray(imgs)
    tgts = np.zeros((2, 8, 5), np.float32)
    tgts[:, 0] = [0, 45, 60, 30, 40]
    tgts[:, 1] = [1, 90, 60, 24, 24]
    masks = np.zeros((2, 8), bool)
    masks[:, :2] = True
    tgts, masks = jnp.asarray(tgts), jnp.asarray(masks)

    tx = optax.adam(1e-3)
    state = {"params": variables["params"],
             "batch_stats": variables.get("batch_stats", {}),
             "opt_state": tx.init(variables["params"])}

    @jax.jit
    def step(state):
        def loss_fn(params):
            v = {"params": params, "batch_stats": state["batch_stats"]}
            aux, mut = model.apply(v, imgs, train=True, decode=False,
                                   mutable=["batch_stats"])
            loss, parts = rcnn_loss(aux, tgts, masks, num_classes=2)
            return loss, (mut["batch_stats"], parts)

        (loss, (stats, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state["params"])
        updates, opt = tx.update(grads, state["opt_state"], state["params"])
        return {
            "params": optax.apply_updates(state["params"], updates),
            "batch_stats": stats, "opt_state": opt,
        }, loss, parts

    losses = []
    for _ in range(8):
        state, loss, parts = step(state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert set(parts) == {"loss/box", "loss/obj", "loss/cls"}
    assert losses[-1] < losses[0]


def test_rcnn_trainer_dispatch(tmp_path):
    from effocr_tpu.core.config import LocalizerConfig, LocalizerTrainConfig
    from effocr_tpu.train.localizer import LocalizerTrainer

    cfg = LocalizerTrainConfig(
        localizer=LocalizerConfig(arch="rcnn_n", num_classes=2,
                                  input_size=128, max_det=16, max_nms=64),
        batch_size=2,
    )
    model = rcnn_n(num_classes=2, num_proposals=32, pre_nms_topk=32,
                   dtype=jnp.float32)
    trainer = LocalizerTrainer(cfg, model, str(tmp_path / "rcnn"),
                               total_steps=10)
    trainer.init_state(jax.random.PRNGKey(0), 128)

    imgs = np.zeros((2, 128, 128, 3), np.float32)
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
