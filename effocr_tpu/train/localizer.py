"""Localizer (detector) training.

Replaces the Detectron2 LazyConfig trainer (train_effocr_localizer_d2.py:48-110):
AMP/bf16 train step with the YOLO loss, warmup+cosine schedule, periodic COCO
mAP eval and best-checkpointing on bbox/AP (the reference's
BestCheckpointer hook, :92-93), resume support, and data parallelism via the
mesh 'data' axis (replaces detectron2.engine.launch/DDP, :258-265).
"""

from __future__ import annotations

import os
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from effocr_tpu.core.config import LocalizerTrainConfig
from effocr_tpu.eval.coco_map import coco_map
from effocr_tpu.kernels.yolo_decode import decode_and_nms
from effocr_tpu.train import checkpoint as ckpt
from effocr_tpu.train.losses import yolo_loss
from effocr_tpu.train.metrics import MetricsWriter


def fit_anchors(boxes_wh: np.ndarray, n: int = 9, iters: int = 50,
                seed: int = 0) -> np.ndarray:
    """k-means anchor fitting over training box (w, h) pairs.

    The reference hand-overrides D2 anchor scales for character detection
    (train_effocr_localizer_d2.py:200-202); this derives them from data —
    standard YOLO autoanchor, 1 - IoU(wh, anchor) as the distance.
    Returns [n, 2] anchors sorted by area (split into 3 scale groups of 3
    for the detect head).
    """
    rng = np.random.default_rng(seed)
    boxes = np.asarray(boxes_wh, np.float64).reshape(-1, 2)
    boxes = boxes[(boxes > 1).all(axis=1)]
    anchors = boxes[rng.choice(len(boxes), size=n, replace=len(boxes) < n)]

    def iou_wh(a, b):
        inter = np.minimum(a[:, None, 0], b[None, :, 0]) * np.minimum(
            a[:, None, 1], b[None, :, 1]
        )
        union = (a[:, 0] * a[:, 1])[:, None] + (b[:, 0] * b[:, 1])[None, :]
        return inter / (union - inter + 1e-9)

    for _ in range(iters):
        assign = np.argmax(iou_wh(boxes, anchors), axis=1)
        for k in range(n):
            sel = boxes[assign == k]
            if len(sel):
                anchors[k] = np.median(sel, axis=0)
    order = np.argsort(anchors[:, 0] * anchors[:, 1])
    return anchors[order].astype(np.float32)


def make_detector_train_step(model, cfg: LocalizerTrainConfig, tx,
                             anchors, mesh: Optional[Mesh] = None,
                             bank_mode: bool = False):
    """Loss dispatch by family: anchors!=None -> YOLOv5 anchor-matching
    loss; two-stage models (num_proposals attr) -> Faster R-CNN RPN+ROI
    loss; otherwise the anchor-free (FCOS) loss.

    bank_mode: canvases/targets live in HBM (LocalizerTrainer.attach_bank);
    the step gathers by int32 index — same rationale as the recognizer's
    resident bank (host PNG decode off the step path; ~1 KB/step on the
    host->device link instead of megabytes).

    cfg.augment: on-device flip/scale-jitter/photometric augmentation
    (kernels/det_augment.py; the reference's D2 mapper augs incl.
    --alt_augs, train_effocr_localizer_d2.py:149-166).  The step then
    takes an extra int32 ``aug_step`` for PRNG folding — a scalar so the
    per-step host->device transfer stays bytes, not a key buffer."""
    two_stage = anchors is None and hasattr(model, "num_proposals")
    augment = getattr(cfg, "augment", False)

    def _body(state, images, targets, target_mask, aug_step):
        """images [B,S,S,3] uint8 (normalized here — ship bytes, not
        floats) or float in [0,1]; targets [B,T,5] (cls,cx,cy,w,h px)."""
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        if augment:
            from effocr_tpu.kernels.det_augment import (
                augment_detection_batch,
            )

            key = jax.random.fold_in(
                jax.random.PRNGKey(cfg.seed + 101), aug_step
            )
            images, targets, target_mask = augment_detection_batch(
                images, targets, target_mask, key,
                flip_p=cfg.aug_flip_p, scale=cfg.aug_scale,
                translate=cfg.aug_translate,
            )

        def loss_fn(params):
            variables = {"params": params,
                         "batch_stats": state["batch_stats"]}
            raw, mut = model.apply(
                variables, images, train=True, decode=False,
                mutable=["batch_stats"],
            )
            if two_stage:
                from effocr_tpu.models.rcnn import rcnn_loss

                loss, parts = rcnn_loss(
                    raw, targets, target_mask,
                    num_classes=cfg.localizer.num_classes,
                )
            elif anchors is None:
                from effocr_tpu.models.fcos import fcos_loss

                loss, parts = fcos_loss(
                    raw, targets, target_mask,
                    num_classes=cfg.localizer.num_classes,
                )
            else:
                loss, parts = yolo_loss(
                    raw, targets, target_mask, anchors,
                    num_classes=cfg.localizer.num_classes,
                    box_gain=cfg.box_gain, obj_gain=cfg.obj_gain,
                    cls_gain=cfg.cls_gain, anchor_t=cfg.anchor_match_thresh,
                )
            return loss, (mut["batch_stats"], parts)

        (loss, (new_stats, parts)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state["params"])
        updates, new_opt = tx.update(grads, state["opt_state"],
                                     state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": new_params,
            "batch_stats": new_stats,
            "opt_state": new_opt,
        }
        return new_state, loss, parts

    if augment:
        def step(state, images, targets, target_mask, aug_step):
            return _body(state, images, targets, target_mask, aug_step)

        def step_bank(state, bank_imgs, bank_targets, bank_masks, idx,
                      aug_step):
            return _body(
                state,
                jnp.take(bank_imgs, idx, axis=0),
                jnp.take(bank_targets, idx, axis=0),
                jnp.take(bank_masks, idx, axis=0),
                aug_step,
            )
    else:
        def step(state, images, targets, target_mask):
            return _body(state, images, targets, target_mask, 0)

        def step_bank(state, bank_imgs, bank_targets, bank_masks, idx):
            return _body(
                state,
                jnp.take(bank_imgs, idx, axis=0),
                jnp.take(bank_targets, idx, axis=0),
                jnp.take(bank_masks, idx, axis=0),
                0,
            )

    extra = ((NamedSharding(mesh, P()),) if (mesh is not None and augment)
             else ())
    if bank_mode:
        if mesh is not None:
            repl = NamedSharding(mesh, P())
            data = NamedSharding(mesh, P("data"))
            return jax.jit(
                step_bank,
                in_shardings=(repl, repl, repl, repl, data) + extra,
                out_shardings=(repl, repl, repl),
                donate_argnums=(0,),
            )
        return jax.jit(step_bank, donate_argnums=(0,))
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(
            step,
            in_shardings=(repl, data, data, data) + extra,
            out_shardings=(repl, repl, repl),
            donate_argnums=(0,),
        )
    return jax.jit(step, donate_argnums=(0,))


class LocalizerTrainer:
    def __init__(self, cfg: LocalizerTrainConfig, model, run_dir: str,
                 total_steps: int, mesh: Optional[Mesh] = None,
                 use_wandb: bool = False):
        self.cfg = cfg
        self.model = model
        self.run_dir = run_dir
        self.mesh = mesh
        os.makedirs(run_dir, exist_ok=True)
        self.metrics = MetricsWriter(run_dir, use_wandb=use_wandb)

        schedule = optax.warmup_cosine_decay_schedule(
            0.0, cfg.lr, cfg.warmup_steps, max(total_steps, cfg.warmup_steps + 1)
        )
        self.tx = optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.adamw(schedule, weight_decay=cfg.weight_decay),
        )
        self.anchors = getattr(model, "anchors", None)
        self._step_fn = make_detector_train_step(
            model, cfg, self.tx, self.anchors, mesh
        )
        self._step_bank_fn = make_detector_train_step(
            model, cfg, self.tx, self.anchors, mesh, bank_mode=True
        )
        self._banks = {}  # id(dataset) -> HBM (imgs, targets, masks)
        self._infer_fn = jax.jit(
            lambda variables, x: decode_and_nms(
                model.apply(
                    variables,
                    x.astype(jnp.float32) / 255.0
                    if x.dtype == jnp.uint8 else x,
                    train=False,
                )[0],
                conf_thresh=0.001,  # low-conf eval sweep for mAP
                iou_thresh=0.45,
                max_nms=cfg.localizer.max_nms,
                max_det=cfg.localizer.max_det,
            )
        )
        self.state = None
        self.best_ap = -1.0
        self._aug_step = 0

    def init_state(self, key: jax.Array, input_size: Optional[int] = None):
        size = input_size or self.cfg.localizer.input_size
        height = self.cfg.localizer.input_height or size
        ch = getattr(self.cfg.localizer, "input_channels", 3)
        x = jnp.zeros((1, height, size, ch), jnp.float32)
        variables = self.model.init(key, x, train=False)
        params = variables["params"]
        self.state = {
            "params": params,
            "batch_stats": variables.get("batch_stats", {}),
            "opt_state": self.tx.init(params),
        }
        if self.mesh is not None:
            self.state = jax.device_put(
                self.state, NamedSharding(self.mesh, P())
            )
        return self.state

    @property
    def variables(self):
        return {"params": self.state["params"],
                "batch_stats": self.state["batch_stats"]}

    def train_step(self, images, targets, target_mask):
        args = (self.state, images, targets, target_mask)
        if self.cfg.augment:
            args += (jnp.int32(self._aug_step),)
            self._aug_step += 1
        self.state, loss, parts = self._step_fn(*args)
        return float(loss), {k: float(v) for k, v in parts.items()}

    # ------------------------------------------------------ resident bank
    def attach_bank(self, dataset):
        """Materialize a DetectionDataset into HBM (uint8 canvases +
        padded targets/masks); one bank per dataset (multi_height rotates
        several).  See make_detector_train_step bank_mode."""
        key = id(dataset)
        if key not in self._banks:
            imgs, tgts, masks = dataset.materialize()
            put = (
                (lambda a: jax.device_put(a, NamedSharding(self.mesh, P())))
                if self.mesh is not None else jax.device_put
            )
            self._banks[key] = (put(imgs), put(tgts), put(masks))
        return self._banks[key]

    def train_step_bank(self, dataset, indices):
        bi, bt, bm = self.attach_bank(dataset)
        args = (self.state, bi, bt, bm,
                jnp.asarray(np.asarray(indices, np.int32)))
        if self.cfg.augment:
            args += (jnp.int32(self._aug_step),)
            self._aug_step += 1
        self.state, loss, parts = self._step_bank_fn(*args)
        return float(loss), {k: float(v) for k, v in parts.items()}

    # ----------------------------------------------------------------- eval
    def evaluate(self, batches: Iterable[Tuple[np.ndarray, List[Dict]]]
                 ) -> Dict[str, float]:
        """batches: (images [B,S,S,3] float, gt list per image with
        'boxes' xyxy / 'classes').  Returns COCO bbox AP metrics."""
        preds, gts = [], []
        for images, gt_list in batches:
            boxes, scores, classes, valid = self._infer_fn(
                self.variables, jnp.asarray(images)
            )
            boxes, scores = np.asarray(boxes), np.asarray(scores)
            classes, valid = np.asarray(classes), np.asarray(valid)
            for i in range(len(gt_list)):
                v = valid[i]
                preds.append({
                    "boxes": boxes[i][v], "scores": scores[i][v],
                    "classes": classes[i][v],
                })
                gts.append(gt_list[i])
        result = coco_map(preds, gts,
                          num_classes=self.cfg.localizer.num_classes)
        self.metrics.log(result)
        if result["bbox/AP"] >= self.best_ap:
            self.best_ap = result["bbox/AP"]
            ckpt.save_variables(
                self.variables,
                ckpt.best_checkpoint_path(self.run_dir, "best_bbox_mAP"),
            )
        return result

    def save(self, name: str = "last"):
        ckpt.save_train_state(
            self.state, os.path.join(self.run_dir, f"{name}.msgpack")
        )

    def resume(self, name: str = "last"):
        path = os.path.join(self.run_dir, f"{name}.msgpack")
        if os.path.exists(path):
            self.state = ckpt.load_train_state(self.state, path)
            return True
        return False
