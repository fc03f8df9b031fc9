"""Localizer training CLI.

Mirrors train_effocr_localizer_d2.py:121-265: COCO train/val/test
registration, epoch-based max-iter computation, periodic mAP eval with
best-checkpointing on bbox/AP, resume; multi-device data parallelism via
the mesh instead of detectron2 launch().
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp

from effocr_tpu.core.config import LocalizerConfig, LocalizerTrainConfig
from effocr_tpu.core.mesh import make_mesh
from effocr_tpu.data.detection import DetectionDataset
from effocr_tpu.models import create_localizer
from effocr_tpu.train.localizer import LocalizerTrainer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image_dir", type=str, required=True)
    p.add_argument("--train_coco", type=str, required=True)
    p.add_argument("--val_coco", type=str, required=True)
    p.add_argument("--test_coco", type=str, default=None,
                   help="held-out test split: evaluated once with the "
                        "best checkpoint after training (the reference's "
                        "test_file registration, "
                        "train_effocr_localizer_d2.py:113-118)")
    p.add_argument("--run_name", type=str, required=True)
    p.add_argument("--arch", type=str, default="yolov5s")
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--input_size", type=int, default=640)
    p.add_argument("--input_height", type=int, default=None,
                   help="rectangular training canvas height (stride-32 "
                        "multiple); text lines are wide, so e.g. 96x1024 "
                        "trains near-full-resolution chars with fewer "
                        "pixels than a 320 square")
    p.add_argument("--multi_height", type=str, default=None,
                   help="comma-separated canvas-height tiers (e.g. '64,96') "
                        "cycled per epoch, so the detector is robust to the "
                        "inference pipeline's adaptive_height tiers; each "
                        "tier compiles one program variant")
    p.add_argument("--input_channels", type=int, default=3, choices=[1, 3],
                   help="1 = grayscale-native detector (pairs with the "
                        "inference pipeline's gray canvas path; train "
                        "recognizer with the same value)")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--eval_period", type=int, default=1,
                   help="epochs between evals")
    p.add_argument("--resume", action="store_true", default=False)
    p.add_argument("--init_ckpt", type=str, default=None,
                   help="warm-start model weights from a checkpoint "
                        "(variables msgpack, e.g. another run's "
                        "best_bbox_mAP.msgpack; the D2 "
                        "train.init_checkpoint equivalent, "
                        "train_effocr_localizer_d2.py:197-198)")
    p.add_argument("--augment", action="store_true", default=False,
                   help="on-device train augmentation: flip + scale "
                        "jitter + photometric (the reference's D2 mapper "
                        "augs / --alt_augs)")
    p.add_argument("--aug_flip_p", type=float, default=0.5)
    p.add_argument("--aug_scale", type=float, default=0.25)
    p.add_argument("--aug_translate", type=float, default=0.1)
    p.add_argument("--fit_anchors", action="store_true", default=False,
                   help="k-means anchor priors from the train boxes "
                        "(letterbox space) instead of the COCO defaults — "
                        "char boxes are far smaller than COCO objects; "
                        "the D2 anchor-override equivalent "
                        "(train_effocr_localizer_d2.py:200-202). Anchors "
                        "are recorded in model.json and reloaded by infer")
    p.add_argument("--data_device", type=str, default="stream",
                   choices=["stream", "resident"],
                   help="resident: letterbox the corpus once into an HBM "
                        "uint8 bank; steps ship int32 indices only")
    p.add_argument("--wandb", action="store_true", default=False)
    args = p.parse_args()

    os.makedirs(args.run_name, exist_ok=True)
    with open(os.path.join(args.run_name, "args_log.json"), "w") as f:
        json.dump(vars(args), f, indent=2)
    # model identity for the inference loader (cli/infer.py load_engine)
    if args.multi_height and args.input_height is None:
        args.input_height = max(
            int(h) for h in args.multi_height.split(",")
        )

    anchors = None
    if args.fit_anchors:
        from effocr_tpu.data.coco import load_json
        from effocr_tpu.train.localizer import fit_anchors

        coco = load_json(args.train_coco)
        dims = {im["id"]: (im["width"], im["height"])
                for im in coco["images"]}
        h_ref = args.input_height or args.input_size
        wh = []
        for a in coco["annotations"]:
            w_img, h_img = dims[a["image_id"]]
            r = min(h_ref / h_img, args.input_size / w_img)
            wh.append((a["bbox"][2] * r, a["bbox"][3] * r))
        import numpy as _np

        fitted = fit_anchors(_np.asarray(wh, _np.float32))
        anchors = tuple(
            tuple(float(v) for v in fitted[3 * i : 3 * i + 3].reshape(-1))
            for i in range(3)
        )
        print(f"fitted anchors (letterbox px, P3/P4/P5): {anchors}")

    with open(os.path.join(args.run_name, "model.json"), "w") as f:
        json.dump({"arch": args.arch, "num_classes": args.num_classes,
                   "input_size": args.input_size,
                   "input_height": args.input_height,
                   "input_channels": args.input_channels,
                   "anchors": ([list(a) for a in anchors]
                               if anchors else None),
                   "trained_heights": sorted(
                       int(h) for h in (
                           args.multi_height.split(",") if args.multi_height
                           else [args.input_height or args.input_size]
                       )
                   )}, f)

    cfg = LocalizerTrainConfig(
        localizer=LocalizerConfig(
            arch=args.arch, input_size=args.input_size,
            input_height=args.input_height,
            num_classes=args.num_classes,
            input_channels=args.input_channels,
        ),
        batch_size=args.batch_size, lr=args.lr,
        weight_decay=args.weight_decay, num_epochs=args.num_epochs,
        eval_period_epochs=args.eval_period,
        augment=args.augment, aug_flip_p=args.aug_flip_p,
        aug_scale=args.aug_scale, aug_translate=args.aug_translate,
    )

    heights = (
        [int(h) for h in args.multi_height.split(",")]
        if args.multi_height else [args.input_height]
    )
    train_sets = [
        DetectionDataset(args.train_coco, args.image_dir, args.input_size,
                         input_height=h, channels=args.input_channels)
        for h in heights
    ]
    train_ds = train_sets[0]
    val_ds = DetectionDataset(args.val_coco, args.image_dir, args.input_size,
                              input_height=max(h or args.input_size
                                               for h in heights),
                              channels=args.input_channels)

    steps_per_epoch = max(len(train_ds) // args.batch_size, 1)
    total_steps = steps_per_epoch * args.num_epochs

    loc_kw = {"anchors": anchors} if anchors else {}
    model = create_localizer(args.arch, num_classes=args.num_classes,
                             **loc_kw)
    mesh = make_mesh() if len(jax.devices()) > 1 else None
    trainer = LocalizerTrainer(cfg, model, args.run_name, total_steps,
                               mesh=mesh, use_wandb=args.wandb)
    trainer.init_state(jax.random.PRNGKey(cfg.seed), args.input_size)
    if args.init_ckpt:
        from effocr_tpu.train import checkpoint as ckpt

        loaded = ckpt.load_variables(trainer.variables, args.init_ckpt)
        trainer.state["params"] = loaded["params"]
        trainer.state["batch_stats"] = loaded.get("batch_stats", {})
        print(f"warm-started weights from {args.init_ckpt}")
    if args.resume:
        trainer.resume()

    import numpy as np

    step = 0
    for epoch in range(args.num_epochs):
        train_ds = train_sets[epoch % len(train_sets)]
        if args.data_device == "resident":
            order = np.arange(len(train_ds))
            np.random.default_rng(cfg.seed + epoch).shuffle(order)
            losses = (
                trainer.train_step_bank(
                    train_ds, order[s : s + args.batch_size]
                )
                for s in range(
                    0, len(order) - args.batch_size + 1, args.batch_size
                )
            )
        else:
            losses = (
                trainer.train_step(
                    jnp.asarray(imgs), jnp.asarray(tgts), jnp.asarray(masks)
                )
                for imgs, tgts, masks, _ in train_ds.batches(
                    args.batch_size, seed=cfg.seed + epoch
                )
            )
        for loss, parts in losses:
            if step % 50 == 0:
                trainer.metrics.log({"train/loss": loss, **parts}, step=step)
                print(f"epoch {epoch} step {step}: loss={loss:.4f}")
            step += 1
        if (epoch + 1) % args.eval_period == 0:
            result = trainer.evaluate(
                (b[0], b[3]) for b in val_ds.batches(
                    args.batch_size, shuffle=False, drop_last=False
                )
            )
            print(f"epoch {epoch}: {result}")
        trainer.save("last")

    if args.test_coco:
        from effocr_tpu.eval.coco_map import coco_map
        from effocr_tpu.train import checkpoint as ckpt

        test_ds = DetectionDataset(
            args.test_coco, args.image_dir, args.input_size,
            input_height=max(h or args.input_size for h in heights),
            channels=args.input_channels)
        # score the BEST checkpoint, not the last epoch
        best = ckpt.best_checkpoint_path(args.run_name, "best_bbox_mAP")
        if os.path.exists(best):
            loaded = ckpt.load_variables(trainer.variables, best)
            trainer.state["params"] = loaded["params"]
            trainer.state["batch_stats"] = loaded.get("batch_stats", {})
        preds, gts = [], []
        for images, _, _, gt_list in test_ds.batches(
                args.batch_size, shuffle=False, drop_last=False):
            boxes, scores, classes, valid = trainer._infer_fn(
                trainer.variables, jnp.asarray(images))
            import numpy as _np

            for i in range(len(gt_list)):
                v = _np.asarray(valid[i])
                preds.append({"boxes": _np.asarray(boxes[i])[v],
                              "scores": _np.asarray(scores[i])[v],
                              "classes": _np.asarray(classes[i])[v]})
                gts.append(gt_list[i])
        test_result = coco_map(preds, gts, num_classes=args.num_classes)
        trainer.metrics.log(
            {f"test/{k}": v for k, v in test_result.items()})
        print(f"test: {test_result}")


if __name__ == "__main__":
    main()
