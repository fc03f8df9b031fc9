"""Recognizer training CLI.

Flag-for-flag with train_effocr_recognizer.py:185-242; emits the same
artifact directory: enc_best checkpoint, ref index + ref.txt, hns.txt,
class_map.json (FFNN mode), args_log.json.
"""

from __future__ import annotations

import argparse
import json
import os

import jax

from effocr_tpu.core.config import EncoderConfig, RecognizerTrainConfig
from effocr_tpu.core.mesh import make_mesh
from effocr_tpu.data.folder import CharFolderDataset, split_indices
from effocr_tpu.models import create_classifier, create_encoder
from effocr_tpu.train.recognizer import RecognizerTrainer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root_dir_path", type=str, required=True)
    p.add_argument("--train_ann_path", type=str, required=True)
    p.add_argument("--val_ann_path", type=str, required=True)
    p.add_argument("--test_ann_path", type=str, required=True)
    p.add_argument("--run_name", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--lr", type=float, default=2e-6)
    p.add_argument("--weight_decay", type=float, default=5e-4)
    p.add_argument("--num_epochs", type=int, default=5)
    p.add_argument("--temp", type=float, default=0.1)
    p.add_argument("--m", type=int, default=4)
    p.add_argument("--imsize", type=int, default=224)
    p.add_argument("--input_channels", type=int, default=3, choices=[1, 3],
                   help="1 = grayscale-native encoder (pairs with the "
                        "inference pipeline's gray canvas path: 3x fewer "
                        "host->device bytes; train localizer with the "
                        "same value)")
    p.add_argument("--hns_txt_path", type=str, default=None)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--resume", action="store_true", default=False,
                   help="continue from <run_name>/last.msgpack (full "
                        "train state incl. optimizer + epoch counter)")
    p.add_argument("--lang", type=str, default="jp", choices=["jp", "en"])
    p.add_argument("--finetune", action="store_true", default=False)
    p.add_argument("--pretrain", action="store_true", default=False)
    p.add_argument("--high_blur", action="store_true", default=False)
    p.add_argument("--epoch_viz_dir", type=str, default=None)
    p.add_argument("--infer_hardneg_k", type=int, default=8)
    p.add_argument("--N_classes", type=int, default=None)
    p.add_argument("--test_at_end", action="store_true", default=False)
    p.add_argument("--auto_model", type=str, default="convnext_tiny",
                   help="encoder architecture (see models.ENCODER_REGISTRY); "
                        "replaces --auto_model_timm/--auto_model_hf")
    p.add_argument("--num_passes", type=int, default=1)
    p.add_argument("--no_aug", action="store_true", default=False)
    p.add_argument("--lr_schedule", type=str, default="constant",
                   choices=["constant", "cosine"],
                   help="from-scratch recipe: warmup+cosine decay")
    p.add_argument("--warmup_frac", type=float, default=0.0)
    p.add_argument("--min_lr_frac", type=float, default=0.0)
    p.add_argument("--aux_ce_weight", type=float, default=0.0,
                   help="weight of the auxiliary cosine-classifier CE "
                        "added to SupCon (kNN mode; 0 = reference parity)")
    p.add_argument("--aux_ce_temp", type=float, default=0.07)
    p.add_argument("--aux_init", type=str, default="embed",
                   choices=["embed", "random"])
    p.add_argument("--aux_lr_mult", type=float, default=1.0,
                   help="proxy-row lr multiplier (10-100x at large C)")
    p.add_argument("--ref_source", type=str, default="render",
                   choices=["render", "centroid"],
                   help="prototype rows: clean renders (reference) or "
                        "per-class centroid embeddings over train items")
    p.add_argument("--centroid_cap", type=int, default=32)
    p.add_argument("--adam_b2", type=float, default=0.999)
    p.add_argument("--crop_sim", type=float, default=0.0,
                   help="p of warping a render into paired-crop geometry "
                        "(scale 0.45-0.85, edge-anchored) during aug")
    p.add_argument("--paired_jitter", type=float, default=0.0,
                   help="p of a small affine jitter on paired crops "
                        "(simulated detector box jitter -> crop-geometry "
                        "invariance; reference never augments crops)")
    p.add_argument("--adjacent_font_path", type=str, default=None,
                   help="font file enabling the AddAdjacentChars neighbor-"
                        "glyph augmentation (reference defines it unwired; "
                        "opt-in here)")
    p.add_argument("--data_device", type=str, default="stream",
                   choices=["stream", "resident"],
                   help="resident: upload the dataset to HBM once (gray "
                        "uint8 bank); steps ship int32 indices only")
    p.add_argument("--eval_period", type=int, default=1,
                   help="epochs between val evals (centroid eval embeds "
                        "the train set; at 10k+ classes evaluate sparsely)")
    p.add_argument("--render_font_name", type=str, default=None,
                   help="prototype font (default: NotoSerifCJKjp-Regular for "
                        "jp, NotoSerif-Regular for en)")
    p.add_argument("--wandb", action="store_true", default=False)
    args = p.parse_args()

    os.makedirs(args.run_name, exist_ok=True)
    with open(os.path.join(args.run_name, "args_log.json"), "w") as f:
        json.dump(vars(args), f, indent=2)
    # model identity for the inference loader (cli/infer.py load_engine).
    # crop_geometry records how the training crops were cut (the tree's
    # dataset_meta.json, written by format-dataset): inference crop rects
    # must match it (core/config.py PipelineConfig.crop_geometry).  Trees
    # predating the meta file came from our builder's default = tight.
    crop_geometry = "tight"
    meta_path = os.path.join(args.root_dir_path, "dataset_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            crop_geometry = json.load(f).get("crop_geometry", "tight")
    with open(os.path.join(args.run_name, "model.json"), "w") as f:
        json.dump({"arch": args.auto_model, "image_size": args.imsize,
                   "num_classes": args.N_classes,
                   "input_channels": args.input_channels,
                   "crop_geometry": crop_geometry}, f)

    cfg = RecognizerTrainConfig(
        encoder=EncoderConfig(
            arch=args.auto_model, image_size=args.imsize,
            num_classes=args.N_classes,
            input_channels=args.input_channels,
        ),
        batch_size=args.batch_size, lr=args.lr,
        weight_decay=args.weight_decay, num_epochs=args.num_epochs,
        temperature=args.temp, m_per_class=args.m,
        num_passes=args.num_passes, lang=args.lang,
        finetune=args.finetune, pretrain=args.pretrain,
        high_blur=args.high_blur, no_aug=args.no_aug,
        hns_txt_path=args.hns_txt_path,
        infer_hardneg_k=args.infer_hardneg_k,
        lr_schedule=args.lr_schedule, warmup_frac=args.warmup_frac,
        min_lr_frac=args.min_lr_frac, aux_ce_weight=args.aux_ce_weight,
        aux_ce_temp=args.aux_ce_temp, aux_init=args.aux_init,
        aux_lr_mult=args.aux_lr_mult, ref_source=args.ref_source,
        centroid_cap=args.centroid_cap, eval_period_epochs=args.eval_period,
        adam_b2=args.adam_b2, crop_sim=args.crop_sim,
        paired_jitter=args.paired_jitter,
        adjacent_font_path=args.adjacent_font_path,
        data_device=args.data_device,
    )

    classifier_mode = args.N_classes is not None
    if classifier_mode:
        model = create_classifier(args.auto_model, args.N_classes)
    else:
        model = create_encoder(args.auto_model)

    dataset = CharFolderDataset(args.root_dir_path)

    from effocr_tpu.cli.common import (
        ann_stems,
        build_and_eval_index,
        default_render_indices,
    )

    idx_train, idx_val, idx_test = split_indices(
        dataset, ann_stems(args.train_ann_path),
        ann_stems(args.val_ann_path), ann_stems(args.test_ann_path),
        finetune=args.finetune, pretrain=args.pretrain,
    )
    render_ref_idx = default_render_indices(
        dataset, args.lang, args.render_font_name
    )

    if classifier_mode:
        idx_to_class = {
            v: chr(int(k)) for k, v in dataset.class_to_idx.items()
        }
        with open(os.path.join(args.run_name, "class_map.json"), "w") as f:
            json.dump(idx_to_class, f, indent=2)

    mesh = make_mesh() if len(jax.devices()) > 1 else None
    trainer = RecognizerTrainer(
        cfg, model, args.run_name, classifier_mode=classifier_mode,
        mesh=mesh, use_wandb=args.wandb,
    )
    trainer.init_state(jax.random.PRNGKey(cfg.seed))
    if args.checkpoint:
        from effocr_tpu.train import checkpoint as ckpt

        loaded = ckpt.load_variables(trainer.variables, args.checkpoint)
        trainer.state["params"] = loaded["params"]
        if "batch_stats" in loaded:
            trainer.state["batch_stats"] = loaded["batch_stats"]

    hardnegs = None
    if args.hns_txt_path:
        with open(args.hns_txt_path) as f:
            hardnegs = f.read().split()

    best = trainer.fit(dataset, idx_train, idx_val, render_ref_idx,
                       hardnegs=hardnegs, resume=args.resume)
    print(f"Best val accuracy: {best}")

    trainer.load_best()
    if not classifier_mode:
        index, acc = build_and_eval_index(
            trainer, dataset, render_ref_idx, cfg, idx_train,
            idx_test=idx_test, run_test=args.test_at_end,
        )
        if acc is not None:
            print(f"Final test acc: {acc}")
        if args.infer_hardneg_k:
            query_idx = [
                i for i in idx_train if dataset.is_paired(i)
            ]
            if not query_idx:
                # no paired data: one synth crop per class
                seen = set()
                query_idx = []
                for i in idx_train:
                    t = dataset.targets[i]
                    if t not in seen:
                        seen.add(t)
                        query_idx.append(i)
            trainer.infer_hardneg(dataset, query_idx, index,
                                  k=args.infer_hardneg_k)
    elif args.test_at_end:
        acc = trainer.eval_classifier(dataset, idx_test)
        print(f"Final test acc: {acc}")


if __name__ == "__main__":
    main()
