"""Standalone prototype-index build from a saved encoder checkpoint.

The reference rebuilds its FAISS index inline at the end of training
(train_effocr_recognizer.py:47-62 save_ref_index) and ad-hoc at inference
time (infer_effocr_onnx_multi.py:117-131).  This command covers the third
case neither supports: harvesting a *mid-flight* run — best-val
checkpointing writes enc_best continuously (atomically: train/checkpoint
save_variables uses temp-file + os.replace), so any epoch is a valid
stopping point, and this rebuilds ref.npz/ref.txt (+ optional test
precision@1) from the run directory's own args_log.json without waiting
for the schedule to finish.

Usage:
  python -m effocr_tpu build-index --run_dir rec_knn6k_hn [--test]
"""

from __future__ import annotations

import argparse
import json
import os

import jax

from effocr_tpu.cli.common import (
    ann_stems,
    build_and_eval_index,
    default_render_indices,
)
from effocr_tpu.core.config import EncoderConfig, RecognizerTrainConfig
from effocr_tpu.data.folder import CharFolderDataset, split_indices
from effocr_tpu.models import create_encoder
from effocr_tpu.train.recognizer import RecognizerTrainer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", type=str, required=True,
                   help="training run dir holding enc_best.msgpack + "
                        "args_log.json")
    p.add_argument("--root_dir_path", type=str, default=None,
                   help="dataset root (default: args_log.json value)")
    p.add_argument("--test", action="store_true", default=False,
                   help="also report kNN precision@1 on the test split")
    p.add_argument("--mine_hardneg", type=int, default=0, metavar="K",
                   help="also mine k-NN hard negatives from the train "
                        "split into <run_dir>/hns.txt (standalone "
                        "equivalent of the reference's infer_hardneg, "
                        "train_effocr_recognizer.py:389-404 — recovers "
                        "runs whose in-training mining was cut short)")
    args = p.parse_args()

    with open(os.path.join(args.run_dir, "args_log.json")) as f:
        a = json.load(f)
    if a.get("N_classes"):
        raise SystemExit("classifier-mode runs have no prototype index; "
                         "use class_map.json directly")

    cfg = RecognizerTrainConfig(
        encoder=EncoderConfig(arch=a["auto_model"], image_size=a["imsize"],
                              input_channels=a.get("input_channels", 3)),
        batch_size=a["batch_size"], lang=a["lang"],
        temperature=a["temp"], m_per_class=a["m"],
        ref_source=a.get("ref_source", "render"),
        centroid_cap=a.get("centroid_cap", 32),
        finetune=a.get("finetune", False),
        pretrain=a.get("pretrain", False),
    )
    dataset = CharFolderDataset(args.root_dir_path or a["root_dir_path"])
    idx_train, _, idx_test = split_indices(
        dataset, ann_stems(a["train_ann_path"]),
        ann_stems(a["val_ann_path"]), ann_stems(a["test_ann_path"]),
        finetune=cfg.finetune, pretrain=cfg.pretrain,
    )
    render_ref_idx = default_render_indices(
        dataset, a["lang"], a.get("render_font_name")
    )

    trainer = RecognizerTrainer(
        cfg, create_encoder(a["auto_model"]), args.run_dir,
        classifier_mode=False,
    )
    trainer.init_state(jax.random.PRNGKey(cfg.seed))
    trainer.load_best()

    index, acc = build_and_eval_index(
        trainer, dataset, render_ref_idx, cfg, idx_train,
        idx_test=idx_test, run_test=args.test,
    )
    print(f"ref index: {index.embeddings.shape[0]} rows "
          f"-> {os.path.join(args.run_dir, 'ref.npz')}")
    if acc is not None:
        print(f"Test precision@1: {acc}")

    if args.mine_hardneg:
        query_idx = [i for i in idx_train if dataset.is_paired(i)]
        if not query_idx:
            seen = set()
            for i in idx_train:
                t = dataset.targets[i]
                if t not in seen:
                    seen.add(t)
                    query_idx.append(i)
        lines = trainer.infer_hardneg(dataset, query_idx, index,
                                      k=args.mine_hardneg)
        print(f"hard negatives: {len(lines)} queries "
              f"-> {os.path.join(args.run_dir, 'hns.txt')}")


if __name__ == "__main__":
    main()
