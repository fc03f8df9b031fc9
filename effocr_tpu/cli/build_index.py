"""Standalone prototype-index build from a saved encoder checkpoint.

The reference rebuilds its FAISS index inline at the end of training
(train_effocr_recognizer.py:47-62 save_ref_index) and ad-hoc at inference
time (infer_effocr_onnx_multi.py:117-131).  This command covers the third
case neither supports: harvesting a *mid-flight* run — best-val
checkpointing writes enc_best continuously, so any epoch is a valid
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
import numpy as np

from effocr_tpu.core.config import EncoderConfig, RecognizerTrainConfig
from effocr_tpu.data.coco import load_json
from effocr_tpu.data.folder import CharFolderDataset, split_indices
from effocr_tpu.models import create_encoder
from effocr_tpu.train.recognizer import RecognizerTrainer


def _stems(path):
    return [os.path.splitext(x["file_name"])[0]
            for x in load_json(path)["images"]]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", type=str, required=True,
                   help="training run dir holding enc_best.msgpack + "
                        "args_log.json")
    p.add_argument("--root_dir_path", type=str, default=None,
                   help="dataset root (default: args_log.json value)")
    p.add_argument("--test", action="store_true", default=False,
                   help="also report kNN precision@1 on the test split")
    args = p.parse_args()

    with open(os.path.join(args.run_dir, "args_log.json")) as f:
        a = json.load(f)
    if a.get("N_classes"):
        raise SystemExit("classifier-mode runs have no prototype index; "
                         "use class_map.json directly")

    cfg = RecognizerTrainConfig(
        encoder=EncoderConfig(arch=a["auto_model"], image_size=a["imsize"]),
        batch_size=a["batch_size"], lang=a["lang"],
        temperature=a["temp"], m_per_class=a["m"],
        ref_source=a.get("ref_source", "render"),
        centroid_cap=a.get("centroid_cap", 32),
        finetune=a.get("finetune", False),
        pretrain=a.get("pretrain", False),
    )
    dataset = CharFolderDataset(args.root_dir_path or a["root_dir_path"])
    idx_train, _, idx_test = split_indices(
        dataset, _stems(a["train_ann_path"]), _stems(a["val_ann_path"]),
        _stems(a["test_ann_path"]), finetune=cfg.finetune,
        pretrain=cfg.pretrain,
    )
    font_name = a.get("render_font_name") or (
        "NotoSerifCJKjp-Regular" if a["lang"] == "jp" else "NotoSerif-Regular"
    )
    render_ref_idx = dataset.render_indices(font_name)
    if not render_ref_idx:
        render_ref_idx = dataset.render_indices()

    trainer = RecognizerTrainer(
        cfg, create_encoder(a["auto_model"]), args.run_dir,
        classifier_mode=False,
    )
    trainer.init_state(jax.random.PRNGKey(cfg.seed))
    trainer.load_best()

    index = trainer.build_ref_index(
        dataset, render_ref_idx,
        centroid_idx=idx_train if cfg.ref_source == "centroid" else None,
    )
    print(f"ref index: {index.embeddings.shape[0]} rows "
          f"-> {os.path.join(args.run_dir, 'ref.npz')}")

    if args.test:
        if cfg.ref_source == "centroid":
            acc = trainer.eval_knn(
                dataset, idx_test, [],
                ref_emb=index.embeddings,
                ref_lab=np.asarray([
                    dataset.class_to_idx[str(ord(ch))]
                    for ch in index.chars
                ]),
            )
        else:
            acc = trainer.eval_knn(dataset, idx_test, render_ref_idx)
        print(f"Test precision@1: {acc}")


if __name__ == "__main__":
    main()
