"""Shared CLI glue for the recognizer index-build flow.

Used by both `train-recognizer` (end-of-training index build,
reference train_effocr_recognizer.py:47-62 save_ref_index) and
`build-index` (standalone / mid-flight harvest) so the prototype-index
semantics — render-font defaulting, centroid reference rows, the
kNN test-eval label mapping — cannot drift between the two entry
points.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from effocr_tpu.data.coco import load_json


def ann_stems(path: str) -> List[str]:
    """Textline stems of a COCO annotation file (split membership)."""
    return [os.path.splitext(x["file_name"])[0]
            for x in load_json(path)["images"]]


def default_render_indices(dataset, lang: str,
                           render_font_name: Optional[str]) -> List[int]:
    """Prototype render rows: the designated font (NotoSerif /
    NotoSerifCJKjp unless overridden — reference
    train_effocr_recognizer.py:320 create_render_dataset call sites),
    falling back to every render if that font has none."""
    font_name = render_font_name or (
        "NotoSerifCJKjp-Regular" if lang == "jp" else "NotoSerif-Regular"
    )
    idx = dataset.render_indices(font_name)
    return idx if idx else dataset.render_indices()


def build_and_eval_index(trainer, dataset, render_ref_idx, cfg,
                         idx_train, idx_test=None,
                         run_test: bool = False) -> Tuple[object,
                                                          Optional[float]]:
    """Build ref.npz/ref.txt from the trainer's current params; optionally
    report kNN precision@1 on the test split (centroid indexes carry their
    own rows + chars->class-label mapping)."""
    index = trainer.build_ref_index(
        dataset, render_ref_idx,
        centroid_idx=idx_train if cfg.ref_source == "centroid" else None,
    )
    acc = None
    if run_test and idx_test is not None:
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
    return index, acc
