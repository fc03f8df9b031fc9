"""Detection dataset: COCO line images + char/word boxes -> fixed-shape
letterboxed training batches.

Replaces the reference's Detectron2 COCO dataloader registration
(train_effocr_localizer_d2.py:113-118): images are letterboxed to the
localizer input size (same transform inference uses) and boxes follow into
letterbox space as (cls, cx, cy, w, h) pixel targets with a validity mask.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from effocr_tpu.data.coco import load_json
from effocr_tpu.kernels.image_ops import letterbox_host


class DetectionDataset:
    def __init__(
        self,
        coco_json: str | Dict,
        image_dir: str,
        input_size: int = 640,
        max_targets: int = 256,
        input_height: Optional[int] = None,
        channels: int = 3,
    ):
        """input_height: rectangular canvas (stride-32 multiple).  Text
        lines are ~15-25x wider than tall, so a (96, 1024) canvas trains on
        near-full-resolution characters with fewer pixels than a 320 square
        — detection AP at char scale is resolution-bound, not data-bound.

        channels=1 trains grayscale-native detectors: images reduce to the
        truncating channel mean, the same reduction the inference host prep
        applies (pipelines/infer.py input_channels == 1)."""
        self.coco = (
            load_json(coco_json) if isinstance(coco_json, str) else coco_json
        )
        self.image_dir = image_dir
        self.input_size = input_size
        self.input_height = input_height or input_size
        self.max_targets = max_targets
        self.channels = channels
        self.annos_by_image: Dict[int, List] = {}
        for a in self.coco["annotations"]:
            self.annos_by_image.setdefault(a["image_id"], []).append(a)
        self.images = self.coco["images"]

    def __len__(self) -> int:
        return len(self.images)

    def load(self, i: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Dict]:
        """-> (letterboxed uint8 image [S,S,3], targets [T,5], mask [T],
        gt dict in letterbox space for eval)."""
        from PIL import Image

        entry = self.images[i]
        img = np.asarray(
            Image.open(
                os.path.join(self.image_dir, entry["file_name"])
            ).convert("RGB")
        )
        size = self.input_size
        if self.channels == 1:
            img = img.mean(axis=-1, keepdims=True).astype(np.uint8)
        lb, r, (dw, dh) = letterbox_host(img, (self.input_height, size))
        # uint8 out: the train/eval programs normalize on device — a f32
        # canvas would quadruple the host->device transfer per step (and
        # this environment's transport retains every transfer buffer)
        x = lb
        # the image content is pasted at the ROUNDED offsets
        # (letterbox rounding, localizer_engine.py:135-136); targets must
        # use the same offsets or every box carries a sub-pixel skew
        top, left = int(round(dh - 0.1)), int(round(dw - 0.1))

        targets = np.zeros((self.max_targets, 5), np.float32)
        mask = np.zeros((self.max_targets,), bool)
        gt_boxes, gt_classes = [], []
        for t, a in enumerate(self.annos_by_image.get(entry["id"], [])):
            if t >= self.max_targets:
                break
            bx, by, bw, bh = a["bbox"]
            cx = (bx + bw / 2) * r + left
            cy = (by + bh / 2) * r + top
            targets[t] = [a["category_id"], cx, cy, bw * r, bh * r]
            mask[t] = True
            gt_boxes.append(
                [cx - bw * r / 2, cy - bh * r / 2,
                 cx + bw * r / 2, cy + bh * r / 2]
            )
            gt_classes.append(a["category_id"])
        gt = {"boxes": np.asarray(gt_boxes, float).reshape(-1, 4),
              "classes": np.asarray(gt_classes, int)}
        return x, targets, mask, gt

    def materialize(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decode + letterbox every image once: (canvases uint8 [N,H,W,3],
        targets [N,T,5], masks [N,T]) — the host half of the detector's
        HBM-resident bank (LocalizerTrainer.attach_bank).  A 6k-image
        640x96 corpus is ~1.1 GB."""
        n = len(self)
        imgs = np.full(
            (n, self.input_height, self.input_size, self.channels),
            114, np.uint8,
        )
        tgts = np.zeros((n, self.max_targets, 5), np.float32)
        masks = np.zeros((n, self.max_targets), bool)
        for i in range(n):
            imgs[i], tgts[i], masks[i], _ = self.load(i)
        return imgs, tgts, masks

    def batches(
        self, batch_size: int, shuffle: bool = True, seed: int = 0,
        drop_last: bool = True,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray, np.ndarray, List[Dict]]]:
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        size = self.input_size
        for s in range(0, len(order), batch_size):
            idx = order[s : s + batch_size]
            if len(idx) < batch_size and drop_last:
                break
            imgs = np.full(
                (batch_size, self.input_height, size, self.channels),
                114, np.uint8,
            )
            tgts = np.zeros((batch_size, self.max_targets, 5), np.float32)
            masks = np.zeros((batch_size, self.max_targets), bool)
            # pad slots carry no gt entry — gts length marks the valid
            # prefix, so eval never double-counts images
            gts = []
            for j, ii in enumerate(idx):
                imgs[j], tgts[j], masks[j], gt = self.load(int(ii))
                gts.append(gt)
            yield imgs, tgts, masks, gts
