"""Character-folder dataset: reads the <root>/<ord(char)>/*.png tree.

The tree layout and PAIRED_ filename convention come from the reference's
dataset builder (format_effocr_recognizer_dataset.py:232-238,253-259) and
are consumed the same way its FontImageFolder does
(effocr_datasets/recognizer_datasets.py:37-59): PAIRED files get the
non-augmenting paired transform, renders get augmentation; split membership
comes from textline-stem prefixes of the per-split COCO jsons (:112-117)
with the same leakage asserts (:106-124).

TPU-first difference: instead of 32 torch DataLoader workers the dataset
materializes fixed-shape uint8 squares (pad-to-square + resize happens once,
host-side), and augmentation runs on-device per batch
(effocr_tpu.data.transforms).
"""

from __future__ import annotations

import os
from glob import glob
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from effocr_tpu.kernels.image_ops import median_pad_square


def _stem(p: str) -> str:
    return os.path.splitext(os.path.basename(p))[0]


class CharFolderDataset:
    """Flat index over the char-folder tree.

    data:      list of (path, target) like the reference's .data
    targets:   class index per item
    class_to_idx: str(ord(char)) -> class index
    """

    def __init__(self, root: str):
        self.root = root
        classes = sorted(
            (d for d in os.listdir(root)
             if os.path.isdir(os.path.join(root, d))),
            key=lambda d: int(d),
        )
        self.classes = classes
        self.class_to_idx: Dict[str, int] = {c: i for i, c in enumerate(classes)}
        self.data: List[Tuple[str, int]] = []
        for c in classes:
            t = self.class_to_idx[c]
            for p in sorted(glob(os.path.join(root, c, "*.png"))):
                self.data.append((p, t))
        self.targets = [t for _, t in self.data]
        # decoded-crop memo (see load_square); ~49 KB per 128-px entry
        self._cache: Dict[Tuple[int, int], np.ndarray] = {}
        self.cache_max_items = 300_000

    def __len__(self) -> int:
        return len(self.data)

    def char_for_target(self, target: int) -> str:
        return chr(int(self.classes[target]))

    def char_for_path(self, path: str) -> str:
        """Decode the char from a filename (render '0x..._' prefix or PAIRED
        '..._0x..._idx' suffix) — cf. train_effocr_recognizer.py:54-59."""
        base = _stem(path)
        if base.startswith("0x"):
            return chr(int(base.split("_")[0], base=16))
        if base.startswith("PAIRED"):
            return chr(int(base.split("_")[-2], base=16))
        return base[0]

    # ------------------------------------------------------------- subsets
    def is_paired(self, idx: int) -> bool:
        return os.path.basename(self.data[idx][0]).startswith("PAIRED")

    def paired_indices_for_stems(self, stems: Sequence[str]) -> List[int]:
        """Indices of PAIRED crops whose source textline stem is in stems
        (recognizer_datasets.py:112-117)."""
        prefixes = tuple(f"PAIRED_{s}_" for s in stems)
        return [
            i for i, (p, _) in enumerate(self.data)
            if os.path.basename(p).startswith(prefixes)
        ]

    def render_indices(self, font_name: Optional[str] = None) -> List[int]:
        """Non-PAIRED (render) indices, optionally filtered to one font
        (recognizer_datasets.py:213-223)."""
        out = []
        for i, (p, _) in enumerate(self.data):
            if os.path.basename(p).startswith("PAIRED"):
                continue
            if font_name is not None and font_name not in p:
                continue
            out.append(i)
        return out

    # -------------------------------------------------------------- loading
    def load_square(self, idx: int, size: int = 224) -> np.ndarray:
        """uint8 [size, size, 3]: white-square-pad (MedianPad override) then
        resize — the shape-normalizing half of the transforms; scaling and
        normalization happen on device.

        Decoded crops are memoized: the training loop re-reads every item
        every epoch (plus each centroid eval), and PNG decode on the host
        is the step-time wall for small models — a 128-px uint8 crop is
        ~49 KB, so even a 100k-item tree caches in ~5 GB."""
        cached = self._cache.get((idx, size))
        if cached is not None:
            return cached
        from PIL import Image

        path, _ = self.data[idx]
        img = Image.open(path).convert("RGB")
        arr = median_pad_square(np.asarray(img))
        if arr.shape[0] != size:
            img = Image.fromarray(arr).resize((size, size), Image.BILINEAR)
            arr = np.asarray(img)
        if len(self._cache) < self.cache_max_items:
            self._cache[(idx, size)] = arr
        return arr

    def decode_all_gray(self, size: int = 224) -> np.ndarray:
        """uint8 [N, size, size] grayscale bank of every item, in dataset
        order — the host half of the HBM-resident data path (the axon
        host->device transport retains every transfer buffer, so streaming
        a batch per step leaks ~payload bytes/step; uploading the bank once
        and shipping int32 indices per step bounds host RSS and cuts the
        per-step link traffic to ~1 KB).  Glyph crops are achromatic; gray
        keeps the bank at size^2 bytes/item (1.8 GB for 110k 128-px items,
        comfortably HBM-resident) and the device broadcasts to RGB."""
        bank = np.empty((len(self.data), size, size), np.uint8)
        for i in range(len(self.data)):
            rgb = self.load_square(i, size)
            bank[i] = (
                rgb[..., 0].astype(np.uint16)
                + rgb[..., 1]
                + rgb[..., 2]
            ) // 3
        return bank

    def load_batch(self, indices: Sequence[int], size: int = 224,
                   num_workers: int = 16
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(images uint8 [N,size,size,3], targets [N], is_paired [N]).

        Decodes with a thread pool (PIL releases the GIL in decode), the
        equivalent of the reference's num_workers=32 DataLoaders
        (recognizer_datasets.py:170-196)."""
        if len(indices) >= 8 and num_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            if not hasattr(self, "_pool"):
                self._pool = ThreadPoolExecutor(num_workers)
            imgs = np.stack(
                list(self._pool.map(lambda i: self.load_square(i, size),
                                    indices))
            )
        else:
            imgs = np.stack([self.load_square(i, size) for i in indices])
        targets = np.asarray([self.targets[i] for i in indices], np.int32)
        paired = np.asarray([self.is_paired(i) for i in indices], bool)
        return imgs, targets, paired


def split_indices(
    dataset: CharFolderDataset,
    train_stems: Sequence[str],
    val_stems: Sequence[str],
    test_stems: Sequence[str],
    finetune: bool = False,
    pretrain: bool = False,
) -> Tuple[List[int], List[int], List[int]]:
    """Train/val/test index split with the reference's leakage asserts
    (recognizer_datasets.py:106-148)."""
    assert not (finetune and pretrain)
    assert not set(test_stems) & set(train_stems)
    assert not set(val_stems) & set(train_stems)

    paired_train = dataset.paired_indices_for_stems(train_stems)
    paired_val = dataset.paired_indices_for_stems(val_stems)
    paired_test = dataset.paired_indices_for_stems(test_stems)
    renders = dataset.render_indices()

    assert not set(paired_train) & set(paired_val)
    assert not set(paired_test) & set(paired_train)

    if finetune:
        idx_train = sorted(paired_train)
    elif pretrain:
        idx_train = sorted(renders)
    else:
        idx_train = sorted(renders + paired_train)
    return idx_train, sorted(paired_val), sorted(paired_test)
