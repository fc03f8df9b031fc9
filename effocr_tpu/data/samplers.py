"""Batch samplers for metric-learning training (numpy, host-side index
generators feeding fixed-shape device batches).

Parity with effocr_datasets/recognizer_samplers.py:
- NoReplacementMPerClassSampler (:9-70): m samples per class, classes cycled
  in shuffled order without replacement within an epoch; epoch length
  m * n_classes * num_passes, truncated to a batch multiple.
- HardNegativeClassSampler (:73-156): parses hns.txt confusion strings, and
  splices whole m-per-class hard-negative sets into the base stream at
  random batch boundaries.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Sequence

import numpy as np


def _labels_to_indices(labels: Sequence[int]) -> Dict[int, np.ndarray]:
    out: Dict[int, List[int]] = {}
    for i, l in enumerate(labels):
        out.setdefault(int(l), []).append(i)
    return {k: np.asarray(v) for k, v in out.items()}


def _safe_choice(rng: np.random.Generator, arr, size: int) -> List[int]:
    replace = len(arr) < size
    return rng.choice(np.asarray(arr), size=size, replace=replace).tolist()


class NoReplacementMPerClassSampler:
    def __init__(self, labels: Sequence[int], m: int, batch_size: int,
                 num_passes: int = 1, seed: int = 0):
        assert batch_size is not None
        self.m = int(m)
        self.batch_size = int(batch_size)
        self.labels_to_indices = _labels_to_indices(labels)
        self.labels = list(self.labels_to_indices.keys())
        length_single_pass = self.m * len(self.labels)
        self.dataset_len = int(length_single_pass * num_passes)
        assert self.dataset_len >= self.batch_size
        assert length_single_pass >= self.batch_size, (
            f"m * n_classes ({length_single_pass}) must be >= batch_size"
        )
        assert self.batch_size % self.m == 0
        self.dataset_len -= self.dataset_len % self.batch_size
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return self.dataset_len

    def __iter__(self) -> Iterator[int]:
        rng = self.rng
        labels = list(self.labels)
        rng.shuffle(labels)
        idx_list: List[int] = []
        classes_per_batch = self.batch_size // self.m
        num_batches = self.dataset_len // self.batch_size
        remaining = {l: set(v.tolist())
                     for l, v in self.labels_to_indices.items()}
        j = 0
        for _ in range(num_batches):
            curr = labels[j : j + classes_per_batch]
            j += classes_per_batch
            if j + classes_per_batch >= len(labels):
                rng.shuffle(labels)
                j = 0
            for label in curr:
                t = sorted(remaining[label])
                if len(t) == 0:
                    pick = _safe_choice(rng, self.labels_to_indices[label],
                                        self.m)
                elif len(t) < self.m:
                    pick = t + _safe_choice(
                        rng, self.labels_to_indices[label], self.m - len(t)
                    )
                else:
                    pick = _safe_choice(rng, t, self.m)
                remaining[label] -= set(pick)
                idx_list.extend(pick)
        return iter(idx_list)


class HardNegativeClassSampler:
    """Wraps the base sampler; splices confusion sets from hns.txt.

    hardnegs: list of strings; each string's chars form one hard-negative
    set (hns_set_size chars, reference default 8).
    """

    def __init__(
        self,
        labels: Sequence[int],
        class_to_idx: Dict[str, int],
        hardnegs: Sequence[str],
        m: int = 4,
        batch_size: int = 128,
        hns_set_size: int = 8,
        num_passes: int = 1,
        seed: int = 0,
    ):
        self.labels = list(labels)
        self.all_labels_for_negs: List[List[int]] = []
        for hns in hardnegs:
            lab_set = [class_to_idx[str(ord(c))] for c in hns
                       if str(ord(c)) in class_to_idx]
            if len(lab_set) == len(hns) == hns_set_size:
                self.all_labels_for_negs.append(lab_set)
        self.batch_size = batch_size
        self.m = m
        self._sampler = NoReplacementMPerClassSampler(
            labels, m=m, batch_size=batch_size, num_passes=num_passes,
            seed=seed,
        )
        self.rng = np.random.default_rng(seed + 1)

    def __len__(self) -> int:
        return len(self._sampler)

    def __iter__(self) -> Iterator[int]:
        rng = self.rng
        idx_list = list(self._sampler)
        neg_sets = list(self.all_labels_for_negs)
        rng.shuffle(neg_sets)
        labels_to_indices = _labels_to_indices(self.labels)
        remaining = {l: set(v.tolist()) for l, v in labels_to_indices.items()}

        all_hn_indices: List[List[int]] = []
        for hn_labels in neg_sets:
            hn_idx: List[int] = []
            for label in hn_labels:
                if label not in labels_to_indices:
                    continue
                t = sorted(remaining[label])
                if len(t) == 0:
                    t = labels_to_indices[label].tolist()
                if len(t) < self.m:
                    pick = t + _safe_choice(
                        rng, labels_to_indices[label], self.m - len(t)
                    )
                else:
                    pick = _safe_choice(rng, t, self.m)
                remaining[label] -= set(pick)
                hn_idx.extend(pick)
            all_hn_indices.append(hn_idx)

        for hni in all_hn_indices:
            starts = list(range(0, len(idx_list), self.batch_size))
            ridx = int(rng.choice(starts))
            idx_list[ridx:ridx] = hni
        return iter(idx_list)


def batch_iterator(sampler, batch_size: int, drop_last: bool = True
                   ) -> Iterator[List[int]]:
    """Group a flat sampler stream into batch index lists."""
    batch: List[int] = []
    for idx in sampler:
        batch.append(idx)
        if len(batch) == batch_size:
            yield batch
            batch = []
    if batch and not drop_last:
        yield batch
