"""Fixed-shape batching helpers.

XLA compiles one program per shape; ragged work (variable chars per line,
variable lines per page) is padded to fixed shapes with validity masks.  The
reference already gestures at this: recognizer batches are zero-padded to 64
crops (infer_effocr_onnx_multi.py:143-158); here it is systematic.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def pad_axis_to(x: np.ndarray, size: int, axis: int = 0, value=0) -> np.ndarray:
    """Pad ``x`` along ``axis`` up to ``size`` with a constant."""
    cur = x.shape[axis]
    if cur == size:
        return x
    assert cur < size, f"axis {axis} of shape {x.shape} exceeds {size}"
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, size - cur)
    return np.pad(x, widths, constant_values=value)


def make_batches(
    items: Sequence[np.ndarray], batch_size: int, pad_value=0
) -> Tuple[List[np.ndarray], np.ndarray]:
    """Stack same-shaped items into fixed [batch_size, ...] batches.

    The final batch is padded to ``batch_size`` (cf. the reference's zero-pad
    to 64, infer_effocr_onnx_multi.py:156-157).  Returns (batches, valid_mask)
    where valid_mask is a flat bool array over batches*batch_size slots.
    """
    n = len(items)
    if n == 0:
        return [], np.zeros((0,), dtype=bool)
    total = pad_to_multiple(n, batch_size)
    mask = np.zeros((total,), dtype=bool)
    mask[:n] = True
    batches = []
    for start in range(0, total, batch_size):
        chunk = list(items[start : min(start + batch_size, n)])
        while len(chunk) < batch_size:
            chunk.append(np.full_like(items[0], pad_value))
        batches.append(np.stack(chunk))
    return batches, mask


def bucket_size(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n (to bound recompilation across shapes)."""
    for b in sorted(buckets):
        if n <= b:
            return b
    return max(buckets)
