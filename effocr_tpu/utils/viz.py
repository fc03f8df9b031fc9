"""Diagnostic visualization: kNN retrieval grids and localizer box overlays.

Parity with viz_effocr_recognizer.py:30-99 (query crop + k nearest prototype
renders saved as an image grid, correctness in the filename) and the
localizer overlay dump of infer_effocr_onnx_multi.py:292-305.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np


def save_knn_grid(
    query_img: np.ndarray,
    neighbor_imgs: Sequence[np.ndarray],
    save_path: str,
    correct: Optional[bool] = None,
    tile: int = 112,
) -> str:
    """Save [query | nn1 | nn2 | ...] horizontally; uint8 HWC inputs."""
    from PIL import Image

    imgs = [query_img] + list(neighbor_imgs)
    canvas = Image.new("RGB", (tile * len(imgs), tile), (255, 255, 255))
    for i, arr in enumerate(imgs):
        im = Image.fromarray(np.asarray(arr, np.uint8)).resize((tile, tile))
        canvas.paste(im, (i * tile, 0))
    root, ext = os.path.splitext(save_path)
    if correct is not None:
        save_path = f"{root}_{'correct' if correct else 'incorrect'}{ext}"
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    canvas.save(save_path)
    return save_path


def draw_boxes(
    image: np.ndarray,
    boxes: Sequence[Sequence[float]],
    save_path: Optional[str] = None,
    color: str = "red",
) -> np.ndarray:
    """Overlay xyxy boxes (infer_effocr_onnx_multi.py:296-305)."""
    from PIL import Image, ImageDraw

    img = Image.fromarray(np.asarray(image, np.uint8))
    draw = ImageDraw.Draw(img)
    for b in boxes:
        draw.rectangle([float(b[0]), float(b[1]), float(b[2]), float(b[3])],
                       outline=color)
    if save_path:
        os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
        img.save(save_path)
    return np.asarray(img)
