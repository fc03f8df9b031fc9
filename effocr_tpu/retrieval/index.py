"""Prototype index: the FAISS IndexFlatIP replacement.

Artifact contract parity (infer_effocr_onnx_multi.py:401-419,
train_effocr_recognizer.py:47-62): a recognizer directory carries
  - ``ref.npz``  (here; the reference's binary ``ref.index``) — the [C, D]
    L2-normalized prototype-embedding matrix,
  - ``ref.txt``  — newline-separated character per index row (identical
    format to the reference, so ref.txt files interchange),
and kNN decode is queries @ prototypes.T + top_k on device
(effocr_tpu.kernels.retrieval).  The char blacklist
(infer_effocr_onnx_multi.py:507-510) is a row mask, not a destructive
remove_ids.
"""

from __future__ import annotations

import os
from typing import Iterable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from effocr_tpu.kernels.retrieval import knn_topk, l2_normalize

REF_NPZ = "ref.npz"
REF_TXT = "ref.txt"


class PrototypeIndex:
    """[C, D] normalized prototypes + the character each row decodes to."""

    def __init__(self, embeddings: np.ndarray, chars: Sequence[str],
                 thumbnails: Optional[np.ndarray] = None):
        """thumbnails: optional uint8 [C, T, T] grayscale previews of the
        prototype renders, kept for the kNN-grid visualizer
        (viz_effocr_recognizer.py shows the retrieved render images)."""
        assert embeddings.ndim == 2 and len(chars) == embeddings.shape[0], (
            embeddings.shape,
            len(chars),
        )
        self.embeddings = np.asarray(
            l2_normalize(jnp.asarray(embeddings, jnp.float32))
        )
        self.chars: List[str] = list(chars)
        self.thumbnails = thumbnails
        self._mask = np.ones((len(chars),), dtype=bool)
        self._device_embeddings = None
        self._device_mask = None

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def build(cls, embed_fn, images, chars, batch_size: int = 512
              ) -> "PrototypeIndex":
        """Embed prototype images (e.g. font renders) into an index.

        embed_fn: [B, H, W, 3] -> [B, D]; images: array or list of arrays.
        """
        images = np.asarray(images)
        embs = []
        n = images.shape[0]
        for start in range(0, n, batch_size):
            chunk = images[start : start + batch_size]
            pad = batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)]
                )
            out = np.asarray(embed_fn(jnp.asarray(chunk)))
            embs.append(out[: batch_size - pad])
        return cls(np.concatenate(embs, axis=0), chars)

    def save(self, dirpath: str) -> None:
        os.makedirs(dirpath, exist_ok=True)
        arrays = {"embeddings": self.embeddings}
        if self.thumbnails is not None:
            arrays["thumbnails"] = self.thumbnails
        np.savez(os.path.join(dirpath, REF_NPZ), **arrays)
        with open(os.path.join(dirpath, REF_TXT), "w") as f:
            f.write("\n".join(self.chars))

    @classmethod
    def load(cls, dirpath: str) -> "PrototypeIndex":
        data = np.load(os.path.join(dirpath, REF_NPZ))
        with open(os.path.join(dirpath, REF_TXT), newline="") as f:
            # one char per line.  The reference parses with .split()
            # (infer_effocr_onnx_multi.py:503), which is equivalent for its
            # curated charsets but silently swallows whitespace characters
            # (U+3000 ideographic space etc.) that font-coverage charsets
            # legitimately contain — line-based parsing keeps every row
            # aligned with its embedding.
            text = f.read()
            if text.endswith("\n"):
                text = text[:-1]
            chars = text.split("\n")
        thumbs = data["thumbnails"] if "thumbnails" in data else None
        return cls(data["embeddings"], chars, thumbnails=thumbs)

    # ------------------------------------------------------------- blacklist
    def blacklist(self, chars: Iterable[str]) -> None:
        bl = set(chars)
        for i, c in enumerate(self.chars):
            if c in bl:
                self._mask[i] = False
        self._device_mask = None

    # ---------------------------------------------------------------- decode
    @property
    def device_embeddings(self) -> jnp.ndarray:
        if self._device_embeddings is None:
            self._device_embeddings = jnp.asarray(self.embeddings)
        return self._device_embeddings

    @property
    def device_mask(self) -> jnp.ndarray:
        if self._device_mask is None:
            self._device_mask = jnp.asarray(self._mask)
        return self._device_mask

    def search(self, queries, k: int = 1) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k (scores, indices) for query embeddings [N, D]."""
        scores, idx = knn_topk(
            jnp.asarray(queries), self.device_embeddings, k=k,
            row_mask=self.device_mask,
        )
        return np.asarray(scores), np.asarray(idx)

    def decode(self, queries, k: int = 1) -> List[str]:
        """1-NN character decode (k>1 returns the k-char string per query,
        like the reference's hard-negative strings)."""
        _, idx = self.search(queries, k=k)
        if k == 1:
            return [self.chars[i] for i in idx[:, 0]]
        return ["".join(self.chars[j] for j in row) for row in idx]

    def __len__(self) -> int:
        return len(self.chars)
