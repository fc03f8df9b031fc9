"""kNN retrieval on the MXU: L2-normalize -> matmul -> top_k.

Replaces FAISS IndexFlatIP (infer_effocr_onnx_multi.py:496-510,
train_effocr_recognizer.py:47-62): the prototype matrix [C, D] lives in HBM,
queries hit it with one batched inner-product matmul, and lax.top_k yields
the neighbors.  The char blacklist (index.remove_ids,
infer_effocr_onnx_multi.py:507-510) becomes an additive -inf row mask.

cf. TPU-KNN (arXiv:2206.14286): exact top-k over a flat index at peak FLOPs
is a single matmul + partial reduction; C here is at most ~14k classes, so
the full similarity matrix is tiny by TPU standards.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


@partial(jax.jit, static_argnames=("k", "normalize_queries"))
def knn_topk(
    queries: jnp.ndarray,
    prototypes: jnp.ndarray,
    k: int = 1,
    row_mask: Optional[jnp.ndarray] = None,
    normalize_queries: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k inner-product neighbors.

    queries [N, D]; prototypes [C, D] (pre-normalized at index build);
    row_mask [C] bool, False = blacklisted.  Returns (scores, indices),
    each [N, k].
    """
    q = l2_normalize(queries) if normalize_queries else queries
    sims = jax.lax.dot_general(
        q.astype(jnp.float32),
        prototypes.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if row_mask is not None:
        sims = jnp.where(row_mask[None, :], sims, NEG_INF)
    return jax.lax.top_k(sims, k)
