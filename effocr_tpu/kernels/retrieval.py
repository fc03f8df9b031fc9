"""kNN retrieval on the MXU: L2-normalize -> matmul -> top_k.

Replaces FAISS IndexFlatIP (infer_effocr_onnx_multi.py:496-510,
train_effocr_recognizer.py:47-62): the prototype matrix [C, D] lives in HBM,
queries hit it with one batched inner-product matmul, and lax.top_k yields
the neighbors.  The char blacklist (index.remove_ids,
infer_effocr_onnx_multi.py:507-510) becomes an additive -inf row mask.

cf. TPU-KNN (arXiv:2206.14286): exact top-k over a flat index at peak FLOPs
is a single matmul + partial reduction; C here is at most ~14k classes, so
the full similarity matrix is tiny by TPU standards.

knn_topk_sharded extends the same decode across a device mesh: prototype
rows are sharded over the mesh "model" axis, each device computes a local
top-k on its shard, and one k*M-wide all_gather + re-top-k (ICI, not HBM)
yields the exact global result — very large charsets cost C/M rows of HBM
per chip and queries are never resharded.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

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


def knn_topk_sharded(
    queries: jnp.ndarray,
    prototypes: jnp.ndarray,
    mesh: Mesh,
    k: int = 1,
    axis: str = "model",
    row_mask: Optional[jnp.ndarray] = None,
    normalize_queries: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k with the prototype matrix sharded over mesh[axis].

    queries [N, D] (replicated), prototypes [C, D]; C is padded to a
    multiple of the axis size internally (padded rows masked out).  Each
    device matmuls its [C/M, D] shard, takes a local top-k, and a k*M-wide
    all_gather + re-top-k produces the global (scores, indices) [N, k] —
    identical digits to knn_topk on the unsharded matrix.
    """
    m = mesh.shape[axis]
    c = prototypes.shape[0]
    if row_mask is None:
        row_mask = jnp.ones((c,), bool)
    pad = -c % m
    if pad:
        prototypes = jnp.pad(prototypes, ((0, pad), (0, 0)))
        row_mask = jnp.pad(row_mask, (0, pad))
    c_local = (c + pad) // m
    q = l2_normalize(queries) if normalize_queries else queries

    def local_topk(qs, ps, mask):
        idx = jax.lax.axis_index(axis)
        sims = jax.lax.dot_general(
            qs.astype(jnp.float32), ps.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sims = jnp.where(mask[None, :], sims, NEG_INF)
        k_eff = min(k, c_local)
        s, i = jax.lax.top_k(sims, k_eff)
        if k_eff < k:
            s = jnp.pad(s, ((0, 0), (0, k - k_eff)),
                        constant_values=NEG_INF)
            i = jnp.pad(i, ((0, 0), (0, k - k_eff)))
        i = i + idx * c_local                       # shard-local -> global
        # [M, N, k] candidates -> global re-top-k on every device
        all_s = jax.lax.all_gather(s, axis)
        all_i = jax.lax.all_gather(i, axis)
        n = qs.shape[0]
        flat_s = jnp.moveaxis(all_s, 0, 1).reshape(n, m * k)
        flat_i = jnp.moveaxis(all_i, 0, 1).reshape(n, m * k)
        gs, gj = jax.lax.top_k(flat_s, k)
        return gs, jnp.take_along_axis(flat_i, gj, axis=1)

    fn = jax.shard_map(
        local_topk, mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis)),
        out_specs=(P(), P()),
        # outputs are replicated by construction (all_gather + identical
        # re-top-k on every device); the static varying-axis checker can't
        # see through take_along_axis, so assert it ourselves
        check_vma=False,
    )
    return fn(q, prototypes, row_mask)
