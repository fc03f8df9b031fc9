"""Pallas fused top-1 retrieval: argmax_c <q, p_c> without materializing the
full [N, C] similarity matrix in HBM.

The XLA path (kernels/retrieval.py) computes sims [N, C] then top_k; for
large prototype sets (Japanese jisx0213 ~13k classes) and big crop batches
that round-trips N*C floats through HBM.  This kernel tiles queries x
prototypes on the MXU and keeps the running (max score, argmax index) in
VMEM scratch, streaming prototype tiles once.

cf. TPU-KNN (arXiv:2206.14286): exact 1-NN at peak FLOPs is a tiled matmul
with an in-register partial reduction.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _top1_kernel(q_ref, p_ref, mask_ref, score_ref, idx_ref,
                 best_score, best_idx):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_score[:] = jnp.full_like(best_score, NEG_INF)
        best_idx[:] = jnp.zeros_like(best_idx)

    # [BN, D] @ [D, BC] on the MXU
    sims = jax.lax.dot_general(
        q_ref[:], p_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # mask is [1, BC]; broadcasts over the query rows.  (Kept 2-D end to
    # end: 1-D s32 operands get an XLA minor tiling of T(1024) at large C,
    # which conflicts with any block_c != 1024 — Mosaic rejects the
    # layout.  2-D arrays use the standard (8, 128) tiling at every size.)
    sims = jnp.where(mask_ref[:] != 0, sims, NEG_INF)

    bc = sims.shape[1]
    tile_best = jnp.max(sims, axis=1, keepdims=True)          # [BN, 1]
    tile_arg = jnp.argmax(sims, axis=1).astype(jnp.int32)      # [BN]
    tile_arg = (tile_arg + j * bc)[:, None]                    # global idx

    improved = tile_best > best_score[:]
    best_idx[:] = jnp.where(improved, tile_arg, best_idx[:])
    best_score[:] = jnp.maximum(best_score[:], tile_best)

    @pl.when(j == nj - 1)
    def _():
        score_ref[:] = best_score[:]
        idx_ref[:] = best_idx[:]


@partial(jax.jit, static_argnames=("block_q", "block_c", "interpret"))
def pallas_top1(
    queries: jnp.ndarray,
    prototypes: jnp.ndarray,
    row_mask: Optional[jnp.ndarray] = None,
    block_q: int = 128,
    block_c: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(scores [N], indices [N]) of the best inner-product prototype.

    queries [N, D] (pre-normalized), prototypes [C, D], row_mask [C]
    (False = blacklisted).  N, C are padded to tile multiples internally.
    """
    n, d = queries.shape
    c = prototypes.shape[0]
    if row_mask is None:
        row_mask = jnp.ones((c,), jnp.int32)
    else:
        row_mask = row_mask.astype(jnp.int32)

    n_pad = -n % block_q
    c_pad = -c % block_c
    q = jnp.pad(queries.astype(jnp.float32), ((0, n_pad), (0, 0)))
    p = jnp.pad(prototypes.astype(jnp.float32), ((0, c_pad), (0, 0)))
    m = jnp.pad(row_mask, (0, c_pad))[None, :]  # padded protos masked out

    grid = (q.shape[0] // block_q, p.shape[0] // block_c)
    scores, idx = pl.pallas_call(
        _top1_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_c, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_c), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((q.shape[0], 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.int32),
        ],
        interpret=interpret,
    )(q, p, m)
    return scores[:n, 0], idx[:n, 0]
