"""Pallas greedy-NMS keep mask: the whole per-image problem in VMEM.

The XLA path (kernels/nms.py) materializes S = [N, N] suppression
matrices for the full batch in HBM and re-reads them every fixpoint
iteration — at the pipeline's [B=256, N=1024] shape that is gigabytes
of HBM traffic per chunk and the stage costs ~37 ms on-chip (stage
microbench, NOTES_ROUND3.md).  This kernel instead grids over the
batch and solves each image entirely on-chip: boxes for one image are
20 KB, so tiles of the IoU work live in VMEM/registers and HBM sees
only the boxes in and the keep mask out.

Semantics are EXACTLY kernels/nms.py `nms_mask(presorted=True)` (which
is exactly torchvision.ops.nms given descending-score input,
onnx_engines/localizer_engine.py:259-263): box j survives iff no kept
higher-ranked box overlaps it above ``iou_thresh``.  Rank = input
order.  The IoU arithmetic (clip/mul/divide + 1e-7 epsilon, f32)
matches nms.py `pairwise_iou` op for op, so the two backends return
bit-identical masks.

Algorithm — greedy NMS is sequential in theory, but its dependency
DAG is shallow, so per 128-box rank tile:

1. cross-tile: boxes in tile t can only be suppressed by FINAL kept
   boxes of earlier tiles — a running [1, N] "suppressed" vector
   (VMEM scratch) carries that state forward,
2. within-tile: the nms.py fixpoint resolve on the [T, T] tile, with
   the OR-reductions cast as [1,T] x [T,T] MXU matmuls (a bool
   reduction along the SUBLANE axis would otherwise need a transpose),
3. after tile t is final: one [T, N] IoU + [1,T] x [T,N] matmul marks
   everything its kept boxes suppress, updating the running vector.

Row-vector operands come in as [8, N] (channels x sublanes) and
column-vector operands as [N, 8] — the same data twice, laid out both
ways, because a [1,T] -> [T,1] transpose inside the kernel is the one
thing Mosaic makes expensive; two DMAs of 20 KB are free by contrast.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
EPS = 1e-7  # matches nms.py pairwise_iou


def _nms_kernel(rows_ref, cols_ref, keep_ref, sup_ref, *, n, iou_thresh):
    """One image: rows_ref [1,8,N], cols_ref [1,N,8] -> keep_ref [1,1,N] i32.

    Channel order: x0, y0, x1, y1, valid (1.0/0.0), pad, pad, pad.
    sup_ref [1, N] f32 scratch: >0 where a FINAL kept box has already
    suppressed that slot.
    """
    x0r = rows_ref[0, 0:1, :]
    y0r = rows_ref[0, 1:2, :]
    x1r = rows_ref[0, 2:3, :]
    y1r = rows_ref[0, 3:4, :]
    vr = rows_ref[0, 4:5, :]                                    # [1, N]
    arear = jnp.clip(x1r - x0r, 0.0) * jnp.clip(y1r - y0r, 0.0)

    sup_ref[:] = jnp.zeros_like(sup_ref)

    for t in range(n // TILE):
        s = t * TILE
        x0c = cols_ref[0, s:s + TILE, 0:1]                       # [T, 1]
        y0c = cols_ref[0, s:s + TILE, 1:2]
        x1c = cols_ref[0, s:s + TILE, 2:3]
        y1c = cols_ref[0, s:s + TILE, 3:4]
        vc = cols_ref[0, s:s + TILE, 4:5]
        areac = jnp.clip(x1c - x0c, 0.0) * jnp.clip(y1c - y0c, 0.0)

        # IoU of tile boxes (rows i, global s+i) vs ALL boxes (cols j)
        # — identical formula to nms.py pairwise_iou, f32
        iw = jnp.clip(jnp.minimum(x1c, x1r) - jnp.maximum(x0c, x0r), 0.0)
        ih = jnp.clip(jnp.minimum(y1c, y1r) - jnp.maximum(y0c, y0r), 0.0)
        inter = iw * ih                                          # [T, N]
        union = areac + arear - inter
        overl = (
            (inter / (union + EPS) > iou_thresh)
            & (vc > 0.0) & (vr > 0.0)
        )

        # within-tile suppression matrix: i (row) outranks j (col)
        tt = overl[:, s:s + TILE]                                # [T, T]
        ri = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
        rj = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
        s_f = jnp.where(tt & (ri < rj), 1.0, 0.0)                # [T, T]

        vrow = jnp.where(vr[:, s:s + TILE] > 0.0, 1.0, 0.0)      # [1, T]
        prior = jnp.where(sup_ref[0:1, s:s + TILE] > 0.0, 1.0, 0.0)
        kept0 = jnp.zeros((1, TILE), jnp.float32)
        und0 = vrow * (1.0 - prior)

        # fixpoint resolve (nms.py nms_mask): each iteration finalizes
        # every box whose fate depends only on already-final boxes —
        # at least the top undecided box, so it terminates.  The
        # OR-reductions over rows run as [1,T] @ [T,T] MXU products
        # (0/1 sums of <=128 terms are exact in f32).  All carried
        # vectors are f32 0/1 indicators: Mosaic fails to legalize
        # while_loop carries of i1 vectors (scf.yield) on real TPU.
        def cond(state):
            _, _, und = state
            return jnp.sum(und) > 0.0

        def body(state):
            kept, supp, und = state
            contested = kept + und                               # [1, T] 0/1
            by_contested = jax.lax.dot_general(
                contested, s_f,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            by_kept = jax.lax.dot_general(
                kept, s_f,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            newly_kept = und * jnp.where(by_contested > 0.0, 0.0, 1.0)
            newly_sup = und * jnp.where(by_kept > 0.0, 1.0, 0.0)
            kept = kept + newly_kept
            supp = supp + newly_sup
            und = und - newly_kept - newly_sup
            return kept, supp, und

        kept, _, _ = jax.lax.while_loop(cond, body, (kept0, prior, und0))

        keep_ref[0, 0:1, s:s + TILE] = kept.astype(jnp.int32)

        # final kept boxes of this tile suppress everything they overlap
        # (only later tiles ever read the flag, so no index mask needed)
        sup_new = jax.lax.dot_general(
            kept, jnp.where(overl, 1.0, 0.0),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                        # [1, N]
        sup_ref[:] = jnp.maximum(sup_ref[:], sup_new)


@partial(jax.jit, static_argnames=("iou_thresh", "interpret"))
def pallas_nms_mask(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Greedy-NMS keep mask [B, N] bool for presorted boxes [B, N, 4].

    Boxes must be in descending-score order per image (lax.top_k
    output; class offsets already applied).  Bit-identical to
    nms.py ``nms_mask(..., presorted=True)`` vmapped over the batch.
    """
    b, n, _ = boxes.shape
    n_pad = -n % TILE
    if n_pad:
        boxes = jnp.pad(boxes, ((0, 0), (0, n_pad), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, n_pad)))
    npad = boxes.shape[1]

    feat = jnp.concatenate(
        [
            boxes.astype(jnp.float32),
            jnp.where(valid, 1.0, 0.0)[..., None],
            jnp.zeros((b, npad, 3), jnp.float32),
        ],
        axis=-1,
    )                                                            # [B, N, 8]
    rows = jnp.swapaxes(feat, 1, 2)                              # [B, 8, N]

    keep = pl.pallas_call(
        partial(_nms_kernel, n=npad, iou_thresh=iou_thresh),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 8, npad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # Output is rank-3 [B, 1, N] with block (1, 1, N): Mosaic requires
        # a block's second-to-last dim to be a multiple of 8 OR equal to
        # the array dim — block (1, npad) over array (b, npad) violated
        # that on real TPU (interpret mode accepted it); the unit middle
        # axis satisfies the rule and is squeezed off below.
        out_specs=pl.BlockSpec((1, 1, npad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, npad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, npad), jnp.float32)],
        interpret=interpret,
    )(rows, feat)
    return keep[:, 0, :n] != 0
