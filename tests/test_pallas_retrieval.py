"""Pallas top-1 retrieval vs. the XLA matmul+top_k reference (interpret
mode on CPU; the compiled path runs on TPU in bench/pipeline)."""

import numpy as np
import jax.numpy as jnp
import pytest

from effocr_tpu.kernels.pallas_retrieval import pallas_top1
from effocr_tpu.kernels.retrieval import knn_topk, l2_normalize


@pytest.mark.parametrize("n,c,d", [(64, 300, 128), (200, 1500, 256)])
def test_pallas_top1_matches_xla(rng, n, c, d):
    q = l2_normalize(jnp.asarray(rng.normal(size=(n, d)), jnp.float32))
    p = l2_normalize(jnp.asarray(rng.normal(size=(c, d)), jnp.float32))
    scores, idx = pallas_top1(q, p, interpret=True)
    ref_scores, ref_idx = knn_topk(q, p, k=1, normalize_queries=False)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx)[:, 0])
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(ref_scores)[:, 0], rtol=1e-5
    )


def test_pallas_top1_respects_mask(rng):
    n, c, d = 32, 256, 64
    q = l2_normalize(jnp.asarray(rng.normal(size=(n, d)), jnp.float32))
    p = jnp.concatenate([q, jnp.asarray(rng.normal(size=(c - n, d)),
                                        jnp.float32)])
    p = l2_normalize(p)
    mask = np.ones((c,), bool)
    mask[:n] = False  # blacklist the exact matches
    _, idx = pallas_top1(q, p, row_mask=jnp.asarray(mask), interpret=True)
    assert (np.asarray(idx) >= n).all()
