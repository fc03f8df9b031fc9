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


def test_knn_topk_sharded_matches_unsharded(rng):
    """Prototype rows sharded over the mesh 'model' axis decode identically
    to the single-device matmul (8-device CPU mesh; C not divisible by the
    axis size exercises the internal padding)."""
    import jax
    from effocr_tpu.core.mesh import make_mesh
    from effocr_tpu.kernels.retrieval import knn_topk_sharded

    if len(jax.devices("cpu")) < 8:
        pytest.skip("needs XLA_FLAGS=--xla_force_host_platform_device_count=8")
    mesh = make_mesh(jax.devices("cpu")[:8], model=4)

    n, c, d, k = 96, 1030, 64, 3
    q = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    p = l2_normalize(jnp.asarray(rng.normal(size=(c, d)), jnp.float32))
    mask = np.ones((c,), bool)
    mask[rng.integers(0, c, 50)] = False

    ref_s, ref_i = knn_topk(q, p, k=k, row_mask=jnp.asarray(mask))
    s, i = knn_topk_sharded(q, p, mesh, k=k, row_mask=jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref_s), rtol=1e-5,
                               atol=1e-6)


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
