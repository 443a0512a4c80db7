"""Windowed dense block attention (ops/block_graph.py) — exact equivalence
with the fixed-K gather path on spatially-sorted crowds."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relationalgraphlearning_tpu.ops import block_graph, sparse


def _crowd(n, seed=0, side=None):
    side = side or 10.0 * (n / 1024) ** 0.5
    pos = jax.random.uniform(jax.random.PRNGKey(seed), (n, 2)) * side
    perm = block_graph.spatial_sort(pos)
    return pos[perm]


@pytest.mark.parametrize("n,K,B,C", [(1024, 8, 64, 192), (2048, 16, 128, 384)])
def test_block_attention_matches_gather_path(n, K, B, C):
    pos = _crowd(n)
    cols = sparse.knn_graph(pos, K)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (n, 32))
    x = jax.random.normal(ks[1], (n, 32))
    v = jax.random.normal(ks[2], (n, 48))

    cand, coverage = block_graph.block_window(cols, B, C)
    assert float(coverage) == 1.0, "window too small for this crowd"

    got = block_graph.block_attention(q, x, v, cols, cand)
    want = sparse.spmm_fixed_k(
        sparse.neighbor_softmax(sparse.sddmm_fixed_k(q, x, cols)), v, cols)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_block_attention_respects_edge_mask():
    n, K, B, C = 512, 8, 64, 192
    pos = _crowd(n, seed=3)
    cols = sparse.knn_graph(pos, K)
    ks = jax.random.split(jax.random.PRNGKey(2), 2)
    h = jax.random.normal(ks[0], (n, 16))
    mask = jax.random.bernoulli(ks[1], 0.7, (n, K))
    # keep at least one neighbor per row so softmax rows are well defined
    mask = mask.at[:, 0].set(True)

    cand, cov = block_graph.block_window(cols, B, C)
    assert float(cov) == 1.0
    got = block_graph.block_attention(h, h, h, cols, cand, mask=mask)
    want = sparse.spmm_fixed_k(
        sparse.neighbor_softmax(sparse.sddmm_fixed_k(h, h, cols, mask)),
        h, cols)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_block_window_overflow_reports_coverage():
    # window smaller than the true union → coverage < 1, no crash, and the
    # dropped edges simply vanish from the mask (softmax over the survivors)
    n, K = 512, 8
    pos = _crowd(n, seed=4)
    cols = sparse.knn_graph(pos, K)
    cand, cov = block_graph.block_window(cols, 64, 48)
    assert float(cov) < 1.0
    h = jax.random.normal(jax.random.PRNGKey(5), (n, 16))
    out = block_graph.block_attention(h, h, h, cols, cand)
    assert np.isfinite(np.asarray(out)).all()


def test_spatial_sort_is_permutation():
    pos = jax.random.normal(jax.random.PRNGKey(6), (777, 2)) * 30
    perm = block_graph.spatial_sort(pos)
    assert sorted(np.asarray(perm).tolist()) == list(range(777))


def test_sparse_value_net_block_backend_matches_gather():
    """Model-level equivalence: SparseValueNet(backend='block') == gather
    backend with identical params on a spatially-sorted crowd."""
    from relationalgraphlearning_tpu.configs.base import GCNConfig
    from relationalgraphlearning_tpu.models.sparse_rgl import SparseValueNet

    n, K, B, C = 512, 8, 64, 192
    pos2 = _crowd(n, seed=7)
    states = jnp.concatenate(
        [pos2, jnp.zeros((n, 2)), 0.3 * jnp.ones((n, 1))], -1)
    cols = sparse.knn_graph(pos2, K)
    cand, cov = block_graph.block_window(cols, B, C)
    assert float(cov) == 1.0

    net_g = SparseValueNet(GCNConfig())
    net_b = SparseValueNet(GCNConfig(), backend="block")
    params = net_g.init(jax.random.PRNGKey(8), states, cols)
    want = net_g.apply(params, states, cols)
    got = net_b.apply(params, states, cols, block_cand=cand)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_force_sync_returns_scalar():
    """utils.sync.force blocks on and returns an element of any pytree."""
    from relationalgraphlearning_tpu.utils.sync import force

    out = {"a": jnp.arange(6.0).reshape(2, 3)}
    assert force(out) == 0.0
