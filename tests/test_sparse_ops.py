"""Sparse op tests: fixed-K and edge-list SDDMM/softmax/SpMM vs dense
reference; SparseRGL ≡ dense RGL on fully-connected graphs; Pallas kernel
parity in interpreter mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relationalgraphlearning_tpu.configs.base import GCNConfig
from relationalgraphlearning_tpu.models.sparse_rgl import SparseRGL, SparseValueNet
from relationalgraphlearning_tpu.ops import sparse
from relationalgraphlearning_tpu.ops.pallas_graph import fused_neighbor_attention


def _rand(n=32, d=16, k=8, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    q = jax.random.normal(ks[0], (n, d))
    x = jax.random.normal(ks[1], (n, d))
    v = jax.random.normal(ks[2], (n, d))
    pos = jax.random.uniform(ks[3], (n, 2)) * 10
    cols = sparse.knn_graph(pos, k)
    return q, x, v, cols


def _dense_reference(q, x, v, cols, mask=None):
    n, k = cols.shape
    scores = np.full((n, n), -np.inf)
    qn, xn, vn = map(np.asarray, (q, x, v))
    for i in range(n):
        for j_idx, j in enumerate(np.asarray(cols)[i]):
            if mask is not None and not np.asarray(mask)[i, j_idx]:
                continue
            scores[i, j] = qn[i] @ xn[j]
    attn = np.zeros_like(scores)
    for i in range(n):
        row = scores[i]
        m = row[np.isfinite(row)].max()
        e = np.where(np.isfinite(row), np.exp(row - m), 0.0)
        attn[i] = e / e.sum()
    return attn @ vn


def test_knn_graph():
    pos = jnp.asarray([[0.0, 0], [1, 0], [2, 0], [10, 0]])
    cols = np.asarray(sparse.knn_graph(pos, 2))
    assert set(cols[0]) == {1, 2}
    assert set(cols[3]) == {2, 1}


def test_fixed_k_matches_dense():
    q, x, v, cols = _rand()
    scores = sparse.sddmm_fixed_k(q, x, cols)
    attn = sparse.neighbor_softmax(scores)
    out = sparse.spmm_fixed_k(attn, v, cols)
    np.testing.assert_allclose(
        np.asarray(out), _dense_reference(q, x, v, cols), rtol=1e-4, atol=1e-5)


def test_edge_list_matches_fixed_k():
    q, x, v, cols = _rand()
    n = q.shape[0]
    rows, cols_flat = sparse.fixed_k_to_edges(cols)
    s_e = sparse.sddmm_edges(q, x, rows, cols_flat)
    a_e = sparse.segment_softmax(s_e, rows, n)
    out_e = sparse.spmm_edges(a_e, v, rows, cols_flat, n)

    s_k = sparse.sddmm_fixed_k(q, x, cols)
    out_k = sparse.spmm_fixed_k(sparse.neighbor_softmax(s_k), v, cols)
    np.testing.assert_allclose(np.asarray(out_e), np.asarray(out_k),
                               rtol=1e-4, atol=1e-5)


def test_mask_drops_edges():
    q, x, v, cols = _rand()
    mask = jax.random.uniform(jax.random.PRNGKey(9), cols.shape) > 0.3
    # keep at least one valid edge per row
    mask = mask.at[:, 0].set(True)
    out = sparse.spmm_fixed_k(
        sparse.neighbor_softmax(sparse.sddmm_fixed_k(q, x, cols, mask), mask),
        v, cols)
    np.testing.assert_allclose(
        np.asarray(out), _dense_reference(q, x, v, cols, mask),
        rtol=1e-4, atol=1e-5)


def test_pallas_entry_point_dispatches_to_chain():
    """ops/pallas_graph.py is a gate+pointer since r4 (the production fused
    kernel is ops/pallas_block.py — see test_pallas_block.py); its entry
    point must keep serving the exact chain for existing callers."""
    q, x, v, cols = _rand(n=64, d=16, k=8)
    mask = jnp.ones(cols.shape, bool)
    out_ref = sparse.spmm_fixed_k(
        sparse.neighbor_softmax(sparse.sddmm_fixed_k(q, x, cols, mask), mask),
        v, cols)
    out_pl = fused_neighbor_attention(q, x, v, cols, mask)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)


def test_sparse_rgl_equals_dense_rgl_fully_connected():
    """On a fully-connected graph (K = n-1 … plus self mask off) SparseRGL
    must reproduce the dense RGL semantics restricted to human nodes."""
    from relationalgraphlearning_tpu.models.rgl import RGL

    n, k = 6, 6
    cfg = GCNConfig(similarity_function="embedded_gaussian",
                    layerwise_graph=True, skip_connection=False)
    states = jax.random.normal(jax.random.PRNGKey(0), (n, 5))
    # fully-connected INCLUDING self → matches dense softmax over all nodes
    cols = jnp.broadcast_to(jnp.arange(n), (n, n))
    smodel = SparseRGL(cfg)
    sparams = smodel.init(jax.random.PRNGKey(1), states, cols)
    H_sparse = smodel.apply(sparams, states, cols)

    # dense "RGL with only human nodes": emulate by reusing the same params
    # through the sparse path with dense ops
    p = sparams["params"]
    import numpy as onp

    def np_mlp(xx, layers, last_relu):
        names = sorted(layers.keys(), key=lambda s: int(s.split("_")[1]))
        for i, nm in enumerate(names):
            xx = xx @ onp.asarray(layers[nm]["kernel"]) + onp.asarray(
                layers[nm]["bias"])
            if i < len(names) - 1 or last_relu:
                xx = onp.maximum(xx, 0)
        return xx

    X = np_mlp(onp.asarray(states), p["w_h"], True)
    H = X
    for li in range(cfg.num_layer):
        q = H @ onp.asarray(p["w_a"]["kernel"])
        scores = q @ H.T
        e = onp.exp(scores - scores.max(-1, keepdims=True))
        A = e / e.sum(-1, keepdims=True)
        H = onp.maximum(A @ (H @ onp.asarray(p[f"gcn_w{li+1}"]["kernel"])), 0)
    np.testing.assert_allclose(np.asarray(H_sparse), H, rtol=2e-4, atol=2e-5)


def test_sparse_value_net():
    n, k = 128, 8
    net = SparseValueNet(GCNConfig())
    states = jax.random.normal(jax.random.PRNGKey(0), (n, 5))
    pos = states[:, :2] * 5
    cols = sparse.knn_graph(pos, k)
    params = net.init(jax.random.PRNGKey(1), states, cols)
    vals = net.apply(params, states, cols)
    assert vals.shape == (n,)
    assert np.all(np.isfinite(np.asarray(vals)))


def test_sparse_rgl_grad_flows():
    n, k = 64, 8
    net = SparseValueNet(GCNConfig())
    states = jax.random.normal(jax.random.PRNGKey(0), (n, 5))
    cols = sparse.knn_graph(states[:, :2], k)
    params = net.init(jax.random.PRNGKey(1), states, cols)

    def loss(p):
        return jnp.mean(net.apply(p, states, cols) ** 2)

    g = jax.grad(loss)(params)
    gmax = max(float(jnp.max(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert gmax > 0


def test_knn_grid_matches_dense():
    """Spatial-hash kNN equals the O(n²) construction when the cell ring
    covers the true neighborhoods and no cell overflows."""
    import numpy as np
    from relationalgraphlearning_tpu.ops.sparse import knn_graph, knn_graph_grid

    key = jax.random.PRNGKey(0)
    n, k = 1500, 8
    pos = jax.random.uniform(key, (n, 2)) * 100.0  # density 0.15/unit²
    dense = np.asarray(knn_graph(pos, k))
    grid = np.asarray(knn_graph_grid(pos, k, cell_size=5.0, max_per_cell=32))
    # same neighbor SETS per row (ordering may differ on distance ties)
    for i in range(0, n, 37):
        assert set(dense[i]) == set(grid[i]), i


def test_knn_grid_jits_at_scale():
    from relationalgraphlearning_tpu.ops.sparse import knn_graph_grid

    pos = jax.random.uniform(jax.random.PRNGKey(1), (20_000, 2)) * 400.0
    cols = jax.jit(lambda p: knn_graph_grid(p, 10, 5.0))(pos)
    assert cols.shape == (20_000, 10)
    assert bool((cols >= 0).all()) and bool((cols < 20_000).all())


def test_knn_auto_dispatch_and_boundary_equivalence():
    """knn_graph_auto: exact path below the threshold; at/above the
    threshold the grid path must reproduce the exact neighbor sets for a
    near-uniform crowd (the regime guaranteed by the cell_size heuristic)."""
    import numpy as np
    from relationalgraphlearning_tpu.ops.sparse import knn_graph, knn_graph_auto

    k = 10
    # just above the default 10k threshold → grid path
    n = 10_016
    pos = jax.random.uniform(jax.random.PRNGKey(2), (n, 2)) * 400.0
    exact = np.asarray(knn_graph(pos, k))
    auto = np.asarray(knn_graph_auto(pos, k))
    same = sum(set(exact[i]) == set(auto[i]) for i in range(0, n, 101))
    checked = len(range(0, n, 101))
    assert same >= checked - 1, f"{same}/{checked} rows match"  # ties allowed

    # below threshold → bitwise-identical to the exact construction
    pos_s = pos[:512]
    assert np.array_equal(
        np.asarray(knn_graph_auto(pos_s, k)), np.asarray(knn_graph(pos_s, k)))


def test_knn_auto_respects_valid_mask():
    import numpy as np
    from relationalgraphlearning_tpu.ops.sparse import knn_graph_auto

    n, k = 10_016, 6
    pos = jax.random.uniform(jax.random.PRNGKey(3), (n, 2)) * 400.0
    valid = jnp.arange(n) % 2 == 0
    cols = np.asarray(knn_graph_auto(pos, k, valid=valid))
    # all returned neighbors of checked rows must be valid nodes
    assert np.all(cols[::211] % 2 == 0)
