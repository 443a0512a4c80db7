"""Chunked-fetch fused kernel vs the XLA block path (ops/pallas_chunk.py).

Interpret-mode equality on the bench-shaped graph; the build must reach
coverage 1.0 with the measured NCH/CT sizing so the kernel's semantics are
exactly ``block_graph.block_attention``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from relationalgraphlearning_tpu.ops import block_graph, sparse
from relationalgraphlearning_tpu.ops.pallas_chunk import (
    chunk_block_attention, chunk_window)


_CACHE = {}


def _graph(n=1024, K=16, B=128, seed=0):
    key = (n, K, seed)
    if key not in _CACHE:  # shared across tests: compile/build once
        ks = jax.random.split(jax.random.PRNGKey(seed), 2)
        pos = jax.random.uniform(ks[1], (n, 2)) * 35
        pos = pos[block_graph.spatial_sort(pos)]
        cols = sparse.knn_graph(pos, K)
        h = jax.random.normal(ks[0], (n, 64))
        h = h / jnp.linalg.norm(h, axis=-1, keepdims=True)
        _CACHE[key] = (cols, h)
    return _CACHE[key]


def test_chunk_window_exact_cover():
    cols, _ = _graph()
    starts, tail, mbits, cov = chunk_window(cols, 128, nch=8, ct=288,
                                             thresh=32, chunk=32)
    assert float(cov) == 1.0, float(cov)
    # starts are aligned table rows; tail ids are valid or sentinel
    assert int(jnp.max(starts)) <= cols.shape[0] - 32
    assert starts.shape == (1024 // 128, 8)
    assert mbits.shape == (8, 128 // 32, 8 * 32 + 288)
    # production sizing (chunk=128, mostly-dense threshold) also covers
    starts2, tail2, mbits2, cov2 = chunk_window(cols, 128, nch=2, ct=352,
                                                thresh=80, chunk=128)
    assert float(cov2) == 1.0, float(cov2)


def test_chunk_attention_matches_block():
    cols, h = _graph()
    n, K = cols.shape
    B = 128
    starts, tail, mbits, cov = chunk_window(cols, B, nch=8, ct=288)
    assert float(cov) == 1.0
    cand, bcov = block_graph.block_window(cols, B, 416)
    assert float(bcov) == 1.0
    ref = block_graph.block_attention(h, h, h, cols, cand)
    for stable in (True, False):
        out = chunk_block_attention(h, h, starts, tail, mbits,
                                    interpret=True, stable=stable)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5)


def test_chunk_attention_epilogue():
    cols, h = _graph()
    starts, tail, mbits, cov = chunk_window(cols, 128, nch=8, ct=288,
                                             thresh=32, chunk=32)
    cand, _ = block_graph.block_window(cols, 128, 416)
    ref = block_graph.block_attention(h, h, h, cols, cand)
    ref = ref / jnp.maximum(
        jnp.linalg.norm(ref, axis=-1, keepdims=True), 1e-6)
    out = chunk_block_attention(h, h, starts, tail, mbits, interpret=True,
                                epilogue="l2norm", stable=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
