"""Pallas fused block attention == XLA block path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relationalgraphlearning_tpu.ops import block_graph, pallas_block, sparse


def _setup(n=1024, K=8, B=128, C=256, dq=32, dv=48, seed=0):
    pos = jax.random.uniform(jax.random.PRNGKey(seed), (n, 2)) * 30
    pos = pos[block_graph.spatial_sort(pos)]
    cols = sparse.knn_graph(pos, K)
    cand, cov = block_graph.block_window(cols, B, C)
    emask = block_graph.block_masks(cols, cand)
    ks = jax.random.split(jax.random.PRNGKey(seed + 1), 3)
    q = jax.random.normal(ks[0], (n, dq))
    x = jax.random.normal(ks[1], (n, dq))
    v = jax.random.normal(ks[2], (n, dv))
    return q, x, v, cols, cand, emask, float(cov)


def test_fused_matches_xla_block_path():
    q, x, v, cols, cand, emask, cov = _setup()
    assert cov == 1.0
    got = pallas_block.block_attention_pallas(q, x, v, cand, emask,
                                              interpret=True)
    want = block_graph.block_attention(q, x, v, cols, cand, emask=emask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_matches_gather_path_end_to_end():
    q, x, v, cols, cand, emask, cov = _setup(seed=3, C=384)
    assert cov == 1.0
    got = pallas_block.block_attention_pallas(q, x, v, cand, emask,
                                              interpret=True)
    want = sparse.spmm_fixed_k(
        sparse.neighbor_softmax(sparse.sddmm_fixed_k(q, x, cols)), v, cols)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pack_emask_roundtrip():
    _, _, _, _, _, emask, _ = _setup(seed=7)
    bits = pallas_block.pack_emask(emask)
    nb, B, C = emask.shape
    assert bits.shape == (nb, B // 32, C) and bits.dtype == jnp.uint32
    unpacked = jax.vmap(lambda b: pallas_block._unpack_bits(b, B))(bits)
    np.testing.assert_array_equal(np.asarray(unpacked), np.asarray(emask))


def test_packed_kernel_matches_xla_block_path():
    q, x, v, cols, cand, emask, cov = _setup(seed=9, C=384)
    assert cov == 1.0
    bits = pallas_block.pack_emask(emask)
    got = pallas_block.block_attention_pallas(q, x, v, cand, bits,
                                              interpret=True)
    want = block_graph.block_attention(q, x, v, cols, cand, emask=emask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_packed_kernel_bf16():
    q, x, v, cols, cand, emask, cov = _setup(seed=11, C=384)
    assert cov == 1.0
    bits = pallas_block.pack_emask(emask)
    bf = jnp.bfloat16
    got = pallas_block.block_attention_pallas(
        q.astype(bf), x.astype(bf), v.astype(bf), cand, bits, interpret=True)
    assert got.dtype == bf
    want = block_graph.block_attention(q, x, v, cols, cand, emask=emask)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.05, atol=0.05)


def test_aligned_window_matches_gather_path():
    """Aligned-slice candidates (block_window_aligned + gather_aligned)
    reproduce the exact gather-path result."""
    n, K, B, A = 1024, 8, 128, 4
    pos = jax.random.uniform(jax.random.PRNGKey(21), (n, 2)) * 30
    pos = pos[block_graph.spatial_sort(pos)]
    cols = sparse.knn_graph(pos, K)
    starts, cand, cov = block_graph.block_window_aligned(cols, B, 512, A)
    assert float(cov) == 1.0
    emask = block_graph.block_masks(cols, cand)
    bits = pallas_block.pack_emask(emask)
    ks = jax.random.split(jax.random.PRNGKey(22), 3)
    q = jax.random.normal(ks[0], (n, 32))
    x = jax.random.normal(ks[1], (n, 32))
    v = jax.random.normal(ks[2], (n, 48))
    got = pallas_block.block_attention_pallas_aligned(
        q, x, v, starts, A, bits, interpret=True)
    want = sparse.spmm_fixed_k(
        sparse.neighbor_softmax(sparse.sddmm_fixed_k(q, x, cols)), v, cols)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_epilogue_l2norm_matches_external_norm():
    q, x, v, cols, cand, emask, cov = _setup(seed=13, C=384)
    assert cov == 1.0
    bits = pallas_block.pack_emask(emask)
    fused = pallas_block.block_attention_pallas(
        q, x, v, cand, bits, interpret=True, epilogue="l2norm")
    plain = pallas_block.block_attention_pallas(
        q, x, v, cand, bits, interpret=True)
    want = plain / jnp.maximum(
        jnp.linalg.norm(plain, axis=-1, keepdims=True), 1e-6)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_zeroes_fully_masked_rows():
    q, x, v, cols, cand, emask, _ = _setup(seed=5)
    emask = emask.at[0, 0, :].set(False)  # row with no edges
    out = pallas_block.block_attention_pallas(q, x, v, cand, emask,
                                              interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]), 0.0, atol=1e-6)
