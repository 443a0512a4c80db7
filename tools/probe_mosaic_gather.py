"""Probe whether this image's Mosaic backend can compile a fused
neighbor-attention kernel with in-VMEM row gathers. Carries the
experimental kernel itself (moved out of ops/pallas_graph.py r4 — the
production fused kernel is ops/pallas_block.py, which needs no in-kernel
gathers). Run on the TPU:

    python tools/probe_mosaic_gather.py

Exit 0 + "PROBE OK" → promote the kernel back into ops/pallas_graph.py and
flip its ``_MOSAIC_GATHER_OK``. Any crash → keep the block/XLA paths.
Known failure on this image (r1–r3): "Not implemented: Multiple source
vregs along gather dimension" — ``tpu.dynamic_gather`` is intra-vreg only,
so a multi-thousand-row VMEM table gather is inexpressible (probe step 3;
steps 1–2 are documented in ops/pallas_graph.py).
"""

import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

_NEG = -1e30


def _row_gather(table, idx):
    """Gather ``len(idx) == n`` rows from ``table`` [n, w] via the
    Mosaic-supported take_along_axis form (no reshapes — Mosaic's
    infer-vector-layout rejects rank-changing shape casts)."""
    idx2 = jax.lax.broadcast_in_dim(idx, (table.shape[0], table.shape[1]),
                                    (0,))
    return jnp.take_along_axis(table, idx2, axis=0)


def _kernel(cols_ref, mask_ref, q_ref, x_ref, v_ref, out_ref):
    n, d = x_ref.shape
    dv = v_ref.shape[-1]
    K = cols_ref.shape[-1]
    q = q_ref[:]
    x = x_ref[:]
    cols = cols_ref[:]
    # SDDMM one neighbor column at a time (static K unroll; each gather is
    # a full-table per-column row gather — the only form Mosaic lowers)
    score_cols = []
    for k in range(K):
        xg = _row_gather(x, cols[:, k])
        score_cols.append(jnp.sum(q * xg, axis=-1, keepdims=True))
    scores = jnp.concatenate(score_cols, axis=1)  # [n, K]
    mask = mask_ref[:]
    scores = scores * mask + _NEG * (1.0 - mask)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    attn = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-20)
    v = v_ref[:]
    acc = jnp.zeros((n, dv), jnp.float32)
    for k in range(K):  # SpMM accumulation
        vg = _row_gather(v, cols[:, k])
        acc = acc + attn[:, k:k + 1] * vg
    out_ref[:] = acc.astype(out_ref.dtype)


def fused_gather_attention(q, x, v, cols, mask):
    n, dv = q.shape[0], v.shape[-1]
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, dv), v.dtype),
        in_specs=[spec] * 5,
        out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=15 * 1024 * 1024),
    )(cols, mask.astype(jnp.float32), q, x, v)


def main():
    from relationalgraphlearning_tpu.ops import sparse

    n, K, d = 2048, 16, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (n, d))
    x = jax.random.normal(ks[1], (n, d))
    v = jax.random.normal(ks[2], (n, d))
    cols = sparse.knn_graph(jax.random.uniform(ks[3], (n, 2)) * 100, K)
    mask = jnp.ones((n, K), bool)

    out = fused_gather_attention(q, x, v, cols, mask)
    jax.block_until_ready(out)

    ref_s = sparse.sddmm_fixed_k(q, x, cols, mask)
    ref = sparse.spmm_fixed_k(sparse.neighbor_softmax(ref_s, mask), v, cols)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"PROBE OK max_err={err:.2e}")
    assert err < 1e-3


if __name__ == "__main__":
    main()
