"""Probe whether this image's Mosaic backend can compile the fused
neighbor-attention kernel (round-1 finding: dynamic_gather crashed the v5e
backend — ops/pallas_graph.py `_MOSAIC_GATHER_OK`). Run on the TPU:

    python tools/probe_mosaic_gather.py

Exit 0 + "PROBE OK" → flip the gate. Any crash/exception → keep XLA path.
Known failure on this image (r3): "Multiple source vregs along gather
dimension" — dynamic_gather is intra-vreg only; see ops/pallas_graph.py.
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def main():
    from relationalgraphlearning_tpu.ops import pallas_graph, sparse

    n, K, d = 2048, 16, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (n, d))
    x = jax.random.normal(ks[1], (n, d))
    v = jax.random.normal(ks[2], (n, d))
    cols = sparse.knn_graph(jax.random.uniform(ks[3], (n, 2)) * 100, K)
    mask = jnp.ones((n, K), bool)

    # bypass the gate: call the pallas path directly
    pallas_graph._MOSAIC_GATHER_OK = True
    out = pallas_graph.fused_neighbor_attention(
        q, x, v, cols, mask)
    jax.block_until_ready(out)

    ref_s = sparse.sddmm_fixed_k(q, x, cols, mask)
    ref = sparse.spmm_fixed_k(sparse.neighbor_softmax(ref_s, mask), v, cols)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"PROBE OK max_err={err:.2e}")
    assert err < 1e-3


if __name__ == "__main__":
    main()
