"""Gather-path fused kernel: gate + pointer (the kernel lives with its
probe in ``tools/probe_mosaic_gather.py``).

The natural fused kernel for SparseRGL's hot op — in-VMEM neighbor gather →
relation softmax → aggregation — is NOT expressible in Mosaic on this
image. Three-step probe chain (r1–r3, re-runnable via the probe tool):

1. ``lax.gather`` lowers to ``tpu.dynamic_gather`` only in the
   take_along_axis form (``idx.shape == table.shape``);
2. conforming via flatten+reshape dies in ``infer-vector-layout:
   unsupported shape cast`` (rank-changing casts);
3. the reshape-free form passes lowering but the v5e backend rejects it —
   ``Not implemented: Multiple source vregs along gather dimension`` —
   i.e. ``dynamic_gather`` shuffles within ONE vector register; a
   multi-thousand-row VMEM table gather is inexpressible.

The production TPU path for this op is therefore the **windowed dense
block kernel** (``ops/pallas_block.py``): same math re-mapped so nothing
is gathered inside the kernel (candidates are gathered once per layer by
XLA, the score tile stays VMEM-resident, the edge mask travels bitpacked).
This module keeps only the dispatch gate and the XLA gather-chain
fallback so existing callers (``SparseRGL(backend="pallas")``,
bench_roofline) keep a stable entry point; ``tools/probe_mosaic_gather.py``
carries the experimental kernel and flips ``_MOSAIC_GATHER_OK`` the day
the backend learns cross-vreg gathers.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import Array

# Flipped by tools/probe_mosaic_gather.py when (and only when) the compiled
# gather kernel both lowers and matches the XLA chain on this backend.
_MOSAIC_GATHER_OK = False


def fused_neighbor_attention(
    q: Array, x: Array, v: Array, cols: Array,
    mask: Optional[Array] = None, interpret: bool = False,
) -> Array:
    """q [n, d] relation queries, x [n, d] keys, v [n, dv] messages,
    cols [n, K] neighbor indices, mask [n, K] → out [n, dv].

    Dispatches to the XLA SDDMM→softmax→SpMM chain (the Mosaic gather
    kernel is gated off on this backend — module docstring). For the fast
    fused path on TPU use the block backend (``ops/pallas_block.py``).
    """
    del interpret  # kept for call-site compatibility
    if _MOSAIC_GATHER_OK:
        raise NotImplementedError(
            "probe flipped the gate — promote the kernel from "
            "tools/probe_mosaic_gather.py back into this module")
    from relationalgraphlearning_tpu.ops import sparse

    if mask is None:
        mask = jnp.ones(cols.shape, bool)
    scores = sparse.sddmm_fixed_k(q, x, cols, mask)
    attn = sparse.neighbor_softmax(scores, mask)
    return sparse.spmm_fixed_k(attn, v, cols)
