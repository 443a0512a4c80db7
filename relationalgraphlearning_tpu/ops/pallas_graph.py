"""Fused Pallas kernel: neighbor gather + relation softmax + aggregation.

The hot op of SparseRGL is, per GCN layer,

    out[i] = Σ_k softmax_k( q[i]·x[cols[i,k]] ) · v[cols[i,k]]

i.e. SDDMM → row softmax → SpMM. Composed from jnp ops, XLA materializes the
gathered neighbor tensors [n, K, d] in HBM between stages; this kernel fuses
the whole chain in VMEM — one HBM read of q/x/v per row tile, one HBM write
of out, no gathered intermediates ever leaving the chip. Node tables (x, v)
are VMEM-resident (n·d·4B each; 10k×64 ≈ 2.5 MB), making the in-kernel
gathers VMEM-latency instead of HBM-latency.

STATUS (v5e, jax 0.9) — the compiled path is gated OFF after a three-step
probe chain (``tools/probe_mosaic_gather.py``, re-run each round):

1. ``lax.gather`` lowers to ``tpu.dynamic_gather`` ONLY in the
   take_along_axis form — ``out[i, j] = x[idx[i, j], j]`` with
   ``idx.shape == x.shape`` (lowering.py's shape check).
2. Conforming via flatten+reshape ([R,K]→[n]→[R,K,d]) dies in
   ``infer-vector-layout: unsupported shape cast`` (rank-changing casts).
3. The reshape-free form below (static K unroll, per-column index
   broadcast) passes lowering but the v5e backend rejects it with
   ``Not implemented: Multiple source vregs along gather dimension`` —
   i.e. ``tpu.dynamic_gather`` only shuffles WITHIN one vector register
   (8 sublanes f32) along the gathered dim; a multi-thousand-row VMEM
   table gather is inexpressible on this backend.

A VMEM-resident row gather therefore cannot be written in Mosaic on this
image, and the XLA path (ops/sparse.py) serves TPU execution — see
bench_roofline.py / docs/ROOFLINE.json for where it sits against the
measured VPU/HBM ceilings. The kernel remains the documented fused design,
is exercised for correctness in interpreter mode, and the probe flips
``_MOSAIC_GATHER_OK`` the day the backend learns cross-vreg gathers.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl

try:  # TPU-only module; absent on CPU-only installs
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

_NEG = -1e30
_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom of the ~16MB/core
# See STATUS in the module docstring: v5e dynamic_gather is intra-vreg
# only ("Multiple source vregs along gather dimension") — probe before use.
_MOSAIC_GATHER_OK = False


def _row_gather(table: Array, idx: Array) -> Array:
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
    # SDDMM, one neighbor column at a time (static K unroll; each gather is
    # a full-table per-column row gather — the only form Mosaic lowers)
    cols = cols_ref[:]
    score_cols = []
    for k in range(K):
        xg = _row_gather(x, cols[:, k])
        score_cols.append(jnp.sum(q * xg, axis=-1, keepdims=True))  # [n, 1]
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


def fits_vmem(n: int, d: int, dv: int) -> bool:
    return 4 * n * (d + dv) < _VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_neighbor_attention(
    q: Array, x: Array, v: Array, cols: Array,
    mask: Optional[Array] = None, interpret: bool = False,
) -> Array:
    """q [n, d] relation queries, x [n, d] keys, v [n, dv] messages,
    cols [n, K] neighbor indices, mask [n, K] → out [n, dv]."""
    n, d = q.shape
    dv = v.shape[-1]
    K = cols.shape[-1]
    if mask is None:
        mask = jnp.ones((n, K), bool)

    # whole problem VMEM-resident (q/x/v tables + a few [n, d] temps);
    # the gather form requires untiled rows (index vectors of length n)
    usable = (_HAS_PLTPU and _MOSAIC_GATHER_OK
              and fits_vmem(n, 2 * d + 2, 2 * dv) and n % 8 == 0)
    if not interpret and not usable:
        # fallback: pure-JAX path (XLA gather)
        from relationalgraphlearning_tpu.ops import sparse

        scores = sparse.sddmm_fixed_k(q, x, cols, mask)
        attn = sparse.neighbor_softmax(scores, mask)
        return sparse.spmm_fixed_k(attn, v, cols)

    kwargs = {}
    if _HAS_PLTPU and not interpret:
        vm = pltpu.VMEM
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(_VMEM_BUDGET * 1.5))
    else:
        vm = None

    def spec():
        return pl.BlockSpec(memory_space=vm) if vm is not None \
            else pl.BlockSpec()

    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, dv), v.dtype),
        in_specs=[spec() for _ in range(5)],
        out_specs=spec(),
        interpret=interpret,
        **kwargs,
    )(cols, mask.astype(jnp.float32), q, x, v)
