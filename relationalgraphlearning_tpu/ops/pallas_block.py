"""Pallas fused kernel for windowed dense block attention.

The XLA block path (ops/block_graph.py) materializes the [nb, B, C] score
and attention tensors in HBM between the two matmuls — at the bench shapes
(B=256, C=640) that round-trips ~5× more bytes than the model data itself
and leaves the chain HBM-bound at ~10% of the MXU (measured r3,
tools/probe_block_chain.py). This kernel fuses the whole per-block chain —

    scores = q_blk · candᵀ   (MXU)
    masked row-softmax        (VPU)
    out    = attn · cand_v    (MXU)

— in VMEM: one grid step per node block, score tile never leaves the chip.
Everything the kernel touches is dense and statically shaped; the candidate
gather happens OUTSIDE in XLA (one [nb, C, d] gather per layer). That is
what makes this kernel expressible where the per-edge gather kernel
(ops/pallas_graph.py) is not: Mosaic on this image cannot lower
cross-vreg ``dynamic_gather``, and here there is nothing to gather.

VMEM budget per grid step at B=256, C=640, d=64 (f32): q 64 KB + x/v
160 KB each + mask 640 KB (f32 0/1) + scores scratch 640 KB + out 64 KB —
≈1.7 MB of the 16 MB/core.

Parity: same masked-softmax aggregation semantics as
``block_graph.block_attention`` (equality tested in
tests/test_pallas_block.py, interpret mode and compiled).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


# ------------------------------------------------------------- packed mask v2
def pack_emask(emask: Array) -> Array:
    """Bitpack a [nb, B, C] bool edge mask along rows → [nb, B//32, C] uint32.

    Row ``w*32 + b`` of block n lands in bit ``b`` of word ``[n, w, :]``.
    Packing along the ROW (sublane) axis keeps the lane axis (C) intact, so
    the in-kernel unpack is a broadcasted shift + a leading-dims reshape —
    both layout-preserving on Mosaic (row-major [B//32, 32, C] IS [B, C]).
    32× less mask HBM traffic than the f32 mask the r3 kernel streamed
    (measured there: the mask was the largest tensor in the chain —
    docs/ROOFLINE.json, VERDICT r3 weak #1).
    """
    nb, B, C = emask.shape
    assert B % 32 == 0, B
    m = emask.reshape(nb, B // 32, 32, C).astype(jnp.uint32)
    bits = m << jnp.arange(32, dtype=jnp.uint32)[None, None, :, None]
    # bits are disjoint powers of two → sum == bitwise or, exactly
    return bits.sum(axis=2, dtype=jnp.uint32)


def _unpack_bits(bits: Array, B: int) -> Array:
    """[B//32, C] uint32 → [B, C] bool (row w*32+b ← bit b of word w)."""
    C = bits.shape[-1]
    shift = jax.lax.broadcasted_iota(jnp.uint32, (B // 32, 32, C), 1)
    return ((bits[:, None, :] >> shift) & 1).reshape(B, C) > 0




def _kernel(q_ref, x_ref, v_ref, m_ref, o_ref):
    q = q_ref[0]  # [B, dq]
    x = x_ref[0]  # [C, dq]
    v = v_ref[0]  # [C, dv]
    m = m_ref[0]  # [B, C] float 0/1
    scores = jax.lax.dot_general(
        q, x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [B, C]
    scores = jnp.where(m > 0, scores, _NEG)
    smax = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - smax) * (m > 0)
    denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-20)
    attn = (e / denom).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        attn, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_block_attention(qb: Array, xg: Array, vg: Array, emask: Array,
                          interpret: bool = False) -> Array:
    """qb [nb, B, dq], xg [nb, C, dq], vg [nb, C, dv], emask [nb, B, C]
    (bool or 0/1) → out [nb, B, dv]; per-block masked-softmax attention
    with the score tile resident in VMEM."""
    nb, B, dq = qb.shape
    C = xg.shape[1]
    dv = vg.shape[2]
    m = emask.astype(jnp.float32)
    return pl.pallas_call(
        _kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, B, dq), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, dq), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, dv), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, dv), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, B, dv), qb.dtype),
        interpret=interpret,
    )(qb, xg, vg, m)


def _masked_softmax_agg(q, x, v, mbits, epilogue, stable):
    """Shared kernel math, r5-tuned. Two changes over the r4 kernel, both
    measured on the interleaved A/B harness (tools/ab_kernel.py — naive
    sequential timing on this tunnel drifts ±20% and had first suggested
    both were regressions): (a) the softmax divide moves AFTER the value
    matmul — out = (e·V)/Σe == (e/Σe)·V by linearity, shrinking the
    divide from [B, C] to [B, dv] (+7%, 2.02 → 2.17 Gedges/s on the
    544-window chain); (b) the unshifted path replaces bool unpack +
    select with a sign-smear int mask + bitwise AND (+4%, → 2.26): shift
    the edge bit into the sign position, arithmetic-shift it across the
    word, AND the f32 exp bits — inf from masked-slot overflow collapses
    to +0.0 exactly."""
    B = q.shape[0]
    scores = jax.lax.dot_general(
        q, x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [B, C] f32
    if stable:
        mask = _unpack_bits(mbits, B)  # [B, C] bool
        scores = jnp.where(mask, scores, _NEG)
        smax = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.where(mask, jnp.exp(scores - smax), 0.0)
    else:
        # exact softmax without the max shift — callers guarantee bounded
        # scores on REAL edges (e.g. l2-normalized inputs ⇒ |q·x| ≤ 1);
        # the shift cancels in e/Σe identically. Masked-out slots may
        # overflow to inf — the bitwise AND zeroes them exactly.
        C = mbits.shape[-1]
        shift = jax.lax.broadcasted_iota(jnp.int32, (B // 32, 32, C), 1)
        m32 = ((mbits.astype(jnp.int32)[:, None, :] << (31 - shift))
               >> 31).reshape(B, C)  # all-ones where edge
        e = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(jnp.exp(scores), jnp.int32) & m32,
            jnp.float32)
    denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-20)
    out = jax.lax.dot_general(
        e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) / denom
    if epilogue == "l2norm":  # fused row normalize — saves an HBM pass
        out = out / jnp.maximum(
            jnp.sqrt(jnp.sum(out * out, axis=-1, keepdims=True)), 1e-6)
    elif epilogue == "relu":  # the GCN-layer activation
        out = jnp.maximum(out, 0.0)
    return out


def _kernel_packed(q_ref, x_ref, v_ref, m_ref, o_ref, *, epilogue="none",
                   stable=True):
    out = _masked_softmax_agg(q_ref[0], x_ref[0], v_ref[0], m_ref[0],
                              epilogue, stable)
    o_ref[0] = out.astype(o_ref.dtype)


def _kernel_packed_shared(q_ref, x_ref, m_ref, o_ref, *, epilogue="none",
                          stable=True):
    """Single-table variant: keys and values are the SAME candidate block
    (the production case since the postponed-weight rewrite). One [C, d]
    DMA per grid step instead of two — Mosaic streams separate input refs
    separately even when they alias the same array."""
    x = x_ref[0]
    out = _masked_softmax_agg(q_ref[0], x, x, m_ref[0], epilogue, stable)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "epilogue", "stable"))
def fused_block_attention_packed_shared(qb: Array, xg: Array, mbits: Array,
                                        interpret: bool = False,
                                        epilogue: str = "none",
                                        stable: bool = True) -> Array:
    """``fused_block_attention_packed`` with values ≡ keys ≡ ``xg``."""
    nb, B, dq = qb.shape
    C = xg.shape[1]
    assert mbits.shape == (nb, B // 32, C), (mbits.shape, (nb, B, C))
    return pl.pallas_call(
        functools.partial(_kernel_packed_shared, epilogue=epilogue,
                          stable=stable),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, B, dq), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, dq), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B // 32, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, dq), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, B, dq), qb.dtype),
        interpret=interpret,
    )(qb, xg, mbits)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "epilogue", "stable"))
def fused_block_attention_packed(qb: Array, xg: Array, vg: Array,
                                 mbits: Array,
                                 interpret: bool = False,
                                 epilogue: str = "none",
                                 stable: bool = True) -> Array:
    """v2 kernel: qb [nb, B, dq], xg [nb, C, dq], vg [nb, C, dv],
    mbits [nb, B//32, C] uint32 from ``pack_emask`` → out [nb, B, dv].

    Same masked-softmax semantics as ``fused_block_attention``, but the edge
    mask arrives bitpacked (32× less HBM than the r3 f32 mask — the mask was
    the largest streamed tensor at the bench shapes) and is expanded on the
    VPU inside VMEM. Feature dtype is free; accumulation stays f32 on the
    MXU. NOTE (r5, interleaved A/B — docs/sweeps/ab_kernel_r5*.log): bf16
    features are consistently SLOWER than f32 here at every swept shape
    (e.g. 2.11 vs 2.26 Gedges/s at B=256/C=544) — the chain is VPU-bound
    in f32 (exp/select over [B, C]) and bf16 only adds conversions; the r4
    "bandwidth-optimal" claim was wrong and is withdrawn.
    """
    nb, B, dq = qb.shape
    C = xg.shape[1]
    dv = vg.shape[2]
    assert mbits.shape == (nb, B // 32, C), (mbits.shape, (nb, B, C))
    return pl.pallas_call(
        functools.partial(_kernel_packed, epilogue=epilogue, stable=stable),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, B, dq), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, dq), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, dv), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B // 32, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, dv), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, B, dv), qb.dtype),
        interpret=interpret,
    )(qb, xg, vg, mbits)


def block_attention_pallas_aligned(q: Array, x: Array, v: Array,
                                   starts: Array, align: int, mbits: Array,
                                   interpret: bool = False,
                                   epilogue: str = "none",
                                   stable: bool = True) -> Array:
    """Like ``block_attention_pallas`` but candidates arrive as ``align``-
    row slice starts (``block_graph.block_window_aligned``): the XLA gather
    fetches S items of align·d instead of S·align row items — the same
    kernel runs on the expanded window with its bitpacked mask."""
    from relationalgraphlearning_tpu.ops.block_graph import gather_aligned

    n, dq = q.shape
    nb, S = starts.shape
    B = n // nb
    xg = gather_aligned(x, starts, align)
    if v is x:
        out = fused_block_attention_packed_shared(
            q.reshape(nb, B, dq), xg, mbits,
            interpret=interpret, epilogue=epilogue, stable=stable)
    else:
        out = fused_block_attention_packed(
            q.reshape(nb, B, dq), xg, gather_aligned(v, starts, align),
            mbits, interpret=interpret, epilogue=epilogue, stable=stable)
    return out.reshape(n, -1)


def block_attention_pallas(q: Array, x: Array, v: Array, cand: Array,
                           emask: Array, interpret: bool = False,
                           epilogue: str = "none",
                           stable: bool = True) -> Array:
    """Drop-in for ``block_graph.block_attention`` with precomputed
    ``emask``: gathers candidates in XLA, runs the fused kernel.

    ``emask`` may be the [nb, B, C] bool mask (packed here per call — fine
    for one-shot use) or the graph-static [nb, B//32, C] uint32 from
    ``pack_emask`` (pack once, reuse across layers/steps — the fast path).
    When x and v are the SAME array (postponed-weight callers) XLA CSEs the
    two candidate gathers into one — the dominant cost at bench shapes.
    """
    n, dq = q.shape
    nb, C = cand.shape
    B = n // nb
    mbits = emask if emask.dtype == jnp.uint32 else pack_emask(emask)
    candc = jnp.clip(cand, 0, n - 1)
    if v is x:
        # keys ≡ values → single-table kernel: one candidate DMA per block
        out = fused_block_attention_packed_shared(
            q.reshape(nb, B, dq), x[candc], mbits,
            interpret=interpret, epilogue=epilogue, stable=stable)
    else:
        out = fused_block_attention_packed(
            q.reshape(nb, B, dq), x[candc], v[candc], mbits,
            interpret=interpret, epilogue=epilogue, stable=stable)
    return out.reshape(n, -1)
