"""Windowed dense neighbor attention — the MXU path for the graph hot op.

The fixed-K gather path (``sparse.sddmm_fixed_k`` → ``neighbor_softmax`` →
``spmm_fixed_k``) is *gather-bound* on TPU: at K=16, d=64 each edge moves two
64-float rows through XLA's dynamic-gather machinery while doing only ~260
flops, and the measured chain sits far below the VPU ceiling (BENCH_r02:
0.37 Gedges/s; see docs/ROOFLINE.json). This module re-maps the SAME math
onto the hardware the TPU is actually good at:

1. **Spatial sort** (``spatial_sort``): permute nodes into grid-cell order so
   consecutive index blocks are spatially local.
2. **Block candidate windows** (``block_window``): for each block of ``B``
   sorted rows, the union of their k-NN neighbors deduplicates to ~B + a
   perimeter ring — a C-slot candidate list (C ≈ 2–3·B), built with static
   shapes (sort + first-occurrence compaction).
3. **Masked dense attention** (``block_attention``): per block, scores =
   Q_block · cand_featsᵀ as a (B×d)·(d×C) matmul on the **MXU**, masked to
   the exact k-NN edges, row-softmaxed, then aggregated with a second
   (B×C)·(C×d) matmul. One [nb, C, d] gather replaces the [n, K, d] edge
   gather (K/(C/B) ≈ 8× fewer gathered rows), and all flops are dense.

Numerically the masked dense softmax over C slots equals the per-row softmax
over the K true neighbors (non-edges get -inf), so the result is *exactly*
``spmm_fixed_k(neighbor_softmax(sddmm_fixed_k(...)))`` whenever every
neighbor of a block lands in its candidate window (``coverage`` reports
this; with the default sizing it is 1.0 for near-uniform crowds —
``tests/test_block_graph.py`` asserts exact equality).

Parity: same relation-inference + GCN-aggregation semantics as the
reference's dense similarity path (SURVEY.md §2.2 ``compute_similarity_matrix``
/ GCN layers), restricted to k-NN edges; this layout is the TPU-native
redesign, not a translation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

_NEG = -1e30


def spatial_sort(positions: Array, cell_size: Optional[Array] = None) -> Array:
    """Permutation putting nodes in grid-cell (row-major) order.

    Returns ``perm`` such that ``positions[perm]`` is spatially blocked;
    apply the same permutation to every per-node array before using the
    block ops, and scatter results back with ``jnp.argsort(perm)``.
    """
    n = positions.shape[0]
    if cell_size is None:
        span = jnp.max(positions, axis=0) - jnp.min(positions, axis=0)
        area = jnp.maximum(span[0] * span[1], 1e-6)
        # ~64 nodes per cell: blocks of 128 span ~2 cells → tight locality
        cell_size = jnp.sqrt(area * 64.0 / n)
    pmin = jnp.min(positions, axis=0)
    ij = jnp.floor((positions - pmin) / cell_size).astype(jnp.int32)
    W = jnp.max(ij[:, 1]) + 2
    return jnp.argsort(ij[:, 0] * W + ij[:, 1])


def block_window(cols: Array, block_size: int, window: int,
                 sentinel: Optional[int] = None) -> Tuple[Array, Array]:
    """Per-block deduplicated candidate lists.

    cols [n, K] (n divisible by ``block_size``) → ``cand [nb, window]``
    sorted ascending, padded with the sentinel (default ``n``); plus
    ``coverage`` (scalar float) — the fraction of edges whose endpoint made
    it into its block's window (1.0 = the dense path is exact).

    Pass ``sentinel`` explicitly when ``cols`` carries ids from a LARGER
    index space than its own row count (the node-partitioned construction:
    per-shard rows, global ids) — it must exceed every real id so padding
    never collides with a candidate.
    """
    n, K = cols.shape
    assert n % block_size == 0, (n, block_size)
    if sentinel is None:
        sentinel = n
    nb = n // block_size
    ids = jnp.sort(cols.reshape(nb, block_size * K), axis=-1)
    first = jnp.concatenate(
        [jnp.ones((nb, 1), bool), ids[:, 1:] != ids[:, :-1]], axis=-1)
    slot = jnp.cumsum(first, axis=-1) - 1  # [nb, BK]
    ok = first & (slot < window)
    dump = jnp.where(ok, slot, window)  # overflow + duplicates → dump slot
    buf = jnp.full((nb, window + 1), sentinel, dtype=cols.dtype)
    cand = jax.vmap(lambda b, s, v: b.at[s].set(v))(buf, dump, ids)[:, :window]
    # coverage: an edge is covered iff its endpoint id equals the candidate
    # at its searchsorted slot (duplicates of kept ids are covered too)
    def _kept(cand_b, ids_b):
        sl = jnp.clip(jnp.searchsorted(cand_b, ids_b), 0, window - 1)
        return cand_b[sl] == ids_b

    coverage = jnp.mean(jax.vmap(_kept)(cand, ids).astype(jnp.float32))
    return cand, coverage


def block_window_aligned(cols: Array, block_size: int, window: int,
                         align: int) -> Tuple[Array, Array, Array]:
    """Aligned-slice candidate windows (r4): candidates are ``align``-row
    slice STARTS instead of single rows.

    The r4 chip sweep showed the block chain bounded by the candidate
    gather's per-ITEM cost, not its bytes; fetching A-row aligned slices
    (table viewed as [n/A, A·d]) cuts items ~(mean run length / A)× for
    the same downstream flops when the window is sized to the expanded
    slot count. Returns ``(starts [nb, S], cand [nb, S·A], coverage)``
    with S = window // align: ``starts`` sorted ascending (sentinel
    n/align), ``cand`` the expanded row ids (sorted — feed to
    ``block_masks``/``pack_emask`` unchanged), ``coverage`` the fraction
    of edges whose target's slice made the window.
    """
    n, K = cols.shape
    assert n % block_size == 0 and window % align == 0, (n, block_size,
                                                        window, align)
    nb = n // block_size
    S = window // align
    sent = n // align
    ids = jnp.sort(cols.reshape(nb, block_size * K) // align, axis=-1)
    first = jnp.concatenate(
        [jnp.ones((nb, 1), bool), ids[:, 1:] != ids[:, :-1]], axis=-1)
    slot = jnp.cumsum(first, axis=-1) - 1
    ok = first & (slot < S)
    dump = jnp.where(ok, slot, S)
    buf = jnp.full((nb, S + 1), sent, dtype=cols.dtype)
    starts = jax.vmap(lambda b, s, v: b.at[s].set(v))(buf, dump, ids)[:, :S]

    def _kept(st_b, ids_b):
        sl = jnp.clip(jnp.searchsorted(st_b, ids_b), 0, S - 1)
        return st_b[sl] == ids_b

    coverage = jnp.mean(jax.vmap(_kept)(starts, ids).astype(jnp.float32))
    cand = (starts[:, :, None] * align
            + jnp.arange(align, dtype=cols.dtype)[None, None, :]
            ).reshape(nb, S * align)
    return starts, cand, coverage


def gather_aligned(x: Array, starts: Array, align: int) -> Array:
    """Fetch the aligned slices: x [n, d], starts [nb, S] (units of
    ``align`` rows) → [nb, S·align, d]. One gather of S items per block —
    each item moves ``align`` rows — instead of S·align row items."""
    n, d = x.shape
    nb, S = starts.shape
    xa = x.reshape(n // align, align * d)
    g = xa[jnp.clip(starts, 0, n // align - 1)]  # [nb, S, align·d]
    return g.reshape(nb, S * align, d)


def block_masks(cols: Array, cand: Array,
                mask: Optional[Array] = None) -> Array:
    """emask [nb, B, C]: True exactly at each block's (row, neighbor) edges.

    Graph-static: depends only on cols/cand (+edge validity), so compute it
    ONCE per graph and reuse across layers/iterations — scatter construction
    inside a hot loop is what XLA cannot hoist or run fast on TPU (measured
    30× slowdown when built per scan iteration).

    ``cand`` rows are sorted, so each col id locates its slot by
    searchsorted; ids that overflowed the window land on a slot whose
    candidate differs and are dropped by the equality check.
    """
    n, K = cols.shape
    nb, C = cand.shape
    B = n // nb
    colsb = cols.reshape(nb, B, K)
    mb = (jnp.ones((nb, B, K), bool) if mask is None
          else mask.reshape(nb, B, K))

    def _m(cols_b, m_b, cand_b):
        slots = jnp.clip(jnp.searchsorted(cand_b, cols_b.reshape(-1)),
                         0, C - 1)
        hit = (cand_b[slots] == cols_b.reshape(-1)) & m_b.reshape(-1)
        rows = jnp.repeat(jnp.arange(B), K)
        return jnp.zeros((B, C), bool).at[rows, slots].max(hit)

    return jax.vmap(_m)(colsb, mb, cand)


def build_block_graph(positions: Array, k: int, block_size: int,
                      window: int, pack: bool = False):
    """Canonical block-graph construction: spatial sort → kNN → candidate
    windows → edge masks, in one call.

    Returns ``(perm, cols, cand, emask, coverage)``: apply ``perm`` to every
    per-node array, feed ``cols``/``cand``/``emask`` to the block backend.
    ``pack=True`` bitpacks the mask (``pallas_block.pack_emask``) selecting
    the fused Pallas kernel downstream. ``coverage`` (scalar, traced) is the
    fraction of edges inside their block's window — callers MUST surface it
    (assert/log == 1.0 on host, or thread it out of jit) rather than drop
    it: silently non-exact aggregation was ADVICE r3 finding #2.
    """
    from relationalgraphlearning_tpu.ops.sparse import knn_graph_auto

    perm = spatial_sort(positions)
    pos = positions[perm]
    cols = knn_graph_auto(pos, k)
    cand, coverage = block_window(cols, block_size, window)
    emask = block_masks(cols, cand)
    if pack:
        from relationalgraphlearning_tpu.ops.pallas_block import pack_emask

        emask = pack_emask(emask)
    return perm, cols, cand, emask, coverage


def block_attention(q: Array, x: Array, v: Array, cols: Array,
                    cand: Array, mask: Optional[Array] = None,
                    emask: Optional[Array] = None) -> Array:
    """Exact k-NN neighbor attention via masked dense per-block matmuls.

    q [n, dq] (query side, e.g. X·W_a), x [n, dq] (key side), v [n, dv]
    (value side), cols [n, K], cand [nb, C] from ``block_window``.
    Pass ``emask`` (from ``block_masks``) when calling repeatedly on the
    same graph — it is graph-static and expensive to rebuild per call.
    Returns out [n, dv] == spmm(neighbor_softmax(sddmm(q, x, cols, mask)),
    v, cols) when coverage == 1.
    """
    n, dq = q.shape
    nb, C = cand.shape
    if emask is None:
        emask = block_masks(cols, cand, mask)
    qb = q.reshape(nb, n // nb, dq)
    candc = jnp.clip(cand, 0, n - 1)
    xg = x[candc]  # [nb, C, dq]
    vg = v[candc]  # [nb, C, dv]

    scores = jnp.einsum("nbd,ncd->nbc", qb, xg,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(emask, scores, _NEG)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = jnp.where(emask, attn, 0.0)  # fully-masked rows → zero output
    out = jnp.einsum("nbc,ncd->nbd", attn.astype(vg.dtype), vg,
                     preferred_element_type=jnp.float32)
    return out.reshape(n, -1)
