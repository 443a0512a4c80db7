"""Sparse graph ops: SDDMM, segment softmax, SpMM.

The reference's relation inference (X·W_a·Xᵀ then row softmax) and GCN
aggregation (A·H·W) are dense n×n ops — fine for n ≤ a few hundred agents,
O(n²) beyond (SURVEY.md §2.2, §5 "long-context" row). For pod-scale crowds
(10k+ agents, BASELINE config #5) the graph sparsifies to k nearest
neighbors and the same math becomes:

- **SDDMM** (sampled dense-dense matmul): edge scores only where edges exist;
- **segment/neighbor softmax**: normalize per source row;
- **SpMM**: gather-weighted neighbor aggregation.

Two layouts are provided:

1. **fixed-degree** ``cols [n, K]`` — the natural k-NN crowd layout. All ops
   are dense-regular (gather + batched matmul), which XLA maps to MXU +
   vectorized gathers; this is the fast path and what the Pallas kernels
   accelerate further (fused online-softmax aggregation).
2. **edge list** ``(rows [E], cols [E])`` — general graphs; uses
   ``jax.ops.segment_*``.

All functions take an optional validity mask so padded nodes/edges drop out
exactly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

_NEG = -1e30


# --------------------------------------------------------------------- graphs
def knn_graph(positions: Array, k: int, valid: Optional[Array] = None,
              include_self: bool = False) -> Array:
    """k-nearest-neighbor graph: positions [n, 2] → cols [n, k].

    Invalid nodes are pushed to +inf distance; self excluded unless asked.
    O(n²) distance matrix — graph construction is cheap relative to model
    flops and happens once per step; spatial-hash construction can replace
    this for n ≫ 10⁵.
    """
    n = positions.shape[0]
    d2 = jnp.sum(
        (positions[:, None, :] - positions[None, :, :]) ** 2, axis=-1)
    if not include_self:
        d2 = jnp.where(jnp.eye(n, dtype=bool), jnp.inf, d2)
    if valid is not None:
        d2 = jnp.where(valid[None, :], d2, jnp.inf)
    _, idx = jax.lax.top_k(-d2, k)
    return idx  # [n, k]


def knn_graph_grid(positions: Array, k: int, cell_size: float,
                   max_per_cell: int = 16,
                   include_self: bool = False,
                   valid: Optional[Array] = None) -> Array:
    """Spatial-hash k-NN: positions [n, 2] → cols [n, k], O(n·9C) instead of
    the O(n²) distance matrix — the scalable construction for n ≫ 10⁴.

    Nodes are bucketed on a ``cell_size`` grid (sorted by cell id; cell
    ranges found by searchsorted), and each node's candidates are the up-to-
    ``max_per_cell`` nodes of its 3×3 cell neighborhood. Exact equality with
    ``knn_graph`` holds when (a) every true k-NN lies within one cell ring
    (``cell_size`` ≥ the k-th-neighbor distance) and (b) no visited cell
    holds more than ``max_per_cell`` nodes; otherwise the graph degrades to
    approximate k-NN (the crowd-simulation regime tolerates this — RVO2
    itself caps maxNeighbors). All shapes static → jit/vmap-safe.
    """
    n = positions.shape[0]
    C = max_per_cell
    pmin = jnp.min(positions, axis=0)
    ij = jnp.floor((positions - pmin) / cell_size).astype(jnp.int32)  # [n,2]
    W = jnp.max(ij[:, 1]) + 2  # dynamic row stride; iy ≤ W-2 keeps ids unique
    cid = ij[:, 0] * W + ij[:, 1]  # [n]
    order = jnp.argsort(cid)
    cid_sorted = cid[order]

    # 3x3 neighborhood cell ids per node: [n, 9]
    offs = jnp.asarray([(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)],
                       jnp.int32)
    nb = ij[:, None, :] + offs[None, :, :]  # [n, 9, 2]
    nb_cid = nb[..., 0] * W + nb[..., 1]  # [n, 9]

    start = jnp.searchsorted(cid_sorted, nb_cid)  # [n, 9]
    slot = jnp.arange(C, dtype=jnp.int32)
    pos_in = start[..., None] + slot  # [n, 9, C]
    in_range = pos_in < n
    pos_cl = jnp.clip(pos_in, 0, n - 1)
    cand_ok = in_range & (cid_sorted[pos_cl] == nb_cid[..., None])
    cand = order[pos_cl]  # [n, 9, C] node ids

    d2 = jnp.sum(
        (positions[:, None, None, :] - positions[cand]) ** 2, axis=-1)
    d2 = jnp.where(cand_ok, d2, jnp.inf)
    if valid is not None:
        d2 = jnp.where(valid[cand], d2, jnp.inf)
    if not include_self:
        me = jnp.arange(n)[:, None, None]
        d2 = jnp.where(cand == me, jnp.inf, d2)
    d2f = d2.reshape(n, 9 * C)
    _, flat_idx = jax.lax.top_k(-d2f, k)  # [n, k]
    return jnp.take_along_axis(cand.reshape(n, 9 * C), flat_idx, axis=-1)


def knn_graph_auto(positions: Array, k: int, valid: Optional[Array] = None,
                   include_self: bool = False,
                   grid_threshold: int = 10_000,
                   max_per_cell: int = 32,
                   cell_size: Optional[Array] = None) -> Array:
    """Size-dispatching k-NN construction: exact O(n²) ``knn_graph`` below
    ``grid_threshold`` nodes, spatial-hash ``knn_graph_grid`` above it (the
    O(n²) distance matrix is the wall at 10⁵-agent crowds — SURVEY.md §5
    long-context row). This is the construction the large-crowd paths
    (``centralized_orca_step_knn``, SparseRGL benches) call.

    ``cell_size`` defaults to a density heuristic targeting ~``max_per_cell``
    /2 nodes per cell, which puts the 3×3 candidate ring well beyond the
    k-th-neighbor distance for near-uniform crowds (≈1.8× at k=16, C=32) —
    the regime where the grid graph equals the exact graph.
    """
    n = positions.shape[0]
    if n < grid_threshold:
        return knn_graph(positions, k, valid=valid, include_self=include_self)
    if cell_size is None:
        span = jnp.max(positions, axis=0) - jnp.min(positions, axis=0)
        area = jnp.maximum(span[0] * span[1], 1e-6)
        cell_size = jnp.sqrt(area * max_per_cell / (2.0 * n))
    return knn_graph_grid(positions, k, cell_size, max_per_cell,
                          include_self=include_self, valid=valid)


# ------------------------------------------------------------ fixed-degree ops
def sddmm_fixed_k(q: Array, x: Array, cols: Array,
                  mask: Optional[Array] = None) -> Array:
    """Edge scores score[i,k] = q[i] · x[cols[i,k]].

    q [n, d] (e.g. X·W_a), x [n, d], cols [n, K] → [n, K]. The SDDMM of the
    relation-inference step restricted to edges.
    """
    xg = x[cols]  # [n, K, d]
    scores = jnp.einsum("nd,nkd->nk", q, xg, preferred_element_type=jnp.float32)
    if mask is not None:
        scores = jnp.where(mask, scores, _NEG)
    return scores


def neighbor_softmax(scores: Array, mask: Optional[Array] = None) -> Array:
    """Row softmax over the K neighbors (parity: softmax rows of the dense
    similarity matrix)."""
    if mask is not None:
        scores = jnp.where(mask, scores, _NEG)
    return jax.nn.softmax(scores, axis=-1)


def spmm_fixed_k(attn: Array, h: Array, cols: Array) -> Array:
    """out[i] = Σ_k attn[i,k] · h[cols[i,k]] — the GCN aggregation (SpMM)."""
    hg = h[cols]  # [n, K, d]
    return jnp.einsum("nk,nkd->nd", attn, hg,
                      preferred_element_type=jnp.float32)


# --------------------------------------------------------------- edge-list ops
def sddmm_edges(q: Array, x: Array, rows: Array, cols: Array,
                edge_valid: Optional[Array] = None) -> Array:
    """score[e] = q[rows[e]] · x[cols[e]] for an edge list [E]."""
    s = jnp.sum(q[rows] * x[cols], axis=-1)
    if edge_valid is not None:
        s = jnp.where(edge_valid, s, _NEG)
    return s


def segment_softmax(scores: Array, rows: Array, num_rows: int,
                    edge_valid: Optional[Array] = None) -> Array:
    """Softmax over edges sharing a source row."""
    if edge_valid is not None:
        scores = jnp.where(edge_valid, scores, _NEG)
    row_max = jax.ops.segment_max(scores, rows, num_segments=num_rows)
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    e = jnp.exp(scores - row_max[rows])
    if edge_valid is not None:
        e = jnp.where(edge_valid, e, 0.0)
    denom = jax.ops.segment_sum(e, rows, num_segments=num_rows)
    return e / jnp.maximum(denom[rows], 1e-20)


def spmm_edges(attn: Array, h: Array, rows: Array, cols: Array,
               num_rows: int) -> Array:
    """out[i] = Σ_{e: rows[e]=i} attn[e] · h[cols[e]] via segment_sum."""
    msgs = attn[:, None] * h[cols]
    return jax.ops.segment_sum(msgs, rows, num_segments=num_rows)


# ----------------------------------------------------------- layout conversion
def fixed_k_to_edges(cols: Array) -> Tuple[Array, Array]:
    n, k = cols.shape
    rows = jnp.repeat(jnp.arange(n), k)
    return rows, cols.reshape(-1)


def dense_adjacency(scores_or_attn: Array, cols: Array, n: int) -> Array:
    """Scatter fixed-K values back to a dense [n, n] matrix (testing)."""
    nK = cols.shape
    out = jnp.zeros((n, n), scores_or_attn.dtype)
    rows = jnp.repeat(jnp.arange(n), cols.shape[1])
    return out.at[rows, cols.reshape(-1)].add(scores_or_attn.reshape(-1))
