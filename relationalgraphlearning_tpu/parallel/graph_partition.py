"""Node/edge-partitioned sparse graph aggregation over a device mesh.

BASELINE config #5: 10k+-agent synthetic crowds partitioned across chips/
hosts, boundary agent features exchanged over ICI overlapped with local
aggregation. The reference has no distributed anything (SURVEY.md §2.6);
this is the graph analogue of sequence/context parallelism:

- nodes are block-partitioned over the mesh's ``data`` axis (shard s owns
  rows [s·n_loc, (s+1)·n_loc)); ``cols`` keeps GLOBAL indices;
- **allgather method**: each device all-gathers the (small) node feature
  tables over ICI, then computes its row block locally — one collective per
  layer, optimal when n·d is far below VMEM;
- **ring method**: D−1 ``ppermute`` steps circulate feature blocks around
  the ICI ring; each step folds the in-flight block's contribution into a
  running online-softmax accumulator (running max m, normalizer s, weighted
  sum acc — the flash-attention recurrence applied to graph neighborhoods),
  so communication of step t+1 overlaps XLA-scheduled compute of step t and
  no device ever holds the full table — the scalable path for crowds that
  outgrow a single chip's memory.

Both methods are exact (tested equal to the single-device SparseRGL).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

_NEG = -1e30


# ---------------------------------------------------------------- primitives
def _local_scores(q, x_blk, cols, blk_start, blk_size):
    """Scores of edges whose source col lands in the current block.

    q [n_loc, d]; x_blk [blk, d]; cols [n_loc, K] global → (scores [n_loc,K]
    masked to the block, local_idx [n_loc, K])."""
    in_blk = (cols >= blk_start) & (cols < blk_start + blk_size)
    local = jnp.clip(cols - blk_start, 0, blk_size - 1)
    xg = x_blk[local]  # [n_loc, K, d]
    s = jnp.einsum("nd,nkd->nk", q, xg, preferred_element_type=jnp.float32)
    return jnp.where(in_blk, s, _NEG), local, in_blk


def ring_neighbor_attention(q: Array, x: Array, v: Array, cols: Array,
                            mask: Optional[Array], axis_name: str) -> Array:
    """Inside shard_map: per-shard [n_loc, ...] arrays, global ``cols``.

    Online-softmax over ring-circulated blocks:
        m' = max(m, m_blk); s' = s·e^{m−m'} + s_blk·e^{m_blk−m'};
        acc' = acc·e^{m−m'} + acc_blk·e^{m_blk−m'}.
    """
    D = jax.lax.psum(1, axis_name)
    me = jax.lax.axis_index(axis_name)
    n_loc, d = x.shape
    K = cols.shape[-1]
    if mask is None:
        mask = jnp.ones((q.shape[0], K), bool)

    perm = [(i, (i + 1) % D) for i in range(D)]

    def fold(carry, blk, blk_owner):
        m, s, acc = carry
        x_blk, v_blk = blk
        blk_start = blk_owner * n_loc
        scores, local, in_blk = _local_scores(q, x_blk, cols, blk_start, n_loc)
        scores = jnp.where(mask, scores, _NEG)
        m_blk = jnp.max(scores, axis=-1)
        m_new = jnp.maximum(m, m_blk)
        # guard: exp(-inf - -inf)
        e_old = jnp.exp(jnp.where(m > _NEG / 2, m - m_new, _NEG))
        e_blk = jnp.exp(jnp.where(m_blk > _NEG / 2, m_blk - m_new, _NEG))
        w = jnp.exp(scores - m_new[:, None])
        w = jnp.where(in_blk & mask, w, 0.0)
        s_blk = jnp.sum(w, axis=-1)
        acc_blk = jnp.einsum("nk,nkd->nd", w, v_blk[local],
                             preferred_element_type=jnp.float32)
        s_new = s * e_old + s_blk
        acc_new = acc * e_old[:, None] + acc_blk
        return (m_new, s_new, acc_new)

    m0 = jnp.full((q.shape[0],), _NEG)
    s0 = jnp.zeros((q.shape[0],))
    acc0 = jnp.zeros((q.shape[0], v.shape[-1]))
    carry = fold((m0, s0, acc0), (x, v), me)

    x_blk, v_blk = x, v
    for step in range(1, D):
        # circulate blocks: after `step` hops we hold the block of owner
        # (me - step) mod D; ppermute issues the send while the fold of the
        # previous block is still in flight (XLA overlaps them).
        x_blk = jax.lax.ppermute(x_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        owner = (me - step) % D
        carry = fold(carry, (x_blk, v_blk), owner)

    m, s, acc = carry
    return acc / jnp.maximum(s, 1e-20)[:, None]


def allgather_neighbor_attention(q: Array, x: Array, v: Array, cols: Array,
                                 mask: Optional[Array], axis_name: str
                                 ) -> Array:
    """Inside shard_map: all-gather the node tables, compute the local rows."""
    from relationalgraphlearning_tpu.ops import sparse

    x_all = jax.lax.all_gather(x, axis_name, tiled=True)
    v_all = jax.lax.all_gather(v, axis_name, tiled=True)
    scores = sparse.sddmm_fixed_k(q, x_all, cols, mask)
    attn = sparse.neighbor_softmax(scores, mask)
    return sparse.spmm_fixed_k(attn, v_all, cols)


# ------------------------------------------------------------- full forward
def partitioned_sparse_rgl(params, cfg, states: Array, cols: Array,
                           mesh: Mesh, mask: Optional[Array] = None,
                           method: str = "ring", axis: str = "data") -> Array:
    """SparseRGL forward with nodes partitioned over ``mesh[axis]``.

    ``params`` is a SparseRGL param tree (replicated); states [n, 5] and
    cols [n, K] shard over rows. Dense applies (w_h/w_a/gcn kernels) are
    row-local; only the neighbor aggregation communicates.
    """
    from relationalgraphlearning_tpu.models.sparse_rgl import SparseRGL

    model = SparseRGL(cfg)
    agg = (ring_neighbor_attention if method == "ring"
           else allgather_neighbor_attention)

    # pad the node dimension up to a multiple of the mesh axis so arbitrary
    # crowd sizes block-partition evenly; padded rows carry an all-False edge
    # mask (softmax denominator guard zeroes them) and are sliced back off.
    n = states.shape[0]
    D = mesh.shape[axis]
    pad = (-n) % D
    if pad:
        K = cols.shape[-1]
        if mask is None:
            mask = jnp.ones((n, K), bool)
        states = jnp.concatenate(
            [states, jnp.zeros((pad,) + states.shape[1:], states.dtype)])
        cols = jnp.concatenate([cols, jnp.zeros((pad, K), cols.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad, K), bool)])

    def forward(params, states, cols, mask):
        def apply_sub(name, x):
            return model.apply(params, x,
                               method=lambda m, xx: getattr(m, name)(xx))

        H = apply_sub("w_h", states)
        p = params["params"]
        num_layers = cfg.num_layer
        for li in range(num_layers):
            q = apply_sub("w_a", H)
            v = H @ p[f"gcn_w{li+1}"]["kernel"]
            out = agg(q, H, v, cols, mask, axis)
            H_next = jax.nn.relu(out)
            if cfg.skip_connection and H_next.shape == H.shape:
                H_next = H_next + H
            H = H_next
        return H

    row = P(axis)
    fn = shard_map(
        forward, mesh=mesh,
        in_specs=(P(), row, row, row if mask is not None else P()),
        out_specs=row, check_vma=False)
    out = fn(params, states, cols, mask)
    return out[:n] if pad else out
