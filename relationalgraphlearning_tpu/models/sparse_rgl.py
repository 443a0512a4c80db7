"""SparseRGL — relation inference + message passing over k-NN agent graphs.

Capability extension over the reference (SURVEY.md §5 "long-context" row):
the reference's RGL is hard-capped by its dense n×n similarity and Python
loops (n = 6 nodes in practice). SparseRGL runs the same relational math —
embed agents, embedded-gaussian relation scores, softmax-normalized GCN
aggregation, ``num_layer`` deep with ``layerwise_graph``/``skip_connection``
— restricted to each agent's K nearest neighbors, scaling to 10k+ agent
crowds (BASELINE config #5). Parameters mirror ``RGL`` (``w_h`` embed,
``w_a`` relation, per-layer GCN kernels), so dense-vs-sparse equivalence is
testable by giving every node all others as neighbors.

The per-node value head mirrors ``ValueEstimator`` but decentralized: a
value for EVERY agent node in one forward.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from relationalgraphlearning_tpu.configs.base import GCNConfig
from relationalgraphlearning_tpu.models.mlp import MLP
from relationalgraphlearning_tpu.ops import sparse


class SparseRGL(nn.Module):
    """``backend`` selects the aggregation implementation (identical math):

    - ``"gather"`` — per-edge gather path (ops/sparse.py); default.
    - ``"block"`` — windowed dense MXU path (ops/block_graph.py); requires
      spatially-sorted nodes + ``block_cand`` from ``block_window`` passed
      to ``__call__``; the fast path for 10k+ crowds on TPU.
    - ``"pallas"`` — fused Pallas kernel (gated off while Mosaic rejects
      cross-vreg gathers; ops/pallas_graph.py).
    """

    cfg: GCNConfig
    use_pallas: bool = False  # legacy alias for backend="pallas"
    backend: str = "gather"

    def setup(self):
        cfg = self.cfg
        self.w_h = MLP(cfg.wh_dims, last_relu=True, name="w_h")
        self.w_a = nn.Dense(cfg.final_state_dim, use_bias=False, name="w_a")
        dims = [cfg.gcn2_w1_dim, cfg.final_state_dim]
        while len(dims) < cfg.num_layer:
            dims.append(cfg.final_state_dim)
        self.gcn_layers = [
            nn.Dense(dims[i], use_bias=False, name=f"gcn_w{i+1}")
            for i in range(cfg.num_layer)
        ]

    def _aggregate(self, H: Array, cols: Array, mask: Optional[Array],
                   layer: nn.Dense,
                   block_cand: Optional[Array] = None,
                   block_emask: Optional[Array] = None) -> Array:
        """softmax-SDDMM + SpMM for one GCN layer: relu(Â · H · W).

        The layer weight is applied AFTER aggregation — (Â·H)·W ==
        Â·(H·W) by linearity, and with values == keys == H the candidate
        tables coincide, so every backend fetches ONE gathered table per
        layer instead of two (the r4 sweep showed the block chain is
        bounded by gather item count, not bytes — halving the tables is
        the highest-leverage exact rewrite).
        """
        q = self.w_a(H)
        backend = "pallas" if self.use_pallas else self.backend
        if backend == "pallas":
            from relationalgraphlearning_tpu.ops.pallas_graph import (
                fused_neighbor_attention,
            )

            agg = fused_neighbor_attention(q, H, H, cols, mask)
        elif backend == "block":
            from relationalgraphlearning_tpu.ops import block_graph

            assert block_cand is not None, (
                "backend='block' needs block_window candidates")
            if (block_emask is not None
                    and block_emask.dtype == jnp.uint32):
                # bitpacked mask selects the fused Pallas kernel — the
                # fast configuration on TPU (interpret-mode on CPU)
                import jax

                from relationalgraphlearning_tpu.ops.pallas_block import (
                    block_attention_pallas)

                agg = block_attention_pallas(
                    q, H, H, block_cand, block_emask,
                    interpret=jax.default_backend() != "tpu")
            else:
                agg = block_graph.block_attention(
                    q, H, H, cols, block_cand, mask=mask,
                    emask=block_emask)
        else:
            scores = sparse.sddmm_fixed_k(q, H, cols, mask)
            attn = sparse.neighbor_softmax(scores, mask)
            agg = sparse.spmm_fixed_k(attn, H, cols)
        return nn.relu(layer(agg))

    def __call__(self, states: Array, cols: Array,
                 mask: Optional[Array] = None,
                 block_cand: Optional[Array] = None,
                 block_emask: Optional[Array] = None) -> Array:
        """states [n, 5], cols [n, K] neighbor indices, mask [n, K] edge
        validity → node embeddings [n, X_dim]. ``block_cand`` [nb, C] from
        ``block_graph.block_window`` when ``backend='block'``; pass
        ``block_emask`` (``block_graph.block_masks``, graph-static) so the
        edge-mask scatter is built once per graph, not once per layer.

        Convention (ADVICE r4 #4): a precomputed ``block_emask`` must ALREADY
        bake in any runtime validity mask (``block_masks(cols, cand, mask)``)
        — the block backends read it verbatim, so passing a fresh per-call
        ``mask`` alongside it would be silently ignored. Asserted here."""
        if block_emask is not None and mask is not None:
            raise ValueError(
                "backend='block': pass EITHER a precomputed block_emask "
                "(with the validity mask baked in via block_masks(cols, "
                "cand, mask)) OR a per-call mask (emask is then built here) "
                "— a mask alongside a precomputed emask would be ignored.")
        H = self.w_h(states)
        if (self.backend == "block" and not self.use_pallas
                and block_emask is None and block_cand is not None):
            from relationalgraphlearning_tpu.ops import block_graph

            block_emask = block_graph.block_masks(cols, block_cand, mask)
        for layer in self.gcn_layers:
            H_next = self._aggregate(H, cols, mask, layer, block_cand,
                                     block_emask)
            if self.cfg.skip_connection and H_next.shape == H.shape:
                H_next = H_next + H
            H = H_next
        return H


class SparseValueNet(nn.Module):
    """Decentralized per-agent value head over SparseRGL embeddings."""

    gcn: GCNConfig
    value_dims: Sequence[int] = (32, 100, 100, 1)
    use_pallas: bool = False
    backend: str = "gather"

    def setup(self):
        self.graph_model = SparseRGL(self.gcn, use_pallas=self.use_pallas,
                                     backend=self.backend,
                                     name="graph_model")
        self.value_head = MLP(self.value_dims, name="value_network")

    def __call__(self, states: Array, cols: Array,
                 mask: Optional[Array] = None,
                 block_cand: Optional[Array] = None,
                 block_emask: Optional[Array] = None) -> Array:
        H = self.graph_model(states, cols, mask, block_cand=block_cand,
                             block_emask=block_emask)
        return self.value_head(H)[..., 0]
