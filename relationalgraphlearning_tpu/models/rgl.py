"""RGL — the relational graph model.

Reference parity: ``crowd_nav/policy/graph_model.py::class RGL`` (SURVEY.md
§2.2): (1) embed robot state (9-d) via MLP ``w_r`` and human states (5-d) via
``w_h`` into a shared X_dim space → node features X ∈ R^{n×X_dim} with node 0
= robot; (2) relation inference ``compute_similarity_matrix`` — pairwise
scores (default ``embedded_gaussian``: softmax rows of X·W_a·Xᵀ, the
SDDMM-shaped op) with the reference's alternative similarity options; (3)
``num_layer`` GCN message-passing layers H ← relu(A·H·W) (the SpMM-shaped op)
with ``skip_connection`` and ``layerwise_graph`` options. The relation matrix
of the final propagation is returned for attention visualization (reference
stores ``self.A``).

TPU-first notes: for small crowds (n = humans+1 ≤ a few hundred) the
similarity and aggregation are dense batched matmuls that map straight onto
the MXU — a [B, n, d] × [d, d] × [B, d, n] einsum batched over envs × planning
branches is exactly what the reference's per-decision Python calls could never
batch. For pod-scale crowds the same ops run sparse/edge-partitioned via
``relationalgraphlearning_tpu.ops`` (Pallas SDDMM/SpMM).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from relationalgraphlearning_tpu.configs.base import GCNConfig
from relationalgraphlearning_tpu.models.mlp import MLP


class RGL(nn.Module):
    cfg: GCNConfig

    def setup(self):
        cfg = self.cfg
        self.w_r = MLP(cfg.wr_dims, last_relu=True, name="w_r")
        self.w_h = MLP(cfg.wh_dims, last_relu=True, name="w_h")
        sim = cfg.similarity_function
        if sim in ("embedded_gaussian", "general"):
            # W_a: bilinear relation score X W_a Xᵀ.
            self.w_a = nn.Dense(cfg.final_state_dim, use_bias=False, name="w_a")
        elif sim == "concatenation":
            self.w_c = MLP((cfg.final_state_dim, 1), last_relu=False, name="w_c")
        # GCN layer weight matrices: X_dim -> gcn2_w1_dim -> final_state_dim -> ...
        dims = [cfg.gcn2_w1_dim, cfg.final_state_dim]
        while len(dims) < cfg.num_layer:
            dims.append(cfg.final_state_dim)
        self.gcn_layers = [
            nn.Dense(dims[i], use_bias=False, name=f"gcn_w{i+1}")
            for i in range(cfg.num_layer)
        ]

    def compute_similarity_matrix(self, X: Array) -> Array:
        """Pairwise relation matrix A [ ..., n, n] from node features X [..., n, d].

        Parity: ``RGL.compute_similarity_matrix`` with options
        embedded_gaussian (default) / gaussian / cosine_similarity / squared /
        equal_attention / general / concatenation (SURVEY.md §2.2).
        """
        sim = self.cfg.similarity_function
        if sim == "embedded_gaussian":
            scores = jnp.einsum(
                "...nd,...md->...nm", self.w_a(X), X,
                preferred_element_type=jnp.float32,
            )
            return jax.nn.softmax(scores, axis=-1)
        if sim == "gaussian":
            scores = jnp.einsum("...nd,...md->...nm", X, X,
                                preferred_element_type=jnp.float32)
            return jax.nn.softmax(scores, axis=-1)
        if sim == "cosine":
            Xn = X / jnp.maximum(jnp.linalg.norm(X, axis=-1, keepdims=True), 1e-12)
            return jnp.einsum("...nd,...md->...nm", Xn, Xn,
                              preferred_element_type=jnp.float32)
        if sim == "cosine_softmax":
            Xn = X / jnp.maximum(jnp.linalg.norm(X, axis=-1, keepdims=True), 1e-12)
            scores = jnp.einsum("...nd,...md->...nm", Xn, Xn,
                                preferred_element_type=jnp.float32)
            return jax.nn.softmax(scores, axis=-1)
        if sim == "squared":
            scores = jnp.einsum("...nd,...md->...nm", X, X,
                                preferred_element_type=jnp.float32) ** 2
            return scores / jnp.maximum(
                jnp.sum(scores, axis=-1, keepdims=True), 1e-12)
        if sim == "equal_attention":
            n = X.shape[-2]
            shape = X.shape[:-1] + (n,)
            return jnp.full(shape, 1.0 / n, dtype=X.dtype)
        if sim == "general":
            return jnp.einsum("...nd,...md->...nm", self.w_a(X), X,
                              preferred_element_type=jnp.float32)
        if sim == "concatenation":
            n = X.shape[-2]
            Xi = jnp.broadcast_to(
                X[..., :, None, :], X.shape[:-2] + (n, n, X.shape[-1]))
            Xj = jnp.broadcast_to(
                X[..., None, :, :], X.shape[:-2] + (n, n, X.shape[-1]))
            scores = nn.relu(self.w_c(jnp.concatenate([Xi, Xj], axis=-1)))[..., 0]
            return scores / jnp.maximum(
                jnp.sum(scores, axis=-1, keepdims=True), 1e-12)
        raise ValueError(f"unknown similarity function: {sim}")

    def __call__(self, robot: Array, humans: Array) -> Tuple[Array, Array]:
        """robot [..., 9], humans [..., N, 5] → (node embeddings [..., N+1,
        X_dim], relation matrix A [..., N+1, N+1])."""
        r_emb = self.w_r(robot)[..., None, :]  # [..., 1, X_dim]
        h_emb = self.w_h(humans)  # [..., N, X_dim]
        X = jnp.concatenate([r_emb, h_emb], axis=-2)

        A = self.compute_similarity_matrix(X)
        H = X
        for layer in self.gcn_layers:
            if self.cfg.layerwise_graph:
                A = self.compute_similarity_matrix(H)
            msg = jnp.einsum("...nm,...md->...nd", A, layer(H),
                             preferred_element_type=jnp.float32)
            H_next = nn.relu(msg)
            if self.cfg.skip_connection and H_next.shape == H.shape:
                H_next = H_next + H
            H = H_next
        return H, A
