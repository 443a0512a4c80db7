"""Value networks for the baseline policies.

Reference parity (SURVEY.md §2.2):
- ``crowd_nav/policy/cadrl.py::ValueNetwork`` — plain MLP over the rotated
  robot+single-human row.
- ``crowd_nav/policy/sarl.py::ValueNetwork`` — mlp1 → mlp2 → attention
  scores (optionally with the mean-pooled global state concatenated) →
  softmax-weighted feature sum joined with the robot self state → mlp3;
  attention weights exposed for visualization.
- ``crowd_nav/policy/lstm_rl.py`` — humans sorted by distance, encoded by an
  LSTM, final hidden state joined with the robot self state → value MLP.

All nets consume the rotated representation from
``policies/state_transform.py`` and broadcast over leading batch axes.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from relationalgraphlearning_tpu.models.mlp import MLP
from relationalgraphlearning_tpu.policies.state_transform import ROTATED_ROBOT_DIM


class CADRLNet(nn.Module):
    """V(rotated_row) per human, reduced by min (reference cadrl).

    Trained single-human (``multiagent_training=False``); on multi-human
    states the reference's ``CADRL.predict`` evaluates the pairwise net once
    per human and takes ``torch.min(outputs, 0)`` — the worst-case pairwise
    value — which is how its Table-I row is produced on the 5-human test
    protocol (SURVEY.md §2.2, §3.5). Reproduced here: rows [..., N, D] →
    per-row values → min over N (identity at N=1, so training is unchanged).
    """

    mlp_dims: Sequence[int] = (150, 100, 100, 1)

    @nn.compact
    def __call__(self, rows: Array) -> Array:
        """rows [..., N, D] → value [...] (min over humans), or [..., D]."""
        vals = MLP(self.mlp_dims, name="value_network")(rows)[..., 0]
        if rows.ndim >= 2:
            vals = jnp.min(vals, axis=-1)
        return vals


class SARLNet(nn.Module):
    """Attention-pooled multi-human value network (reference sarl)."""

    mlp1_dims: Sequence[int] = (150, 100)
    mlp2_dims: Sequence[int] = (100, 50)
    attention_dims: Sequence[int] = (100, 100, 1)
    mlp3_dims: Sequence[int] = (150, 100, 100, 1)
    with_global_state: bool = True

    @nn.compact
    def __call__(self, rows: Array) -> tuple[Array, Array]:
        """rows [..., N, D] → (value [...], attention weights [..., N])."""
        self_state = rows[..., 0, :ROTATED_ROBOT_DIM]
        e = MLP(self.mlp1_dims, last_relu=True, name="mlp1")(rows)
        h = MLP(self.mlp2_dims, name="mlp2")(e)
        if self.with_global_state:
            global_state = jnp.mean(e, axis=-2, keepdims=True)
            global_state = jnp.broadcast_to(global_state, e.shape)
            attn_in = jnp.concatenate([e, global_state], axis=-1)
        else:
            attn_in = e
        scores = MLP(self.attention_dims, name="attention")(attn_in)[..., 0]
        weights = jax.nn.softmax(scores, axis=-1)
        weighted = jnp.sum(weights[..., None] * h, axis=-2)
        joint = jnp.concatenate([self_state, weighted], axis=-1)
        value = MLP(self.mlp3_dims, name="mlp3")(joint)[..., 0]
        return value, weights


class LstmRLNet(nn.Module):
    """LSTM-encoded multi-human value network (reference lstm_rl).

    Humans are sorted by DEcreasing distance to the robot (reference feeds
    the farthest first so the nearest has the freshest influence on h_n).
    """

    lstm_hidden_dim: int = 50
    mlp_dims: Sequence[int] = (150, 100, 100, 1)
    with_interaction_module: bool = False
    mlp1_dims: Sequence[int] = (150, 100, 100, 50)

    @nn.compact
    def __call__(self, rows: Array) -> Array:
        """rows [..., N, D] rotated rows → value [...]."""
        self_state = rows[..., 0, :ROTATED_ROBOT_DIM]
        human_rows = rows[..., ROTATED_ROBOT_DIM:]  # [..., N, 7(+om)]
        # sort by decreasing distance (row index 5 is `da`)
        da = human_rows[..., 5]
        order = jnp.flip(jnp.argsort(da, axis=-1), axis=-1)
        sorted_rows = jnp.take_along_axis(
            human_rows, order[..., None], axis=-2)
        if self.with_interaction_module:
            sorted_rows = MLP(self.mlp1_dims, last_relu=True, name="mlp1")(
                sorted_rows)

        lstm = nn.OptimizedLSTMCell(self.lstm_hidden_dim, name="lstm")
        batch_shape = sorted_rows.shape[:-2]
        carry = lstm.initialize_carry(
            jax.random.PRNGKey(0), batch_shape + (sorted_rows.shape[-1],))
        # static human count → unrolled loop (params shared across steps;
        # nn.scan lifting is unnecessary for N ≤ tens of humans)
        for i in range(sorted_rows.shape[-2]):
            carry, h = lstm(carry, sorted_rows[..., i, :])
        joint = jnp.concatenate([self_state, h], axis=-1)
        return MLP(self.mlp_dims, name="value_network")(joint)[..., 0]
