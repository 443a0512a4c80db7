"""Value estimator head.

Reference parity: ``crowd_nav/policy/value_estimator.py::ValueEstimator`` —
graph model + MLP value head reading the robot node embedding (node 0):
``value_network(graph_model(state)[:, 0, :])`` (SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
from jax import Array

from relationalgraphlearning_tpu.configs.base import GCNConfig
from relationalgraphlearning_tpu.models.mlp import MLP
from relationalgraphlearning_tpu.models.rgl import RGL


class ValueEstimator(nn.Module):
    gcn: GCNConfig
    value_dims: Sequence[int] = (32, 100, 100, 1)

    def setup(self):
        self.graph_model = RGL(self.gcn, name="graph_model")
        self.value_head = MLP(self.value_dims, name="value_network")

    def __call__(self, robot: Array, humans: Array) -> Array:
        """robot [..., 9], humans [..., N, 5] → V(s) [...]."""
        H, _ = self.graph_model(robot, humans)
        return self.value_head(H[..., 0, :])[..., 0]
