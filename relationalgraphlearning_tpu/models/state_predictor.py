"""Trajectory (state) predictor.

Reference parity: ``crowd_nav/policy/state_predictor.py`` (SURVEY.md §2.2):
``StatePredictor`` = graph model + ``human_motion_predictor`` MLP over human
node embeddings → next human observable states; the robot's next state is
computed analytically from the action via kinematics
(``compute_next_state``). ``LinearStatePredictor`` is the constant-velocity
baseline (``linear_state_predictor`` config).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from relationalgraphlearning_tpu import geometry
from relationalgraphlearning_tpu import types as T
from relationalgraphlearning_tpu.configs.base import GCNConfig
from relationalgraphlearning_tpu.models.mlp import MLP
from relationalgraphlearning_tpu.models.rgl import RGL


def propagate_humans_linear(humans: Array, dt) -> Array:
    """Constant-velocity propagation of ObservableState[..., N, 5]."""
    pos = humans[..., :2] + humans[..., 2:4] * dt
    return jnp.concatenate([pos, humans[..., 2:]], axis=-1)


class StatePredictor(nn.Module):
    gcn: GCNConfig
    motion_predictor_dims: Sequence[int] = (64, 5)
    time_step: float = 0.25
    kinematics: str = T.HOLONOMIC

    def setup(self):
        self.graph_model = RGL(self.gcn, name="graph_model")
        self.human_motion_predictor = MLP(
            self.motion_predictor_dims, name="human_motion_predictor")

    def __call__(self, robot: Array, humans: Array, action: Array
                 ) -> Tuple[Array, Array]:
        """(robot [..., 9], humans [..., N, 5], action [..., 2]) →
        (next_robot [..., 9], next_humans [..., N, 5])."""
        H, _ = self.graph_model(robot, humans)
        next_humans = self.human_motion_predictor(H[..., 1:, :])
        next_robot = geometry.propagate_full_state(
            robot, action, self.time_step, self.kinematics)
        return next_robot, next_humans


def linear_state_predictor(robot: Array, humans: Array, action: Array,
                           time_step: float, kinematics: str
                           ) -> Tuple[Array, Array]:
    """Parity: ``LinearStatePredictor`` — humans propagate at constant
    velocity; robot analytically by kinematics."""
    next_robot = geometry.propagate_full_state(robot, action, time_step, kinematics)
    return next_robot, propagate_humans_linear(humans, time_step)
