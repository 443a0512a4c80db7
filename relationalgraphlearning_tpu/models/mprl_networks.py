"""Combined MPRL network bundle: value estimator + state predictor.

Reference parity: ``ModelPredictiveRL.configure`` wiring — with
``share_graph_model`` the value estimator and state predictor share one RGL
graph model; otherwise each owns its own; with ``linear_state_predictor`` the
learned predictor is replaced by constant-velocity propagation
(``get_state_dict/load_state_dict`` aggregate the 2–3 sub-modules — here a
single flax param tree does that for free). SURVEY.md §2.2.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
from jax import Array

from relationalgraphlearning_tpu import geometry
from relationalgraphlearning_tpu import types as T
from relationalgraphlearning_tpu.configs.base import PolicyConfig
from relationalgraphlearning_tpu.models.mlp import MLP
from relationalgraphlearning_tpu.models.rgl import RGL
from relationalgraphlearning_tpu.models.state_predictor import (
    propagate_humans_linear,
)


class MPRLNetworks(nn.Module):
    cfg: PolicyConfig
    time_step: float = 0.25
    kinematics: str = T.HOLONOMIC

    def setup(self):
        mprl = self.cfg.mprl
        self.value_graph_model = RGL(self.cfg.gcn, name="value_graph_model")
        if mprl.share_graph_model:
            self._pred_graph = self.value_graph_model
        elif not mprl.linear_state_predictor:
            self.pred_graph_model = RGL(self.cfg.gcn, name="pred_graph_model")
            self._pred_graph = self.pred_graph_model
        self.value_head = MLP(mprl.value_network_dims, name="value_network")
        if not mprl.linear_state_predictor:
            self.human_motion_predictor = MLP(
                mprl.motion_predictor_dims, name="human_motion_predictor")

    def _canon(self, robot: Array, humans: Array):
        """Optional goal-frame canonicalization of net inputs (symmetry
        reduction; ``MPRLConfig.canonicalize``)."""
        if not self.cfg.mprl.canonicalize:
            return robot, humans, None
        from relationalgraphlearning_tpu.policies.state_transform import (
            canonicalize_scene)

        return canonicalize_scene(robot, humans)

    def value(self, robot: Array, humans: Array) -> Array:
        robot_c, humans_c, _ = self._canon(robot, humans)
        H, _ = self.value_graph_model(robot_c, humans_c)
        return self.value_head(H[..., 0, :])[..., 0]

    def attention(self, robot: Array, humans: Array) -> Array:
        """Relation matrix of the value graph model, for visualization."""
        robot_c, humans_c, _ = self._canon(robot, humans)
        _, A = self.value_graph_model(robot_c, humans_c)
        return A

    def next_state(self, robot: Array, humans: Array, action: Array
                   ) -> Tuple[Array, Array]:
        next_robot = geometry.propagate_full_state(
            robot, action, self.time_step, self.kinematics)
        if self.cfg.mprl.linear_state_predictor:
            next_humans = propagate_humans_linear(humans, self.time_step)
        else:
            robot_c, humans_c, rot = self._canon(robot, humans)
            H, _ = self._pred_graph(robot_c, humans_c)
            next_humans = self.human_motion_predictor(H[..., 1:, :])
            if rot is not None:
                from relationalgraphlearning_tpu.policies.state_transform \
                    import decanonicalize_humans

                next_humans = decanonicalize_humans(next_humans, robot, rot)
        return next_robot, next_humans

    def __call__(self, robot: Array, humans: Array, action: Array):
        """Init-time entry touching every submodule."""
        v = self.value(robot, humans)
        ns = self.next_state(robot, humans, action)
        return v, ns
