"""Non-trainable robot policies: ORCA (IL demonstrator), Linear, SocialForce.

Reference parity: ``crowd_sim/envs/policy/orca.py::ORCA.predict`` (robot as
an RVO2 agent among the humans; ``safety_space`` inflation — used as the
imitation-learning demonstrator with safety_space=0.15, SURVEY.md §2.1,
§2.4), ``linear.py::Linear`` (go straight to goal), and
``socialforce.py::SocialForce`` as a robot policy.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from jax import Array

from relationalgraphlearning_tpu import types as T
from relationalgraphlearning_tpu.configs.base import EnvConfig, PolicyConfig
from relationalgraphlearning_tpu.envs.orca import ORCAParams, orca_velocity
from relationalgraphlearning_tpu.envs.social_force import SFMParams, centralized_sfm_step
from relationalgraphlearning_tpu.policies.base import BasePolicy


def _pref_velocity(robot: Array) -> Array:
    to_goal = T.goal(robot) - T.position(robot)
    d = jnp.linalg.norm(to_goal, axis=-1, keepdims=True)
    return jnp.where(d > 1e-6, to_goal / jnp.maximum(d, 1e-9), 0.0) \
        * robot[..., T.VPREF, None]


class LinearPolicy(BasePolicy):
    """Straight to goal at v_pref (parity: envs/policy/linear.py)."""

    def __init__(self, policy_cfg: PolicyConfig, env_cfg: EnvConfig):
        del policy_cfg, env_cfg

    def predict(self, params: Any, js: T.JointState, key, epsilon) -> Array:
        return _pref_velocity(js.robot)


class ORCARobotPolicy(BasePolicy):
    """Robot as an ORCA agent (parity: envs/policy/orca.py::ORCA).

    ``safety_space`` inflates radii (demonstrator uses 0.15). The robot sees
    the humans' observable states; humans are treated as neighbors with
    their current velocities.
    """

    def __init__(self, policy_cfg: PolicyConfig, env_cfg: EnvConfig,
                 safety_space: float = 0.0,
                 time_horizon: float | None = None):
        self.params_ = ORCAParams(
            neighbor_dist=env_cfg.orca_neighbor_dist,
            time_horizon=(time_horizon if time_horizon is not None
                          else env_cfg.orca_time_horizon),
            time_step=env_cfg.time_step,
            safety_space=safety_space)

    def predict(self, params: Any, js: T.JointState, key, epsilon) -> Array:
        robot, humans = js.robot, js.humans
        n = humans.shape[-2]
        return orca_velocity(
            T.position(robot), T.velocity(robot), robot[..., T.RADIUS],
            _pref_velocity(robot), robot[..., T.VPREF],
            T.position(humans), T.velocity(humans), humans[..., T.RADIUS],
            jnp.ones((n,), bool), self.params_)


class SocialForceRobotPolicy(BasePolicy):
    """Robot driven by social forces (parity: envs/policy/socialforce.py)."""

    def __init__(self, policy_cfg: PolicyConfig, env_cfg: EnvConfig):
        self.env_cfg = env_cfg
        self.sfm = SFMParams()

    def predict(self, params: Any, js: T.JointState, key, epsilon) -> Array:
        robot, humans = js.robot, js.humans
        pos = jnp.concatenate([T.position(robot)[None], T.position(humans)], 0)
        vel = jnp.concatenate([T.velocity(robot)[None], T.velocity(humans)], 0)
        rad = jnp.concatenate([robot[..., T.RADIUS][None], humans[..., T.RADIUS]], 0)
        vmax = jnp.concatenate(
            [robot[..., T.VPREF][None], jnp.ones(humans.shape[-2])], 0)
        pref = jnp.concatenate(
            [_pref_velocity(robot)[None], T.velocity(humans)], 0)
        active = jnp.ones(pos.shape[0], bool)
        new_v = centralized_sfm_step(
            pos, vel, rad, pref, vmax, active, self.sfm, self.env_cfg.time_step)
        return new_v[0]
