"""One-step-lookahead value policies (CADRL / SARL / LSTM-RL / GCN).

Reference parity: ``crowd_nav/policy/multi_human_rl.py::MultiHumanRL.predict``
(and ``cadrl.py::CADRL.propagate``) — for every discrete action: propagate
the robot analytically and the humans at constant velocity, estimate the
reward, evaluate the value net on the propagated joint state, and take
argmax over ``reward + γ^(Δt·v_pref) · V(s')`` (SURVEY.md §2.2). The
reference loops over ~81 actions in Python per decision; here the whole
action sweep is one batched forward.

Each concrete policy supplies a flax module over rotated rows; GCN supplies
the RGL value estimator over raw states.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from relationalgraphlearning_tpu import geometry
from relationalgraphlearning_tpu import types as T
from relationalgraphlearning_tpu.configs.base import EnvConfig, PolicyConfig
from relationalgraphlearning_tpu.envs.reward import estimate_reward
from relationalgraphlearning_tpu.models.baseline_nets import (
    CADRLNet,
    LstmRLNet,
    SARLNet,
)
from relationalgraphlearning_tpu.models.value_estimator import ValueEstimator
from relationalgraphlearning_tpu.policies import state_transform
from relationalgraphlearning_tpu.policies.action_space import build_action_space
from relationalgraphlearning_tpu.policies.base import BasePolicy, epsilon_greedy


class OneStepLookaheadPolicy(BasePolicy):
    """Shared machinery; subclasses set ``self.module`` and ``self.rotate``."""

    trainable = True

    def __init__(self, policy_cfg: PolicyConfig, env_cfg: EnvConfig):
        self.cfg = policy_cfg
        self.env_cfg = env_cfg
        self.gamma = policy_cfg.gamma
        self.kinematics = env_cfg.robot_kinematics
        self.action_space = jnp.asarray(build_action_space(
            policy_cfg.action_space, env_cfg.robot_v_pref, self.kinematics))
        self.module = None  # set by subclass
        self.rotate = True  # value net consumes rotated rows
        self.with_om = policy_cfg.with_om
        # parity: MultiHumanRL.predict query_env — humans propagated through
        # the env's privileged onestep_lookahead instead of const velocity.
        self.query_env = policy_cfg.query_env

    # -- value-net input ----------------------------------------------------
    def net_input(self, robot: Array, humans: Array) -> Array:
        rows = state_transform.rotate_joint_state(robot, humans, self.kinematics)
        if self.with_om:
            om = state_transform.build_occupancy_maps(
                humans, self.cfg.om_cell_num, self.cfg.om_cell_size,
                self.cfg.om_channel_size)
            rows = jnp.concatenate([rows, om], axis=-1)
        return rows

    def value(self, params: Any, robot: Array, humans: Array) -> Array:
        out = self.module.apply(params, self.net_input(robot, humans))
        if isinstance(out, tuple):  # SARL returns (value, attention)
            out = out[0]
        return out

    def init_params(self, key: Array):
        robot = jnp.zeros((1, 9))
        humans = jnp.zeros((1, self.env_cfg.sim.human_num, 5))
        return self.module.init(key, self.net_input(robot, humans))

    # -- prediction ---------------------------------------------------------
    def action_values(self, params: Any, js: T.JointState) -> Array:
        """One-step return for every action: [A]."""
        A = self.action_space.shape[0]
        robot_b = jnp.broadcast_to(js.robot, (A,) + js.robot.shape)
        humans_b = jnp.broadcast_to(js.humans, (A,) + js.humans.shape)
        r = estimate_reward(robot_b, humans_b, self.action_space, self.env_cfg)
        next_robot = geometry.propagate_full_state(
            robot_b, self.action_space, self.env_cfg.time_step, self.kinematics)
        next_humans = humans_b.at[..., :2].add(
            humans_b[..., 2:4] * self.env_cfg.time_step)
        v_next = self.value(params, next_robot, next_humans)
        gamma_bar = self.gamma ** (
            self.env_cfg.time_step * js.robot[..., T.VPREF])
        return r.reward + gamma_bar * v_next

    def predict(self, params: Any, js: T.JointState, key: Array,
                epsilon: Array) -> Array:
        returns = self.action_values(params, js)
        greedy = self.action_space[jnp.argmax(returns)]
        return epsilon_greedy(greedy, self.action_space, key, epsilon)

    # -- privileged env-queried lookahead (parity: query_env=True) ----------
    def action_values_env(self, params: Any, env, env_state) -> Array:
        """One-step return per action with humans propagated by the env's
        own crowd dynamics (``CrowdSim.lookahead_actions``): [A]."""
        rew, next_robot, next_obs = env.lookahead_actions(
            env_state, self.action_space)
        A = self.action_space.shape[0]
        v_next = self.value(
            params, next_robot, jnp.broadcast_to(next_obs, (A,) + next_obs.shape))
        gamma_bar = self.gamma ** (
            self.env_cfg.time_step * env_state.robot[..., T.VPREF])
        return rew + gamma_bar * v_next

    def predict_env(self, params: Any, env, env_state, key: Array,
                    epsilon: Array) -> Array:
        returns = self.action_values_env(params, env, env_state)
        greedy = self.action_space[jnp.argmax(returns)]
        return epsilon_greedy(greedy, self.action_space, key, epsilon)


class CADRLPolicy(OneStepLookaheadPolicy):
    """Parity: ``crowd_nav/policy/cadrl.py`` — single-human value net."""

    multiagent_training = False

    def __init__(self, policy_cfg: PolicyConfig, env_cfg: EnvConfig):
        super().__init__(policy_cfg, env_cfg)
        self.module = CADRLNet(policy_cfg.cadrl_mlp_dims)


class SARLPolicy(OneStepLookaheadPolicy):
    """Parity: ``crowd_nav/policy/sarl.py`` — attention pooling value net."""

    def __init__(self, policy_cfg: PolicyConfig, env_cfg: EnvConfig):
        super().__init__(policy_cfg, env_cfg)
        self.module = SARLNet(
            mlp1_dims=policy_cfg.sarl_mlp1_dims,
            mlp2_dims=policy_cfg.sarl_mlp2_dims,
            attention_dims=policy_cfg.sarl_attention_dims,
            mlp3_dims=policy_cfg.sarl_mlp3_dims,
            with_global_state=policy_cfg.sarl_with_global_state)

    def attention_weights(self, params: Any, js: T.JointState) -> Array:
        _, w = self.module.apply(params, self.net_input(js.robot, js.humans))
        return w


class LstmRLPolicy(OneStepLookaheadPolicy):
    """Parity: ``crowd_nav/policy/lstm_rl.py`` — distance-sorted LSTM net."""

    def __init__(self, policy_cfg: PolicyConfig, env_cfg: EnvConfig):
        super().__init__(policy_cfg, env_cfg)
        self.module = LstmRLNet(
            lstm_hidden_dim=policy_cfg.lstm_hidden_dim,
            mlp_dims=policy_cfg.lstm_mlp_dims,
            with_interaction_module=policy_cfg.lstm_with_interaction_module,
            mlp1_dims=policy_cfg.lstm_mlp1_dims)


class GCNPolicy(OneStepLookaheadPolicy):
    """Parity: ``crowd_nav/policy/gcn.py`` — model-free one-step policy using
    the RGL graph model as value net over RAW (unrotated) states (the paper's
    RGL-onestep ablation)."""

    def __init__(self, policy_cfg: PolicyConfig, env_cfg: EnvConfig):
        super().__init__(policy_cfg, env_cfg)
        self.module = ValueEstimator(
            policy_cfg.gcn, policy_cfg.mprl.value_network_dims)
        self.rotate = False

    def net_input(self, robot, humans):  # raw states
        raise NotImplementedError("GCN consumes raw states via value()")

    def value(self, params: Any, robot: Array, humans: Array) -> Array:
        return self.module.apply(params, robot, humans)

    def init_params(self, key: Array):
        robot = jnp.zeros((1, 9))
        humans = jnp.zeros((1, self.env_cfg.sim.human_num, 5))
        return self.module.init(key, robot, humans)
