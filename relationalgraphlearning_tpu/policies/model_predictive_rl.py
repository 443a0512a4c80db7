"""Model-Predictive RL policy (MP-RGL) — the paper's main method.

Reference parity: ``crowd_nav/policy/model_predictive_rl.py`` (SURVEY.md
§2.2, §3.3): discrete action space (5 speeds × 16 rotations + stop = 81);
optional ``action_clip`` pre-selecting the top ``planning_width`` actions by
one-step value; d-step planning recursion

    V_planning(s, d, w) = max over clipped actions of
        V(s)/d + (d−1)/d · [ R̂(s,a) + γ^(Δt·v_pref) · V_planning(ŝ', d−1, w) ]

with leaf value = the value estimator, learned dynamics ŝ' from the state
predictor, and R̂ the pure-function reward estimate (no env calls).

TPU-first redesign: the reference's recursive Python tree (graph model
invoked O(width^depth × 81) times per decision, SURVEY.md §3.3) becomes a
LEVEL-WISE BATCHED tensor program: each tree level evaluates ALL branches ×
ALL candidate actions as one batched RGL forward on the MXU; top-k clipping
is ``jax.lax.top_k``. Depth is static so the tree unrolls at trace time into
`depth` dense batched matmul stages — no recursion, no Python in the hot
path, and the whole planner vmaps over env batches.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import Array

from relationalgraphlearning_tpu import types as T
from relationalgraphlearning_tpu.configs.base import EnvConfig, PolicyConfig
from relationalgraphlearning_tpu.envs.reward import estimate_reward
from relationalgraphlearning_tpu.models.mprl_networks import MPRLNetworks
from relationalgraphlearning_tpu.policies.action_space import (
    build_action_group_index, build_action_space)
from relationalgraphlearning_tpu.policies.base import BasePolicy, epsilon_greedy


class ModelPredictiveRLPolicy(BasePolicy):
    trainable = True

    def __init__(self, policy_cfg: PolicyConfig, env_cfg: EnvConfig):
        self.cfg = policy_cfg
        self.env_cfg = env_cfg
        self.gamma = policy_cfg.gamma
        self.kinematics = env_cfg.robot_kinematics
        self.depth = policy_cfg.mprl.planning_depth
        self.width = policy_cfg.mprl.planning_width
        self.do_action_clip = policy_cfg.mprl.do_action_clip
        self.sparse_search = policy_cfg.mprl.sparse_search
        self.action_space = jnp.asarray(build_action_space(
            policy_cfg.action_space, env_cfg.robot_v_pref, self.kinematics))
        self.action_group_index = jnp.asarray(build_action_group_index(
            policy_cfg.action_space, policy_cfg.mprl.sparse_speed_samples,
            policy_cfg.mprl.sparse_rotation_samples))
        self.module = MPRLNetworks(
            policy_cfg, time_step=env_cfg.time_step, kinematics=self.kinematics)

    # ----------------------------------------------------------------- setup
    def init_params(self, key: Array):
        robot = jnp.zeros((1, 9))
        humans = jnp.zeros((1, self.env_cfg.sim.human_num, 5))
        action = jnp.zeros((1, 2))
        return self.module.init(key, robot, humans, action)

    # ------------------------------------------------------------- net calls
    def value(self, params: Any, robot: Array, humans: Array) -> Array:
        return self.module.apply(params, robot, humans,
                                 method=MPRLNetworks.value)

    def next_state(self, params: Any, robot: Array, humans: Array,
                   action: Array):
        return self.module.apply(params, robot, humans, action,
                                 method=MPRLNetworks.next_state)

    def attention(self, params: Any, robot: Array, humans: Array) -> Array:
        return self.module.apply(params, robot, humans,
                                 method=MPRLNetworks.attention)

    def _gamma_bar(self, robot: Array) -> Array:
        return self.gamma ** (self.env_cfg.time_step * robot[..., T.VPREF])

    # ------------------------------------------------------- batched planner
    def _expand(self, params: Any, robot: Array, humans: Array,
                actions: Array):
        """Evaluate `actions` [..., A, 2] from states [..., 9]/[..., N, 5]:
        returns (reward_est [..., A], next_robot [..., A, 9],
        next_humans [..., A, N, 5])."""
        A = actions.shape[-2]
        robot_b = jnp.broadcast_to(
            robot[..., None, :], robot.shape[:-1] + (A, 9))
        humans_b = jnp.broadcast_to(
            humans[..., None, :, :], humans.shape[:-2] + (A,) + humans.shape[-2:])
        r = estimate_reward(robot_b, humans_b, actions, self.env_cfg)
        next_robot, next_humans = self.next_state(
            params, robot_b, humans_b, actions)
        return r.reward, next_robot, next_humans

    def _clip_actions(self, params: Any, robot: Array, humans: Array,
                      width: int):
        """Top-`width` actions by one-step value (parity: ``action_clip``).
        robot [..., 9] → actions [..., width, 2] plus their expansion."""
        A = self.action_space.shape[0]
        acts = jnp.broadcast_to(
            self.action_space, robot.shape[:-1] + (A, 2))
        rew, nr, nh = self._expand(params, robot, humans, acts)
        v1 = rew + self._gamma_bar(robot)[..., None] * self.value(params, nr, nh)
        if self.sparse_search:
            idx = self._sparse_topk(v1, width)  # [..., width]
        else:
            _, idx = jax.lax.top_k(v1, width)  # [..., width]
        gather = lambda x, extra: jnp.take_along_axis(
            x, idx.reshape(idx.shape + (1,) * extra), axis=len(idx.shape) - 1)
        return (gather(acts, 1), gather(rew, 0),
                gather(nr, 1), gather(nh, 2))

    def _sparse_topk(self, v1: Array, width: int) -> Array:
        """Group-diverse top-k (parity: ``action_clip`` sparse_search branch):
        walk actions in descending one-step value, skipping any whose coarse
        (speed, rotation) bucket is already represented. Batched: `width`
        unrolled masked-argmax rounds (width is 1–4; buckets ≈ 17)."""
        groups = self.action_group_index  # [A]
        masked = v1
        picks = []
        for _ in range(width):
            i = jnp.argmax(masked, axis=-1)  # [...]
            picks.append(i)
            g = jnp.take(groups, i)  # [...]
            masked = jnp.where(groups == g[..., None], -jnp.inf, masked)
        return jnp.stack(picks, axis=-1)  # [..., width]

    def v_planning(self, params: Any, robot: Array, humans: Array,
                   depth: int) -> Array:
        """Batched V_planning over arbitrary leading axes; returns [...]."""
        v_cur = self.value(params, robot, humans)
        if depth <= 1:
            return v_cur
        if self.do_action_clip:
            _, rew, nr, nh = self._clip_actions(params, robot, humans, self.width)
        else:
            A = self.action_space.shape[0]
            acts = jnp.broadcast_to(
                self.action_space, robot.shape[:-1] + (A, 2))
            rew, nr, nh = self._expand(params, robot, humans, acts)
        v_next = self.v_planning(params, nr, nh, depth - 1)  # [..., W]
        returns = v_cur[..., None] / depth + (depth - 1) / depth * (
            rew + self._gamma_bar(robot)[..., None] * v_next)
        return jnp.max(returns, axis=-1)

    def action_values(self, params: Any, js: T.JointState) -> Array:
        """Planning return for every action in the space: [..., A] (used by
        predict and by tests; width clipping only applies below the root)."""
        A = self.action_space.shape[0]
        acts = jnp.broadcast_to(self.action_space, js.robot.shape[:-1] + (A, 2))
        rew, nr, nh = self._expand(params, js.robot, js.humans, acts)
        # parity: predict passes the FULL planning_depth to V_planning on the
        # next state — V_planning counts the node it is called on (depth==1 is
        # the leaf), so a d-step plan is root action + V_planning(s', d).
        v_next = self.v_planning(params, nr, nh, self.depth)
        return rew + self._gamma_bar(js.robot)[..., None] * v_next

    def predict(self, params: Any, js: T.JointState, key: Array,
                epsilon: Array) -> Array:
        """Greedy planning action with ε-exploration (parity:
        ``ModelPredictiveRL.predict``)."""
        if self.do_action_clip and self.depth > 1:
            acts, rew, nr, nh = self._clip_actions(
                params, js.robot, js.humans, self.width)
            v_next = self.v_planning(params, nr, nh, self.depth)  # see above
            returns = rew + self._gamma_bar(js.robot)[..., None] * v_next
            greedy = jnp.take_along_axis(
                acts, jnp.argmax(returns, axis=-1)[..., None, None], axis=-2
            )[..., 0, :]
        else:
            returns = self.action_values(params, js)
            greedy = self.action_space[jnp.argmax(returns, axis=-1)]
        return epsilon_greedy(greedy, self.action_space, key, epsilon)
