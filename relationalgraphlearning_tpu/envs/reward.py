"""Reward and collision logic, shared by the env step and the planner.

Reference parity: the reward shaping inside ``CrowdSim.step`` (success +1,
collision −0.25, discomfort (dmin − 0.2)·0.5·Δt, else 0; collision via
``point_to_segment_dist`` on relative motion segments) and its pure-function
replication ``ModelPredictiveRL.estimate_reward`` (SURVEY.md §2.1, §2.2,
§3.2–3.3). Keeping one implementation guarantees the planner's reward
estimates match the env exactly — stronger than the reference, which
duplicates the logic.

All functions broadcast over leading batch axes ([envs], [envs, actions], …).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

from relationalgraphlearning_tpu import types as T
from relationalgraphlearning_tpu.configs.base import EnvConfig
from relationalgraphlearning_tpu.geometry import point_to_segment_dist, propagate_full_state


class RewardOutput(NamedTuple):
    reward: Array  # [...]
    done: Array  # [...] bool
    outcome: Array  # [...] int32 (OUTCOME_*)
    dmin: Array  # [...] closest robot-human separation during the step


def compute_reward(
    robot: Array,  # [..., 9] robot FullState (pre-step)
    humans_obs: Array,  # [..., N, 5] human ObservableState (pre-step)
    human_velocities: Array,  # [..., N, 2] velocities humans take this step
    action: Array,  # [..., 2] robot action
    t_next: Array,  # [...] episode time after this step
    cfg: EnvConfig,
    kinematics: str | None = None,
) -> RewardOutput:
    """Reward for taking ``action`` from the given state.

    Mirrors CrowdSim.step ordering: collision → goal → timeout → discomfort.
    Collision/dmin use the closest approach between the robot (at origin,
    stationary in relative frame) and each human's relative motion segment
    over the step — exactly the reference's per-human
    ``point_to_segment_dist`` check, vectorized.

    ``kinematics`` overrides the env default — the action convention follows
    the ACTING policy, like the reference's ActionXY/ActionRot types do
    (e.g. the holonomic ORCA demonstrator inside a unicycle-configured env).
    """
    dt = cfg.time_step
    rc = cfg.reward

    next_robot = propagate_full_state(
        robot, action, dt, kinematics or cfg.robot_kinematics)
    robot_vel = (T.position(next_robot) - T.position(robot)) / dt

    rel_p0 = T.position(humans_obs) - T.position(robot)[..., None, :]
    rel_v = human_velocities - robot_vel[..., None, :]
    rel_p1 = rel_p0 + rel_v * dt
    origin = jnp.zeros_like(rel_p0)
    sep = point_to_segment_dist(rel_p0, rel_p1, origin) \
        - humans_obs[..., T.RADIUS] - robot[..., None, T.RADIUS]
    dmin = jnp.min(sep, axis=-1)
    collision = dmin < 0.0

    goal_dist = jnp.linalg.norm(
        T.position(next_robot) - T.goal(robot), axis=-1)
    reaching_goal = goal_dist < robot[..., T.RADIUS]
    timeout = t_next >= cfg.time_limit

    discomfort = dmin < rc.discomfort_dist
    r_discomfort = (dmin - rc.discomfort_dist) * rc.discomfort_penalty_factor * dt

    reward = jnp.where(
        collision, rc.collision_penalty,
        jnp.where(reaching_goal, rc.success_reward,
                  jnp.where(discomfort, r_discomfort, 0.0)))
    done = collision | reaching_goal | timeout
    outcome = jnp.where(
        collision, T.OUTCOME_COLLISION,
        jnp.where(reaching_goal, T.OUTCOME_REACH_GOAL,
                  jnp.where(timeout, T.OUTCOME_TIMEOUT, T.OUTCOME_NOTHING)))
    return RewardOutput(reward, done, outcome.astype(jnp.int32), dmin)


def estimate_reward(robot: Array, humans_obs: Array, action: Array,
                    cfg: EnvConfig) -> RewardOutput:
    """Planner-side reward estimate (parity:
    ``ModelPredictiveRL.estimate_reward``): humans assumed to keep their
    current observed velocities; no timeout accounting (t_next = -inf)."""
    return compute_reward(
        robot, humans_obs, T.velocity(humans_obs), action,
        jnp.full(robot.shape[:-1], -jnp.inf), cfg)
