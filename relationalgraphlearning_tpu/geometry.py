"""Geometry primitives, vectorized over arbitrary leading batch axes.

Reference parity: ``crowd_sim/envs/utils/utils.py::point_to_segment_dist`` —
THE collision primitive used by both the env step and policy-side reward
estimation (SURVEY.md §2.1, §3.2). The reference computes it per-human in a
Python loop; here it is a pure jnp function broadcast over [envs, humans,
actions, ...] at once.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from relationalgraphlearning_tpu import types as T


def point_to_segment_dist(p1: Array, p2: Array, q: Array) -> Array:
    """Distance from point(s) ``q`` to segment(s) ``p1``->``p2``.

    All args are [..., 2]; broadcasting applies. Matches the reference
    semantics: clamp the projection parameter to [0, 1] and return the
    Euclidean distance to the clamped closest point. Degenerate segments
    (p1 == p2) reduce to point distance.
    """
    seg = p2 - p1
    seg_sq = jnp.sum(seg * seg, axis=-1, keepdims=True)
    t = jnp.sum((q - p1) * seg, axis=-1, keepdims=True) / jnp.maximum(seg_sq, 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    closest = p1 + t * seg
    return jnp.linalg.norm(q - closest, axis=-1)


def propagate_full_state(state: Array, action: Array, dt, kinematics: str) -> Array:
    """Advance a FullState[..., 9] by one step under ``action``.

    Parity: ``Agent.compute_position``/``Agent.step`` in
    ``crowd_sim/envs/utils/agent.py`` and ``StatePredictor.compute_next_state``
    (SURVEY.md §2.1, §2.2). Holonomic: action = [vx, vy]. Unicycle: action =
    [v, dtheta]; heading updates first, then the agent moves along the new
    heading (reference semantics).
    """
    if kinematics == T.HOLONOMIC:
        vx = action[..., 0]
        vy = action[..., 1]
        theta = state[..., T.THETA]
    elif kinematics == T.UNICYCLE:
        theta = state[..., T.THETA] + action[..., 1]
        vx = action[..., 0] * jnp.cos(theta)
        vy = action[..., 0] * jnp.sin(theta)
    else:
        raise ValueError(f"unknown kinematics: {kinematics}")
    px = state[..., T.PX] + vx * dt
    py = state[..., T.PY] + vy * dt
    out = state.at[..., T.PX].set(px)
    out = out.at[..., T.PY].set(py)
    out = out.at[..., T.VX].set(vx)
    out = out.at[..., T.VY].set(vy)
    out = out.at[..., T.THETA].set(theta)
    return out


def reached_destination(full_state: Array, tol: Array | None = None) -> Array:
    """True where the agent is within its radius (or ``tol``) of its goal.

    Parity: ``Agent.reached_destination`` / ``Policy.reach_destination``.
    """
    d = jnp.linalg.norm(T.goal(full_state) - T.position(full_state), axis=-1)
    if tol is None:
        tol = full_state[..., T.RADIUS]
    return d < tol


def holonomic_to_unicycle(action: Array, theta: Array,
                          rotation_constraint: float) -> Array:
    """Convert a holonomic (vx, vy) action into a feasible unicycle
    (v, dtheta) for an agent currently heading ``theta``.

    Parity note: the reference disambiguates by action TYPE (ActionXY vs
    ActionRot) and lets a holonomic demonstrator drive a unicycle-configured
    robot holonomically. That leaves imitation data with a frozen heading
    the unicycle policy never sees at decision time (r3 finding: IL val 0.46
    vs 0.94 holonomic). Converting instead keeps the demonstration
    trajectories INSIDE the unicycle-feasible set: turn toward the commanded
    velocity clipped to ±``rotation_constraint``, with forward speed scaled
    by cos of the residual heading error (never negative — large errors turn
    in place), so stored states carry the heading distribution the policy
    meets at evaluation.
    """
    vx, vy = action[..., 0], action[..., 1]
    speed = jnp.sqrt(vx * vx + vy * vy)
    heading = jnp.arctan2(vy, vx)
    err = heading - theta
    err = jnp.arctan2(jnp.sin(err), jnp.cos(err))  # wrap to [-pi, pi]
    dtheta = jnp.clip(err, -rotation_constraint, rotation_constraint)
    moving = speed > 1e-6
    dtheta = jnp.where(moving, dtheta, 0.0)
    v = speed * jnp.maximum(jnp.cos(err - dtheta), 0.0)
    return jnp.stack([v, dtheta], axis=-1)
