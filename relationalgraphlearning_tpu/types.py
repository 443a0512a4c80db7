"""Core pytree state schemas.

Reference parity: ``crowd_sim/envs/utils/state.py`` (``FullState`` 9-dim,
``ObservableState`` 5-dim, ``JointState``), ``crowd_sim/envs/utils/action.py``
(``ActionXY``/``ActionRot``) — see SURVEY.md §2.1. Instead of Python objects,
states are fixed-shape arrays so the whole simulator + planner traces into one
XLA program and vmaps over env batches.

Layout (last axis):
  FullState[9]       = [px, py, vx, vy, radius, gx, gy, v_pref, theta]
  ObservableState[5] = [px, py, vx, vy, radius]
Actions are 2-vectors: holonomic ``ActionXY=[vx, vy]``; unicycle
``ActionRot=[v, dtheta]``. Which interpretation applies is a *static* config
choice (``kinematics``), never data-dependent.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array

# FullState component indices.
PX, PY, VX, VY, RADIUS, GX, GY, VPREF, THETA = range(9)

FULL_STATE_DIM = 9
OBSERVABLE_STATE_DIM = 5

HOLONOMIC = "holonomic"
UNICYCLE = "unicycle"


class JointState(NamedTuple):
    """Robot full state + observable human states — the policy input.

    Parity: ``JointState(self_state, human_states)`` in the reference's
    ``state.py`` and its ``to_tensor`` conversion (SURVEY.md §2.1). Here it is
    already tensor-shaped; leading batch axes are free.
    """

    robot: Array  # [..., 9]
    humans: Array  # [..., N, 5]


def observable(full_states: Array) -> Array:
    """FullState[..., 9] -> ObservableState[..., 5] (px, py, vx, vy, radius)."""
    return full_states[..., :OBSERVABLE_STATE_DIM]


def full_state(
    px, py, vx, vy, radius, gx, gy, v_pref, theta, dtype=jnp.float32
) -> Array:
    return jnp.stack(
        [
            jnp.asarray(px, dtype),
            jnp.asarray(py, dtype),
            jnp.asarray(vx, dtype),
            jnp.asarray(vy, dtype),
            jnp.asarray(radius, dtype),
            jnp.asarray(gx, dtype),
            jnp.asarray(gy, dtype),
            jnp.asarray(v_pref, dtype),
            jnp.asarray(theta, dtype),
        ],
        axis=-1,
    )


def position(states: Array) -> Array:
    return states[..., PX : PY + 1]

def velocity(states: Array) -> Array:
    return states[..., VX : VY + 1]

def goal(full_states: Array) -> Array:
    return full_states[..., GX : GY + 1]

def radius(states: Array) -> Array:
    return states[..., RADIUS]


def action_xy(vx, vy, dtype=jnp.float32) -> Array:
    return jnp.stack([jnp.asarray(vx, dtype), jnp.asarray(vy, dtype)], axis=-1)


def action_rot(v, r, dtype=jnp.float32) -> Array:
    return jnp.stack([jnp.asarray(v, dtype), jnp.asarray(r, dtype)], axis=-1)


# Episode outcome codes. Parity: `crowd_sim/envs/utils/info.py` classes
# Nothing/ReachGoal/Collision/Timeout/Danger (SURVEY.md §2.1) — as int codes so
# outcomes live in device arrays. Danger is reported separately as min
# separation distance, not as an outcome.
OUTCOME_NOTHING = 0
OUTCOME_REACH_GOAL = 1
OUTCOME_COLLISION = 2
OUTCOME_TIMEOUT = 3
