"""Robot-centric state transforms for the value-network baselines.

Reference parity: ``CADRL.rotate`` (SURVEY.md §2.2) — the canonical rotation
of a JointState into the robot-centric frame whose x-axis points at the goal:
robot part [dg, v_pref, theta, radius, vx, vy]; per-human part [px1, py1,
vx1, vy1, radius1, da, radius + radius1] (13-dim rows consumed by
CADRL/SARL/LSTM-RL value nets). Also ``MultiHumanRL.build_occupancy_maps``
(cell_num=4, cell_size=1, om_channel_size=3): per-human local occupancy /
velocity grids over its neighbors.

Everything broadcasts over leading batch axes.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from relationalgraphlearning_tpu import types as T

ROTATED_ROBOT_DIM = 6
ROTATED_HUMAN_DIM = 7


def rotate_joint_state(robot: Array, humans: Array,
                       kinematics: str) -> Array:
    """robot [..., 9], humans [..., N, 5] → rotated rows [..., N, 13].

    Row layout: [dg, v_pref, theta', radius, vx', vy',
                 px1', py1', vx1', vy1', radius1, da, radius_sum]
    where ' denotes the goal-aligned robot-centric frame. For holonomic
    robots theta' = 0 (parity with CADRL.rotate).
    """
    dx = robot[..., T.GX] - robot[..., T.PX]
    dy = robot[..., T.GY] - robot[..., T.PY]
    rot = jnp.arctan2(dy, dx)
    cos_r, sin_r = jnp.cos(rot), jnp.sin(rot)

    dg = jnp.sqrt(dx * dx + dy * dy)
    v_pref = robot[..., T.VPREF]
    vx = robot[..., T.VX] * cos_r + robot[..., T.VY] * sin_r
    vy = robot[..., T.VY] * cos_r - robot[..., T.VX] * sin_r
    radius = robot[..., T.RADIUS]
    if kinematics == T.UNICYCLE:
        theta = robot[..., T.THETA] - rot
    else:
        theta = jnp.zeros_like(rot)
    robot_part = jnp.stack([dg, v_pref, theta, radius, vx, vy], axis=-1)

    hpx = humans[..., T.PX] - robot[..., None, T.PX]
    hpy = humans[..., T.PY] - robot[..., None, T.PY]
    cos_rn, sin_rn = cos_r[..., None], sin_r[..., None]
    px1 = hpx * cos_rn + hpy * sin_rn
    py1 = hpy * cos_rn - hpx * sin_rn
    vx1 = humans[..., T.VX] * cos_rn + humans[..., T.VY] * sin_rn
    vy1 = humans[..., T.VY] * cos_rn - humans[..., T.VX] * sin_rn
    radius1 = humans[..., T.RADIUS]
    da = jnp.sqrt(hpx * hpx + hpy * hpy)
    radius_sum = radius[..., None] + radius1
    human_part = jnp.stack(
        [px1, py1, vx1, vy1, radius1, da, radius_sum], axis=-1)

    n = humans.shape[-2]
    robot_tiled = jnp.broadcast_to(
        robot_part[..., None, :], robot_part.shape[:-1] + (n, ROTATED_ROBOT_DIM))
    return jnp.concatenate([robot_tiled, human_part], axis=-1)


def build_occupancy_maps(humans: Array, cell_num: int, cell_size: float,
                         om_channel_size: int) -> Array:
    """Per-human local occupancy map over the OTHER humans.

    humans [..., N, 5] → [..., N, om_channel_size * cell_num**2].
    Channel 1: occupancy count; channels 2-3 (om_channel_size=3): mean vx/vy
    per cell, in each human's velocity-aligned frame — parity with
    ``MultiHumanRL.build_occupancy_maps``.
    """
    n = humans.shape[-2]
    px = humans[..., T.PX]
    py = humans[..., T.PY]
    vx = humans[..., T.VX]
    vy = humans[..., T.VY]

    # pairwise displacement of other-humans j in human i's frame
    dx = px[..., None, :] - px[..., :, None]  # [..., i, j]
    dy = py[..., None, :] - py[..., :, None]
    # rotate into human i's heading frame
    angle = jnp.arctan2(vy, vx)  # [..., i]
    ca, sa = jnp.cos(angle)[..., None], jnp.sin(angle)[..., None]
    x = dx * ca + dy * sa
    y = dy * ca - dx * sa
    # velocity of j in i's frame
    vxj = vx[..., None, :] * ca + vy[..., None, :] * sa
    vyj = vy[..., None, :] * ca - vx[..., None, :] * sa

    half = cell_num * cell_size / 2
    xi = jnp.floor((x + half) / cell_size).astype(jnp.int32)
    yi = jnp.floor((y + half) / cell_size).astype(jnp.int32)
    inside = (xi >= 0) & (xi < cell_num) & (yi >= 0) & (yi < cell_num)
    not_self = ~jnp.eye(n, dtype=bool)
    valid = inside & not_self
    cell = jnp.where(valid, yi * cell_num + xi, 0)

    num_cells = cell_num * cell_num
    onehot = jnp.equal(
        cell[..., None], jnp.arange(num_cells)) & valid[..., None]
    onehot = onehot.astype(humans.dtype)  # [..., i, j, cells]
    occupancy = jnp.sum(onehot, axis=-2)  # [..., i, cells]
    if om_channel_size == 1:
        return occupancy
    sum_vx = jnp.einsum("...ij,...ijc->...ic", vxj, onehot)
    sum_vy = jnp.einsum("...ij,...ijc->...ic", vyj, onehot)
    denom = jnp.maximum(occupancy, 1.0)
    maps = jnp.stack([occupancy, sum_vx / denom, sum_vy / denom], axis=-1)
    # interleave per cell: [c0_occ, c0_vx, c0_vy, c1_occ, ...]
    return maps.reshape(maps.shape[:-2] + (num_cells * 3,))
