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


def canonicalize_scene(robot: Array, humans: Array):
    """Rigid-transform the whole scene into the goal frame: origin at the
    robot, x-axis pointing at the goal.

    The crowd environment is isotropic (no global landmarks), so value and
    human-motion prediction are invariant/covariant under rigid transforms;
    canonicalizing removes two symmetry dimensions the raw-coordinate MPRL
    nets otherwise have to learn — decisive for unicycle robots, whose
    heading varies at decision time (r3: raw-input MPRL plateaus at ~0.68
    success under unicycle vs 0.98 holonomic). State layouts are unchanged
    (FullState[9] / ObservableState[5]), so the same RGL nets consume them.

    Returns (robot_c, humans_c, rot) with rot the world->canonical rotation
    angle (needed by ``decanonicalize_humans``).
    """
    px, py = robot[..., T.PX], robot[..., T.PY]
    dx = robot[..., T.GX] - px
    dy = robot[..., T.GY] - py
    dg = jnp.sqrt(dx * dx + dy * dy)
    rot = jnp.where(dg > 1e-6, jnp.arctan2(dy, dx), 0.0)
    cos_r, sin_r = jnp.cos(rot), jnp.sin(rot)

    def _rotv(vx, vy, c, s):
        return vx * c + vy * s, vy * c - vx * s

    rvx, rvy = _rotv(robot[..., T.VX], robot[..., T.VY], cos_r, sin_r)
    theta = robot[..., T.THETA] - rot
    theta = jnp.arctan2(jnp.sin(theta), jnp.cos(theta))
    robot_c = robot
    robot_c = robot_c.at[..., T.PX].set(0.0)
    robot_c = robot_c.at[..., T.PY].set(0.0)
    robot_c = robot_c.at[..., T.VX].set(rvx)
    robot_c = robot_c.at[..., T.VY].set(rvy)
    robot_c = robot_c.at[..., T.GX].set(dg)
    robot_c = robot_c.at[..., T.GY].set(0.0)
    robot_c = robot_c.at[..., T.THETA].set(theta)

    cn, sn = cos_r[..., None], sin_r[..., None]
    hpx, hpy = _rotv(humans[..., T.PX] - px[..., None],
                     humans[..., T.PY] - py[..., None], cn, sn)
    hvx, hvy = _rotv(humans[..., T.VX], humans[..., T.VY], cn, sn)
    humans_c = humans
    humans_c = humans_c.at[..., T.PX].set(hpx)
    humans_c = humans_c.at[..., T.PY].set(hpy)
    humans_c = humans_c.at[..., T.VX].set(hvx)
    humans_c = humans_c.at[..., T.VY].set(hvy)
    return robot_c, humans_c, rot


def decanonicalize_humans(humans_c: Array, robot: Array,
                          rot: Array) -> Array:
    """Map canonical-frame human observable states back to world frame
    (inverse of ``canonicalize_scene`` for the predictor's outputs)."""
    cos_r, sin_r = jnp.cos(rot)[..., None], jnp.sin(rot)[..., None]

    def _inv(vx, vy):
        return vx * cos_r - vy * sin_r, vy * cos_r + vx * sin_r

    hpx, hpy = _inv(humans_c[..., T.PX], humans_c[..., T.PY])
    hvx, hvy = _inv(humans_c[..., T.VX], humans_c[..., T.VY])
    out = humans_c
    out = out.at[..., T.PX].set(hpx + robot[..., None, T.PX])
    out = out.at[..., T.PY].set(hpy + robot[..., None, T.PY])
    out = out.at[..., T.VX].set(hvx)
    out = out.at[..., T.VY].set(hvy)
    return out
