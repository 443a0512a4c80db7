"""Seeded scenario generation.

Reference parity: ``CrowdSim.generate_human`` + the seeded ``case_counter``
mechanism (SURVEY.md §2.1, §4): each (phase, case index) deterministically
generates a scenario; train/val/test use disjoint seed offsets. The reference
seeds numpy globally per case; here each case folds its index into a JAX PRNG
key, so generation is pure, order-independent, and vmappable over case
batches.

Scenarios: ``circle_crossing`` (humans on a circle of radius ``circle_radius``
with positional noise, goal = antipode; robot from (0, -r) to (0, r)) and
``square_crossing`` (humans cross a square of width ``square_width``).
Rejection sampling for non-overlapping starts uses a fixed attempt budget
(static shapes) instead of a while loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from relationalgraphlearning_tpu import types as T
from relationalgraphlearning_tpu.configs.base import EnvConfig

_ATTEMPTS = 12  # fixed rejection-sampling budget per human


def _sample_attributes(key: Array, cfg: EnvConfig):
    """Human (v_pref, radius); parity: Agent.sample_random_attributes —
    v_pref ~ U(0.5, 1.5), radius ~ U(0.3, 0.5) when randomize_attributes."""
    if cfg.randomize_attributes:
        k1, k2 = jax.random.split(key)
        v_pref = jax.random.uniform(k1, (), minval=0.5, maxval=1.5)
        radius = jax.random.uniform(k2, (), minval=0.3, maxval=0.5)
    else:
        v_pref = jnp.asarray(cfg.human_v_pref)
        radius = jnp.asarray(cfg.human_radius)
    return v_pref, radius


def _circle_crossing_human(key: Array, cfg: EnvConfig, occupied_pos: Array,
                           occupied_rad: Array, occupied_valid: Array):
    """One human start/goal on the circle avoiding existing agents."""
    k_attr, k_pos = jax.random.split(key)
    v_pref, radius = _sample_attributes(k_attr, cfg)

    def try_place(k):
        ka, kx, ky = jax.random.split(k, 3)
        angle = jax.random.uniform(ka, (), minval=0.0, maxval=2.0 * jnp.pi)
        # noise scaled by v_pref, parity with reference's px/py_noise
        nx = (jax.random.uniform(kx) - 0.5) * v_pref
        ny = (jax.random.uniform(ky) - 0.5) * v_pref
        px = cfg.sim.circle_radius * jnp.cos(angle) + nx
        py = cfg.sim.circle_radius * jnp.sin(angle) + ny
        pos = jnp.stack([px, py])
        # min separation from both existing starts and their goals
        d_start = jnp.linalg.norm(occupied_pos - pos[None, :], axis=-1)
        min_dist = radius + occupied_rad + cfg.reward.discomfort_dist
        ok = jnp.all(jnp.where(occupied_valid, d_start > min_dist, True))
        return pos, ok

    keys = jax.random.split(k_pos, _ATTEMPTS)
    positions, oks = jax.vmap(try_place)(keys)
    # first acceptable attempt (fallback: last attempt)
    idx = jnp.argmax(oks)
    idx = jnp.where(jnp.any(oks), idx, _ATTEMPTS - 1)
    pos = positions[idx]
    goal = -pos
    return pos, goal, v_pref, radius


def _square_crossing_human(key: Array, cfg: EnvConfig, occupied_pos: Array,
                           occupied_rad: Array, occupied_valid: Array):
    k_attr, k_sgn, k_pos, k_goal = jax.random.split(key, 4)
    v_pref, radius = _sample_attributes(k_attr, cfg)
    sign = jnp.where(jax.random.uniform(k_sgn) > 0.5, 1.0, -1.0)
    w = cfg.sim.square_width

    def try_place(k, sgn):
        kx, ky = jax.random.split(k)
        px = jax.random.uniform(kx, (), minval=0.0, maxval=1.0) * w * 0.5 * sgn
        py = (jax.random.uniform(ky, ()) - 0.5) * w
        pos = jnp.stack([px, py])
        d = jnp.linalg.norm(occupied_pos - pos[None, :], axis=-1)
        ok = jnp.all(jnp.where(
            occupied_valid, d > radius + occupied_rad + cfg.reward.discomfort_dist,
            True))
        return pos, ok

    keys_p = jax.random.split(k_pos, _ATTEMPTS)
    pos_c, ok_p = jax.vmap(lambda k: try_place(k, sign))(keys_p)
    i = jnp.where(jnp.any(ok_p), jnp.argmax(ok_p), _ATTEMPTS - 1)
    pos = pos_c[i]
    keys_g = jax.random.split(k_goal, _ATTEMPTS)
    goal_c, ok_g = jax.vmap(lambda k: try_place(k, -sign))(keys_g)
    j = jnp.where(jnp.any(ok_g), jnp.argmax(ok_g), _ATTEMPTS - 1)
    goal = goal_c[j]
    return pos, goal, v_pref, radius


def generate_case(key: Array, cfg: EnvConfig) -> tuple[Array, Array]:
    """Generate one scenario → (robot FullState [9], humans FullState [N, 9]).

    Robot: start (0, -circle_radius), goal (0, +circle_radius), theta = pi/2
    (facing the goal) — parity with CrowdSim.reset.
    Humans placed sequentially, each avoiding all previously placed agents
    and the robot.
    """
    n = cfg.sim.human_num
    robot = T.full_state(
        0.0, -cfg.sim.circle_radius, 0.0, 0.0, cfg.robot_radius,
        0.0, cfg.sim.circle_radius, cfg.robot_v_pref, jnp.pi / 2)

    # occupancy buffers: robot + up to n humans (start positions)
    occ_pos = jnp.zeros((n + 1, 2)).at[0].set(robot[:2])
    occ_rad = jnp.zeros((n + 1,)).at[0].set(cfg.robot_radius)
    occ_valid = jnp.zeros((n + 1,), dtype=bool).at[0].set(True)

    place = (_circle_crossing_human if cfg.sim.scenario == "circle_crossing"
             else _square_crossing_human)

    humans = jnp.zeros((n, 9))
    keys = jax.random.split(key, n)

    def body(i, carry):
        humans, occ_pos, occ_rad, occ_valid = carry
        pos, goal, v_pref, radius = place(
            keys[i], cfg, occ_pos, occ_rad, occ_valid)
        h = T.full_state(
            pos[0], pos[1], 0.0, 0.0, radius, goal[0], goal[1], v_pref, 0.0)
        humans = humans.at[i].set(h)
        occ_pos = occ_pos.at[i + 1].set(pos)
        occ_rad = occ_rad.at[i + 1].set(radius)
        occ_valid = occ_valid.at[i + 1].set(True)
        return humans, occ_pos, occ_rad, occ_valid

    humans, *_ = jax.lax.fori_loop(
        0, n, body, (humans, occ_pos, occ_rad, occ_valid))
    return robot, humans


def case_key(base_seed: int | Array, phase_offset: int | Array,
             case_idx: Array) -> Array:
    """Deterministic per-case PRNG key; parity with the reference's
    ``counter_offset[phase] + case_counter`` numpy seeding (disjoint,
    reproducible train/val/test scenario sets)."""
    key = jax.random.PRNGKey(jnp.asarray(base_seed, jnp.uint32))
    return jax.random.fold_in(key, jnp.asarray(phase_offset + case_idx, jnp.uint32))
