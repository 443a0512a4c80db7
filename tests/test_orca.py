"""ORCA solver tests: LP feasibility, reciprocal avoidance scenarios."""

import jax
import jax.numpy as jnp
import numpy as np

from relationalgraphlearning_tpu.envs.orca import (
    ORCAParams,
    centralized_orca_step,
    orca_velocity,
)

PARAMS = ORCAParams(neighbor_dist=10.0, time_horizon=5.0, time_step=0.25)


def _simulate(positions, goals, radii, v_pref, params, steps, dt=0.25):
    positions = jnp.asarray(positions, jnp.float32)
    goals = jnp.asarray(goals, jnp.float32)
    radii = jnp.asarray(radii, jnp.float32)
    v_pref = jnp.asarray(v_pref, jnp.float32)
    n = positions.shape[0]
    velocities = jnp.zeros((n, 2))
    active = jnp.ones((n,), bool)

    @jax.jit
    def one(carry, _):
        pos, vel = carry
        to_goal = goals - pos
        dist = jnp.linalg.norm(to_goal, axis=-1, keepdims=True)
        pref = jnp.where(dist > 1e-3, to_goal / jnp.maximum(dist, 1e-9), 0.0) \
            * jnp.minimum(v_pref[:, None], dist / dt)
        new_v = centralized_orca_step(pos, vel, radii, pref, v_pref, active, params)
        return (pos + new_v * dt, new_v), pos

    (pos, vel), traj = jax.lax.scan(one, (positions, velocities), None, steps)
    return np.asarray(pos), np.asarray(jnp.concatenate([traj, pos[None]], 0))


def _min_pairwise_dist(traj, radii):
    # traj [T, n, 2]
    d = np.linalg.norm(traj[:, :, None, :] - traj[:, None, :, :], axis=-1)
    n = traj.shape[1]
    iu = np.triu_indices(n, 1)
    sep = d[:, iu[0], iu[1]] - (np.asarray(radii)[iu[0]] + np.asarray(radii)[iu[1]])
    return sep.min()


def test_single_agent_goes_to_pref():
    """No neighbors → optimal velocity is the preferred velocity."""
    v = orca_velocity(
        jnp.zeros(2), jnp.zeros(2), jnp.asarray(0.3),
        jnp.array([0.5, 0.5]), jnp.asarray(1.0),
        jnp.zeros((4, 2)), jnp.zeros((4, 2)), jnp.ones(4) * 0.3,
        jnp.zeros(4, bool), PARAMS)
    np.testing.assert_allclose(np.asarray(v), [0.5, 0.5], atol=1e-5)


def test_max_speed_clamp():
    v = orca_velocity(
        jnp.zeros(2), jnp.zeros(2), jnp.asarray(0.3),
        jnp.array([3.0, 0.0]), jnp.asarray(1.0),
        jnp.zeros((4, 2)), jnp.zeros((4, 2)), jnp.ones(4) * 0.3,
        jnp.zeros(4, bool), PARAMS)
    np.testing.assert_allclose(np.asarray(v), [1.0, 0.0], atol=1e-5)


def test_head_on_swap_no_collision():
    """Two agents swapping positions head-on must avoid each other and reach
    their goals — the canonical reciprocal-avoidance test."""
    # tiny y-offset breaks the exact-symmetry deadlock (RVO2 demos add the
    # same perturbation to preferred velocities)
    pos = [[-3.0, 0.01], [3.0, 0.0]]
    goals = [[3.0, 0.01], [-3.0, 0.0]]
    radii = [0.3, 0.3]
    final, traj = _simulate(pos, goals, radii, [1.0, 1.0], PARAMS, 80)
    assert _min_pairwise_dist(traj, radii) > -1e-3, "collision occurred"
    np.testing.assert_allclose(final, goals, atol=0.2)


def test_circle_swap_no_collision():
    """5 agents on a noisy circle crossing to antipodes (CrowdNav-style
    scenario). A perfectly symmetric circle gridlocks under real ORCA
    semantics too (verified against the sequential oracle), so the test uses
    the realistic perturbed layout the env actually generates."""
    n = 5
    rng = np.random.RandomState(3)
    ang = rng.uniform(0, 2 * np.pi, n)
    pos = np.stack([4 * np.cos(ang), 4 * np.sin(ang)], -1) \
        + rng.uniform(-0.5, 0.5, (n, 2))
    goals = -pos
    radii = [0.3] * n
    final, traj = _simulate(pos, goals, radii, [1.0] * n, PARAMS, 140)
    assert _min_pairwise_dist(traj, radii) > -1e-3, "collision occurred"
    np.testing.assert_allclose(final, goals, atol=0.3)


def test_parity_vs_sequential_oracle():
    """Fuzz: the vectorized JAX ORCA must match an independent sequential
    numpy transcription of the published algorithm on random agent states."""
    from orca_oracle import orca_np

    from relationalgraphlearning_tpu.envs.orca import orca_velocity

    jitted = jax.jit(orca_velocity, static_argnames=())

    rng = np.random.RandomState(7)
    mismatches = 0
    for trial in range(60):
        m = rng.randint(1, 9)
        pi = rng.uniform(-4, 4, 2)
        vi = rng.uniform(-1, 1, 2)
        ri = 0.3
        pref = rng.uniform(-1, 1, 2)
        vmax = 1.0
        pj = rng.uniform(-4, 4, (m, 2))
        vj = rng.uniform(-1, 1, (m, 2))
        rj = np.full(m, 0.3)
        expected = orca_np(pi, vi, ri, pref, vmax, pj, vj, rj,
                           PARAMS.time_horizon, PARAMS.time_step)
        got = jitted(
            jnp.asarray(pi, jnp.float32), jnp.asarray(vi, jnp.float32),
            jnp.asarray(ri, jnp.float32), jnp.asarray(pref, jnp.float32),
            jnp.asarray(vmax, jnp.float32), jnp.asarray(pj, jnp.float32),
            jnp.asarray(vj, jnp.float32), jnp.asarray(rj, jnp.float32),
            jnp.ones(m, bool), PARAMS)
        if not np.allclose(np.asarray(got), expected, atol=2e-3):
            mismatches += 1
    # float32 vs float64 boundary flips can differ on degenerate instances;
    # require near-total agreement
    assert mismatches <= 1, f"{mismatches}/60 oracle mismatches"


def test_colliding_agents_separate():
    """Overlapping agents (infeasible LP → linearProgram3) must push apart."""
    pos = [[0.0, 0.0], [0.4, 0.0]]
    goals = [[0.0, 0.0], [0.4, 0.0]]  # both want to stay
    radii = [0.3, 0.3]
    final, traj = _simulate(pos, goals, radii, [1.0, 1.0], PARAMS, 20)
    d = np.linalg.norm(final[0] - final[1])
    assert d > 0.55, f"agents did not separate: {d}"


def test_safety_space_increases_clearance():
    pos = [[-3.0, 0.0], [3.0, 0.0]]
    goals = [[3.0, 0.0], [-3.0, 0.0]]
    radii = [0.3, 0.3]
    _, traj0 = _simulate(pos, goals, radii, [1.0, 1.0], PARAMS, 60)
    params_s = PARAMS._replace(safety_space=0.15)
    _, traj1 = _simulate(pos, goals, radii, [1.0, 1.0], params_s, 60)
    assert _min_pairwise_dist(traj1, radii) > _min_pairwise_dist(traj0, radii) - 1e-3
