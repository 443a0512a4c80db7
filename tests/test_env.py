"""CrowdSim env tests: seeded determinism, step/reward semantics, done
freezing, vmapped batching, full episodes with each human policy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relationalgraphlearning_tpu import types as T
from relationalgraphlearning_tpu.configs.base import EnvConfig, RewardConfig
from relationalgraphlearning_tpu.envs import CrowdSim
from relationalgraphlearning_tpu.envs.reward import estimate_reward
from relationalgraphlearning_tpu.envs.scenarios import case_key

CFG = EnvConfig()


def test_reset_deterministic_and_disjoint():
    env = CrowdSim(CFG)
    k1 = case_key(0, CFG.sim.test_seed_offset, jnp.asarray(3))
    s1, _ = env.reset(k1)
    s2, _ = env.reset(k1)
    np.testing.assert_array_equal(np.asarray(s1.humans), np.asarray(s2.humans))
    s3, _ = env.reset(case_key(0, CFG.sim.test_seed_offset, jnp.asarray(4)))
    assert not np.allclose(np.asarray(s1.humans), np.asarray(s3.humans))


def test_reset_geometry():
    env = CrowdSim(CFG)
    s, obs = env.reset(case_key(0, 0, jnp.asarray(0)))
    r = np.asarray(s.robot)
    np.testing.assert_allclose(r[:2], [0.0, -4.0], atol=1e-6)
    np.testing.assert_allclose(r[T.GX:T.GY + 1], [0.0, 4.0], atol=1e-6)
    h = np.asarray(s.humans)
    # humans on circle radius 4 (within noise ±0.5·v_pref)
    radii = np.linalg.norm(h[:, :2], axis=-1)
    assert np.all(radii > 2.5) and np.all(radii < 5.5)
    # goals are antipodal
    np.testing.assert_allclose(h[:, T.GX:T.GY + 1], -h[:, :2], atol=1e-6)
    # no initial overlaps (incl. robot)
    pos = np.concatenate([r[None, :2], h[:, :2]])
    rad = np.concatenate([[r[T.RADIUS]], h[:, T.RADIUS]])
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    iu = np.triu_indices(len(pos), 1)
    assert np.all(d[iu] > rad[iu[0]] + rad[iu[1]])


def test_step_reaches_goal_straight_line():
    """Empty-ish crowd: drive straight up; robot must hit goal with +1."""
    cfg = EnvConfig(human_policy="linear")
    env = CrowdSim(cfg)
    s, _ = env.reset(case_key(5, 0, jnp.asarray(7)))
    # push humans far away so the path is clear
    far = s.humans.at[:, T.PX].add(50.0).at[:, T.GX].add(50.0)
    s = s._replace(humans=far)
    step = jax.jit(env.step)
    action = jnp.array([0.0, 1.0])
    total = 0.0
    for _ in range(40):
        out = step(s, action)
        s = out.state
        total += float(out.reward)
        if bool(out.done):
            break
    assert int(s.outcome) == T.OUTCOME_REACH_GOAL
    assert total == pytest.approx(1.0)
    # ~8 m at 1 m/s with 0.3 goal radius → ~31 steps
    assert 28 <= int(s.step) <= 33


def test_collision_penalty():
    cfg = EnvConfig(human_policy="linear")
    env = CrowdSim(cfg)
    s, _ = env.reset(case_key(1, 0, jnp.asarray(0)))
    # place a stationary human right above the robot
    h = s.humans.at[0].set(
        T.full_state(0.0, -3.5, 0.0, 0.0, 0.3, 0.0, -3.5, 1.0, 0.0))
    s = s._replace(humans=h)
    out = jax.jit(env.step)(s, jnp.array([0.0, 1.0]))
    assert bool(out.done) and int(out.outcome) == T.OUTCOME_COLLISION
    assert float(out.reward) == pytest.approx(-0.25)


def test_discomfort_reward():
    cfg = EnvConfig(human_policy="linear")
    env = CrowdSim(cfg)
    s, _ = env.reset(case_key(1, 0, jnp.asarray(0)))
    # human passes at 0.7m above: separation 0.7-0.6=0.1 < 0.2
    h = s.humans.at[0].set(
        T.full_state(0.0, -3.3, 0.0, 0.0, 0.3, 0.0, -3.3, 1.0, 0.0))
    # move other humans away
    h = h.at[1:, T.PX].add(50.0).at[1:, T.GX].add(50.0)
    s = s._replace(humans=h)
    out = jax.jit(env.step)(s, jnp.array([0.0, 0.0]))
    sep = 0.7 - 0.6
    expected = (sep - 0.2) * 0.5 * 0.25
    assert float(out.reward) == pytest.approx(expected, abs=1e-5)
    assert not bool(out.done)
    assert float(out.dmin) == pytest.approx(sep, abs=1e-5)


def test_timeout():
    cfg = EnvConfig(human_policy="linear")
    env = CrowdSim(cfg)
    s, _ = env.reset(case_key(2, 0, jnp.asarray(1)))
    step = jax.jit(env.step)
    action = jnp.zeros(2)  # robot stands still (humans walk their own paths)
    for _ in range(cfg.max_steps):
        out = step(s, action)
        s = out.state
    assert bool(s.done)
    assert int(s.outcome) in (T.OUTCOME_TIMEOUT, T.OUTCOME_COLLISION)
    assert int(s.step) <= cfg.max_steps


def test_done_freezes_state():
    cfg = EnvConfig(human_policy="linear")
    env = CrowdSim(cfg)
    s, _ = env.reset(case_key(3, 0, jnp.asarray(2)))
    s = s._replace(done=jnp.asarray(True),
                   outcome=jnp.asarray(T.OUTCOME_REACH_GOAL, jnp.int32))
    out = jax.jit(env.step)(s, jnp.array([1.0, 1.0]))
    np.testing.assert_array_equal(np.asarray(out.state.robot), np.asarray(s.robot))
    assert float(out.reward) == 0.0
    assert int(out.state.step) == int(s.step)


@pytest.mark.parametrize("policy", ["orca", "socialforce", "linear"])
def test_full_episode_each_human_policy(policy):
    cfg = EnvConfig(human_policy=policy)
    env = CrowdSim(cfg)
    s, _ = env.reset(case_key(0, 0, jnp.asarray(11)))

    @jax.jit
    def rollout(s):
        def body(s, _):
            out = env.step(s, jnp.array([0.0, 0.5]))
            return out.state, (out.reward, out.dmin)
        return jax.lax.scan(body, s, None, cfg.max_steps)

    final, (rewards, dmin) = rollout(s)
    assert np.all(np.isfinite(np.asarray(rewards)))
    # humans should make progress toward goals under their policy
    h0 = np.asarray(s.humans)
    h1 = np.asarray(final.humans)
    d0 = np.linalg.norm(h0[:, :2] - h0[:, T.GX:T.GY + 1], axis=-1)
    d1 = np.linalg.norm(h1[:, :2] - h1[:, T.GX:T.GY + 1], axis=-1)
    assert np.mean(d1) < np.mean(d0)


def test_vmapped_envs():
    env = CrowdSim(EnvConfig(human_policy="orca"))
    B = 8
    keys = jax.vmap(lambda i: case_key(0, 0, i))(jnp.arange(B))
    states, obs = jax.vmap(env.reset)(keys)
    assert obs.shape == (B, CFG.sim.human_num, 5)
    actions = jnp.tile(jnp.array([0.0, 1.0]), (B, 1))
    out = jax.jit(jax.vmap(env.step))(states, actions)
    assert out.reward.shape == (B,)
    assert out.state.humans.shape == (B, CFG.sim.human_num, 9)


def test_estimate_reward_matches_env_for_linear_humans():
    """With constant-velocity humans the planner's estimate_reward must equal
    the env reward exactly (same shared implementation, same inputs)."""
    cfg = EnvConfig(human_policy="linear")
    env = CrowdSim(cfg)
    s, _ = env.reset(case_key(9, 0, jnp.asarray(5)))
    # give humans their linear velocities by stepping once
    out0 = env.step(s, jnp.zeros(2))
    s1 = out0.state
    action = jnp.array([0.3, 0.4])
    env_out = env.step(s1, action)
    est = estimate_reward(s1.robot, T.observable(s1.humans), action, cfg)
    # env humans move by pref-vel (recomputed), estimate uses current vel —
    # equal here because linear humans keep constant velocity between steps
    np.testing.assert_allclose(
        float(est.reward), float(env_out.reward), atol=1e-5)
