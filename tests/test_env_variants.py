"""Env variant coverage: square crossing, randomized attributes, unicycle
robot, mixed ORCA/SFM crowds, 10-human scenes, LSTM interaction module."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relationalgraphlearning_tpu import types as T
from relationalgraphlearning_tpu.configs.base import (
    EnvConfig,
    PolicyConfig,
    SimConfig,
)
from relationalgraphlearning_tpu.envs import CrowdSim
from relationalgraphlearning_tpu.envs.scenarios import case_key
from relationalgraphlearning_tpu.policies import make_policy


def test_square_crossing_scenario():
    cfg = EnvConfig(sim=SimConfig(scenario="square_crossing"),
                    human_policy="linear")
    env = CrowdSim(cfg)
    s, _ = env.reset(case_key(0, 0, jnp.asarray(4)))
    h = np.asarray(s.humans)
    w = cfg.sim.square_width
    assert np.all(np.abs(h[:, 0]) <= w / 2 + 1e-5)
    assert np.all(np.abs(h[:, 1]) <= w / 2 + 1e-5)
    # humans cross the square: start and goal on opposite x half-planes
    assert np.all(np.sign(h[:, T.PX]) != np.sign(h[:, T.GX]))


def test_randomize_attributes():
    cfg = EnvConfig(randomize_attributes=True)
    env = CrowdSim(cfg)
    s, _ = env.reset(case_key(0, 0, jnp.asarray(0)))
    h = np.asarray(s.humans)
    # v_pref ~ U(0.5, 1.5), radius ~ U(0.3, 0.5), not all identical
    assert np.all((h[:, T.VPREF] >= 0.5) & (h[:, T.VPREF] <= 1.5))
    assert np.all((h[:, T.RADIUS] >= 0.3) & (h[:, T.RADIUS] <= 0.5))
    assert len(np.unique(np.round(h[:, T.VPREF], 6))) > 1


def test_unicycle_episode():
    cfg = EnvConfig(robot_kinematics="unicycle", human_policy="linear")
    env = CrowdSim(cfg)
    s, _ = env.reset(case_key(0, 0, jnp.asarray(1)))
    # full speed ahead with slight turn each step
    act = jnp.array([1.0, 0.1])
    step = jax.jit(env.step)
    for _ in range(10):
        out = step(s, act)
        s = out.state
    r = np.asarray(s.robot)
    assert r[T.THETA] == pytest.approx(np.pi / 2 + 10 * 0.1, rel=1e-4)
    assert np.isfinite(r).all()
    # robot moved (curved path)
    assert np.linalg.norm(r[:2] - [0, -4]) > 1.5


def test_unicycle_policy_actions():
    cfg = EnvConfig(robot_kinematics="unicycle", human_policy="linear")
    pol = make_policy("sarl", PolicyConfig(), cfg)
    params = pol.init_params(jax.random.PRNGKey(0))
    env = CrowdSim(cfg)
    s, _ = env.reset(case_key(0, 0, jnp.asarray(0)))
    js = T.JointState(s.robot, T.observable(s.humans))
    act = pol.predict(params, js, jax.random.PRNGKey(1), jnp.asarray(0.0))
    assert abs(float(act[1])) <= np.pi / 4 + 1e-6  # rotation constraint


def test_mixed_crowd():
    cfg = EnvConfig(human_policy="mixed", sim=SimConfig(human_num=10))
    env = CrowdSim(cfg)
    s, _ = env.reset(case_key(0, 0, jnp.asarray(2)))

    @jax.jit
    def roll(s):
        def body(s, _):
            out = env.step(s, jnp.zeros(2))
            return out.state, out.reward
        return jax.lax.scan(body, s, None, 60)

    final, rews = roll(s)
    h0, h1 = np.asarray(s.humans), np.asarray(final.humans)
    d0 = np.linalg.norm(h0[:, :2] - h0[:, 5:7], axis=-1)
    d1 = np.linalg.norm(h1[:, :2] - h1[:, 5:7], axis=-1)
    # both halves of the crowd make progress toward goals
    assert d1[:5].mean() < d0[:5].mean()  # ORCA half
    assert d1[5:].mean() < d0[5:].mean()  # SFM half


def test_ten_human_policies():
    cfg = EnvConfig(sim=SimConfig(human_num=10), human_policy="linear")
    pol = make_policy("model_predictive_rl", PolicyConfig(), cfg)
    params = pol.init_params(jax.random.PRNGKey(0))
    env = CrowdSim(cfg)
    s, _ = env.reset(case_key(0, 0, jnp.asarray(0)))
    js = T.JointState(s.robot, T.observable(s.humans))
    act = pol.predict(params, js, jax.random.PRNGKey(1), jnp.asarray(0.0))
    assert act.shape == (2,)


def test_lstm_interaction_module():
    pcfg = PolicyConfig(lstm_with_interaction_module=True)
    cfg = EnvConfig(human_policy="linear")
    pol = make_policy("lstm_rl", pcfg, cfg)
    params = pol.init_params(jax.random.PRNGKey(0))
    assert "mlp1" in params["params"]
    env = CrowdSim(cfg)
    s, _ = env.reset(case_key(0, 0, jnp.asarray(0)))
    js = T.JointState(s.robot, T.observable(s.humans))
    act = pol.predict(params, js, jax.random.PRNGKey(1), jnp.asarray(0.0))
    assert np.all(np.isfinite(np.asarray(act)))
