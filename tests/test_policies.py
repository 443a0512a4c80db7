"""Policy tests: action space parity, rotation transform, one-step
lookahead baselines, MPRL batched planning tree semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relationalgraphlearning_tpu import types as T
from relationalgraphlearning_tpu.configs.base import (
    ActionSpaceConfig,
    EnvConfig,
    MPRLConfig,
    PolicyConfig,
)
from relationalgraphlearning_tpu.envs import CrowdSim
from relationalgraphlearning_tpu.envs.scenarios import case_key
from relationalgraphlearning_tpu.policies import make_policy
from relationalgraphlearning_tpu.policies.action_space import build_action_space
from relationalgraphlearning_tpu.policies.state_transform import rotate_joint_state

ENV = EnvConfig()
PCFG = PolicyConfig()


def _js(key=0):
    env = CrowdSim(ENV)
    s, _ = env.reset(case_key(key, 0, jnp.asarray(0)))
    return T.JointState(s.robot, T.observable(s.humans))


def test_action_space_shape_and_speeds():
    acts = build_action_space(ActionSpaceConfig(), 1.0, T.HOLONOMIC)
    assert acts.shape == (81, 2)
    np.testing.assert_allclose(acts[0], [0.0, 0.0])
    speeds = np.linalg.norm(acts[1:], axis=-1)
    # exponentially spaced, max = v_pref
    assert speeds.max() == pytest.approx(1.0, rel=1e-5)
    expected = (np.exp((np.arange(5) + 1) / 5) - 1) / (np.e - 1)
    np.testing.assert_allclose(sorted(set(np.round(speeds, 5))),
                               np.round(expected, 5), atol=1e-4)


def test_action_space_unicycle():
    acts = build_action_space(ActionSpaceConfig(), 1.0, T.UNICYCLE)
    assert acts.shape == (81, 2)
    assert np.abs(acts[:, 1]).max() <= np.pi / 4 + 1e-6


def test_rotation_invariance():
    """Value-net input must be invariant to global rotation of the scene."""
    js = _js()
    rows = rotate_joint_state(js.robot, js.humans, T.HOLONOMIC)

    ang = 1.1
    c, s = np.cos(ang), np.sin(ang)
    R = jnp.asarray(np.array([[c, -s], [s, c]], np.float32))

    def rot_state(st, has_goal):
        out = st.at[..., 0:2].set(st[..., 0:2] @ R.T)
        out = out.at[..., 2:4].set(st[..., 2:4] @ R.T)
        if has_goal:
            out = out.at[..., 5:7].set(st[..., 5:7] @ R.T)
        return out

    js2 = T.JointState(rot_state(js.robot, True), rot_state(js.humans, False))
    rows2 = rotate_joint_state(js2.robot, js2.humans, T.HOLONOMIC)
    np.testing.assert_allclose(np.asarray(rows), np.asarray(rows2),
                               rtol=1e-4, atol=1e-5)


def test_rotation_semantics():
    """Robot at origin, goal straight up → dg = dist; human ahead maps onto
    +x axis of the rotated frame."""
    robot = T.full_state(0.0, 0.0, 0.0, 0.5, 0.3, 0.0, 4.0, 1.0, 0.0)
    humans = jnp.stack([jnp.array([0.0, 2.0, 0.0, -1.0, 0.3])])
    rows = np.asarray(rotate_joint_state(robot, humans, T.HOLONOMIC))[0]
    assert rows[0] == pytest.approx(4.0)  # dg
    assert rows[1] == pytest.approx(1.0)  # v_pref
    assert rows[4] == pytest.approx(0.5)  # vx' (velocity toward goal)
    assert rows[6] == pytest.approx(2.0)  # px1' along goal axis
    assert rows[7] == pytest.approx(0.0, abs=1e-6)  # py1'
    assert rows[11] == pytest.approx(2.0)  # da
    assert rows[12] == pytest.approx(0.6)  # radius sum


@pytest.mark.parametrize("name", ["sarl", "lstm_rl", "gcn", "rgl"])
def test_one_step_policies_predict(name):
    pol = make_policy(name, PCFG, ENV)
    params = pol.init_params(jax.random.PRNGKey(0))
    js = _js()
    act = jax.jit(lambda p, s, k: pol.predict(p, s, k, jnp.asarray(0.0)))(
        params, js, jax.random.PRNGKey(1))
    assert act.shape == (2,)
    assert np.linalg.norm(np.asarray(act)) <= 1.0 + 1e-5


def test_cadrl_single_human():
    env_cfg = EnvConfig(sim=ENV.sim.__class__(human_num=1))
    pol = make_policy("cadrl", PCFG, env_cfg)
    params = pol.init_params(jax.random.PRNGKey(0))
    env = CrowdSim(env_cfg)
    s, _ = env.reset(case_key(0, 0, jnp.asarray(0)))
    js = T.JointState(s.robot, T.observable(s.humans))
    act = pol.predict(params, js, jax.random.PRNGKey(1), jnp.asarray(0.0))
    assert act.shape == (2,)


def test_with_om_policy():
    pcfg = PolicyConfig(with_om=True)
    pol = make_policy("sarl", pcfg, ENV)
    params = pol.init_params(jax.random.PRNGKey(0))
    act = pol.predict(params, _js(), jax.random.PRNGKey(1), jnp.asarray(0.0))
    assert act.shape == (2,)


def test_epsilon_greedy_explores():
    pol = make_policy("sarl", PCFG, ENV)
    params = pol.init_params(jax.random.PRNGKey(0))
    js = _js()
    greedy = pol.predict(params, js, jax.random.PRNGKey(1), jnp.asarray(0.0))
    acts = [np.asarray(pol.predict(params, js, jax.random.PRNGKey(i),
                                   jnp.asarray(1.0))) for i in range(5)]
    # with epsilon=1 actions are random draws from the space; at least one
    # should differ from greedy
    assert any(not np.allclose(a, np.asarray(greedy)) for a in acts)


@pytest.mark.parametrize("share,linear,clip", [
    (False, False, True), (True, False, False), (False, True, True)])
def test_mprl_predict_variants(share, linear, clip):
    pcfg = PolicyConfig(mprl=MPRLConfig(
        share_graph_model=share, linear_state_predictor=linear,
        do_action_clip=clip, planning_depth=2, planning_width=2))
    pol = make_policy("model_predictive_rl", pcfg, ENV)
    params = pol.init_params(jax.random.PRNGKey(0))
    js = _js()
    act = jax.jit(lambda p, s, k: pol.predict(p, s, k, jnp.asarray(0.0)))(
        params, js, jax.random.PRNGKey(1))
    assert act.shape == (2,)
    assert np.all(np.isfinite(np.asarray(act)))


def test_mprl_depth1_equals_one_step():
    """depth=1 planning = plain one-step lookahead over the action space."""
    pcfg = PolicyConfig(mprl=MPRLConfig(planning_depth=1, do_action_clip=False))
    pol = make_policy("model_predictive_rl", pcfg, ENV)
    params = pol.init_params(jax.random.PRNGKey(0))
    js = _js()
    vals = pol.action_values(params, js)
    assert vals.shape == (81,)
    # manual: reward + gamma_bar * V(next)
    A = pol.action_space.shape[0]
    robot_b = jnp.broadcast_to(js.robot, (A, 9))
    humans_b = jnp.broadcast_to(js.humans, (A,) + js.humans.shape)
    from relationalgraphlearning_tpu.envs.reward import estimate_reward
    r = estimate_reward(robot_b, humans_b, pol.action_space, ENV)
    nr, nh = pol.next_state(params, robot_b, humans_b, pol.action_space)
    gamma_bar = PCFG.gamma ** (ENV.time_step * js.robot[T.VPREF])
    expected = r.reward + gamma_bar * pol.value(params, nr, nh)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


def test_mprl_depth2_matches_reference_recursion():
    """depth=2 planning follows the reference V_planning recursion:
    Q(s,a) = r(s,a) + gamma_bar(s) * V_planning(s', 2) with
    V_planning(s', 2) = max_a' [ V(s')/2 + 1/2*(r(s',a') + gamma_bar(s')*V(s''))].
    predict passes the FULL planning_depth to V_planning on the next state
    (V_planning counts the node it is called on; depth==1 is the leaf)."""
    pcfg = PolicyConfig(mprl=MPRLConfig(planning_depth=2, do_action_clip=False))
    pol = make_policy("model_predictive_rl", pcfg, ENV)
    params = pol.init_params(jax.random.PRNGKey(0))
    js = _js()
    vals = jax.jit(pol.action_values)(params, js)

    from relationalgraphlearning_tpu.envs.reward import estimate_reward
    A = pol.action_space.shape[0]

    def expand(robot, humans):
        rb = jnp.broadcast_to(robot[..., None, :], robot.shape[:-1] + (A, 9))
        hb = jnp.broadcast_to(humans[..., None, :, :],
                              humans.shape[:-2] + (A,) + humans.shape[-2:])
        acts = jnp.broadcast_to(pol.action_space, robot.shape[:-1] + (A, 2))
        r = estimate_reward(rb, hb, acts, ENV).reward
        nr, nh = pol.next_state(params, rb, hb, acts)
        return r, nr, nh

    gbar = lambda robot: PCFG.gamma ** (ENV.time_step * robot[..., T.VPREF])
    r1, nr1, nh1 = expand(js.robot, js.humans)          # root: [A]
    r2, nr2, nh2 = expand(nr1, nh1)                     # level 2: [A, A]
    v_leaf = pol.value(params, nr2, nh2)                # [A, A]
    v_mid = pol.value(params, nr1, nh1)                 # [A]
    vp2 = jnp.max(v_mid[..., None] / 2.0
                  + 0.5 * (r2 + gbar(nr1)[..., None] * v_leaf), axis=-1)
    expected = r1 + gbar(js.robot) * vp2
    np.testing.assert_allclose(np.asarray(vals), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)
    # and depth=2 must actually differ from one-step lookahead
    one_step = r1 + gbar(js.robot) * v_mid
    assert not np.allclose(np.asarray(vals), np.asarray(one_step))


def test_mprl_batched_predict():
    pcfg = PolicyConfig(mprl=MPRLConfig(planning_depth=2, planning_width=2))
    pol = make_policy("model_predictive_rl", pcfg, ENV)
    params = pol.init_params(jax.random.PRNGKey(0))
    env = CrowdSim(ENV)
    B = 4
    keys = jax.vmap(lambda i: case_key(0, 0, i))(jnp.arange(B))
    states, _ = jax.vmap(env.reset)(keys)
    js = T.JointState(states.robot, T.observable(states.humans))
    acts = jax.jit(jax.vmap(
        lambda s, k: pol.predict(params, s, k, jnp.asarray(0.0))))(
        js, jax.random.split(jax.random.PRNGKey(2), B))
    assert acts.shape == (B, 2)


def test_orca_robot_policy_and_linear():
    js = _js()
    for name in ["orca", "linear", "socialforce"]:
        pol = make_policy(name, PCFG, ENV)
        act = jax.jit(lambda s: pol.predict(None, s, None, None))(js)
        assert act.shape == (2,)
        assert np.linalg.norm(np.asarray(act)) <= 1.0 + 1e-4
    # linear policy points at the goal
    pol = make_policy("linear", PCFG, ENV)
    act = np.asarray(pol.predict(None, js, None, None))
    to_goal = np.asarray(T.goal(js.robot) - T.position(js.robot))
    cos = act @ to_goal / (np.linalg.norm(act) * np.linalg.norm(to_goal))
    assert cos == pytest.approx(1.0, abs=1e-5)


# ---------------------------------------------------------------- sparse search
def test_action_group_index_layout():
    from relationalgraphlearning_tpu.policies.action_space import (
        build_action_group_index)
    groups = build_action_group_index(ActionSpaceConfig(), 2, 8)
    assert groups.shape == (81,)
    assert groups[0] == 0  # stop action: own group
    # 8 rotation buckets x 2 speed buckets + stop
    assert len(set(groups.tolist())) == 17
    # rotation-major ordering: actions 1..5 (first rotation, 5 speeds) map to
    # rotation bucket 0, speed buckets [0,0,0,1,1] (j*2//5)
    np.testing.assert_array_equal(groups[1:6] - 1, [0, 0, 0, 1, 1])


def test_mprl_sparse_search_clip():
    pcfg = PolicyConfig(mprl=MPRLConfig(
        planning_depth=2, planning_width=3, do_action_clip=True,
        sparse_search=True))
    pol = make_policy("model_predictive_rl", pcfg, ENV)
    groups = np.asarray(pol.action_group_index)

    # synthetic one-step values: check the group-diverse selection against a
    # sequential reference (descending value, skip already-taken groups)
    rng = np.random.default_rng(0)
    v1 = jnp.asarray(rng.normal(size=(4, 81)).astype(np.float32))
    idx = np.asarray(pol._sparse_topk(v1, 3))
    for b in range(4):
        taken, expect = set(), []
        for i in np.argsort(-np.asarray(v1[b])):
            if groups[i] not in taken:
                expect.append(i)
                taken.add(groups[i])
            if len(expect) == 3:
                break
        np.testing.assert_array_equal(idx[b], expect)

    # end-to-end predict still works under jit
    params = pol.init_params(jax.random.PRNGKey(0))
    act = jax.jit(lambda p, s, k: pol.predict(p, s, k, jnp.asarray(0.0)))(
        params, _js(), jax.random.PRNGKey(1))
    assert np.all(np.isfinite(np.asarray(act)))


# ------------------------------------------------------------------- query_env
def test_query_env_matches_const_velocity_when_linear():
    """With linear humans already moving at their preferred velocity, the
    env-queried lookahead must equal the constant-velocity lookahead."""
    env_cfg = EnvConfig(human_policy="linear")
    env = CrowdSim(env_cfg)
    s, _ = env.reset(case_key(0, 0, jnp.asarray(0)))
    # set human velocities to exactly their linear-policy step velocity
    to_goal = T.goal(s.humans) - T.position(s.humans)
    dist = jnp.linalg.norm(to_goal, axis=-1, keepdims=True)
    pref = to_goal / jnp.maximum(dist, 1e-9) * s.humans[..., T.VPREF, None]
    humans = s.humans.at[..., T.VX:T.VY + 1].set(pref)
    s = s._replace(humans=humans)

    pol = make_policy("sarl", PolicyConfig(query_env=True), env_cfg)
    assert pol.query_env
    params = pol.init_params(jax.random.PRNGKey(0))
    js = T.JointState(s.robot, T.observable(s.humans))
    va = pol.action_values(params, js)
    ve = pol.action_values_env(params, env, s)
    np.testing.assert_allclose(np.asarray(va), np.asarray(ve), atol=1e-5)


def test_query_env_rollout_orca():
    """query_env policy drives a full explorer rollout with ORCA humans and
    differs from the const-velocity lookahead (humans actually avoid)."""
    from relationalgraphlearning_tpu.training.explorer import Explorer

    env_cfg = EnvConfig(human_policy="orca")
    env = CrowdSim(env_cfg)
    pol = make_policy("sarl", PolicyConfig(query_env=True), env_cfg)
    params = pol.init_params(jax.random.PRNGKey(0))

    ex = Explorer(env, pol, 0.9)
    carry = ex.init_carry(4, 0, jax.random.PRNGKey(1))
    carry, traj = jax.jit(
        lambda c: ex.collect(params, c, 8, jnp.asarray(0.0), 0))(carry)
    assert np.all(np.isfinite(np.asarray(traj.reward)))

    s, _ = env.reset(case_key(0, 0, jnp.asarray(3)))
    out = env.step(s, jnp.zeros(2))
    s2 = out.state  # a step in: humans now have nonzero velocities
    js = T.JointState(s2.robot, T.observable(s2.humans))
    va = np.asarray(pol.action_values(params, js))
    ve = np.asarray(pol.action_values_env(params, env, s2))
    assert not np.allclose(va, ve, atol=1e-6)
