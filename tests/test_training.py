"""Training-layer tests: replay buffer semantics, explorer collection and
target computation, trainers, and a smoke IL+RL loop that must improve the
value loss and produce finite metrics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relationalgraphlearning_tpu.configs.base import (
    Config,
    EnvConfig,
    MPRLConfig,
    PolicyConfig,
    TrainConfig,
)
from relationalgraphlearning_tpu.envs import CrowdSim
from relationalgraphlearning_tpu.policies import make_policy
from relationalgraphlearning_tpu.policies.robot_policies import ORCARobotPolicy
from relationalgraphlearning_tpu.training import replay_buffer as rb
from relationalgraphlearning_tpu.training.explorer import Explorer
from relationalgraphlearning_tpu.training.trainer import MPRLTrainer, VNRLTrainer

ENV = EnvConfig(human_policy="linear")  # linear humans: fast compile
PCFG = PolicyConfig(mprl=MPRLConfig(
    planning_depth=1, do_action_clip=False, linear_state_predictor=False))
N = ENV.sim.human_num


def _mk_batch(k, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 7)
    return rb.Transition(
        robot=jax.random.normal(ks[0], (k, 9)),
        humans=jax.random.normal(ks[1], (k, N, 5)),
        value=jax.random.normal(ks[2], (k,)),
        reward=jax.random.normal(ks[3], (k,)),
        next_robot=jax.random.normal(ks[4], (k, 9)),
        next_humans=jax.random.normal(ks[5], (k, N, 5)),
        valid=jnp.ones((k,)),
        terminal=jnp.zeros((k,)),
    )


class TestReplayBuffer:
    def test_push_and_wrap(self):
        buf = rb.create(10, N)
        buf = rb.push(buf, _mk_batch(7))
        assert int(buf.size) == 7 and int(buf.ptr) == 7
        b2 = _mk_batch(7, key=1)
        buf = rb.push(buf, b2)
        assert int(buf.size) == 10 and int(buf.ptr) == 4
        # wrapped entries 0..3 come from b2[3:]
        np.testing.assert_array_equal(
            np.asarray(buf.data.robot[0]), np.asarray(b2.robot[3]))

    def test_sample_shapes(self):
        buf = rb.push(rb.create(100, N), _mk_batch(50))
        s = rb.sample(buf, jax.random.PRNGKey(0), 32)
        assert s.robot.shape == (32, 9)
        # samples come only from the filled region
        assert np.all(np.isfinite(np.asarray(s.value)))

    def test_clear(self):
        buf = rb.push(rb.create(10, N), _mk_batch(5))
        buf = rb.clear(buf)
        assert int(buf.size) == 0 and int(buf.ptr) == 0


class TestExplorer:
    def _explorer(self, policy_name="linear"):
        env = CrowdSim(ENV)
        pol = make_policy(policy_name, PCFG, ENV)
        return Explorer(env, pol, PCFG.gamma), pol

    def test_run_cases_stats(self):
        ex, _ = self._explorer("orca")
        stats = jax.jit(lambda k: ex.run_cases(
            None, 0, jnp.arange(8), k))(jax.random.PRNGKey(0))
        total = float(stats.success_rate + stats.collision_rate
                      + stats.timeout_rate)
        assert total == pytest.approx(1.0, abs=1e-5)
        assert np.isfinite(float(stats.avg_return))

    def test_collect_auto_reset(self):
        ex, _ = self._explorer("linear")
        carry = ex.init_carry(4, 0, jax.random.PRNGKey(1))
        carry, traj = jax.jit(
            lambda c: ex.collect(None, c, 80, jnp.asarray(0.0), 0))(carry)
        term = np.asarray(traj.terminal)
        assert term.sum() >= 4  # several episodes complete in 80 steps
        # after a terminal the episode step counter resets
        ep = np.asarray(traj.ep_step)
        for b in range(4):
            idx = np.where(term[:, b])[0]
            for i in idx:
                if i + 1 < ep.shape[0]:
                    assert ep[i + 1, b] == 0
        # per-env case counters advanced by stride B
        assert np.all(np.asarray(carry.case_counter) >= 4)

    def test_mc_returns(self):
        """IL targets must equal the discounted suffix sums within episodes."""
        ex, pol = self._explorer("linear")
        carry = ex.init_carry(2, 0, jax.random.PRNGKey(2))
        carry, traj = ex.collect(None, carry, 60, jnp.asarray(0.0), 0)
        buf = rb.create(200, N)
        buf = ex.update_memory(buf, traj, None, None, imitation_learning=True)

        r = np.asarray(traj.reward)
        term = np.asarray(traj.terminal)
        gb = 0.9 ** (0.25 * np.asarray(traj.robot)[..., 7])
        Tn, B = r.shape
        expected = np.zeros_like(r)
        for b in range(B):
            g = 0.0
            for t in reversed(range(Tn)):
                g = r[t, b] + gb[t, b] * (0.0 if term[t, b] else g)
                expected[t, b] = g
        got = np.asarray(buf.data.value[: Tn * B]).reshape(Tn, B)
        valid = np.asarray(buf.data.valid[: Tn * B]).reshape(Tn, B)
        np.testing.assert_allclose(got * valid, expected * valid, rtol=1e-4,
                                   atol=1e-5)
        # validity: everything before the last terminal is valid
        for b in range(B):
            idx = np.where(term[:, b])[0]
            if len(idx):
                assert valid[: idx[-1] + 1, b].all()
                assert not valid[idx[-1] + 1:, b].any()

    def test_td_targets(self):
        ex, _ = self._explorer("linear")
        pol = make_policy("model_predictive_rl", PCFG, ENV)
        params = pol.init_params(jax.random.PRNGKey(0))
        ex2 = Explorer(ex.env, pol, PCFG.gamma)
        carry = ex2.init_carry(2, 0, jax.random.PRNGKey(3))
        carry, traj = ex2.collect(params, carry, 10, jnp.asarray(0.0), 0)
        buf = rb.create(100, N)
        buf = ex2.update_memory(buf, traj, pol.value, params,
                                imitation_learning=False)
        K = 10 * 2
        v_next = np.asarray(pol.value(params, traj.next_robot,
                                      traj.next_humans))
        gb = 0.9 ** (0.25 * np.asarray(traj.robot)[..., 7])
        term = np.asarray(traj.terminal)
        expected = (np.asarray(traj.reward)
                    + gb * (1 - term) * v_next).reshape(-1)
        np.testing.assert_allclose(
            np.asarray(buf.data.value[:K]), expected, rtol=1e-4, atol=1e-5)


class TestTrainers:
    def test_mprl_train_step_reduces_loss(self):
        pol = make_policy("model_predictive_rl", PCFG, ENV)
        params = pol.init_params(jax.random.PRNGKey(0))
        trainer = MPRLTrainer(pol, learning_rate=1e-2)
        state = trainer.init(params)
        batch = _mk_batch(64)
        step = jax.jit(lambda s, b: trainer.train_step(s, b, jnp.asarray(1.0)))
        _, aux0 = step(state, batch)
        for _ in range(30):
            state, aux = step(state, batch)
        assert float(aux.value_loss) < float(aux0.value_loss)
        assert float(aux.predictor_loss) < float(aux0.predictor_loss)

    def test_vnrl_trainer(self):
        pol = make_policy("sarl", PCFG, ENV)
        params = pol.init_params(jax.random.PRNGKey(0))
        trainer = VNRLTrainer(pol, learning_rate=1e-2)
        state = trainer.init(params)
        batch = _mk_batch(64)
        step = jax.jit(lambda s, b: trainer.train_step(s, b, jnp.asarray(1.0)))
        _, aux0 = step(state, batch)
        for _ in range(30):
            state, aux = step(state, batch)
        assert float(aux.value_loss) < float(aux0.value_loss)
        assert float(aux.predictor_loss) == 0.0

    def test_optimize_batches(self):
        pol = make_policy("model_predictive_rl", PCFG, ENV)
        params = pol.init_params(jax.random.PRNGKey(0))
        trainer = MPRLTrainer(pol, learning_rate=1e-3)
        state = trainer.init(params)
        buf = rb.push(rb.create(500, N), _mk_batch(200))
        state2, aux = jax.jit(lambda s, b, k: trainer.optimize_batches(
            s, b, k, 5, 32))(state, buf, jax.random.PRNGKey(1))
        assert np.isfinite(float(aux.value_loss))
        # params actually changed
        diff = jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state.params, state2.params)
        assert max(jax.tree.leaves(diff)) > 0

    def test_mprl_fresh_td_targets(self):
        """RL TD targets come from the CURRENT target net, not the stored
        value field (parity: optimize_batch recomputes r + γ̄·V_target(ś))."""
        pol = make_policy("model_predictive_rl", PCFG, ENV)
        tparams = pol.init_params(jax.random.PRNGKey(9))
        trainer = MPRLTrainer(pol)
        batch = _mk_batch(16)._replace(
            value=jnp.full((16,), 1e6))  # garbage stored targets
        batch = batch._replace(robot=batch.robot.at[:, 7].set(1.0))
        target = trainer._td_target(tparams, batch)
        gb = PCFG.gamma ** (ENV.time_step * 1.0)
        v_next = pol.value(tparams, batch.next_robot, batch.next_humans)
        np.testing.assert_allclose(
            np.asarray(target), np.asarray(batch.reward + gb * v_next),
            rtol=1e-5)
        # terminal transitions do not bootstrap
        target_t = trainer._td_target(
            tparams, batch._replace(terminal=jnp.ones((16,))))
        np.testing.assert_allclose(
            np.asarray(target_t), np.asarray(batch.reward), rtol=1e-5)
        # the garbage stored values must not reach the loss when use_td=True
        params = pol.init_params(jax.random.PRNGKey(0))
        loss, _ = trainer.loss_fn(params, batch, jnp.asarray(0.0),
                                  target_params=tparams, use_td=True)
        assert float(loss) < 1e4

    def test_target_update(self):
        pol = make_policy("model_predictive_rl", PCFG, ENV)
        params = pol.init_params(jax.random.PRNGKey(0))
        trainer = MPRLTrainer(pol)
        state = trainer.init(params)
        state, _ = trainer.train_step(state, _mk_batch(8), jnp.asarray(1.0))
        # target params still the originals
        d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         state.target_params, params)
        assert max(jax.tree.leaves(d)) == 0.0
        state = trainer.update_target(state)
        d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         state.target_params, state.params)
        assert max(jax.tree.leaves(d)) == 0.0

    def test_detach_state_predictor(self):
        pcfg = PolicyConfig(mprl=MPRLConfig(
            planning_depth=1, share_graph_model=True))
        pol = make_policy("model_predictive_rl", pcfg, ENV)
        params = pol.init_params(jax.random.PRNGKey(0))
        trainer = MPRLTrainer(pol, detach_state_predictor=True)
        batch = _mk_batch(16)
        grads, _ = jax.grad(trainer.loss_fn, has_aux=True)(
            params, batch._replace(value=pol.value(params, batch.robot,
                                                   batch.humans)), jnp.asarray(1.0))
        # with value loss ≈ 0 (targets = predictions) and detach on, the
        # graph model receives (near) zero gradient from the predictor loss
        g = grads["params"]["value_graph_model"]
        gmax = max(float(jnp.max(jnp.abs(x))) for x in jax.tree.leaves(g))
        assert gmax < 1e-4


def test_smoke_train_loop(tmp_path):
    """Tiny end-to-end IL+RL run through the real pipeline."""
    from relationalgraphlearning_tpu.training.train_loop import LoopOptions, train

    cfg = Config(
        env=ENV,
        policy=PCFG,
        train=TrainConfig(),
    )
    result = train(cfg, "model_predictive_rl", str(tmp_path / "out"),
                   debug=True, seed=0,
                   opts=LoopOptions(train_envs=4, collect_steps=40,
                                    eval_envs=8))
    assert np.isfinite(result["success_rate"])
    assert result["episodes"] >= 40
    assert (tmp_path / "out" / "il_model").exists()
    assert (tmp_path / "out" / "rl_model").exists()
    assert (tmp_path / "out" / "metrics.jsonl").exists()


def test_quality_gate_il_value_direction():
    """Cheap training-regression gate (full-schedule quality lives in
    reproduce_quality.py): (a) the ORCA demonstrator must navigate the val
    cases, (b) IL on its demonstrations must orient the value function —
    V(about-to-reach-goal) > V(mid-episode) > V(about-to-collide). Catches
    sign/γ/target regressions that loss-decrease assertions miss."""
    from relationalgraphlearning_tpu.training.train_loop import build

    cfg = Config(env=ENV, policy=PCFG)
    art = build(cfg, "model_predictive_rl")
    demo_ex = art.demonstrator_explorer

    # (a) demonstrator quality on 16 val cases
    ev = jax.jit(lambda k: demo_ex.run_cases(None, 0, jnp.arange(16), k))(
        jax.random.PRNGKey(0))
    assert float(ev.success_rate) >= 0.8, float(ev.success_rate)

    # (b) IL on ~60 demonstrated episodes
    buffer = rb.create(8000, N)
    collect = jax.jit(lambda c, b: (
        lambda carry, traj: (
            carry,
            demo_ex.update_memory(b, traj, art.policy.value, None, True),
            demo_ex.count_episodes(traj)))(
        *demo_ex.collect(None, c, 64, jnp.asarray(0.0), 1_000_000)))
    carry = demo_ex.init_carry(8, 1_000_000, jax.random.PRNGKey(1))
    eps = 0
    while eps < 60:
        carry, buffer, stats = collect(carry, buffer)
        eps += int(stats["episodes"])

    trainer = art.trainer
    trainer.set_learning_rate(0.01, "sgd")
    state = trainer.init(art.policy.init_params(jax.random.PRNGKey(2)))

    @jax.jit
    def il(state, buffer, key):
        def body(c, _):
            s, k = c
            k, sub = jax.random.split(k)
            s, aux = trainer.train_step(
                s, rb.sample(buffer, sub, 100), jnp.asarray(1.0))
            return (s, k), aux
        (s, _), aux = jax.lax.scan(body, (state, key), None, 800)
        return s, jax.tree.map(jnp.mean, aux)

    state, aux = il(state, buffer, jax.random.PRNGKey(3))
    assert float(aux.value_loss) < 0.05

    # synthetic probes with humans far away (in-distribution for safe ORCA
    # demos — near-collision states are NOT, so no collision-value probe):
    # (1) value must increase with goal proximity; (2) the greedy one-step
    # policy must move toward the goal from mid-field.
    from relationalgraphlearning_tpu import types as T

    far = jnp.tile(jnp.asarray([10.0, 10.0, 0.0, 0.0, 0.3]), (N, 1))
    def robot(px, py, vx, vy):
        return jnp.asarray([px, py, vx, vy, 0.3, 0.0, 4.0, 1.0, 0.0])
    v_goal = art.policy.value(state.params, robot(0.0, 3.7, 0.0, 1.0), far)
    v_mid = art.policy.value(state.params, robot(0.0, 0.0, 0.0, 1.0), far)
    assert float(v_goal) > float(v_mid), (float(v_goal), float(v_mid))

    # monotone along the approach path at several scales (greedy-policy
    # behavior at full IL scale is covered by reproduce_quality.py)
    ys = jnp.asarray([-3.0, -1.0, 1.0, 3.0])
    vs = jax.vmap(lambda y: art.policy.value(
        state.params, robot(0.0, y, 0.0, 1.0), far))(ys)
    assert bool(jnp.all(jnp.diff(vs) > 0)), np.asarray(vs)


def test_unicycle_demonstrator_succeeds():
    """The holonomic ORCA demonstrator must navigate successfully inside a
    unicycle-configured env. Its (vx, vy) is CONVERTED to a feasible
    (v, dθ) and the env steps unicycle (heading evolves), so imitation
    trajectories carry the heading distribution the learned policy meets at
    evaluation. Guards two regressions: r2's (vx, vy) silently read as
    (v, dθ) (demonstrator 'succeeded' 0.00), and r3's frozen-theta holonomic
    demos (IL val 0.46 vs 0.94 holonomic — value net out of distribution)."""
    from relationalgraphlearning_tpu.training.train_loop import build

    cfg = Config(
        env=dataclasses.replace(ENV, robot_kinematics="unicycle"),
        policy=PCFG)
    art = build(cfg, "model_predictive_rl")
    demo_ex = art.demonstrator_explorer
    assert demo_ex.convert_to_unicycle  # demonstrator converts, env unicycle
    assert demo_ex.kinematics == "unicycle"
    assert art.explorer.kinematics == "unicycle"  # learned policy convention
    assert not art.explorer.convert_to_unicycle

    ev = jax.jit(lambda k: demo_ex.run_cases(None, 0, jnp.arange(16), k))(
        jax.random.PRNGKey(0))
    assert float(ev.success_rate) > 0.8, float(ev.success_rate)


def test_holonomic_to_unicycle_conversion():
    """Feasibility + fidelity of the action conversion: |dθ| respects the
    constraint, forward speed never exceeds the commanded speed, zero
    commands hold heading, and small-angle commands are followed exactly."""
    from relationalgraphlearning_tpu.geometry import holonomic_to_unicycle

    rc = np.pi / 4
    theta = jnp.asarray([0.0, 0.0, np.pi / 2, 0.0])
    act = jnp.asarray([
        [1.0, 0.0],    # straight ahead: v=1, dθ=0
        [0.0, 1.0],    # 90° left: clipped to rc, speed scaled by cos
        [0.0, 1.0],    # aligned with heading π/2: v=1, dθ=0
        [0.0, 0.0],    # stop: v=0, dθ=0
    ])
    out = np.asarray(holonomic_to_unicycle(act, theta, rc))
    np.testing.assert_allclose(out[0], [1.0, 0.0], atol=1e-6)
    assert abs(out[1, 1] - rc) < 1e-6
    np.testing.assert_allclose(out[1, 0], np.cos(np.pi / 2 - rc), atol=1e-6)
    np.testing.assert_allclose(out[2], [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(out[3], [0.0, 0.0], atol=1e-6)
    assert np.all(np.abs(out[:, 1]) <= rc + 1e-6)


def test_unicycle_policy_steps_with_rotation_constraint():
    """A unicycle-configured trainable policy emits (v, dθ) actions the env
    integrates with heading-first kinematics."""
    from relationalgraphlearning_tpu import types as T

    cfg = Config(
        env=dataclasses.replace(ENV, robot_kinematics="unicycle"),
        policy=PCFG)
    env = CrowdSim(cfg.env)
    policy = make_policy("model_predictive_rl", cfg.policy, cfg.env)
    assert policy.kinematics == "unicycle"
    # action space is (speed, dθ) with |dθ| ≤ rotation_constraint
    acts = np.asarray(policy.action_space)
    assert np.all(np.abs(acts[:, 1]) <=
                  cfg.policy.action_space.rotation_constraint + 1e-6)
    params = policy.init_params(jax.random.PRNGKey(0))
    ex = Explorer(env, policy, cfg.policy.gamma)
    carry = ex.init_carry(2, 0, jax.random.PRNGKey(1))
    carry, traj = jax.jit(
        lambda c: ex.collect(params, c, 4, jnp.asarray(0.0), 0))(carry)
    # heading must change only within the constraint per step
    th0 = np.asarray(traj.robot[..., T.THETA])
    th1 = np.asarray(traj.next_robot[..., T.THETA])
    dtheta = np.abs(th1 - th0)
    assert np.all(dtheta <= cfg.policy.action_space.rotation_constraint + 1e-5)


def test_il_gate_aborts_on_bad_demonstrator(tmp_path, monkeypatch):
    """train() must refuse to imitate a failing demonstrator (quality gate)."""
    from relationalgraphlearning_tpu.training import train_loop as tl

    # sabotage the demonstrator: a zero-velocity 'ORCA' never reaches goals
    class StuckPolicy(ORCARobotPolicy):
        def predict(self, params, js, key, epsilon):
            return jnp.zeros(2)

    monkeypatch.setattr(tl, "ORCARobotPolicy", StuckPolicy)
    cfg = Config(env=ENV, policy=PCFG, train=TrainConfig())
    with pytest.raises(RuntimeError, match="IL demonstrator success"):
        tl.train(cfg, "model_predictive_rl", str(tmp_path / "out"),
                 debug=True, seed=0,
                 opts=tl.LoopOptions(train_envs=4, collect_steps=40,
                                     eval_envs=8))
