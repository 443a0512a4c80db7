"""Full training pipeline: imitation pretrain + RL fine-tune.

Reference parity: ``crowd_nav/train.py`` (SURVEY.md §2.4, §3.1):
Phase 1 — imitation learning from an ORCA demonstrator (safety_space=0.15,
il_episodes≈2000 / il_epochs≈50 / lr 0.01) → ``il`` checkpoint; Phase 2 — RL
fine-tune with ε-decay (0.5→0.1 over 4000 episodes), per-iteration
experience collection + ``train_batches`` minibatch updates, hard target-net
update every ``target_update_interval`` episodes, validation every
``evaluation_interval``, periodic checkpoints → ``rl`` checkpoint.

TPU-first: the reference interleaves ONE Python episode with 100 torch
batches. Here each RL iteration is two jitted device programs — (1) an
auto-resetting vmapped rollout of B envs × K steps that pushes transitions
into the device replay buffer, (2) a ``lax.scan`` of minibatch updates —
so wall-clock per episode collapses (see bench.py). Episode accounting uses
terminal flags, reproducing the reference's episode-count-driven schedule.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import time
from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from relationalgraphlearning_tpu.configs.base import Config
from relationalgraphlearning_tpu.envs.crowd_sim import CrowdSim
from relationalgraphlearning_tpu.policies import make_policy
from relationalgraphlearning_tpu.policies.model_predictive_rl import (
    ModelPredictiveRLPolicy,
)
from relationalgraphlearning_tpu.policies.robot_policies import ORCARobotPolicy
from relationalgraphlearning_tpu.training import checkpoint as ckpt
from relationalgraphlearning_tpu.training import replay_buffer as rb
from relationalgraphlearning_tpu.training.explorer import Explorer, RolloutCarry
from relationalgraphlearning_tpu.training.metrics import MetricsWriter
from relationalgraphlearning_tpu.training.trainer import (
    LossAux,
    MPRLTrainer,
    TrainState,
    VNRLTrainer,
)

log = logging.getLogger(__name__)


@dataclasses.dataclass
class LoopOptions:
    """Batching knobs of the TPU loop (no reference counterpart — the
    reference is strictly B=1)."""

    train_envs: int = 16  # parallel envs during collection
    collect_steps: int = 64  # env-steps per iteration per env
    eval_envs: int = 100
    # Optional jax.sharding.Mesh ("data", "model"): env batch + replay
    # minibatches shard over `data` (XLA inserts the gradient all-reduce),
    # Dense kernels TP over `model` (parallel/sharding.py rules). None =
    # single-device. Multi-host: parallel/distributed.initialize() first.
    mesh: Any = None


class TrainerArtifacts(NamedTuple):
    policy: Any
    trainer: Any
    explorer: Explorer
    demonstrator_explorer: Explorer
    env: CrowdSim


def build(config: Config, policy_name: str, base_seed: int = 0,
          policy_kwargs: Optional[dict] = None) -> TrainerArtifacts:
    env = CrowdSim(config.env)
    policy = make_policy(policy_name, config.policy, config.env,
                         **(policy_kwargs or {}))
    if isinstance(policy, ModelPredictiveRLPolicy):
        trainer = MPRLTrainer(
            policy,
            optimizer=config.train.optimizer,
            learning_rate=config.train.rl_learning_rate,
            freeze_state_predictor=config.train.freeze_state_predictor,
            detach_state_predictor=config.train.detach_state_predictor,
            sp_update_stride=5 if config.train.reduce_sp_update_frequency else 1)
    else:
        trainer = VNRLTrainer(
            policy, optimizer=config.train.optimizer,
            learning_rate=config.train.rl_learning_rate)
    explorer = Explorer(env, policy, config.policy.gamma, base_seed)
    demonstrator = ORCARobotPolicy(
        config.policy, config.env,
        safety_space=config.train.orca_safety_space)
    demo_explorer = Explorer(
        env, demonstrator, config.policy.gamma, base_seed,
        rotation_constraint=config.policy.action_space.rotation_constraint)
    return TrainerArtifacts(policy, trainer, explorer, demo_explorer, env)


def train(config: Config, policy_name: str, output_dir: str,
          debug: bool = False, resume: bool = False, seed: int = 0,
          opts: Optional[LoopOptions] = None) -> dict:
    """Run IL + RL; returns final metrics dict. Artifacts land in
    ``output_dir`` (checkpoints, metrics.jsonl, tensorboard events)."""
    opts = opts or LoopOptions()
    tc = config.train
    sim = config.env.sim
    if debug:  # parity: config __init__(debug=True) shrinking the run
        tc = dataclasses.replace(
            tc, il_episodes=20, il_epochs=2, rl_train_episodes=40,
            evaluation_interval=20, target_update_interval=20,
            checkpoint_interval=20, capacity=20_000)

    os.makedirs(output_dir, exist_ok=True)
    writer = MetricsWriter(output_dir)
    art = build(config, policy_name, base_seed=seed)
    policy, trainer, explorer = art.policy, art.trainer, art.explorer

    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    params = policy.init_params(k_init)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    log.info("policy %s: %d parameters", policy_name, n_params)

    buffer = rb.create(tc.capacity, sim.human_num)

    # ------------------------------------------------------------ jitted ops
    B = opts.train_envs
    mesh = opts.mesh
    if mesh is not None and B % mesh.shape["data"] != 0:
        raise ValueError(
            f"train_envs={B} not divisible by data axis {mesh.shape['data']}")

    def _dp(tree):
        """Shard leading axes over the mesh's data axis (no-op without)."""
        if mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P("data") if x.ndim >= 1 else P())),
            tree)

    @partial(jax.jit, static_argnames=("imitation", "phase_offset"))
    def collect_and_update(params, target_params, carry, buffer, epsilon,
                           imitation: bool, phase_offset: int):
        expl = art.demonstrator_explorer if imitation else explorer
        carry, traj = expl.collect(
            params if not imitation else None, _dp(carry),
            opts.collect_steps, epsilon, phase_offset)
        buffer = expl.update_memory(
            buffer, traj, policy.value, target_params, imitation)
        stats = expl.count_episodes(traj)
        return carry, buffer, stats

    @jax.jit
    def rl_optimize(state: TrainState, buffer, key):
        return trainer.optimize_batches(
            state, buffer, key, tc.train_batches, tc.batch_size)

    @jax.jit
    def evaluate(params, key, case_indices):
        return explorer.run_cases(
            params, sim.val_seed_offset, case_indices, key)

    def _shard_state(state: TrainState) -> TrainState:
        if mesh is None:
            return state
        from relationalgraphlearning_tpu.parallel.sharding import (
            shard_train_state)

        return shard_train_state(state, mesh)

    # ---------------------------------------------------------- phase 1: IL
    trainer.set_learning_rate(tc.il_learning_rate, tc.il_optimizer)
    state = _shard_state(trainer.init(params))

    il_ckpt = os.path.join(output_dir, "il_model")
    rl_ckpt = os.path.join(output_dir, "rl_model")
    resumed_rl = False
    if resume and ckpt.exists(rl_ckpt):
        # rl checkpoints carry the RL optimizer's state — template must match
        trainer.set_learning_rate(tc.rl_learning_rate, tc.optimizer)
        state = ckpt.restore(rl_ckpt, trainer.init(params))
        resumed_rl = True
        log.info("resumed RL checkpoint from %s", rl_ckpt)
    elif resume and ckpt.exists(il_ckpt):
        state = ckpt.restore(il_ckpt, state)
        log.info("resumed IL checkpoint from %s", il_ckpt)
    else:
        t0 = time.time()
        key, k_carry = jax.random.split(key)
        carry = art.demonstrator_explorer.init_carry(
            B, sim.train_seed_offset, k_carry)
        episodes = 0
        demo_successes = 0.0
        while episodes < tc.il_episodes:
            carry, buffer, stats = collect_and_update(
                None, None, carry, buffer, jnp.asarray(0.0),
                imitation=True, phase_offset=sim.train_seed_offset)
            ep_inc = int(stats["episodes"])
            episodes += ep_inc
            demo_successes += float(stats["success_rate"]) * ep_inc
        demo_success = demo_successes / max(episodes, 1)
        log.info(
            "IL demonstrations: %d episodes (success %.2f) in %.1fs",
            episodes, demo_success, time.time() - t0)
        # Demonstrator-quality gate: imitation targets from a failing
        # demonstrator poison the value function silently (e.g. a
        # kinematics-mismatched action stream). The reference's ORCA
        # demonstrator succeeds at ~1.0; anything far below is a pipeline
        # bug, not a training condition — abort loudly.
        if demo_success < 0.7:
            raise RuntimeError(
                f"IL demonstrator success {demo_success:.2f} < 0.7 — "
                "demonstrations are unusable (check robot kinematics vs "
                "demonstrator action convention); aborting before IL.")

        key, k_opt = jax.random.split(key)
        # epoch sweeps sized to the *filled* buffer
        filled = int(buffer.size)
        steps = max(tc.il_epochs * max(filled // tc.batch_size, 1), 1)

        @jax.jit
        def il_optimize(state, buffer, key):
            def body(carry, _):
                state, key = carry
                key, sub = jax.random.split(key)
                batch = rb.sample(buffer, sub, tc.batch_size)
                state, aux = trainer.train_step(state, batch, jnp.asarray(1.0))
                return (state, key), aux
            (state, _), aux = jax.lax.scan(body, (state, key), None, steps)
            return state, jax.tree.map(jnp.mean, aux)

        t0 = time.time()
        state, aux = il_optimize(state, buffer, k_opt)
        state = trainer.update_target(state)
        log.info("IL: %d sgd steps, value loss %.4f, sp loss %.4f (%.1fs)",
                 steps, float(aux.value_loss), float(aux.predictor_loss),
                 time.time() - t0)
        writer.write(0, {"value_loss": float(aux.value_loss),
                         "sp_loss": float(aux.predictor_loss)}, prefix="il")
        ckpt.save(il_ckpt, state)

        # IL validation (parity: train.py validates the IL policy)
        key, k_eval = jax.random.split(key)
        n_val = min(sim.val_size, opts.eval_envs)
        ev = evaluate(state.params, k_eval, jnp.arange(n_val))
        log.info("IL val: success %.2f coll %.2f nav %.2fs ret %.3f",
                 float(ev.success_rate), float(ev.collision_rate),
                 float(ev.avg_nav_time), float(ev.avg_return))

    # ---------------------------------------------------------- phase 2: RL
    if not resumed_rl:
        trainer.set_learning_rate(tc.rl_learning_rate, tc.optimizer)
        state = _shard_state(TrainState(state.params, state.target_params,
                                        trainer.tx.init(state.params)))

    key, k_carry = jax.random.split(key)
    carry = explorer.init_carry(B, sim.train_seed_offset, k_carry)
    episodes = 0
    it = 0
    opt_debt = 0  # episodes whose train_batches sweep is still owed
    aux = LossAux(jnp.asarray(0.0), jnp.asarray(0.0))
    last_eval_ep = -1
    last_target_ep = 0
    last_ckpt_ep = 0
    best_score = (-1.0, float("-inf"))  # lexicographic (success, return)
    best_ckpt = os.path.join(output_dir, "rl_model_best")
    t_loop = time.time()
    while episodes < tc.rl_train_episodes:
        frac = min(episodes / tc.epsilon_decay, 1.0)
        epsilon = tc.epsilon_start + frac * (tc.epsilon_end - tc.epsilon_start)

        carry, buffer, stats = collect_and_update(
            state.params, state.target_params, carry, buffer,
            jnp.asarray(epsilon), imitation=False,
            phase_offset=sim.train_seed_offset)
        ep_inc = int(stats["episodes"])
        episodes += ep_inc

        # Parity: the reference runs optimize_batch(train_batches) after
        # EVERY episode (SURVEY.md §3.1) — ~train_batches gradient steps per
        # episode (1M over a 10k-episode run). The batched collector finishes
        # ~B*K/len episodes per iteration, so run one train_batches sweep per
        # completed episode; each sweep is a single jitted lax.scan dispatch.
        opt_debt += ep_inc
        while opt_debt > 0:
            key, k_opt = jax.random.split(key)
            state, aux = rl_optimize(state, buffer, k_opt)
            opt_debt -= 1
            it += 1

        if episodes - last_target_ep >= tc.target_update_interval:
            state = trainer.update_target(state)
            last_target_ep = episodes

        if episodes // tc.evaluation_interval > last_eval_ep // max(
                tc.evaluation_interval, 1) or last_eval_ep < 0:
            key, k_eval = jax.random.split(key)
            n_val = min(sim.val_size, opts.eval_envs) if debug else sim.val_size
            ev = evaluate(state.params, k_eval, jnp.arange(n_val))
            log.info(
                "RL ep %d it %d eps %.2f | val success %.2f coll %.2f "
                "nav %.2fs ret %.3f | vloss %.4f sploss %.4f | %.1fs",
                episodes, it, epsilon, float(ev.success_rate),
                float(ev.collision_rate), float(ev.avg_nav_time),
                float(ev.avg_return), float(aux.value_loss),
                float(aux.predictor_loss), time.time() - t_loop)
            writer.write(episodes, {
                "success_rate": float(ev.success_rate),
                "collision_rate": float(ev.collision_rate),
                "timeout_rate": float(ev.timeout_rate),
                "nav_time": float(ev.avg_nav_time),
                "return": float(ev.avg_return)}, prefix="val")
            last_eval_ep = episodes
            # keep the best-on-val snapshot; the discounted return breaks
            # success-rate ties toward faster, lower-discomfort navigation
            # (strict lexicographic comparison — DESIGN.md item 8)
            score = (float(ev.success_rate), float(ev.avg_return))
            if score > best_score:
                best_score = score
                ckpt.save(best_ckpt, state)
                log.info("new best val success %.2f → %s",
                         float(ev.success_rate), best_ckpt)
        writer.write(episodes, {
            "value_loss": float(aux.value_loss),
            "sp_loss": float(aux.predictor_loss),
            "epsilon": epsilon,
            "train_success": float(stats["success_rate"])}, prefix="rl")

        if episodes - last_ckpt_ep >= tc.checkpoint_interval:
            ckpt.save(rl_ckpt, state)
            last_ckpt_ep = episodes

    ckpt.save(rl_ckpt, state)

    # final validation
    key, k_eval = jax.random.split(key)
    ev = evaluate(state.params, k_eval, jnp.arange(min(sim.val_size, 500)))
    result = {
        "success_rate": float(ev.success_rate),
        "collision_rate": float(ev.collision_rate),
        "timeout_rate": float(ev.timeout_rate),
        "nav_time": float(ev.avg_nav_time),
        "return": float(ev.avg_return),
        "episodes": episodes,
    }
    log.info("final val: %s", result)
    writer.close()
    return result
