"""Trainers — jitted optimization steps over the replay buffer.

Reference parity: ``crowd_nav/utils/trainer.py`` (SURVEY.md §2.3, §3.4):
``MPRLTrainer`` jointly trains the value estimator (MSE vs MC/TD targets)
and the trajectory predictor (MSE of predicted next human states vs actual),
with ``optimize_epoch`` (imitation: full sweeps over memory) and
``optimize_batch`` (RL: sampled minibatches), knobs
``reduce_sp_update_frequency`` / ``freeze_state_predictor`` /
``detach_state_predictor``; ``VNRLTrainer`` is the value-only variant for
CADRL/SARL/LSTM-RL/GCN; both own the optimizer (Adam / SGD) and
``set_learning_rate``.

TPU-first: each optimize step is one jitted program — sample minibatch from
the device buffer, compute losses, optax update. Multi-batch sweeps are a
``lax.scan`` over steps, so an entire RL iteration (100 batches) is a single
dispatch.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import Array

from relationalgraphlearning_tpu.training import replay_buffer as rb


def make_optimizer(name: str, learning_rate: float) -> optax.GradientTransformation:
    """Adam / SGD+momentum (parity: trainer.py owns the optimizer). A global
    grad-norm clip guards the tiny nets against the loss spikes that large
    on-device step counts can hit (46k IL steps run in seconds here)."""
    if name == "adam":
        opt = optax.adam(learning_rate)
    elif name == "sgd":
        opt = optax.sgd(learning_rate, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    return optax.chain(optax.clip_by_global_norm(10.0), opt)


class TrainState(NamedTuple):
    params: Any
    target_params: Any
    opt_state: Any


class LossAux(NamedTuple):
    value_loss: Array
    predictor_loss: Array


class MPRLTrainer:
    """Joint value + state-predictor training for ModelPredictiveRLPolicy."""

    def __init__(self, policy, optimizer: str = "adam",
                 learning_rate: float = 0.001,
                 freeze_state_predictor: bool = False,
                 detach_state_predictor: bool = False,
                 sp_update_stride: int = 1):
        self.policy = policy
        self.tx = make_optimizer(optimizer, learning_rate)
        self.freeze_sp = freeze_state_predictor
        self.detach_sp = detach_state_predictor
        self.sp_update_stride = sp_update_stride
        # MPRL recomputes RL TD targets per minibatch (reference stores
        # next_state for exactly this); VNRL fits targets stored at
        # collection time (reference memory stores (state, value) only).
        self.rl_recomputes_td = True

    def init(self, params: Any) -> TrainState:
        return TrainState(params, params, self.tx.init(params))

    def set_learning_rate(self, learning_rate: float, optimizer: str = "adam"):
        """Parity: ``Trainer.set_learning_rate`` between IL and RL phases.
        Re-init the transform; call ``init`` again to rebuild opt state."""
        self.tx = make_optimizer(optimizer, learning_rate)

    # ------------------------------------------------------------------ loss
    def _td_target(self, target_params: Any, batch: rb.Transition) -> Array:
        """Fresh 1-step TD target from the CURRENT target network (parity:
        MPRLTrainer.optimize_batch computes target_values = r + γ̄·V_target(ś)
        per minibatch — the reason ReplayMemory stores next_state). Stored
        targets would go stale between target-net refreshes."""
        from relationalgraphlearning_tpu import types as T

        gamma_bar = self.policy.gamma ** (
            self.policy.env_cfg.time_step * batch.robot[..., T.VPREF])
        v_next = self.policy.value(
            target_params, batch.next_robot, batch.next_humans)
        return batch.reward + gamma_bar * (1.0 - batch.terminal) * \
            jax.lax.stop_gradient(v_next)

    def loss_fn(self, params: Any, batch: rb.Transition, update_sp: Array,
                target_params: Any = None, use_td: bool = False):
        w = batch.valid
        denom = jnp.maximum(jnp.sum(w), 1.0)
        v = self.policy.value(params, batch.robot, batch.humans)
        target = (self._td_target(target_params, batch) if use_td
                  else batch.value)
        value_loss = jnp.sum(w * (v - target) ** 2) / denom

        if self.policy.cfg.mprl.linear_state_predictor or self.freeze_sp:
            predictor_loss = jnp.asarray(0.0)
        else:
            sp_params = params
            if self.detach_sp:
                # parity with trainer.py detach_state_predictor: the
                # predictor loss trains only the motion head — stop
                # gradients into every other submodule (notably a shared
                # graph model).
                sp_params = {"params": {
                    k: (v if k == "human_motion_predictor"
                        else jax.tree.map(jax.lax.stop_gradient, v))
                    for k, v in params["params"].items()}}
            # human prediction is action-independent (the action only moves
            # the robot analytically), so a zero action is passed.
            _, pred_h = self.policy.next_state(
                sp_params, batch.robot, batch.humans,
                jnp.zeros(batch.robot.shape[:-1] + (2,)))
            predictor_loss = jnp.sum(
                w[..., None, None] * (pred_h - batch.next_humans) ** 2
            ) / (denom * pred_h.shape[-1] * pred_h.shape[-2])
            predictor_loss = predictor_loss * update_sp

        return value_loss + predictor_loss, LossAux(value_loss, predictor_loss)

    # ------------------------------------------------------------------ step
    def train_step(self, state: TrainState, batch: rb.Transition,
                   update_sp: Array, use_td: bool = False
                   ) -> tuple[TrainState, LossAux]:
        grads, aux = jax.grad(self.loss_fn, has_aux=True)(
            state.params, batch, update_sp,
            target_params=state.target_params, use_td=use_td)
        updates, opt_state = self.tx.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, state.target_params, opt_state), aux

    def optimize_batches(self, state: TrainState, buffer: rb.ReplayBuffer,
                         key: Array, num_batches: int, batch_size: int
                         ) -> tuple[TrainState, LossAux]:
        """RL: ``num_batches`` sampled minibatch steps as one lax.scan
        (parity: ``optimize_batch`` — fresh TD targets from the target net
        each minibatch). State-predictor updates run every
        ``sp_update_stride`` batches (parity: reduce_sp_update_frequency)."""

        def body(carry, i):
            state, key = carry
            key, sub = jax.random.split(key)
            batch = rb.sample(buffer, sub, batch_size)
            update_sp = (i % self.sp_update_stride == 0).astype(jnp.float32)
            state, aux = self.train_step(state, batch, update_sp,
                                         use_td=self.rl_recomputes_td)
            return (state, key), aux

        (state, _), aux = jax.lax.scan(
            body, (state, key), jnp.arange(num_batches))
        return state, jax.tree.map(jnp.mean, aux)

    def update_target(self, state: TrainState) -> TrainState:
        """Hard target-network update (parity: target_update_interval)."""
        return TrainState(state.params, state.params, state.opt_state)


class VNRLTrainer(MPRLTrainer):
    """Value-only trainer for the one-step baselines (parity: VNRLTrainer —
    fits the targets stored at collection time)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.rl_recomputes_td = False

    def loss_fn(self, params: Any, batch: rb.Transition, update_sp: Array,
                target_params: Any = None, use_td: bool = False):
        del update_sp, target_params, use_td
        w = batch.valid
        denom = jnp.maximum(jnp.sum(w), 1.0)
        v = self.policy.value(params, batch.robot, batch.humans)
        value_loss = jnp.sum(w * (v - batch.value) ** 2) / denom
        return value_loss, LossAux(value_loss, jnp.asarray(0.0))
