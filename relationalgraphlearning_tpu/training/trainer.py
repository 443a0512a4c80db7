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

    def init(self, params: Any) -> TrainState:
        return TrainState(params, params, self.tx.init(params))

    def set_learning_rate(self, learning_rate: float, optimizer: str = "adam"):
        """Parity: ``Trainer.set_learning_rate`` between IL and RL phases.
        Re-init the transform; call ``init`` again to rebuild opt state."""
        self.tx = make_optimizer(optimizer, learning_rate)

    # ------------------------------------------------------------------ loss
    def loss_fn(self, params: Any, batch: rb.Transition, update_sp: Array):
        w = batch.valid
        denom = jnp.maximum(jnp.sum(w), 1.0)
        v = self.policy.value(params, batch.robot, batch.humans)
        value_loss = jnp.sum(w * (v - batch.value) ** 2) / denom

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
                   update_sp: Array) -> tuple[TrainState, LossAux]:
        grads, aux = jax.grad(self.loss_fn, has_aux=True)(
            state.params, batch, update_sp)
        updates, opt_state = self.tx.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, state.target_params, opt_state), aux

    def optimize_batches(self, state: TrainState, buffer: rb.ReplayBuffer,
                         key: Array, num_batches: int, batch_size: int
                         ) -> tuple[TrainState, LossAux]:
        """RL: ``num_batches`` sampled minibatch steps as one lax.scan
        (parity: ``optimize_batch``). State-predictor updates run every
        ``sp_update_stride`` batches (parity: reduce_sp_update_frequency)."""

        def body(carry, i):
            state, key = carry
            key, sub = jax.random.split(key)
            batch = rb.sample(buffer, sub, batch_size)
            update_sp = (i % self.sp_update_stride == 0).astype(jnp.float32)
            state, aux = self.train_step(state, batch, update_sp)
            return (state, key), aux

        (state, _), aux = jax.lax.scan(
            body, (state, key), jnp.arange(num_batches))
        return state, jax.tree.map(jnp.mean, aux)

    def update_target(self, state: TrainState) -> TrainState:
        """Hard target-network update (parity: target_update_interval)."""
        return TrainState(state.params, state.params, state.opt_state)


class VNRLTrainer(MPRLTrainer):
    """Value-only trainer for the one-step baselines (parity: VNRLTrainer)."""

    def loss_fn(self, params: Any, batch: rb.Transition, update_sp: Array):
        del update_sp
        w = batch.valid
        denom = jnp.maximum(jnp.sum(w), 1.0)
        v = self.policy.value(params, batch.robot, batch.humans)
        value_loss = jnp.sum(w * (v - batch.value) ** 2) / denom
        return value_loss, LossAux(value_loss, jnp.asarray(0.0))
