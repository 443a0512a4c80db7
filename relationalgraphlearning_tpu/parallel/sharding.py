"""Sharding rules + parallel training step.

New capability vs the single-process reference (SURVEY.md §2.6): the jitted
training step runs SPMD over a ("data", "model") mesh —

- **data parallelism**: replay minibatches shard over ``data``; XLA inserts
  the gradient all-reduce (psum over ICI) automatically from the sharding
  constraints;
- **tensor parallelism**: Dense kernels shard their output features over
  ``model`` where divisible (the RGL 32-wide layers are tiny — the axis
  exists for large synthetic configs and exercises the TP code path);
- collection (env rollout) shards the env batch over ``data`` the same way.

No shard_map needed at this level: sharding constraints + jit give XLA the
whole program; the explicit-collective path (edge-partitioned graphs with
ppermute boundary exchange) lives in ``parallel/graph_partition.py``.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from relationalgraphlearning_tpu.training import replay_buffer as rb
from relationalgraphlearning_tpu.training.trainer import TrainState


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard leading (batch) axis over the data axis; replicate the rest."""
    def put(x):
        spec = P("data") if x.ndim >= 1 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)


def param_spec(path_leaf, mesh: Mesh) -> P:
    """TP rule: shard the last (output-feature) dim of 2-D kernels over
    ``model`` when divisible; everything else replicated."""
    leaf = path_leaf
    model = mesh.shape["model"]
    if leaf.ndim == 2 and model > 1 and leaf.shape[-1] % model == 0:
        return P(None, "model")
    return P()


def shard_params(params: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, param_spec(x, mesh))),
        params)


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    return TrainState(
        params=shard_params(state.params, mesh),
        target_params=shard_params(state.target_params, mesh),
        opt_state=jax.tree.map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh, param_spec(x, mesh)))
            if hasattr(x, "ndim") else x,
            state.opt_state),
    )


def make_parallel_train_step(trainer, mesh: Mesh):
    """jit the trainer step with mesh shardings: batch over data, params TP
    over model, gradient all-reduce inserted by XLA."""

    @partial(jax.jit,
             out_shardings=None)
    def step(state: TrainState, batch: rb.Transition, update_sp):
        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree.map(
                lambda x: NamedSharding(mesh, P("data")), batch))
        return trainer.train_step(state, batch, update_sp)

    return step


def make_parallel_collect(explorer, mesh: Mesh, num_steps: int,
                          phase_offset: int):
    """jit the explorer collection with the env batch sharded over data."""

    @jax.jit
    def collect(params, carry, epsilon):
        carry = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P("data") if x.ndim >= 1 else P())),
            carry)
        return explorer.collect(params, carry, num_steps, epsilon, phase_offset)

    return collect
