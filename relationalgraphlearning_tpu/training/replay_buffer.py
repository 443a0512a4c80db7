"""Experience replay buffer — device-resident ring buffer.

Reference parity: ``crowd_nav/utils/memory.py::ReplayMemory`` (fixed-capacity
ring, ``push``/``is_full``/``clear``, indexable for DataLoader; SURVEY.md
§2.3) and the tuple layout the MPRL explorer pushes: (state, value target,
reward, next_state).

TPU-first: the buffer is a pytree of fixed-shape device arrays updated with
``dynamic_update_slice`` — inserts and uniform sampling jit into the training
program, so experience never bounces through host Python. A ``valid`` weight
channel handles transitions whose targets are undefined (e.g. the trailing
partial episode of an imitation rollout); sampling is uniform and the loss is
weighted by validity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array


class Transition(NamedTuple):
    robot: Array  # [..., 9]
    humans: Array  # [..., N, 5]
    value: Array  # [...] — stored target (MC return for IL; TD for VNRL)
    reward: Array  # [...]
    next_robot: Array  # [..., 9]
    next_humans: Array  # [..., N, 5]
    valid: Array  # [...] float 0/1
    terminal: Array  # [...] float 0/1 — episode ended at this transition
    # (MPRLTrainer recomputes its TD target from the CURRENT target net:
    # r + γ̄·(1−terminal)·V_target(ś) — the reason the reference memory
    # stores next_state; stored `value` would go stale as the target net
    # refreshes)


class ReplayBuffer(NamedTuple):
    data: Transition  # arrays with leading dim = capacity
    ptr: Array  # int32 next write slot
    size: Array  # int32 number of filled slots

    @property
    def capacity(self) -> int:
        return self.data.reward.shape[0]


def create(capacity: int, human_num: int) -> ReplayBuffer:
    data = Transition(
        robot=jnp.zeros((capacity, 9)),
        humans=jnp.zeros((capacity, human_num, 5)),
        value=jnp.zeros((capacity,)),
        reward=jnp.zeros((capacity,)),
        next_robot=jnp.zeros((capacity, 9)),
        next_humans=jnp.zeros((capacity, human_num, 5)),
        valid=jnp.zeros((capacity,)),
        terminal=jnp.zeros((capacity,)),
    )
    return ReplayBuffer(data, jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))


def push(buffer: ReplayBuffer, batch: Transition) -> ReplayBuffer:
    """Insert a flat batch [K, ...] at the ring pointer (wrapping).

    K is static. Positions are (ptr + arange(K)) % capacity via scatter.
    """
    K = batch.reward.shape[0]
    cap = buffer.capacity
    idx = (buffer.ptr + jnp.arange(K, dtype=jnp.int32)) % cap

    def upd(buf_arr, new_arr):
        return buf_arr.at[idx].set(new_arr)

    data = jax.tree.map(upd, buffer.data, batch)
    return ReplayBuffer(
        data=data,
        ptr=((buffer.ptr + K) % cap).astype(jnp.int32),
        size=jnp.minimum(buffer.size + K, cap).astype(jnp.int32),
    )


def sample(buffer: ReplayBuffer, key: Array, batch_size: int) -> Transition:
    """Uniform sample of ``batch_size`` transitions from the filled region."""
    idx = jax.random.randint(
        key, (batch_size,), 0, jnp.maximum(buffer.size, 1))
    return jax.tree.map(lambda a: a[idx], buffer.data)


def clear(buffer: ReplayBuffer) -> ReplayBuffer:
    """Parity: ``ReplayMemory.clear``."""
    return ReplayBuffer(
        data=buffer.data._replace(valid=jnp.zeros_like(buffer.data.valid)),
        ptr=jnp.asarray(0, jnp.int32),
        size=jnp.asarray(0, jnp.int32),
    )


def is_full(buffer: ReplayBuffer) -> Array:
    return buffer.size >= buffer.capacity
