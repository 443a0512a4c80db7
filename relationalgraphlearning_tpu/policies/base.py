"""Policy interface.

Reference parity: ``crowd_sim/envs/policy/policy.py::Policy`` ABC —
``configure``/``predict``, attrs ``trainable``/``kinematics``/
``multiagent_training`` (SURVEY.md §2.1). Here policies are stateless
configured objects whose ``predict(params, joint_state, key, epsilon)`` is a
pure function: vmap it over env batches, jit it into the rollout program.
Phase/device handling (``set_phase/set_device``) disappears — phase enters as
the ``epsilon`` argument and device placement is XLA's job.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import Array

from relationalgraphlearning_tpu import types as T


class BasePolicy:
    trainable: bool = False
    kinematics: str = T.HOLONOMIC
    multiagent_training: bool = True

    def init_params(self, key: Array) -> Any:
        """Initialize learnable parameters (None for non-trainable)."""
        return None

    def predict(self, params: Any, js: T.JointState, key: Array,
                epsilon: Array) -> Array:
        """JointState → action [2]. Pure; vmap over batches."""
        raise NotImplementedError


def epsilon_greedy(greedy_action: Array, action_space: Array, key: Array,
                   epsilon: Array) -> Array:
    """Pick a uniformly random action with prob ``epsilon`` (parity:
    trainable policies' exploration during RL)."""
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (), 0, action_space.shape[0])
    explore = jax.random.uniform(k2) < epsilon
    return jnp.where(explore, action_space[idx], greedy_action)
