"""Native C++ ORCA: build, bind, and cross-check against the JAX solver."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from relationalgraphlearning_tpu.envs.orca import ORCAParams, centralized_orca_step
from relationalgraphlearning_tpu.runtime import (
    NativeORCA,
    native_orca_available,
    orca_step_batch_native,
)

pytestmark = pytest.mark.skipif(
    not native_orca_available(), reason="native toolchain unavailable")


def _random_scene(B=4, n=6, seed=0):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(-4, 4, (B, n, 2)).astype(np.float32)
    vel = rng.uniform(-1, 1, (B, n, 2)).astype(np.float32)
    rad = np.full((B, n), 0.3, np.float32)
    pref = rng.uniform(-1, 1, (B, n, 2)).astype(np.float32)
    vmax = np.ones((B, n), np.float32)
    act = np.ones((B, n), np.uint8)
    return pos, vel, rad, pref, vmax, act


def test_native_matches_jax():
    pos, vel, rad, pref, vmax, act = _random_scene()
    out_c = orca_step_batch_native(pos, vel, rad, pref, vmax, act)

    params = ORCAParams()
    out_j = jax.vmap(
        lambda p, v, r, pv, ms, a: centralized_orca_step(
            p, v, r, pv, ms, a, params)
    )(jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(rad),
      jnp.asarray(pref), jnp.asarray(vmax), jnp.asarray(act, bool))
    # independent float32 implementations; allow loose pointwise agreement
    diff = np.abs(out_c - np.asarray(out_j))
    assert np.median(diff) < 1e-3
    assert diff.max() < 5e-2, f"max diff {diff.max()}"


def test_native_safety_space_and_inactive():
    pos, vel, rad, pref, vmax, act = _random_scene(seed=1)
    act[:, -1] = 0
    out = orca_step_batch_native(pos, vel, rad, pref, vmax, act,
                                 safety_space=0.1)
    # inactive agents get zero velocity
    np.testing.assert_array_equal(out[:, -1], 0.0)
    assert np.all(np.isfinite(out))
    # speed clamp holds
    assert np.linalg.norm(out, axis=-1).max() <= 1.0 + 1e-4


def test_native_callback_in_jit():
    pos, vel, rad, pref, vmax, act = _random_scene(B=2)
    solver = NativeORCA()

    @jax.jit
    def step(p, v, r, pv, ms, a):
        return solver(p, v, r, pv, ms, a)

    out = step(jnp.asarray(pos), jnp.asarray(vel), jnp.asarray(rad),
               jnp.asarray(pref), jnp.asarray(vmax), jnp.asarray(act))
    out_ref = orca_step_batch_native(pos, vel, rad, pref, vmax, act)
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-6)
