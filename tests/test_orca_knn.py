"""kNN-limited ORCA: matches all-pairs for small crowds; scales to large."""

import jax
import jax.numpy as jnp
import numpy as np

from relationalgraphlearning_tpu.envs.orca import (
    ORCAParams,
    centralized_orca_step,
    centralized_orca_step_knn,
)

PARAMS = ORCAParams()


def test_knn_matches_allpairs_small():
    """With max_neighbors >= n-1 the kNN variant is exactly all-pairs."""
    rng = np.random.RandomState(0)
    n = 6
    pos = jnp.asarray(rng.uniform(-4, 4, (n, 2)), jnp.float32)
    vel = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
    rad = jnp.full((n,), 0.3)
    pref = jnp.asarray(rng.uniform(-1, 1, (n, 2)), jnp.float32)
    vmax = jnp.ones((n,))
    act = jnp.ones((n,), bool)
    v_all = centralized_orca_step(pos, vel, rad, pref, vmax, act, PARAMS)
    v_knn = centralized_orca_step_knn(pos, vel, rad, pref, vmax, act, PARAMS,
                                      max_neighbors=n - 1)
    np.testing.assert_allclose(np.asarray(v_knn), np.asarray(v_all),
                               atol=1e-5)


def test_knn_large_crowd_steps():
    """2048-agent crowd steps without collisions exploding; agents move."""
    rng = np.random.RandomState(1)
    n = 2048
    pos = jnp.asarray(rng.uniform(-60, 60, (n, 2)), jnp.float32)
    goals = -pos
    rad = jnp.full((n,), 0.3)
    vmax = jnp.ones((n,))
    act = jnp.ones((n,), bool)
    vel = jnp.zeros((n, 2))

    @jax.jit
    def step(pos, vel):
        to = goals - pos
        d = jnp.linalg.norm(to, axis=-1, keepdims=True)
        pref = jnp.where(d > 1e-3, to / jnp.maximum(d, 1e-9), 0.0)
        new_v = centralized_orca_step_knn(
            pos, vel, rad, pref, vmax, act, PARAMS, max_neighbors=10)
        return pos + new_v * 0.25, new_v

    for _ in range(8):
        pos, vel = step(pos, vel)
    speeds = np.linalg.norm(np.asarray(vel), axis=-1)
    assert np.isfinite(np.asarray(pos)).all()
    assert speeds.mean() > 0.5  # crowd is moving
