"""Social Force Model (SFM) crowd dynamics in pure JAX.

Reference parity: ``crowd_sim/envs/policy/socialforce.py`` (``SocialForce`` /
``CentralizedSocialForce``) which wraps the external numpy ``socialforce``
package (Helbing & Molnár 1995 model) — SURVEY.md §2.1, §2.5. The pairwise
repulsive forces are trivially vmappable; one jnp expression replaces the
package.

Model: goal attraction relaxes velocity toward the preferred velocity with
time constant tau; pairwise repulsion uses the circular specification
F = A * exp((r_ij - d_ij) / B) * n_ij with anisotropic field-of-view weight
(lambda); force saturation via max speed clamp.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import Array


class SFMParams(NamedTuple):
    tau: float = 0.5
    A: float = 2.0  # repulsion strength (m/s^2)
    B: float = 0.3  # repulsion range (m)
    lam: float = 0.5  # anisotropy factor (1 = isotropic)


def centralized_sfm_step(
    positions: Array, velocities: Array, radii: Array,
    pref_vels: Array, max_speeds: Array, active: Array,
    params: SFMParams, dt: float,
) -> Array:
    """One synchronous SFM update for n agents; returns new velocities [n, 2]."""
    diff = positions[None, :, :] - positions[:, None, :]  # i→j vector [n, n, 2]
    dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 1e-12))
    n_ij = -diff / dist[..., None]  # push i away from j
    r_ij = radii[:, None] + radii[None, :]

    mag = params.A * jnp.exp((r_ij - dist) / params.B)  # [n, n]

    # anisotropy: weight by angle between walking direction e_i and -n_ij
    speed = jnp.sqrt(jnp.maximum(jnp.sum(velocities**2, -1), 1e-12))
    e_i = velocities / speed[..., None]
    cos_phi = jnp.sum(e_i[:, None, :] * (-n_ij), axis=-1)
    w = params.lam + (1.0 - params.lam) * 0.5 * (1.0 + cos_phi)

    n = positions.shape[0]
    mask = (active[None, :] & ~jnp.eye(n, dtype=bool)).astype(mag.dtype)
    f_rep = jnp.sum((mag * w * mask)[..., None] * n_ij, axis=1)  # [n, 2]

    f_goal = (pref_vels - velocities) / params.tau
    new_v = velocities + (f_goal + f_rep) * dt
    v_norm = jnp.sqrt(jnp.maximum(jnp.sum(new_v**2, -1), 1e-12))
    scale = jnp.minimum(1.0, max_speeds / v_norm)
    new_v = new_v * scale[..., None]
    return jnp.where(active[..., None], new_v, jnp.zeros_like(new_v))
