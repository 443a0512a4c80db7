"""ORCA (Optimal Reciprocal Collision Avoidance) in pure JAX.

Reference parity: ``crowd_sim/envs/policy/orca.py`` wraps the external C++
RVO2 library (``rvo2.PyRVOSimulator``) — the reference's only native
component (SURVEY.md §2.1, §2.5). Here the ORCA algorithm (van den Berg,
Guy, Lin, Manocha — "Reciprocal n-body collision avoidance", ISRR 2009) is
re-derived as a fixed-shape, fixed-iteration JAX program:

- half-plane (ORCA line) construction is fully vectorized over agent pairs;
- the incremental 2-D linear program (linearProgram1/2) and the infeasible
  fallback (linearProgram3) become masked ``lax.fori_loop``s with static trip
  counts, vmapped over agents — no data-dependent Python control flow, so the
  entire crowd update jits into the env step and runs on TPU;
- neighbor selection keeps RVO2 semantics (neighbor_dist cutoff; all pairs
  considered — crowds here are small per env, scale comes from vmap over
  thousands of envs).

A C++ batched implementation with identical semantics lives in
``native/orca`` as the host-side runtime counterpart; tests cross-check the
two.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

_EPS = 1e-5


class ORCAParams(NamedTuple):
    neighbor_dist: float = 10.0
    time_horizon: float = 5.0
    time_step: float = 0.25
    safety_space: float = 0.0


def _det(a: Array, b: Array) -> Array:
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _norm_sq(a: Array) -> Array:
    return jnp.sum(a * a, axis=-1)


def orca_lines(
    p_i: Array, v_i: Array, r_i: Array,
    p_j: Array, v_j: Array, r_j: Array,
    valid: Array, params: ORCAParams,
) -> tuple[Array, Array, Array]:
    """Build ORCA half-plane lines for one agent against M neighbors.

    Args: p_i/v_i [2], r_i scalar; p_j/v_j [M, 2], r_j [M]; valid [M] bool.
    Returns (points [M, 2], directions [M, 2], valid [M]). The feasible
    half-plane for a line is {v : det(direction, point - v) <= 0}, i.e. the
    left side of the directed line, matching RVO2's convention.
    """
    inv_th = 1.0 / params.time_horizon
    inv_dt = 1.0 / params.time_step

    rel_pos = p_j - p_i  # [M, 2]
    rel_vel = v_i[None, :] - v_j  # [M, 2]
    dist_sq = _norm_sq(rel_pos)
    comb_r = r_i + r_j
    comb_r_sq = comb_r * comb_r
    colliding = dist_sq <= comb_r_sq

    # --- non-colliding case (project on VO truncated cone, horizon time_horizon)
    w = rel_vel - inv_th * rel_pos
    w_len_sq = _norm_sq(w)
    dot1 = jnp.sum(w * rel_pos, axis=-1)
    on_cutoff = (dot1 < 0.0) & (dot1 * dot1 > comb_r_sq * w_len_sq)

    w_len = jnp.sqrt(jnp.maximum(w_len_sq, 1e-20))
    unit_w = w / w_len[..., None]
    dir_cut = jnp.stack([unit_w[..., 1], -unit_w[..., 0]], axis=-1)
    u_cut = (comb_r * inv_th - w_len)[..., None] * unit_w

    # legs
    leg = jnp.sqrt(jnp.maximum(dist_sq - comb_r_sq, 1e-20))
    left_side = _det(rel_pos, w) > 0.0
    dir_left = jnp.stack(
        [rel_pos[..., 0] * leg - rel_pos[..., 1] * comb_r,
         rel_pos[..., 0] * comb_r + rel_pos[..., 1] * leg], axis=-1
    ) / jnp.maximum(dist_sq, 1e-20)[..., None]
    dir_right = -jnp.stack(
        [rel_pos[..., 0] * leg + rel_pos[..., 1] * comb_r,
         -rel_pos[..., 0] * comb_r + rel_pos[..., 1] * leg], axis=-1
    ) / jnp.maximum(dist_sq, 1e-20)[..., None]
    dir_leg = jnp.where(left_side[..., None], dir_left, dir_right)
    dot2 = jnp.sum(rel_vel * dir_leg, axis=-1)
    u_leg = dot2[..., None] * dir_leg - rel_vel

    dir_nc = jnp.where(on_cutoff[..., None], dir_cut, dir_leg)
    u_nc = jnp.where(on_cutoff[..., None], u_cut, u_leg)

    # --- colliding case (cutoff at time_step)
    w_c = rel_vel - inv_dt * rel_pos
    w_c_len = jnp.sqrt(jnp.maximum(_norm_sq(w_c), 1e-20))
    unit_w_c = w_c / w_c_len[..., None]
    dir_col = jnp.stack([unit_w_c[..., 1], -unit_w_c[..., 0]], axis=-1)
    u_col = (comb_r * inv_dt - w_c_len)[..., None] * unit_w_c

    direction = jnp.where(colliding[..., None], dir_col, dir_nc)
    u = jnp.where(colliding[..., None], u_col, u_nc)
    point = v_i[None, :] + 0.5 * u

    in_range = dist_sq < params.neighbor_dist**2
    return point, direction, valid & in_range


def _linear_program1(
    pts: Array, dirs: Array, valid: Array, line_no: Array,
    radius: Array, opt_vel: Array, direction_opt: bool,
) -> tuple[Array, Array]:
    """1-D LP along line ``line_no`` subject to the disc and lines < line_no.

    Returns (feasible, result). Static shapes: pts/dirs [M, 2], valid [M].
    """
    M = pts.shape[0]
    pt = pts[line_no]
    dr = dirs[line_no]

    dot_product = jnp.dot(pt, dr)
    discriminant = dot_product * dot_product + radius * radius - jnp.dot(pt, pt)
    feasible0 = discriminant >= 0.0
    sqrt_disc = jnp.sqrt(jnp.maximum(discriminant, 0.0))
    t_left0 = -dot_product - sqrt_disc
    t_right0 = -dot_product + sqrt_disc

    def body(i, carry):
        t_left, t_right, feasible = carry
        use = (i < line_no) & valid[i]
        denom = _det(dr, dirs[i])
        numer = _det(dirs[i], pt - pts[i])
        parallel = jnp.abs(denom) <= _EPS
        # parallel & numerator < 0 → infeasible; parallel & numer >= 0 → no-op
        feas_i = jnp.where(use & parallel & (numer < 0.0), False, True)
        t = numer / jnp.where(parallel, 1.0, denom)
        new_t_right = jnp.where(
            use & ~parallel & (denom >= 0.0), jnp.minimum(t_right, t), t_right)
        new_t_left = jnp.where(
            use & ~parallel & (denom < 0.0), jnp.maximum(t_left, t), t_left)
        return new_t_left, new_t_right, feasible & feas_i

    t_left, t_right, feasible = jax.lax.fori_loop(
        0, M, body, (t_left0, t_right0, feasible0))
    feasible = feasible & (t_left <= t_right)

    if direction_opt:
        t = jnp.where(jnp.dot(opt_vel, dr) > 0.0, t_right, t_left)
    else:
        t = jnp.clip(jnp.dot(dr, opt_vel - pt), t_left, t_right)
    return feasible, pt + t * dr


def _linear_program2(
    pts: Array, dirs: Array, valid: Array,
    radius: Array, opt_vel: Array, direction_opt: bool,
) -> tuple[Array, Array]:
    """Incremental 2-D LP. Returns (result [2], fail_line — M if feasible)."""
    M = pts.shape[0]
    if direction_opt:
        result0 = opt_vel * radius
    else:
        speed_sq = _norm_sq(opt_vel)
        scaled = opt_vel / jnp.sqrt(jnp.maximum(speed_sq, 1e-20)) * radius
        result0 = jnp.where(speed_sq > radius * radius, scaled, opt_vel)

    def body(i, carry):
        result, fail = carry
        ok = fail >= M  # still feasible so far
        violated = valid[i] & (_det(dirs[i], pts[i] - result) > 0.0) & ok
        feasible_i, new_result = _linear_program1(
            pts, dirs, valid, i, radius, opt_vel, direction_opt)
        result = jnp.where(violated & feasible_i, new_result, result)
        fail = jnp.where(violated & ~feasible_i, jnp.minimum(fail, i), fail)
        return result, fail

    return jax.lax.fori_loop(0, M, body, (result0, jnp.asarray(M)))


def _linear_program3(
    pts: Array, dirs: Array, valid: Array,
    begin_line: Array, radius: Array, result: Array,
) -> Array:
    """Infeasible fallback: minimize the maximum half-plane penetration.

    Sequentially (over lines ≥ begin_line whose penetration exceeds the
    current max) re-solves a direction-optimizing LP on projected lines,
    matching RVO2's linearProgram3 with no static obstacle lines.
    """
    M = pts.shape[0]

    def body(i, carry):
        result, distance = carry
        pen = _det(dirs[i], pts[i] - result)
        act = valid[i] & (i >= begin_line) & (pen > distance)

        # Build projected lines for all j < i (masked).
        j_idx = jnp.arange(M)
        use_j = (j_idx < i) & valid
        denom = _det(dirs[i], dirs)  # [M]
        parallel = jnp.abs(denom) <= _EPS
        same_dir = jnp.sum(dirs[i] * dirs, axis=-1) > 0.0
        # parallel & same direction → skip line j entirely
        use_j = use_j & ~(parallel & same_dir)
        pt_parallel = 0.5 * (pts[i] + pts)  # parallel opposite direction
        tproj = _det(dirs, pts[i] - pts) / jnp.where(parallel, 1.0, denom)
        pt_general = pts[i] + tproj[..., None] * dirs[i]
        proj_pts = jnp.where(parallel[..., None], pt_parallel, pt_general)
        dgap = dirs - dirs[i]
        dlen = jnp.sqrt(jnp.maximum(_norm_sq(dgap), 1e-20))
        proj_dirs = dgap / dlen[..., None]

        opt_dir = jnp.stack([-dirs[i, 1], dirs[i, 0]])
        feas_fail = _linear_program2(
            proj_pts, proj_dirs, use_j, radius, opt_dir, True)
        new_result, fail = feas_fail
        # Keep old result if the projected LP itself failed (numerical).
        new_result = jnp.where(fail >= M, new_result, result)
        result = jnp.where(act, new_result, result)
        new_distance = _det(dirs[i], pts[i] - result)
        distance = jnp.where(act, new_distance, distance)
        return result, distance

    result, _ = jax.lax.fori_loop(0, M, body, (result, jnp.asarray(0.0)))
    return result


def orca_velocity(
    p_i: Array, v_i: Array, r_i: Array, pref_vel: Array, max_speed: Array,
    p_j: Array, v_j: Array, r_j: Array, valid: Array,
    params: ORCAParams,
) -> Array:
    """New velocity for one agent given M (masked) neighbors."""
    pts, dirs, line_valid = orca_lines(
        p_i, v_i, r_i + params.safety_space,
        p_j, v_j, r_j + params.safety_space, valid, params)
    result, fail = _linear_program2(
        pts, dirs, line_valid, max_speed, pref_vel, False)
    M = pts.shape[0]
    result = jnp.where(
        fail < M,
        _linear_program3(pts, dirs, line_valid, fail, max_speed, result),
        result,
    )
    return result


def centralized_orca_step(
    positions: Array, velocities: Array, radii: Array,
    pref_vels: Array, max_speeds: Array, active: Array,
    params: ORCAParams,
) -> Array:
    """One synchronous ORCA update for n agents (parity:
    ``CentralizedORCA`` — one RVO2 sim steps ALL humans per env step).

    positions/velocities/pref_vels [n, 2]; radii/max_speeds/active [n].
    Inactive agents keep zero velocity and are invisible to others.
    Vectorized with vmap over agents; jit/vmap-able over env batches.
    """
    n = positions.shape[0]
    eye = jnp.eye(n, dtype=bool)

    def one_agent(i):
        valid = active & ~eye[i]
        return orca_velocity(
            positions[i], velocities[i], radii[i], pref_vels[i], max_speeds[i],
            positions, velocities, radii, valid, params)

    new_v = jax.vmap(one_agent)(jnp.arange(n))
    return jnp.where(active[..., None], new_v, jnp.zeros_like(new_v))


def centralized_orca_step_knn(
    positions: Array, velocities: Array, radii: Array,
    pref_vels: Array, max_speeds: Array, active: Array,
    params: ORCAParams, max_neighbors: int = 10,
    cols: Array | None = None,
) -> Array:
    """Large-crowd variant: each agent builds ORCA lines only against its
    ``max_neighbors`` nearest agents (RVO2's ``maxNeighbors=10`` semantics —
    the all-pairs ``centralized_orca_step`` is exact for small crowds but
    O(n²) lines; this is O(n·K), making 10k+-agent synthetic crowds
    steppable on device).

    Pass ``cols`` [n, K] to reuse a precomputed neighbor graph — the
    amortized-rebuild path for huge crowds, where graph construction
    dominates the step (PERF.md). A graph R steps stale mis-ranks
    neighbors by at most 2·v_max·Δt·R of relative displacement; ORCA
    avoidance itself still uses the CURRENT positions/velocities of the
    listed neighbors, so the approximation is in neighbor selection only
    (RVO2's own maxNeighbors cutoff is the same kind of truncation)."""
    from relationalgraphlearning_tpu.ops.sparse import knn_graph_auto

    if cols is None:
        # exact O(n²) kNN for small crowds, spatial-hash grid above ~10k
        cols = knn_graph_auto(positions, max_neighbors, valid=active)

    def one_agent(i):
        idx = cols[i]
        valid = active[idx] & (idx != i)
        return orca_velocity(
            positions[i], velocities[i], radii[i], pref_vels[i],
            max_speeds[i], positions[idx], velocities[idx], radii[idx],
            valid, params)

    n = positions.shape[0]
    new_v = jax.vmap(one_agent)(jnp.arange(n))
    return jnp.where(active[..., None], new_v, jnp.zeros_like(new_v))
