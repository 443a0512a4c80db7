"""Distributed graph CONSTRUCTION + the multi-chip amortized mega-crowd step.

Closes VERDICT r4 missing #2/#3: every r4 partitioned path consumed
globally-built artifacts (global spatial sort, global kNN, global windows/
masks — a single-device O(n) serial fraction and memory wall at pod scale),
and the flagship amortized mega-crowd rollout (grid kNN + ORCA-kNN +
SparseRGL, rebuild cadence R — PERF.md) had no multi-chip form at all. Here
the ENTIRE pipeline — band partition, migration, spatial sort, kNN,
candidate windows, bitpacked masks, ORCA avoidance, block-RGL values — runs
inside one ``shard_map`` over the mesh's data axis, with fixed shapes and
only ring-neighbor ``ppermute`` collectives (no all_gather, no host
callbacks, no data-dependent shapes):

- **Band partition.** Space splits into D contiguous bands along x (the
  spatial-sort raster's major axis); shard s owns a fixed-capacity slab of
  ``n_cap`` agent slots (``active`` mask) for agents in band s. Global node
  id = shard·n_cap + slot — the same contiguous-rows-per-shard layout
  ``block_halo_attention`` already assumes.
- **Migration** (per rebuild): agents whose x crossed a band edge move to
  the adjacent shard via two fixed-capacity ``ppermute`` buffers (agents
  move ≤ v_max·Δt·R per chunk ≪ band width, so only adjacent-band motion is
  possible; the overflow/lost counters make any violation loud).
- **Local sort + build** (per rebuild): each shard sorts its slab by global
  grid-cell key (actives first), exchanges the FULL adjacent slabs (one
  ring hop each way — O(n_cap·d) bytes, D-independent, vs the allgather's
  O(n·d)), and computes exact kNN, block candidate windows (global ids,
  sentinel D·n_cap) and bitpacked edge masks over the 3·n_cap-row extended
  table. Exactness is guarded by two TRACED checks returned to the host
  (VERDICT r4 weak #7 — no host-numpy ``halo_reach`` in the loop):
  ``band_cov`` (fraction of agents whose k-th-neighbor radius fits inside
  the adjacent-band reach) and ``win_cov`` (windows hold all edges).
- **Step** (×R per rebuild): refresh adjacent-slab positions/velocities
  (2 ppermutes), run the masked-LP ORCA against the kNN columns, integrate,
  and evaluate the SparseRGL value net through ``block_halo_attention`` with
  ``halo = n_cap`` (the full-adjacent-slab exchange) and the fused Pallas
  kernel on the bitpacked masks.

Reference anchor: the reference has no distributed anything (SURVEY.md
§2.6); this is the graph analogue of sequence parallelism applied to the
reference's CentralizedORCA + RGL stack at BASELINE config-#5 scale.
Exactness vs the single-device program is tested in
``tests/test_partitioned_build.py``; the multi-chip dryrun drives it end to
end; ``bench_scaling.py --mega`` measures it on the virtual mesh.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from relationalgraphlearning_tpu.envs.orca import ORCAParams, orca_velocity
from relationalgraphlearning_tpu.ops import block_graph
from relationalgraphlearning_tpu.ops.pallas_block import pack_emask
from relationalgraphlearning_tpu.parallel.graph_partition import (
    block_halo_attention, halo_exchange)

_BIGKEY = jnp.int32(2 ** 30)


class CrowdShards(NamedTuple):
    """Per-agent state in the banded slab layout: arrays [D·n_cap, ...]
    (row-sharded over the mesh's data axis). ``aid`` is the original agent
    id (-1 in empty slots) — identity survives migration and sorting, which
    is what the exactness tests match on."""

    pos: Array    # [n, 2]
    vel: Array    # [n, 2]
    goal: Array   # [n, 2]
    rad: Array    # [n]
    vmax: Array   # [n]
    active: Array  # [n] bool
    aid: Array    # [n] int32


@dataclasses.dataclass(frozen=True)
class BandSpec:
    """Static geometry of the partition (all jit-static).

    Bands: shard s owns x ∈ [x0 + s·band_w, x0 + (s+1)·band_w). The cell
    raster (``cell``, ``grid_w``) is GLOBAL so per-shard sorts agree with a
    global sort; ``grid_w`` must exceed the domain's cell-row width.
    """

    D: int          # shards (mesh data-axis size)
    n_cap: int      # slots per shard (multiple of B)
    x0: float
    band_w: float
    y0: float
    cell: float     # sort/grid cell size
    grid_w: int     # cell-key row stride (> domain height / cell)
    B: int          # block rows
    C: int          # candidate window
    K: int          # kNN degree built (>= both consumers below)
    K_orca: int     # ORCA neighbor count (first K_orca of the K)
    mig_cap: int    # migration buffer slots per direction
    dt: float = 0.25
    # spatial-hash kNN inside shards instead of the dense distance matrix
    # (exact when cell ≥ the k-th-neighbor distance and cells hold
    # ≤ grid_max_per_cell agents — same contract as knn_graph_grid)
    grid_knn: bool = False
    grid_max_per_cell: int = 32


def init_crowd_shards(pos, vel, goal, rad, vmax, spec: BandSpec
                      ) -> CrowdShards:
    """Host-side setup: place n agents into the banded slab layout.

    Raises if any band exceeds ``n_cap`` (size the capacity with slack —
    migration keeps it balanced afterwards only up to crowd drift)."""
    pos = np.asarray(pos)
    n = pos.shape[0]
    band = np.clip(((pos[:, 0] - spec.x0) // spec.band_w).astype(np.int64),
                   0, spec.D - 1)
    counts = np.bincount(band, minlength=spec.D)
    if counts.max() > spec.n_cap:
        raise ValueError(
            f"band occupancy {counts.max()} > n_cap={spec.n_cap}; "
            f"counts={counts.tolist()}")
    rows = spec.D * spec.n_cap
    out = {
        "pos": np.zeros((rows, 2), np.float32),
        "vel": np.zeros((rows, 2), np.float32),
        "goal": np.zeros((rows, 2), np.float32),
        "rad": np.zeros((rows,), np.float32),
        "vmax": np.zeros((rows,), np.float32),
        "active": np.zeros((rows,), bool),
        "aid": np.full((rows,), -1, np.int32),
    }
    src = {"pos": pos, "vel": np.asarray(vel), "goal": np.asarray(goal),
           "rad": np.asarray(rad), "vmax": np.asarray(vmax),
           "aid": np.arange(n, dtype=np.int32)}
    for s in range(spec.D):
        sel = np.nonzero(band == s)[0]
        sl = slice(s * spec.n_cap, s * spec.n_cap + len(sel))
        for k, v in src.items():
            out[k][sl] = v[sel]
        out["active"][sl] = True
    return CrowdShards(**{k: jnp.asarray(v) for k, v in out.items()})


# ----------------------------------------------------------- shard-local ops
def _dest_band(x: Array, spec: BandSpec) -> Array:
    return jnp.clip(((x - spec.x0) // spec.band_w).astype(jnp.int32),
                    0, spec.D - 1)


def _migrate(sh: CrowdShards, spec: BandSpec, axis: str):
    """Adjacent-band migration via two fixed-capacity ppermute buffers.

    Returns (shards', stats) with traced ``overflow`` (agents that wanted to
    move but didn't fit the buffer — they STAY, graph quality degrades
    loudly via band_cov) and ``lost`` (received agents with no free slot —
    deactivated; must be 0, sized by capacity slack)."""
    me = jax.lax.axis_index(axis)
    D, M, n_cap = spec.D, spec.mig_cap, spec.n_cap
    dest = jnp.where(sh.active, _dest_band(sh.pos[:, 0], spec), me)

    def send(dirn: int):
        want = sh.active & (dest == me + dirn)
        order = jnp.argsort(~want)          # stable: senders first
        take = order[:M]
        took = want[take]                   # True for real migrants
        overflow = jnp.sum(want) - jnp.sum(took)
        sent = jnp.zeros((n_cap,), bool).at[take].set(took)
        perm = [(i, (i + dirn) % D) for i in range(D)]
        buf = jax.tree.map(
            lambda a: jax.lax.ppermute(a[take], axis, perm), sh)
        rvalid = jax.lax.ppermute(took, axis, perm)
        # the ring wraps; bands don't: a migrant can't arrive from across
        # the wrap (dest is clipped to [0, D-1] so edge shards never send
        # outward) — rvalid is already all-False there.
        return buf, rvalid, sent, overflow

    buf_l, rv_l, sent_l, ov_l = send(-1)
    buf_r, rv_r, sent_r, ov_r = send(+1)
    active = sh.active & ~sent_l & ~sent_r

    # merge the ≤2M received rows into free slots (valid-first compaction)
    buf = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), buf_l, buf_r)
    rvalid = jnp.concatenate([rv_l, rv_r])
    ordv = jnp.argsort(~rvalid)
    buf = jax.tree.map(lambda a: a[ordv], buf)
    rvalid = rvalid[ordv]
    free_order = jnp.argsort(active)        # free slots first
    slot = free_order[: 2 * M]
    ok = rvalid & (jnp.arange(2 * M) < jnp.sum(~active))
    lost = jnp.sum(rvalid) - jnp.sum(ok)

    def place(cur, new):
        okb = ok.reshape((-1,) + (1,) * (new.ndim - 1))
        return cur.at[slot].set(jnp.where(okb, new, cur[slot]))

    merged = CrowdShards(*(place(c, n) for c, n in zip(sh, buf)))
    active = active | jnp.zeros((n_cap,), bool).at[slot].set(ok)
    merged = merged._replace(active=active)
    stats = {"overflow": ov_l + ov_r, "lost": lost}
    return merged, stats


def _local_sort(sh: CrowdShards, spec: BandSpec) -> CrowdShards:
    """Sort the slab by the GLOBAL grid-cell key (actives first) — the same
    row-major raster ``block_graph.spatial_sort`` uses, so concatenated
    shard orders ARE a global spatial order (band edges align with cell
    rows when band_w is a multiple of cell)."""
    ij = jnp.floor(
        (sh.pos - jnp.asarray([spec.x0, spec.y0])) / spec.cell
    ).astype(jnp.int32)
    key = ij[:, 0] * spec.grid_w + ij[:, 1]
    key = jnp.where(sh.active, key, _BIGKEY)
    order = jnp.argsort(key)
    return jax.tree.map(lambda a: a[order], sh)


def _build_graph(sh: CrowdShards, spec: BandSpec, axis: str):
    """Per-shard kNN + block windows + bitpacked masks over the extended
    (3·n_cap) table; returns traced coverage diagnostics instead of host
    asserts (VERDICT r4 weak #7)."""
    me = jax.lax.axis_index(axis)
    n_cap, K = spec.n_cap, spec.K
    pos_ext = halo_exchange(sh.pos, axis, n_cap)      # [3n_cap, 2]
    act_ext = halo_exchange(sh.active, axis, n_cap)
    rad_ext = halo_exchange(sh.rad, axis, n_cap)
    vmax_ext = halo_exchange(sh.vmax, axis, n_cap)
    strip_ok = jnp.concatenate([
        jnp.full((n_cap,), me > 0),
        jnp.ones((n_cap,), bool),
        jnp.full((n_cap,), me < spec.D - 1)])         # non-periodic bands
    act_ext = act_ext & strip_ok

    if spec.grid_knn:
        # spatial-hash kNN over the extended table — O(n_cap·9C) instead
        # of the O(n_cap·3n_cap) dense distance matrix + top_k that
        # dominates the build at scale (PERF.md r5 on-chip D=1 row).
        # Exact under the usual grid conditions (cell ≥ k-th-neighbor
        # distance, ≤ max_per_cell nodes/cell); only the middle band's
        # rows are consumed. Self-exclusion is exact: the local copy
        # appears once in the extended table.
        from relationalgraphlearning_tpu.ops.sparse import knn_graph_grid

        # inactive slots sit at (0, 0) and would flood the origin cell
        # past max_per_cell, crowding REAL agents out of its candidate
        # list — park them in one far (but bounded — cell ids must not
        # overflow) corner cell instead; ``valid`` already excludes them
        # as neighbors.
        far = jnp.max(jnp.where(act_ext[:, None], pos_ext, -jnp.inf),
                      axis=0) + 10.0 * spec.cell
        posg = jnp.where(act_ext[:, None], pos_ext, far)
        eidx_all = knn_graph_grid(posg, K, spec.cell,
                                  max_per_cell=spec.grid_max_per_cell,
                                  valid=act_ext)
        eidx = eidx_all[n_cap:2 * n_cap]
        d2k = jnp.sum(
            (sh.pos[:, None, :] - pos_ext[eidx]) ** 2, axis=-1)
        me_ext = n_cap + jnp.arange(n_cap)
        colvalid = (act_ext[eidx] & (eidx != me_ext[:, None])
                    & sh.active[:, None])
        negd = jnp.where(colvalid, -d2k, -jnp.inf)
    else:
        d2 = jnp.sum(
            (sh.pos[:, None, :] - pos_ext[None, :, :]) ** 2, axis=-1)
        d2 = jnp.where(act_ext[None, :], d2, jnp.inf)
        is_self = (jnp.arange(3 * n_cap)[None, :]
                   == (n_cap + jnp.arange(n_cap))[:, None])
        d2 = jnp.where(is_self, jnp.inf, d2)
        negd, eidx = jax.lax.top_k(-d2, K)            # ascending distance
        colvalid = jnp.isfinite(negd) & sh.active[:, None]

    own_gid = me * n_cap + jnp.arange(n_cap, dtype=jnp.int32)
    gid = (me - 1) * n_cap + eidx                     # ext idx → global id
    cols = jnp.where(colvalid, gid, own_gid[:, None])

    # band-reach coverage: the k-th-neighbor radius must fit inside the
    # extended region, else a true neighbor could hide two bands away
    kth = jnp.sqrt(jnp.where(colvalid[:, -1], -negd[:, -1], 0.0))
    lo = jnp.where(me == 0, -jnp.inf, spec.x0 + (me - 1) * spec.band_w)
    hi = jnp.where(me == spec.D - 1, jnp.inf,
                   spec.x0 + (me + 2) * spec.band_w)
    margin = jnp.minimum(sh.pos[:, 0] - lo, hi - sh.pos[:, 0])
    okb = (kth <= margin) | ~sh.active
    n_act = jnp.maximum(jax.lax.psum(jnp.sum(sh.active), axis), 1)
    band_cov = jax.lax.psum(
        jnp.sum(jnp.where(sh.active, okb, False)), axis) / n_act

    cand, win_cov = block_graph.block_window(
        cols, spec.B, spec.C, sentinel=spec.D * n_cap)
    mbits = pack_emask(block_graph.block_masks(cols, cand, mask=colvalid))
    win_cov = jax.lax.pmean(win_cov, axis)
    return eidx, colvalid, cand, mbits, rad_ext, vmax_ext, act_ext, \
        band_cov, win_cov


def _orca_step(pos, vel, sh, eidx, colvalid, pos_ext, vel_ext, rad_ext,
               params: ORCAParams, K_orca: int):
    """Masked-LP ORCA for the local slab against the extended table."""
    idx = eidx[:, :K_orca]
    valid = colvalid[:, :K_orca]
    to = sh.goal - pos
    d = jnp.linalg.norm(to, axis=-1, keepdims=True)
    pref = jnp.where(d > 1e-3, to / jnp.maximum(d, 1e-9), 0.0)

    def one(i):
        j = idx[i]
        return orca_velocity(
            pos[i], vel[i], sh.rad[i], pref[i], sh.vmax[i],
            pos_ext[j], vel_ext[j], rad_ext[j], valid[i], params)

    new_v = jax.vmap(one)(jnp.arange(pos.shape[0]))
    return jnp.where(sh.active[:, None], new_v, 0.0)


def _value_net_fullshard(net, net_params, states, cand, mbits, axis):
    """SparseValueNet forward with the aggregation through the full-
    adjacent-slab halo (halo = n_cap) — per-layer feature exchange is two
    ppermutes of the slab, O(n_cap·d) bytes on the ICI ring."""
    cfg = net.gcn
    gp = {"params": net_params["params"]["graph_model"]}
    from relationalgraphlearning_tpu.models.sparse_rgl import SparseRGL

    gm = SparseRGL(cfg)

    def apply_sub(name, xx):
        return gm.apply(gp, xx, method=lambda m, a: getattr(m, name)(a))

    n_cap = states.shape[0]
    H = apply_sub("w_h", states)
    for li in range(cfg.num_layer):
        q = apply_sub("w_a", H)
        out = block_halo_attention(q, H, H, cand, mbits, axis, halo=n_cap)
        H = jax.nn.relu(
            out @ gp["params"][f"gcn_w{li+1}"]["kernel"])
    from relationalgraphlearning_tpu.models.mlp import MLP

    head = MLP(net.value_dims)
    return head.apply(
        {"params": net_params["params"]["value_network"]}, H)[..., 0]


# ------------------------------------------------------------- the rollout
def partitioned_mega_rollout(mesh: Mesh, spec: BandSpec, net, net_params,
                             orca_params: ORCAParams, steps: int,
                             rebuild_every: int, axis: str = "data"):
    """jit-able end-to-end partitioned mega-crowd rollout.

    ``net`` is a ``SparseValueNet`` (block backend semantics); returns a
    function ``CrowdShards -> (CrowdShards, diag)`` where ``diag`` carries
    the traced exactness/health signals (min band/window coverage over
    chunks, migration overflow/lost totals, mean value per chunk). The
    whole thing is ONE device program: scan over chunks, inner scan over
    the R steps of each chunk.
    """
    assert steps % rebuild_every == 0, (steps, rebuild_every)

    def sharded(net_params, sh: CrowdShards):
        def chunk(carry, _):
            sh = carry
            sh, mig = _migrate(sh, spec, axis)
            sh = _local_sort(sh, spec)
            (eidx, colvalid, cand, mbits, rad_ext, vmax_ext, act_ext,
             band_cov, win_cov) = _build_graph(sh, spec, axis)
            del vmax_ext, act_ext

            def body(inner, _):
                pos, vel = inner
                pos_ext = halo_exchange(pos, axis, spec.n_cap)
                vel_ext = halo_exchange(vel, axis, spec.n_cap)
                new_v = _orca_step(pos, vel, sh, eidx, colvalid, pos_ext,
                                   vel_ext, rad_ext, orca_params,
                                   spec.K_orca)
                new_pos = pos + new_v * spec.dt
                states = jnp.concatenate(
                    [new_pos, new_v, sh.rad[:, None]], axis=-1)
                vals = _value_net_fullshard(
                    net, net_params, states, cand, mbits, axis)
                n_act = jnp.maximum(
                    jax.lax.psum(jnp.sum(sh.active), axis), 1)
                vmean = jax.lax.psum(
                    jnp.sum(jnp.where(sh.active, vals, 0.0)), axis) / n_act
                return (new_pos, new_v), vmean

            (pos, vel), vmeans = jax.lax.scan(
                body, (sh.pos, sh.vel), None, rebuild_every)
            sh = sh._replace(pos=pos, vel=vel)
            diag = {"band_cov": band_cov, "win_cov": win_cov,
                    "overflow": jax.lax.psum(mig["overflow"], axis),
                    "lost": jax.lax.psum(mig["lost"], axis),
                    "vmean": jnp.mean(vmeans)}
            return sh, diag

        sh, diags = jax.lax.scan(chunk, sh, None, steps // rebuild_every)
        return sh, diags

    row = P(axis)
    specs = CrowdShards(*([row] * len(CrowdShards._fields)))
    fn = shard_map(sharded, mesh=mesh,
                   in_specs=(P(), specs), out_specs=(specs, P()),
                   check_vma=False)

    def run(sh: CrowdShards):
        sh, diags = fn(net_params, sh)
        diag = {"band_cov": jnp.min(diags["band_cov"]),
                "win_cov": jnp.min(diags["win_cov"]),
                "overflow": jnp.sum(diags["overflow"]),
                "lost": jnp.sum(diags["lost"]),
                "vmean": jnp.mean(diags["vmean"])}
        return sh, diag

    return run
