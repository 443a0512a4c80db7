"""Weak-scaling measurement of the node-partitioned sparse aggregation on a
virtual CPU device mesh (D = 1/2/4/8).

Single-chip hardware only in this environment (BASELINE.md), so these are
CORRECTNESS + PLUMBING numbers — every collective (ppermute ring,
all_gather) executes for real over the virtual mesh, but CPU "devices" share
one socket, so efficiency is NOT a TPU ICI prediction. The per-shard problem
size is fixed (weak scaling): n = n_per_shard · D.

Prints one JSON line per (method, D).
"""

import json
import time

import jax
import jax.numpy as jnp


def measure(method: str, n_devices: int, n_per_shard: int = 2048,
            K: int = 16, inner: int = 8, reps: int = 3) -> float:
    from relationalgraphlearning_tpu.configs.base import GCNConfig
    from relationalgraphlearning_tpu.models.sparse_rgl import SparseRGL
    from relationalgraphlearning_tpu.ops import block_graph
    from relationalgraphlearning_tpu.ops.sparse import knn_graph
    from relationalgraphlearning_tpu.parallel.graph_partition import (
        halo_reach, partitioned_block_rgl, partitioned_sparse_rgl)
    from relationalgraphlearning_tpu.parallel.mesh import make_mesh

    cfg = GCNConfig()
    mesh = make_mesh(data=n_devices, model=1,
                     devices=jax.devices()[:n_devices])
    n = n_per_shard * n_devices
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (n, 2)) * 100.0
    if method == "block_halo":
        pos = pos[block_graph.spatial_sort(pos)]
    states = jnp.concatenate(
        [pos, jnp.zeros((n, 2)), 0.3 * jnp.ones((n, 1))], axis=-1)
    cols = knn_graph(pos, K)
    params = SparseRGL(cfg).init(jax.random.PRNGKey(1), states, cols)

    if method == "block_halo":
        # the windowed dense MXU path, node-partitioned with halo exchange
        # (r4): B chosen so every shard holds whole blocks at D=1..8
        B, C = 128, 448
        cand, cov = block_graph.block_window(cols, B, C)
        assert float(cov) == 1.0, float(cov)
        emask = block_graph.block_masks(cols, cand)
        halo = max(8, -(-halo_reach(cand, B, n // n_devices) // 8) * 8)
        assert halo < n // n_devices, halo

        @jax.jit
        def run(params, states, cand, emask):
            def body(s, _):
                h = partitioned_block_rgl(
                    params, cfg, s, cand, emask, mesh, halo=halo)
                return s.at[:, 2:4].set(h[:, :2] * 1e-6), None

            s, _ = jax.lax.scan(body, states, None, inner)
            return s

        run_args = (params, states, cand, emask)
    else:

        @jax.jit
        def run(params, states, cols):
            def body(s, _):
                h = partitioned_sparse_rgl(
                    params, cfg, s, cols, mesh, method=method)
                # re-inject so `inner` forwards chain without host round-trips
                return s.at[:, 2:4].set(h[:, :2] * 1e-6), None

            s, _ = jax.lax.scan(body, states, None, inner)
            return s

        run_args = (params, states, cols)

    from relationalgraphlearning_tpu.utils.sync import force

    with mesh:
        out = run(*run_args)
        force(out)  # fetch-based barrier (see utils/sync.py)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(*run_args)
        force(out)
        dt = (time.perf_counter() - t0) / reps
    # num_layer aggregation passes per forward
    return n * K * inner * cfg.num_layer / dt


def measure_mega(n_devices: int, n_per_shard: int = 2048, steps: int = 16,
                 rebuild_every: int = 8, reps: int = 3) -> float:
    """End-to-end partitioned mega-crowd step (r5): graph construction +
    ORCA + block-RGL values, everything inside one shard_map
    (parallel/partitioned_build.py). Weak scaling: n = n_per_shard · D."""
    from relationalgraphlearning_tpu.configs.base import GCNConfig
    from relationalgraphlearning_tpu.envs.orca import ORCAParams
    from relationalgraphlearning_tpu.models.sparse_rgl import SparseValueNet
    from relationalgraphlearning_tpu.ops.sparse import knn_graph_auto
    from relationalgraphlearning_tpu.parallel.mesh import make_mesh
    from relationalgraphlearning_tpu.parallel.partitioned_build import (
        BandSpec, init_crowd_shards, partitioned_mega_rollout)
    from relationalgraphlearning_tpu.utils.sync import force

    D = n_devices
    n = n_per_shard * D
    mesh = make_mesh(data=D, model=1, devices=jax.devices()[:D])
    # density-matched domain (~0.256 agents/m^2, the mega_crowd default)
    half = 100.0 * (n / 10240.0) ** 0.5
    key = jax.random.PRNGKey(0)
    pos = jax.random.uniform(key, (n, 2), minval=-half, maxval=half)
    n_cap = -(-int(n_per_shard * 1.3) // 128) * 128
    spec = BandSpec(D=D, n_cap=n_cap, x0=-half, band_w=2 * half / D,
                    y0=-half, cell=2 * half / 64, grid_w=256, B=128, C=512,
                    K=16, K_orca=10, mig_cap=max(64, n_per_shard // 8))
    gcn = GCNConfig()
    net = SparseValueNet(gcn, backend="block")
    cols0 = knn_graph_auto(pos, 16)
    st0 = jnp.concatenate(
        [pos, jnp.zeros((n, 2)), 0.3 * jnp.ones((n, 1))], -1)
    params = SparseValueNet(gcn, backend="gather").init(
        jax.random.PRNGKey(1), st0, cols0)
    shards = init_crowd_shards(
        pos, jnp.zeros((n, 2)), -pos, jnp.full((n,), 0.3), jnp.ones((n,)),
        spec)
    run = jax.jit(partitioned_mega_rollout(
        mesh, spec, net, params, ORCAParams(), steps, rebuild_every))
    with mesh:
        sh2, diag = run(shards)
        force(diag["vmean"])
        cov = (float(diag["band_cov"]), float(diag["win_cov"]))
        t0 = time.perf_counter()
        for _ in range(reps):
            sh2, diag = run(shards)
        force(diag["vmean"])
        dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "metric": f"partitioned mega-crowd agent-steps/s (D={n_devices}, "
                  f"n={n}, R={rebuild_every}, weak)",
        "value": round(n * steps / dt, 1), "unit": "agent-steps/s",
        "band_cov": cov[0], "win_cov": cov[1],
        "note": "virtual CPU mesh — plumbing, not TPU perf",
    }))
    return n * steps / dt


def main():
    import sys

    if "--mega" in sys.argv:
        for d in (1, 2, 4, 8):
            if d > len(jax.devices()):
                break
            measure_mega(d)
        return
    results = {}
    for method in ("ring", "allgather", "block_halo"):
        base = None
        for d in (1, 2, 4, 8):
            if d > len(jax.devices()):
                break
            e = measure(method, d)
            base = base or e
            eff = e / (base * d)
            results[(method, d)] = e
            print(json.dumps({
                "metric": f"partitioned edges/s ({method}, D={d}, weak)",
                "value": round(e / 1e6, 2), "unit": "Medges/s",
                "scaling_efficiency_vs_D1": round(eff, 3),
                "note": "virtual CPU mesh — plumbing, not TPU perf",
            }))


if __name__ == "__main__":
    import os

    os.environ.setdefault(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    jax.config.update("jax_platforms", "cpu")
    main()
