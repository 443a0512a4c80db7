"""Extended benchmarks (beyond bench.py's headline env-steps/s):

- planning decisions/s: full d-step MP-RGL decisions (action clip + tree
  expansion + value backup) in the real env loop;
- relation edges/s: fused SDDMM→softmax→SpMM over k-NN crowds (BASELINE
  SpMM/SDDMM gate), XLA path;
- per-decision latency: single-state planning latency (reference's
  per-decision cost analogue, SURVEY.md §3.3).

Prints one JSON line per metric. Run manually; results are recorded in
PERF.md.
"""

import json
import time

import jax
import jax.numpy as jnp

from relationalgraphlearning_tpu.utils import compile_cache
from relationalgraphlearning_tpu.utils.sync import force

compile_cache.enable()


def _timeit(fn, *args, reps=20, trials=3):
    """Median of ``trials`` timed regions of ``reps`` dispatches each.

    reps amortizes the ~20 ms fetch RTT; the median guards against the
    tunnel's bursty external contention (r5: a single-trial region once
    printed 0.06 Gedges/s for a chain that re-measures at 1.95 ×3)."""
    import statistics

    out = fn(*args)
    force(out)  # block_until_ready lies on the tunnel — fetch to sync
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        force(out)  # in-order TPU stream: last value implies reps done
        ts.append((time.perf_counter() - t0) / reps)
    return statistics.median(ts)


def planning_throughput(batch=64, steps=32):
    from relationalgraphlearning_tpu.configs.base import (
        EnvConfig, MPRLConfig, PolicyConfig)
    from relationalgraphlearning_tpu.envs.crowd_sim import CrowdSim
    from relationalgraphlearning_tpu.policies import make_policy
    from relationalgraphlearning_tpu.training.explorer import Explorer

    cfg = EnvConfig(human_policy="orca")
    pcfg = PolicyConfig(mprl=MPRLConfig(planning_depth=2, planning_width=2))
    policy = make_policy("model_predictive_rl", pcfg, cfg)
    params = policy.init_params(jax.random.PRNGKey(0))
    ex = Explorer(CrowdSim(cfg), policy, pcfg.gamma)

    collect = jax.jit(lambda p, c: ex.collect(
        p, c, steps, jnp.asarray(0.0), 0))
    carry = ex.init_carry(batch, 0, jax.random.PRNGKey(1))
    dt = _timeit(lambda p, c: collect(p, c)[1].reward, params, carry, reps=5)
    decisions = batch * steps / dt

    # per-decision latency (single state, jitted planner alone)
    from relationalgraphlearning_tpu import types as T

    js = T.JointState(carry.env_states.robot[0],
                      T.observable(carry.env_states.humans[0]))
    pred = jax.jit(lambda p, s: policy.predict(
        p, s, jax.random.PRNGKey(0), jnp.asarray(0.0)))
    lat = _timeit(pred, params, js, reps=50)
    return decisions, lat


def edges_throughput(n=8192, K=16, d=64, inner=100):
    """``inner`` chained applications inside ONE jitted scan so device time,
    not per-dispatch tunnel latency, is measured.

    The WHOLE chain is loop-carried (q = x = v = previous iteration's
    output, as stacked SparseRGL layers see it), so XLA's while-loop
    invariant code motion cannot hoist the SDDMM/softmax out of the loop and
    time only the SpMM — that hoisting inflated the r2 number (ADVICE.md).
    """
    from relationalgraphlearning_tpu.ops import sparse

    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    h0 = jax.random.normal(ks[0], (n, d))
    cols = sparse.knn_graph(jax.random.uniform(ks[1], (n, 2)) * 100, K)
    mask = jnp.ones((n, K), bool)

    @jax.jit
    def f(h, cols, mask):
        def body(h, _):
            s = sparse.sddmm_fixed_k(h, h, cols, mask)
            a = sparse.neighbor_softmax(s, mask)
            h = sparse.spmm_fixed_k(a, h, cols)
            # row-normalize: keeps the carried features bounded over
            # ``inner`` iterations (cost ~1/K of the chain — negligible)
            return h / jnp.maximum(
                jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-6), None

        h, _ = jax.lax.scan(body, h, None, inner)
        return h

    dt = _timeit(f, h0, cols, mask, reps=30)  # amortize tunnel RTT
    return n * K * inner / dt


def edges_throughput_block(n=8192, K=16, d=64, inner=100, B=256, C=544,
                           backend="pallas"):
    """Same chain, same loop-carried protocol, but through the windowed dense
    MXU path: per-block masked dense attention instead of per-edge gathers.
    cols/cand/mask are graph-static (legitimately amortized across layers,
    like cols in the gather path); the carried feature chain itself cannot
    be hoisted.

    ``backend='pallas'`` (default, the production path since r4) runs the
    fused kernel with bitpacked masks, fused l2norm epilogue, and the
    unshifted softmax (inputs are row-normalized ⇒ |scores| ≤ 1); the
    B=256/C=544 shape is the fastest EXACT-coverage configuration of the
    r4 sweep (tools/sweep_block.py + sweep_extra: 2.0 Gedges/s; C=512
    reaches 2.37 but drops 0.027% of edges on this graph). ``backend='xla'`` keeps the r3 XLA composition for
    comparison.
    """
    from relationalgraphlearning_tpu.ops import block_graph, pallas_block, \
        sparse

    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    pos = jax.random.uniform(ks[1], (n, 2)) * 100
    pos = pos[block_graph.spatial_sort(pos)]
    cols = sparse.knn_graph(pos, K)
    cand, cov = block_graph.block_window(cols, B, C)
    emask = block_graph.block_masks(cols, cand)  # graph-static, built once
    h0 = jax.random.normal(ks[0], (n, d))
    # row-normalize the seed features: every iteration (including the first)
    # must satisfy the unshifted-softmax precondition |scores| <= 1 that
    # stable=False below relies on (ADVICE r4 #2)
    h0 = h0 / jnp.maximum(jnp.linalg.norm(h0, axis=-1, keepdims=True), 1e-6)

    if backend == "chunk":
        # r5 flagship: in-kernel chunk DMA + tail gather (ops/pallas_chunk)
        from relationalgraphlearning_tpu.ops.pallas_chunk import (
            chunk_block_attention, chunk_window)

        starts, tail, cmbits, ccov = chunk_window(cols, B)

        @jax.jit
        def f(h, starts, tail, cmbits):
            def body(h, _):
                out = chunk_block_attention(
                    h, h, starts, tail, cmbits, epilogue="l2norm",
                    stable=False)
                return out, None

            h, _ = jax.lax.scan(body, h, None, inner)
            return h

        dt = _timeit(f, h0, starts, tail, cmbits, reps=30)
        return n * K * inner / dt, float(ccov)

    if backend == "pallas":
        mbits = pallas_block.pack_emask(emask)

        @jax.jit
        def f(h, cand, mbits):
            def body(h, _):
                out = pallas_block.block_attention_pallas(
                    h, h, h, cand, mbits, epilogue="l2norm", stable=False)
                return out, None

            h, _ = jax.lax.scan(body, h, None, inner)
            return h

        dt = _timeit(f, h0, cand, mbits, reps=30)  # amortize tunnel RTT
        return n * K * inner / dt, float(cov)

    @jax.jit
    def f(h, cols, cand, emask):
        def body(h, _):
            out = block_graph.block_attention(h, h, h, cols, cand,
                                              emask=emask)
            return out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-6), None

        h, _ = jax.lax.scan(body, h, None, inner)
        return h

    dt = _timeit(f, h0, cols, cand, emask, reps=30)
    return n * K * inner / dt, float(cov)


def mega_crowd(n=10240, K=10, steps=16, side=None, backend="gather",
               block_B=256, block_C=640, rebuild_every=1, packed=False):
    """BASELINE config #5 scale: 10k+-agent synthetic crowd — kNN ORCA step
    + SparseRGL decentralized value inference, one jitted program. Graph
    construction goes through ``knn_graph_auto``: at these sizes the
    spatial-hash grid path replaces the O(n²) distance matrix (the wall at
    n=10⁵). ``backend='block'`` runs the GNN through the windowed dense MXU
    path (ops/block_graph.py; ``packed=True`` additionally bitpacks the
    edge mask, selecting the fused Pallas kernel), the production
    configuration for 10k+ crowds on TPU.

    ``rebuild_every=R`` amortizes graph construction (VERDICT r3 #3): the
    spatial sort, kNN graph, candidate windows and edge masks are rebuilt
    once per R-step chunk and reused (stale) within it. Agents move ≤
    v_max·Δt per step, so after R steps neighbor RANKING is off by at most
    2·v_max·Δt·R = 0.5·R m of relative displacement (~a radius per 2 steps
    at defaults) while avoidance math still reads current positions;
    ``knn_overlap`` in the return measures the actual end-of-chunk graph
    agreement. Returns (agent_steps_per_s, coverage, knn_overlap).
    """
    from relationalgraphlearning_tpu.configs.base import GCNConfig
    from relationalgraphlearning_tpu.envs.orca import (
        ORCAParams, centralized_orca_step_knn)
    from relationalgraphlearning_tpu.models.sparse_rgl import SparseValueNet
    from relationalgraphlearning_tpu.ops import block_graph
    from relationalgraphlearning_tpu.ops.sparse import knn_graph_auto

    assert steps % rebuild_every == 0, (steps, rebuild_every)
    side = side or 200.0 * (n / 10240.0) ** 0.5  # keep crowd density constant
    rng = jax.random.PRNGKey(0)
    pos = jax.random.uniform(rng, (n, 2), minval=-side, maxval=side)
    goals = -pos
    rad = jnp.full((n,), 0.3)
    vmax = jnp.ones((n,))
    act = jnp.ones((n,), bool)
    params_orca = ORCAParams()
    use_block = backend == "block"

    net = SparseValueNet(GCNConfig(), backend=backend)
    states0 = jnp.zeros((n, 5))
    cols0 = knn_graph_auto(pos, 16)
    if use_block:
        cand0, _ = block_graph.block_window(cols0, block_B, block_C)
        em0 = block_graph.block_masks(cols0, cand0)
        if packed:
            from relationalgraphlearning_tpu.ops.pallas_block import pack_emask
            em0 = pack_emask(em0)
    else:
        cand0 = em0 = None
    net_params = net.init(jax.random.PRNGKey(1), states0, cols0,
                          block_cand=cand0, block_emask=em0)

    def rebuild(pos, other):
        """Sort the crowd spatially (block backend) and build the graphs the
        next R steps reuse. ALL per-agent arrays ride the permutation —
        rad/vmax/act are uniform today, but a heterogeneous crowd must not
        silently desync (ADVICE r3 #4)."""
        if use_block:
            perm = block_graph.spatial_sort(pos)
            pos = pos[perm]
            other = jax.tree.map(lambda a: a[perm], other)
        cols_gnn = knn_graph_auto(pos, 16)
        cols_orca = knn_graph_auto(pos, K) if K != 16 else cols_gnn
        if use_block:
            cand, cov = block_graph.block_window(cols_gnn, block_B, block_C)
            em = block_graph.block_masks(cols_gnn, cand)
            if packed:
                from relationalgraphlearning_tpu.ops.pallas_block import (
                    pack_emask)
                em = pack_emask(em)
        else:
            cand = jnp.zeros((1,), jnp.int32)  # scan-carry placeholders
            em = jnp.zeros((1,), jnp.uint32 if packed else bool)
            cov = jnp.asarray(1.0)
        return pos, other, cols_gnn, cols_orca, cand, em, cov

    @jax.jit
    def rollout(pos, vel, goals, rad, vmax, act):
        def chunk(carry, _):
            pos, vel, goals, rad, vmax, act = carry
            pos, (vel, goals, rad, vmax, act), cols_gnn, cols_orca, cand, \
                em, cov = rebuild(pos, (vel, goals, rad, vmax, act))

            def body(inner, _):
                pos, vel, goals = inner
                to = goals - pos
                d = jnp.linalg.norm(to, axis=-1, keepdims=True)
                pref = jnp.where(d > 1e-3, to / jnp.maximum(d, 1e-9), 0.0)
                new_v = centralized_orca_step_knn(
                    pos, vel, rad, pref, vmax, act, params_orca, K,
                    cols=cols_orca)
                new_pos = pos + new_v * 0.25
                states = jnp.concatenate([new_pos, new_v, rad[:, None]], -1)
                vals = net.apply(net_params, states, cols_gnn,
                                 block_cand=cand if use_block else None,
                                 block_emask=em if use_block else None)
                return (new_pos, new_v, goals), jnp.mean(vals)

            (pos, vel, goals), vals = jax.lax.scan(
                body, (pos, vel, goals), None, rebuild_every)
            return (pos, vel, goals, rad, vmax, act), (vals, cov)

        carry, (vals, covs) = jax.lax.scan(
            chunk, (pos, vel, goals, rad, vmax, act), None,
            steps // rebuild_every)
        return carry, vals, jnp.min(covs)

    vel = jnp.zeros((n, 2))
    out = rollout(pos, vel, goals, rad, vmax, act)
    force(out)
    t0 = time.perf_counter()
    (fpos, fvel, *rest), vals, cov = rollout(pos, vel, goals, rad, vmax, act)
    force(vals)
    dt = time.perf_counter() - t0

    # staleness diagnostic: march the final crowd one further chunk on a
    # FROZEN graph, then compare that stale graph against the true kNN of
    # the moved positions — the worst-case end-of-chunk disagreement.
    if rebuild_every > 1:
        fpos = jnp.asarray(fpos)
        stale_cols = knn_graph_auto(fpos, 16)
        moved = fpos + jnp.asarray(fvel) * 0.25 * rebuild_every
        fresh_cols = knn_graph_auto(moved, 16)
        both = jax.vmap(lambda a, b: jnp.isin(b, a).mean())(
            stale_cols, fresh_cols)
        overlap = float(jnp.mean(both))
    else:
        overlap = 1.0
    return n * steps / dt, float(cov), overlap


def main():
    dec, lat = planning_throughput()
    print(json.dumps({"metric": "planning decisions/s (d=2 MP-RGL in env)",
                      "value": round(dec, 1), "unit": "decisions/s",
                      "latency_per_decision_ms": round(lat * 1e3, 3)}))
    e = edges_throughput()
    print(json.dumps({"metric": "relation edges/s (SDDMM+softmax+SpMM)",
                      "value": round(e / 1e9, 2), "unit": "Gedges/s"}))
    ec, cov = edges_throughput_block(backend="chunk")
    print(json.dumps({"metric":
                      "relation edges/s (chunked-fetch pallas kernel)",
                      "value": round(ec / 1e9, 2), "unit": "Gedges/s",
                      "coverage": cov}))
    eb, cov = edges_throughput_block()
    print(json.dumps({"metric":
                      "relation edges/s (block path, fused pallas kernel)",
                      "value": round(eb / 1e9, 2), "unit": "Gedges/s",
                      "coverage": cov}))
    ebx, covx = edges_throughput_block(backend="xla")
    print(json.dumps({"metric": "relation edges/s (block path, XLA)",
                      "value": round(ebx / 1e9, 2), "unit": "Gedges/s",
                      "coverage": covx}))
    m, _, _ = mega_crowd()
    print(json.dumps({"metric": "10k-agent crowd (kNN ORCA + SparseRGL values)",
                      "value": round(m, 1), "unit": "agent-steps/s"}))
    mb, cov, _ = mega_crowd(backend="block")
    print(json.dumps({"metric": "10k-agent crowd (block MXU backend)",
                      "value": round(mb, 1), "unit": "agent-steps/s",
                      "coverage": cov}))
    # amortized rows run block_C=576 — EXACT coverage (r5). The r4 "C=640
    # ~20x slowdown" pathology (docs/sweeps/probe_pathology.log) vanished
    # with the retuned kernel math (divide-after-matmul + sign-smear
    # masks, ops/pallas_block.py) — the r5 sweep (docs/sweeps/
    # pathology_r5.log) shows a smooth C taper with C=576 exact within
    # ~1% of C=512, so the exact shape is the production default.
    ma, cov, ov = mega_crowd(backend="block", packed=True, rebuild_every=8,
                             steps=32, block_C=576)
    print(json.dumps({"metric":
                      "10k-agent crowd (block+pallas, rebuild every 8)",
                      "value": round(ma, 1), "unit": "agent-steps/s",
                      "coverage": cov, "knn_overlap": round(ov, 4)}))
    mg, _, ov = mega_crowd(backend="gather", rebuild_every=8, steps=32)
    print(json.dumps({"metric":
                      "10k-agent crowd (gather, rebuild every 8)",
                      "value": round(mg, 1), "unit": "agent-steps/s",
                      "knn_overlap": round(ov, 4)}))
    m100k, _, _ = mega_crowd(n=102_400)
    print(json.dumps({"metric": "100k-agent crowd (grid kNN + ORCA + SparseRGL)",
                      "value": round(m100k, 1), "unit": "agent-steps/s"}))
    m100kb, cov, _ = mega_crowd(n=102_400, backend="block")
    print(json.dumps({"metric": "100k-agent crowd (block MXU backend)",
                      "value": round(m100kb, 1), "unit": "agent-steps/s",
                      "coverage": cov}))
    m100ka, cov, ov = mega_crowd(n=102_400, backend="block", packed=True,
                                 rebuild_every=8, steps=32, block_C=576)
    print(json.dumps({"metric":
                      "100k-agent crowd (block+pallas, rebuild every 8)",
                      "value": round(m100ka, 1), "unit": "agent-steps/s",
                      "coverage": cov, "knn_overlap": round(ov, 4)}))


if __name__ == "__main__":
    main()
