"""Roofline analysis for the graph hot path (BASELINE gate: "SpMM/SDDMM
edges/s per chip: speed-of-light analysis + measured").

Measures on the attached chip:
  1. empirical ceilings — MXU matmul flops (f32 + bf16), VPU elementwise
     flops, HBM copy bandwidth;
  2. the fused SDDMM→softmax→SpMM chain (XLA path) at benchmark shapes;
  3. optional Pallas path when the Mosaic gate is open.

Speed-of-light argument: at K=16 neighbors the SDDMM/SpMM einsums are
batched length-d matvecs — too small to tile onto the 128×128 MXU, so the
gather path's best case is VPU/HBM-bound. Measured (r3, fetch-synced): the
XLA gather chain lands at ~40% of even the HBM-roundtrip bound (gathered
rows ride HBM through the gather machinery; nothing stays VMEM-resident),
far under the VPU ceiling — which is why the windowed dense MXU path
(ops/block_graph.py) exists: same math, dense per-block matmuls, measured
~3× the gather chain at bench shapes.

Prints one JSON line per measurement; writes docs/ROOFLINE.json.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

from relationalgraphlearning_tpu.utils import compile_cache
from relationalgraphlearning_tpu.utils.sync import force

compile_cache.enable()


def _med_time(fn, *args, reps=10, trials=5):
    import statistics

    out = fn(*args)
    force(out)  # block_until_ready lies on the tunnel — fetch to sync
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        force(out)  # in-order stream: last value implies all reps done
        ts.append((time.perf_counter() - t0) / reps)
    return statistics.median(ts)


def mxu_peak(dtype, m=4096, inner=16):
    a = jnp.ones((m, m), dtype)
    b = jnp.ones((m, m), dtype)

    @jax.jit
    def f(a, b):
        def body(a, _):
            return jnp.dot(a, b, preferred_element_type=dtype), None
        a, _ = jax.lax.scan(body, a, None, inner)
        return a

    dt = _med_time(f, a, b, reps=3)
    return 2 * m * m * m * inner / dt


def vpu_peak(n=1024 * 1024, inner=64, fmas=128):
    """``fmas`` chained FMAs per element per pass amortize HBM traffic
    (32 flops/byte at 128 — comfortably compute-bound), so this measures
    the VPU, not bandwidth (the r3 first cut at 1 FMA/pass measured HBM)."""
    x = jnp.ones((n,), jnp.float32)

    @jax.jit
    def f(x):
        def body(x, _):
            for _ in range(fmas):
                x = x * 1.0000001 + 1e-9  # 1 FMA = 2 flops/elem
            return x, None
        x, _ = jax.lax.scan(body, x, None, inner)
        return x

    dt = _med_time(f, x, reps=3)
    return 2 * fmas * n * inner / dt


def hbm_bw(mb=512, inner=8):
    n = mb * 1024 * 1024 // 4
    x = jnp.ones((n,), jnp.float32)

    @jax.jit
    def f(x):
        def body(x, _):
            return x + 1.0, None
        x, _ = jax.lax.scan(body, x, None, inner)
        return x

    dt = _med_time(f, x, reps=3)
    return 2 * 4 * n * inner / dt  # read + write per pass


def graph_chain(n=8192, K=16, d=64, inner=100, dtype=jnp.float32,
                use_pallas=False):
    """Loop-carried chain (q = x = v = previous output, like stacked
    SparseRGL layers) so while-loop invariant code motion cannot hoist the
    SDDMM/softmax and time only the SpMM (the r2 inflation, ADVICE.md)."""
    from relationalgraphlearning_tpu.ops import sparse
    from relationalgraphlearning_tpu.ops import pallas_graph

    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    h0 = jax.random.normal(ks[0], (n, d), dtype)
    cols = sparse.knn_graph(jax.random.uniform(ks[1], (n, 2)) * 100, K)
    mask = jnp.ones((n, K), bool)

    @jax.jit
    def f(h, cols, mask):
        def body(h, _):
            if use_pallas:
                out = pallas_graph.fused_neighbor_attention(h, h, h, cols, mask)
            else:
                s = sparse.sddmm_fixed_k(h, h, cols, mask)
                a = sparse.neighbor_softmax(s, mask)
                out = sparse.spmm_fixed_k(a, h, cols)
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-6)
            return out.astype(dtype), None

        h, _ = jax.lax.scan(body, h, None, inner)
        return h

    dt = _med_time(f, h0, cols, mask, reps=10)  # amortize tunnel RTT
    edges = n * K * inner
    return edges / dt


def main():
    dev = str(jax.devices()[0])
    res = {"device": dev}

    res["mxu_f32_tflops"] = round(mxu_peak(jnp.float32) / 1e12, 1)
    res["mxu_bf16_tflops"] = round(mxu_peak(jnp.bfloat16) / 1e12, 1)
    res["vpu_f32_tflops"] = round(vpu_peak() / 1e12, 2)
    res["hbm_gb_s"] = round(hbm_bw() / 1e9, 1)
    for k in ("mxu_f32_tflops", "mxu_bf16_tflops", "vpu_f32_tflops",
              "hbm_gb_s"):
        print(json.dumps({"metric": f"ceiling {k}", "value": res[k]}))

    n, K, d = 8192, 16, 64
    flops_per_edge = 2 * (d + d) + 6  # SDDMM + SpMM FMAs + softmax ops
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        e = graph_chain(n=n, K=K, d=d, dtype=dtype)
        eff = e * flops_per_edge
        res[f"chain_{tag}_gedges_s"] = round(e / 1e9, 2)
        res[f"chain_{tag}_eff_tflops"] = round(eff / 1e12, 2)
        res[f"chain_{tag}_vs_vpu"] = round(
            eff / (res["vpu_f32_tflops"] * 1e12), 3)
        print(json.dumps({
            "metric": f"graph chain ({tag}, n={n}, K={K}, d={d})",
            "gedges_per_s": res[f"chain_{tag}_gedges_s"],
            "effective_tflops": res[f"chain_{tag}_eff_tflops"],
            "fraction_of_vpu_ceiling": res[f"chain_{tag}_vs_vpu"],
        }))

    # HBM-roundtrip speed-of-light for comparison: if every gathered
    # neighbor row came from HBM, bytes/edge = 2 tables · d · 4B
    hbm_sol = res["hbm_gb_s"] * 1e9 / (2 * d * 4)
    res["hbm_sol_gedges_s"] = round(hbm_sol / 1e9, 2)
    print(json.dumps({
        "metric": "HBM-bound speed-of-light (if gathers left chip)",
        "gedges_per_s": res["hbm_sol_gedges_s"],
        "note": "measured chain exceeding this proves VMEM-resident gathers",
    }))

    # Windowed dense MXU path (ops/block_graph.py): same chain re-mapped to
    # per-block masked dense matmuls; its ceiling is the MXU, not the VPU.
    # Dense flops/edge are (C/B)/K × larger (C=640, B=256 → 2.5/16 per edge
    # slot, i.e. 40 candidate slots per true edge), so MFU is reported
    # against dense flops actually issued.
    from relationalgraphlearning_tpu.ops import block_graph, sparse as _sp
    B, C = 256, 640
    for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        ks = jax.random.split(jax.random.PRNGKey(0), 2)
        pos = jax.random.uniform(ks[1], (n, 2)) * 100
        pos = pos[block_graph.spatial_sort(pos)]
        cols = _sp.knn_graph(pos, K)
        cand, cov = block_graph.block_window(cols, B, C)
        emask = block_graph.block_masks(cols, cand)  # graph-static
        h0 = jax.random.normal(ks[0], (n, d), dtype)

        @jax.jit
        def fb(h, cols, cand, emask):
            def body(h, _):
                out = block_graph.block_attention(h, h, h, cols, cand,
                                                  emask=emask)
                out = out / jnp.maximum(
                    jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-6)
                return out.astype(dtype), None

            h, _ = jax.lax.scan(body, h, None, 100)
            return h

        dt = _med_time(fb, h0, cols, cand, emask, reps=30)
        e = n * K * 100 / dt
        dense_flops = n * C * 2 * (d + d) * 100 / dt  # issued matmul flops
        mxu_key = "mxu_bf16_tflops" if tag == "bf16" else "mxu_f32_tflops"
        res[f"block_{tag}_gedges_s"] = round(e / 1e9, 2)
        res[f"block_{tag}_dense_tflops"] = round(dense_flops / 1e12, 2)
        res[f"block_{tag}_vs_mxu"] = round(
            dense_flops / (res[mxu_key] * 1e12), 3)
        print(json.dumps({
            "metric": f"graph chain (windowed dense MXU, {tag})",
            "gedges_per_s": res[f"block_{tag}_gedges_s"],
            "dense_tflops": res[f"block_{tag}_dense_tflops"],
            "fraction_of_mxu_ceiling": res[f"block_{tag}_vs_mxu"],
            "coverage": float(cov),
        }))

    # Pallas fused block kernel (ops/pallas_block.py v2: bitpacked mask +
    # fused l2norm epilogue): same chain, score tiles resident in VMEM.
    # try/except: if Mosaic rejects it on this image, the roofline records
    # the XLA rows and moves on.
    try:
        from relationalgraphlearning_tpu.ops import pallas_block

        for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            ks = jax.random.split(jax.random.PRNGKey(0), 2)
            pos = jax.random.uniform(ks[1], (n, 2)) * 100
            pos = pos[block_graph.spatial_sort(pos)]
            cols = _sp.knn_graph(pos, K)
            cand, cov = block_graph.block_window(cols, B, C)
            mbits = pallas_block.pack_emask(
                block_graph.block_masks(cols, cand))
            h0 = jax.random.normal(ks[0], (n, d), dtype)

            @jax.jit
            def fp(h, cand, mbits):
                def body(h, _):
                    out = pallas_block.block_attention_pallas(
                        h, h, h, cand, mbits, epilogue="l2norm")
                    return out.astype(dtype), None

                h, _ = jax.lax.scan(body, h, None, 100)
                return h

            dt = _med_time(fp, h0, cand, mbits, reps=30)
            e = n * K * 100 / dt
            dense_flops = n * C * 2 * (d + d) * 100 / dt
            mxu_key = ("mxu_bf16_tflops" if tag == "bf16"
                       else "mxu_f32_tflops")
            res[f"block_pallas_{tag}_gedges_s"] = round(e / 1e9, 2)
            res[f"block_pallas_{tag}_vs_mxu"] = round(
                dense_flops / (res[mxu_key] * 1e12), 3)
            print(json.dumps({
                "metric": f"graph chain (pallas fused block, {tag})",
                "gedges_per_s": res[f"block_pallas_{tag}_gedges_s"],
                "fraction_of_mxu_ceiling": res[f"block_pallas_{tag}_vs_mxu"],
            }))
        res["block_pallas_gedges_s"] = res["block_pallas_f32_gedges_s"]
    except Exception as err:  # Mosaic lowering failure — record and move on
        res["block_pallas_error"] = f"{type(err).__name__}: {err}"[:200]
        print(json.dumps({"metric": "graph chain (pallas fused block)",
                          "error": res["block_pallas_error"]}))

    from relationalgraphlearning_tpu.ops import pallas_graph
    if pallas_graph._MOSAIC_GATHER_OK:
        e = graph_chain(n=n, K=K, d=d, use_pallas=True)
        res["chain_pallas_gedges_s"] = round(e / 1e9, 2)
        print(json.dumps({"metric": "graph chain (pallas fused)",
                          "gedges_per_s": res["chain_pallas_gedges_s"]}))

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "docs", "ROOFLINE.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({"metric": "written", "path": out}))


if __name__ == "__main__":
    main()
