"""r5 kernel measurement: the VPU-diet packed kernel vs records, one
protocol (reps=30, median of 3 trials, fetch barrier), exact + near-exact
shapes, f32 AND bf16 (VERDICT r4 weak #2 — reconcile the bf16 records).

    python tools/sweep_r5.py [--quick]
"""

import argparse
import json
import statistics
import time

import jax
import jax.numpy as jnp

from relationalgraphlearning_tpu.utils import compile_cache
from relationalgraphlearning_tpu.utils.sync import force

compile_cache.enable()


def _med_time(fn, *args, reps=30, trials=3):
    out = fn(*args)
    force(out)
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        force(out)
        ts.append((time.perf_counter() - t0) / reps)
    return statistics.median(ts)


def run(backend, dtype, B, C, n=8192, K=16, inner=100):
    from relationalgraphlearning_tpu.ops import block_graph, pallas_block, \
        sparse

    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    pos = jax.random.uniform(ks[1], (n, 2)) * 100
    pos = pos[block_graph.spatial_sort(pos)]
    cols = sparse.knn_graph(pos, K)
    cand, cov = block_graph.block_window(cols, B, C)
    emask = block_graph.block_masks(cols, cand)
    h0 = jax.random.normal(ks[0], (n, 64))
    # iteration 0 must satisfy the stable=False |scores|<=1 precondition
    h0 = (h0 / jnp.maximum(jnp.linalg.norm(h0, axis=-1, keepdims=True),
                           1e-6)).astype(dtype)
    mb = pallas_block.pack_emask(emask)

    if backend == "xla":

        @jax.jit
        def f(h, cols, cand, emask):
            def body(h, _):
                out = block_graph.block_attention(h, h, h, cols, cand,
                                                  emask=emask)
                out = out / jnp.maximum(
                    jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-6)
                return out.astype(dtype), None

            h, _ = jax.lax.scan(body, h, None, inner)
            return h

        dt = _med_time(f, h0, cols, cand, emask)
    else:

        @jax.jit
        def f(h, cand, mb):
            def body(h, _):
                out = pallas_block.block_attention_pallas(
                    h, h, h, cand, mb, epilogue="l2norm", stable=False)
                return out.astype(dtype), None

            h, _ = jax.lax.scan(body, h, None, inner)
            return h

        dt = _med_time(f, h0, cand, mb)
        out = f(h0, cand, mb)
        assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32)))), backend
    return n * K * inner / dt, float(cov)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--xla", action="store_true", help="include XLA rows")
    args = ap.parse_args()
    shapes = [(256, 512), (256, 544), (256, 640)]
    if args.quick:
        shapes = [(256, 544)]
    for B, C in shapes:
        for dtype, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            e, cov = run("pallas", dtype, B, C)
            print(json.dumps({"backend": "pallas", "dtype": tag, "B": B,
                              "C": C, "gedges_s": round(e / 1e9, 3),
                              "coverage": round(cov, 5)}), flush=True)
    if args.xla:
        for B, C in shapes:
            e, cov = run("xla", jnp.float32, B, C)
            print(json.dumps({"backend": "xla", "dtype": "f32", "B": B,
                              "C": C, "gedges_s": round(e / 1e9, 3),
                              "coverage": round(cov, 5)}), flush=True)


if __name__ == "__main__":
    main()
