"""Microbenchmark: XLA gather strategies for the block-path candidate fetch.

The r4 sweep showed the block chain insensitive to dtype/mask-packing/shape
— the wall is the per-ROW cost of the candidate gather (and VPU softmax),
not HBM bytes. Hypothesis: gathering A-row ALIGNED slices (table viewed as
[n/A, A·d]) cuts the per-item count ~(run-structure)× for ~equal flops
downstream. Measures, fetch-synced, per iteration of a loop-carried chain:

  1. row gather      x[cand]            (16384 items of 256 B)
  2. 4-aligned slice x4[starts]         (~5k items of 1 KB)
  3. 8-aligned slice x8[starts]         (~3k items of 2 KB)
  4. contiguous span dynamic-slice      (nb fat slices — lower bound)

Run on chip: python tools/probe_gather.py
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from relationalgraphlearning_tpu.utils import compile_cache
from relationalgraphlearning_tpu.utils.sync import force, warmup_tunnel

compile_cache.enable()


def timeit(fn, *args, reps=5):
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / reps


def aligned_starts(cand, n, align, pad_to=None):
    """Unique aligned slice starts covering every real candidate."""
    c = np.asarray(cand)
    nb = c.shape[0]
    rows = []
    for b in range(nb):
        ids = c[b][c[b] < n]
        st = np.unique(ids // align)
        rows.append(st)
    C = pad_to or max(len(r) for r in rows)
    out = np.full((nb, C), n // align, np.int32)
    for b, r in enumerate(rows):
        out[b, :len(r)] = r[:C]
    return jnp.asarray(out), C


def main():
    from relationalgraphlearning_tpu.ops import block_graph, sparse

    warmup_tunnel()
    n, K, d, B, C, inner = 8192, 16, 64, 256, 640, 100
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    pos = jax.random.uniform(ks[1], (n, 2)) * 100
    pos = pos[block_graph.spatial_sort(pos)]
    cols = sparse.knn_graph(pos, K)
    cand, _ = block_graph.block_window(cols, B, C)
    h0 = jax.random.normal(ks[0], (n, d))
    nb = n // B
    candc = jnp.clip(cand, 0, n - 1)

    def chain(gather_fn):
        @jax.jit
        def f(h, idx):
            def body(h, _):
                xg = gather_fn(h, idx)  # [nb, C?, d]
                upd = jnp.sum(xg, axis=(0, 1)) * 1e-9  # consume, tiny
                return h * 0.9999 + upd[None, :], None

            h, _ = jax.lax.scan(body, h, None, inner)
            return h
        return f

    results = {}
    # 1. plain row gather
    f = chain(lambda h, idx: h[idx])
    dt = timeit(f, h0, candc)
    results["row_gather_ms_per_iter"] = dt / inner * 1e3
    print(json.dumps({"variant": "row gather", "items": int(nb * C),
                      "ms_per_iter": round(dt / inner * 1e3, 3)}), flush=True)

    # 2/3. aligned slice gathers
    for A in (4, 8, 16):
        starts, CA = aligned_starts(cand, n, A)
        startsc = jnp.clip(starts, 0, n // A - 1)

        def g(h, idx, A=A, CA=CA):
            hA = h.reshape(n // A, A * d)
            return hA[idx].reshape(nb, CA * A, d)

        f = chain(g)
        dt = timeit(f, h0, startsc)
        results[f"aligned{A}_ms_per_iter"] = dt / inner * 1e3
        print(json.dumps({"variant": f"{A}-aligned slices",
                          "items": int(nb * CA), "slots": int(CA * A),
                          "ms_per_iter": round(dt / inner * 1e3, 3)}),
              flush=True)

    # 4. contiguous span per block (lower bound: nb fat dynamic slices)
    c = np.asarray(cand)
    W = 1920
    span_starts = jnp.asarray(
        [min(int(c[b][c[b] < n].min()), n - W) for b in range(nb)],
        jnp.int32)

    def g_span(h, st):
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(h, (s, 0), (W, d)))(st)

    f = chain(g_span)
    dt = timeit(f, h0, span_starts)
    print(json.dumps({"variant": "contiguous span slices", "items": nb,
                      "slots": int(nb * W),
                      "ms_per_iter": round(dt / inner * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
