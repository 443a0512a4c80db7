"""Interleaved A/B harness for packed-kernel math variants (r5).

The axon tunnel shows ±20% wall-clock drift between back-to-back runs of
IDENTICAL programs (observed 1.64 vs 1.98 Gedges/s), so sequential
comparisons lie. This harness round-robins all variants inside one
process, many rounds, and reports per-variant median + IQR — drift hits
every variant equally.

    python tools/ab_kernel.py [--rounds 7] [--reps 30]
"""

import argparse
import functools
import json
import statistics
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from relationalgraphlearning_tpu.utils import compile_cache
from relationalgraphlearning_tpu.utils.sync import force

compile_cache.enable()
_NEG = -1e30


def _unpack_bool(bits, B):
    C = bits.shape[-1]
    shift = jax.lax.broadcasted_iota(jnp.uint32, (B // 32, 32, C), 1)
    return ((bits[:, None, :] >> shift) & 1).reshape(B, C) > 0


def make_kernel(B, C, d, *, div_after=False, intmask=False):
    def kern(q_ref, x_ref, m_ref, o_ref):
        q = q_ref[0]
        x = x_ref[0]
        if intmask:
            bits = m_ref[0]
            shift = jax.lax.broadcasted_iota(
                jnp.int32, (B // 32, 32, C), 1)
            m32 = ((bits.astype(jnp.int32)[:, None, :] << (31 - shift))
                   >> 31).reshape(B, C)
        else:
            mask = _unpack_bool(m_ref[0], B)
        scores = jax.lax.dot_general(
            q, x, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if intmask:
            e = jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(jnp.exp(scores), jnp.int32)
                & m32, jnp.float32)
        else:
            e = jnp.where(mask, jnp.exp(scores), 0.0)
        denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-20)
        if div_after:
            out = jax.lax.dot_general(
                e.astype(x.dtype), x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) / denom
        else:
            attn = (e / denom).astype(x.dtype)
            out = jax.lax.dot_general(
                attn, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out = out / jnp.maximum(
            jnp.sqrt(jnp.sum(out * out, axis=-1, keepdims=True)), 1e-6)
        o_ref[0] = out.astype(o_ref.dtype)

    def call(qb, xg, mbits):
        nb = qb.shape[0]
        return pl.pallas_call(
            kern, grid=(nb,),
            in_specs=[
                pl.BlockSpec((1, B, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, C, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, B // 32, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, B, d), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, B, d), qb.dtype),
        )(qb, xg, mbits)

    return call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=7)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--B", type=int, default=256)
    ap.add_argument("--C", type=int, default=544)
    ap.add_argument("--inner", type=int, default=100)
    args = ap.parse_args()
    from relationalgraphlearning_tpu.ops import block_graph, pallas_block, \
        sparse

    n, K, d = 8192, 16, 64
    B, C = args.B, args.C
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    pos = jax.random.uniform(ks[1], (n, 2)) * 100
    pos = pos[block_graph.spatial_sort(pos)]
    cols = sparse.knn_graph(pos, K)
    cand, cov = block_graph.block_window(cols, B, C)
    mb = pallas_block.pack_emask(block_graph.block_masks(cols, cand))
    h0 = jax.random.normal(ks[0], (n, d))
    h0 = h0 / jnp.maximum(jnp.linalg.norm(h0, axis=-1, keepdims=True), 1e-6)

    def chain(kernel_call, dtype, no_gather=False, tail_from=None):
        @jax.jit
        def f(h, cand, mb):
            nb = cand.shape[0]
            candc = jnp.clip(cand, 0, n - 1)
            xg0 = h[candc]

            def body(h, _):
                # no_gather: candidate table frozen at iteration 0 — the
                # kernel-only ceiling (q side still loop-carried, nothing
                # hoistable); else the full chain with the XLA gather
                if no_gather:
                    xg = xg0
                elif tail_from is not None:
                    xg = jnp.concatenate(
                        [xg0[:, :tail_from], h[candc[:, tail_from:]]], 1)
                else:
                    xg = h[candc]
                out = kernel_call(h.reshape(nb, B, d), xg, mb)
                return out.reshape(n, d).astype(dtype), None

            h, _ = jax.lax.scan(body, h, None, args.inner)
            return h

        return f

    variants = {
        "base_f32": (chain(make_kernel(B, C, d), jnp.float32), jnp.float32),
        "divafter_f32": (chain(make_kernel(B, C, d, div_after=True),
                               jnp.float32), jnp.float32),
        "divafter_intmask_f32": (
            chain(make_kernel(B, C, d, div_after=True, intmask=True),
                  jnp.float32), jnp.float32),
        "divafter_bf16": (chain(make_kernel(B, C, d, div_after=True),
                                jnp.bfloat16), jnp.bfloat16),
        "divafter_intmask_f32_NOGATHER": (
            chain(make_kernel(B, C, d, div_after=True, intmask=True),
                  jnp.float32, no_gather=True), jnp.float32),
        # upper-bound simulation of the chunk-DMA + tail-gather design:
        # first 320 slots frozen (in-kernel DMA stand-in), tail gathered
        # fresh per iteration — optimistic (no slot expansion, no DMA cost)
        "divafter_intmask_f32_TAILSIM": (
            chain(make_kernel(B, C, d, div_after=True, intmask=True),
                  jnp.float32, tail_from=320), jnp.float32),
    }

    # the real chunked-fetch kernel (ops/pallas_chunk.py)
    from relationalgraphlearning_tpu.ops.pallas_chunk import (
        chunk_block_attention, chunk_window)

    nch, ct = 2, 288
    cstarts, tail, cmbits, ccov = chunk_window(cols, B, nch=nch, ct=ct,
                                               thresh=80, chunk=128)

    @jax.jit
    def f_chunk(h, cstarts, tail, cmbits):
        def body(h, _):
            out = chunk_block_attention(h, h, cstarts, tail, cmbits,
                                        epilogue="l2norm", stable=False)
            return out, None

        h, _ = jax.lax.scan(body, h, None, args.inner)
        return h

    variants["chunkfetch_f32"] = (
        lambda h, cand, mb: f_chunk(h, cstarts, tail, cmbits), jnp.float32)
    print(json.dumps({"chunk_coverage": round(float(ccov), 5),
                      "nch": nch, "ct": ct}), flush=True)
    # warm up all compiles first
    inputs = {}
    for name, (f, dtype) in variants.items():
        hi = h0.astype(dtype)
        out = f(hi, cand, mb)
        force(out)
        inputs[name] = hi
    times = {k: [] for k in variants}
    for _ in range(args.rounds):
        for name, (f, dtype) in variants.items():
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = f(inputs[name], cand, mb)
            force(out)
            times[name].append((time.perf_counter() - t0) / args.reps)
    for name, ts in times.items():
        med = statistics.median(ts)
        print(json.dumps({
            "variant": name, "B": B, "C": C,
            "gedges_s": round(n * K * args.inner / med / 1e9, 3),
            # best-of-rounds: the tunnel shows intermittent external
            # contention (IQRs jump 2% -> 60% with an idle host); the
            # fastest round is the least-disturbed estimate of device
            # capability, the median is the sustained number
            "gedges_s_best": round(n * K * args.inner / min(ts) / 1e9, 3),
            "iqr_pct": round(100 * (sorted(ts)[len(ts) * 3 // 4]
                                    - sorted(ts)[len(ts) // 4]) / med, 1),
            "coverage": round(float(cov), 5)}), flush=True)


if __name__ == "__main__":
    main()
