"""Probe: can the chunked-fetch kernel serve d=32 (the SparseRGL
production feature dim) via a QUAD row view [n/4, 4d=128]?

The d=64 production kernel (ops/pallas_chunk.py) uses a pair view for
128-lane-aligned DMAs and splits even/odd rows with 64-lane static
slices. d=32 needs a quad view and 32-lane compute slices + mask parts at
64-slot boundaries — this probe checks whether Mosaic lowers those, and
at what cost vs the gather-fed packed kernel at d=32.

    python tools/probe_chunk_d32.py        (on the chip)

RESULT (r5, measured): Mosaic LOWERS the quad view (32-lane compute
slices, 64-slot mask parts) and the output is exact (max_err 6e-4,
coverage 1.0) — but throughput is PARITY with the gather-fed packed
kernel (2.206 vs 2.239 Gedges/s, sequential protocol): at d=32 the
gather moves half the bytes per row, so it is no longer the serialized
wall the chunk DMA removes, while the 5-part score/value structure adds
overhead. Conclusion: the chunked-fetch kernel stays the d=64 production
path; d=32 models keep the gather-fed packed kernel. This probe is the
committed evidence either way.
"""

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


def _kernel(starts_ref, q_ref, tail_ref, m_ref, x4_hbm, o_ref, xg4, sems,
            *, nch, chunk, g):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    B, d = q_ref.shape[1], q_ref.shape[2]
    hc = chunk // g

    def dma(blk, slot, c):
        return pltpu.make_async_copy(
            x4_hbm.at[pl.ds(starts_ref[blk, c] // g, hc), :],
            xg4.at[slot, pl.ds(c * hc, hc), :],
            sems.at[slot, c])

    @pl.when(b == 0)
    def _():
        for c in range(nch):
            dma(0, 0, c).start()

    @pl.when(b + 1 < nb)
    def _():
        for c in range(nch):
            dma(b + 1, (b + 1) % 2, c).start()

    slot = b % 2
    for c in range(nch):
        dma(b, slot, c).wait()

    q = q_ref[0]
    xc4 = xg4[slot]                       # [nch*hc, g*d]
    part_w = nch * chunk // g
    xt = tail_ref[0]
    bits = m_ref[0]
    ntot = bits.shape[-1]
    shift = jax.lax.broadcasted_iota(jnp.int32, (B // 32, 32, ntot), 1)
    m32 = ((bits.astype(jnp.int32)[:, None, :] << (31 - shift))
           >> 31).reshape(B, ntot)
    parts = [(xc4[:, i * d:(i + 1) * d],
              m32[:, i * part_w:(i + 1) * part_w]) for i in range(g)]
    parts.append((xt, m32[:, g * part_w:]))
    cast = lambda z: jax.lax.bitcast_convert_type(z, jnp.int32)
    uncast = lambda z: jax.lax.bitcast_convert_type(z, jnp.float32)
    es = []
    for xk, m in parts:
        s = jax.lax.dot_general(q, xk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        es.append(uncast(cast(jnp.exp(s)) & m))
    denom = jnp.maximum(
        sum(jnp.sum(e, -1, keepdims=True) for e in es), 1e-20)
    out = sum(
        jax.lax.dot_general(e, xk, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        for e, (xk, _m) in zip(es, parts)) / denom
    o_ref[0] = out.astype(o_ref.dtype)


def chunk_attention_d32(q, x, chunk_starts, tail, mbits):
    n, d = q.shape
    g = 128 // d
    nb, nch = chunk_starts.shape
    ct = tail.shape[1]
    B = n // nb
    chunk = (mbits.shape[-1] - ct) // nch
    ntot = nch * chunk + ct
    tail_g = x[jnp.clip(tail, 0, n - 1)]
    x4 = x.reshape(n // g, g * d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, B, d), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct, d), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B // 32, ntot), lambda i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, B, d), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, nch * chunk // g, g * d), q.dtype),
            pltpu.SemaphoreType.DMA((2, nch)),
        ])
    out = pl.pallas_call(
        functools.partial(_kernel, nch=nch, chunk=chunk, g=g),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, B, d), q.dtype),
    )(chunk_starts, q.reshape(nb, B, d), tail_g, mbits, x4)
    return out.reshape(n, d)


def main():
    from relationalgraphlearning_tpu.ops import block_graph, pallas_block, \
        sparse
    from relationalgraphlearning_tpu.ops.pallas_chunk import chunk_window

    n, K, B, d = 8192, 16, 256, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    pos = jax.random.uniform(ks[1], (n, 2)) * 100
    pos = pos[block_graph.spatial_sort(pos)]
    cols = sparse.knn_graph(pos, K)
    h = jax.random.normal(ks[0], (n, d))
    h = h / jnp.linalg.norm(h, axis=-1, keepdims=True)
    starts, tail, mbits, cov = chunk_window(cols, B, groups=4)
    out = chunk_attention_d32(h, h, starts, tail, mbits)
    jax.block_until_ready(out)
    cand, _ = block_graph.block_window(cols, B, 544)
    ref = block_graph.block_attention(h, h, h, cols, cand)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 1e-3, err
    print(f"PROBE OK d=32 quad-view max_err={err:.2e} cov={float(cov)}")

    # timing vs the gather-fed packed kernel at d=32 (same chain protocol)
    mb = pallas_block.pack_emask(block_graph.block_masks(cols, cand))

    def timed(f, *args):
        out = f(*args)
        force(out)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(30):
                out = f(*args)
            force(out)
            ts.append((time.perf_counter() - t0) / 30)
        return statistics.median(ts)

    inner = 100

    @jax.jit
    def f_chunk(h, starts, tail, mbits):
        def body(h, _):
            o = chunk_attention_d32(h, h, starts, tail, mbits)
            return o / jnp.maximum(
                jnp.linalg.norm(o, axis=-1, keepdims=True), 1e-6), None
        h, _ = jax.lax.scan(body, h, None, inner)
        return h

    @jax.jit
    def f_pack(h, cand, mb):
        def body(h, _):
            o = pallas_block.block_attention_pallas(
                h, h, h, cand, mb, epilogue="l2norm", stable=False)
            return o, None
        h, _ = jax.lax.scan(body, h, None, inner)
        return h

    for name, dt in (("chunk_d32", timed(f_chunk, h, starts, tail, mbits)),
                     ("packed_d32", timed(f_pack, h, cand, mb))):
        print(json.dumps({"variant": name,
                          "gedges_s": round(n * K * inner / dt / 1e9, 3)}))


if __name__ == "__main__":
    main()
