"""On-chip decomposition of the windowed-dense chain cost (r3 debugging).

Times, fetch-synced, at bench shapes (n=8192, K=16, d=64, B=256, C=640):
  a. full block chain with emask precomputed (the fixed protocol);
  b. the two einsums alone (masked-scores shapes);
  c. the candidate gather alone;
  d. softmax+mask alone;
  e. the gather-path chain (reference point).
"""

import time

import jax
import jax.numpy as jnp

from relationalgraphlearning_tpu.utils import compile_cache
from relationalgraphlearning_tpu.utils.sync import force, warmup_tunnel

compile_cache.enable()


def timeit(fn, *args, reps=30):
    """reps must amortize the ~20 ms tunnel fetch RTT — at reps=3 every
    row carries a ~7 ms floor that swamps sub-20 ms programs (r4)."""
    out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / reps


def main():
    from relationalgraphlearning_tpu.ops import block_graph, sparse

    warmup_tunnel()
    n, K, d, B, C, inner = 8192, 16, 64, 256, 640, 100
    ks = jax.random.split(jax.random.PRNGKey(0), 2)
    pos = jax.random.uniform(ks[1], (n, 2)) * 100
    pos = pos[block_graph.spatial_sort(pos)]
    cols = sparse.knn_graph(pos, K)
    cand, cov = block_graph.block_window(cols, B, C)
    emask = block_graph.block_masks(cols, cand)
    h0 = jax.random.normal(ks[0], (n, d))
    nb = n // B
    edges = n * K * inner

    @jax.jit
    def chain_block(h, cols, cand, emask):
        def body(h, _):
            out = block_graph.block_attention(h, h, h, cols, cand,
                                              emask=emask)
            return out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-6), None
        h, _ = jax.lax.scan(body, h, None, inner)
        return h

    dt = timeit(chain_block, h0, cols, cand, emask)
    print(f"a. block chain (emask precomputed): {dt*1e3:.2f} ms "
          f"-> {edges/dt/1e9:.2f} Gedges/s", flush=True)

    @jax.jit
    def einsums_only(h, cand, emask):
        candc = jnp.clip(cand, 0, n - 1)

        def body(h, _):
            qb = h.reshape(nb, B, d)
            xg = h[candc]
            s = jnp.einsum("nbd,ncd->nbc", qb, xg,
                           preferred_element_type=jnp.float32)
            a = jnp.where(emask, s, -1e30)
            out = jnp.einsum("nbc,ncd->nbd", a, xg,
                             preferred_element_type=jnp.float32).reshape(n, d)
            return out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-6), None
        h, _ = jax.lax.scan(body, h, None, inner)
        return h

    dt = timeit(einsums_only, h0, cand, emask)
    print(f"b. gather+einsums+where (no softmax): {dt*1e3:.2f} ms", flush=True)

    @jax.jit
    def gather_only(h, cand):
        candc = jnp.clip(cand, 0, n - 1)

        def body(h, _):
            xg = h[candc]  # [nb, C, d]
            out = jnp.mean(xg, axis=0)  # [C, d] -> fold back to n rows
            return h * 0.999 + jnp.tile(out, (n // C + 1, 1))[:n] * 0.001, None
        h, _ = jax.lax.scan(body, h, None, inner)
        return h

    dt = timeit(gather_only, h0, cand)
    print(f"c. candidate gather alone: {dt*1e3:.2f} ms", flush=True)

    @jax.jit
    def softmax_only(s0, emask):
        def body(s, _):
            a = jax.nn.softmax(jnp.where(emask, s, -1e30), axis=-1)
            return jnp.where(emask, a, 0.0) + s * 1e-6, None
        s, _ = jax.lax.scan(body, s0, None, inner)
        return s

    s0 = jax.random.normal(jax.random.PRNGKey(2), (nb, B, C))
    dt = timeit(softmax_only, s0, emask)
    print(f"d. softmax+mask alone: {dt*1e3:.2f} ms", flush=True)

    # ---- r4 additions: localize the residual wall (sweep showed backend/
    # dtype/mask-packing near-irrelevant → suspect the per-layer gather)
    from relationalgraphlearning_tpu.ops import pallas_block

    mbits = pallas_block.pack_emask(emask)
    candc = jnp.clip(cand, 0, n - 1)

    @jax.jit
    def kernel_only(h, xg, vg, mbits):
        def body(h, _):
            qb = h.reshape(nb, B, d)
            out = pallas_block.fused_block_attention_packed(
                qb, xg, vg, mbits).reshape(n, d)
            return out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-6), None
        h, _ = jax.lax.scan(body, h, None, inner)
        return h

    xg0 = h0[candc]
    dt = timeit(kernel_only, h0, xg0, xg0, mbits)
    print(f"f. pallas kernel only (pre-gathered xg/vg): {dt*1e3:.2f} ms "
          f"-> {edges/dt/1e9:.2f} Gedges/s", flush=True)

    @jax.jit
    def chain_pallas(h, cand, mbits):
        def body(h, _):
            out = pallas_block.block_attention_pallas(h, h, h, cand, mbits)
            return out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-6), None
        h, _ = jax.lax.scan(body, h, None, inner)
        return h

    dt = timeit(chain_pallas, h0, cand, mbits)
    print(f"g. pallas chain (gather in loop): {dt*1e3:.2f} ms "
          f"-> {edges/dt/1e9:.2f} Gedges/s", flush=True)

    @jax.jit
    def norm_only(h):
        def body(h, _):
            return h / jnp.maximum(
                jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-6) + 1e-9, None
        h, _ = jax.lax.scan(body, h, None, inner)
        return h

    dt = timeit(norm_only, h0)
    print(f"h. norm alone: {dt*1e3:.2f} ms", flush=True)

    @jax.jit
    def chain_gather(h, cols):
        mask = jnp.ones(cols.shape, bool)

        def body(h, _):
            s = sparse.sddmm_fixed_k(h, h, cols, mask)
            a = sparse.neighbor_softmax(s, mask)
            out = sparse.spmm_fixed_k(a, h, cols)
            return out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-6), None
        h, _ = jax.lax.scan(body, h, None, inner)
        return h

    dt = timeit(chain_gather, h0, cols)
    print(f"e. gather chain: {dt*1e3:.2f} ms -> {edges/dt/1e9:.2f} Gedges/s",
          flush=True)


if __name__ == "__main__":
    main()
