"""Reliable device synchronization for timing.

On the axon-tunneled TPU backend ``jax.block_until_ready`` can return before
remote execution has actually finished (observed this round: a 2048x2048
matmul "blocked" in 0.2 ms while fetching its first element took minutes of
tunnel queue time; after the per-process warm-up fetch, fetches settle to
~30 ms). Any wall-clock measurement that ends at ``block_until_ready`` is
therefore dispatch-only and can overstate throughput by orders of magnitude.

``force`` is the trustworthy barrier: it fetches one scalar element of the
output, which cannot complete until the producing program (and, on the
in-order TPU execution stream, everything dispatched before it) has run.
All bench entry points (bench.py / bench_extra.py / bench_roofline.py /
bench_scaling.py) end their timed regions with ``force``.
"""

from __future__ import annotations

import jax
import numpy as np


def force(out) -> float:
    """Block until ``out`` is really computed; returns one element of it."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(jax.device_get(leaf.ravel()[0])))


def warmup_tunnel() -> None:
    """Absorb the per-process first-fetch latency before any timed region."""
    import jax.numpy as jnp

    force(jax.jit(lambda x: x * 2.0)(jnp.ones(())))
