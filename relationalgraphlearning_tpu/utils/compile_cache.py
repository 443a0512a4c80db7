"""Persistent XLA compilation cache.

The d-step planner jits into a large XLA program (planning tree × RGL
forwards × vmapped envs); first compilation through the axon remote-compile
tunnel can take minutes. Enabling JAX's persistent cache makes every
subsequent process (training runs, eval CLI, bench) reuse the compiled
executable.
"""

from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "RGL_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "rgl_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
