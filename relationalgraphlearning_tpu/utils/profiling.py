"""Profiling hooks.

SURVEY.md §5: the reference has no tracing/profiling at all. Here:
``trace(dir)`` wraps a block in a ``jax.profiler`` trace (viewable in
TensorBoard / xprof / Perfetto), and ``annotate`` names regions of the
device timeline. The train CLI exposes ``--profile_dir``.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Profile the enclosed block when ``log_dir`` is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named region on the device trace (use as context manager)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
