"""ctypes bindings for the native batched ORCA library.

Reference parity: the Python→C++ boundary in the reference is
``rvo2.PyRVOSimulator`` (Cython over RVO2; the ONLY native component —
SURVEY.md §2.5, §3.2★). Here the native side is ``native/orca/orca.cpp``
(batched multi-env C++ ORCA) bound via ctypes (no pybind11 in the image),
auto-built with the repo Makefile on first use.

Two consumption paths:

1. **host arrays** — ``orca_step_batch_native(numpy arrays)`` for host-side
   rollouts / cross-checking the JAX solver;
2. **device callback** — ``NativeORCA.as_pure_callback`` wraps the C call in
   ``jax.pure_callback`` so a jitted env step can route crowd dynamics
   through the native solver (the reference's architecture, kept as an
   option; the pure-JAX ORCA remains the default on-device path).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def _lib_path() -> str:
    return os.path.join(_repo_root(), "native", "orca", "liborca.so")


def _build() -> bool:
    src_dir = os.path.join(_repo_root(), "native", "orca")
    try:
        subprocess.run(["make", "-C", src_dir], check=True,
                       capture_output=True, timeout=120)
        return True
    except Exception as e:  # toolchain genuinely missing → JAX path only
        log.warning("native ORCA build failed: %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path) and not _build():
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError as e:
        log.warning("native ORCA load failed: %s", e)
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.orca_step_batch.argtypes = [
        f32p, f32p, f32p, f32p, f32p, u8p,
        ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        f32p]
    lib.orca_step_batch.restype = None
    lib.orca_version.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def native_orca_available() -> bool:
    return _load() is not None


def orca_step_batch_native(
    positions: np.ndarray, velocities: np.ndarray, radii: np.ndarray,
    pref_vels: np.ndarray, max_speeds: np.ndarray, active: np.ndarray,
    neighbor_dist: float = 10.0, time_horizon: float = 5.0,
    time_step: float = 0.25, safety_space: float = 0.0) -> np.ndarray:
    """positions/velocities/pref_vels [B, n, 2]; radii/max_speeds [B, n];
    active [B, n] → new velocities [B, n, 2]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native ORCA library unavailable")
    positions = np.ascontiguousarray(positions, np.float32)
    velocities = np.ascontiguousarray(velocities, np.float32)
    radii = np.ascontiguousarray(radii, np.float32)
    pref_vels = np.ascontiguousarray(pref_vels, np.float32)
    max_speeds = np.ascontiguousarray(max_speeds, np.float32)
    active = np.ascontiguousarray(active, np.uint8)
    B, n = radii.shape
    out = np.empty((B, n, 2), np.float32)
    lib.orca_step_batch(
        positions, velocities, radii, pref_vels, max_speeds, active,
        B, n, neighbor_dist, time_horizon, time_step, safety_space, out)
    return out


class NativeORCA:
    """Device-callback wrapper: use the C++ solver inside a jitted step."""

    def __init__(self, neighbor_dist=10.0, time_horizon=5.0, time_step=0.25,
                 safety_space=0.0):
        self.kw = dict(neighbor_dist=neighbor_dist, time_horizon=time_horizon,
                       time_step=time_step, safety_space=safety_space)

    def __call__(self, positions, velocities, radii, pref_vels, max_speeds,
                 active):
        import jax
        import jax.numpy as jnp

        def host(p, v, r, pv, ms, a):
            return orca_step_batch_native(p, v, r, pv, ms, a, **self.kw)

        return jax.pure_callback(
            host,
            jax.ShapeDtypeStruct(positions.shape, jnp.float32),
            positions, velocities, radii, pref_vels, max_speeds,
            active.astype(jnp.uint8),
            vmap_method="broadcast_all")
