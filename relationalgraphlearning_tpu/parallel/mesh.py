"""Device mesh construction.

The reference has NO distributed execution of any kind (SURVEY.md §2.6) —
this layer is new capability, built the JAX way: one logical mesh with a
``data`` axis (env/batch parallelism over chips; gradients all-reduce over
ICI) and a ``model`` axis (tensor/graph partitioning: Dense kernels and graph
node/edge shards). Multi-host extends the same mesh over DCN via
``jax.distributed.initialize`` — no NCCL/MPI analogue needed; XLA owns the
collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Mesh with axes ("data", "model"). Defaults: all devices on data."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} > {n} devices")
    # explicit sizes may use a prefix of the available devices
    arr = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))
