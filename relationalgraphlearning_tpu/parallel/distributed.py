"""Multi-host (multi-process) entry point.

The reference is single-process (SURVEY.md §2.6 — no NCCL/MPI/Gloo). Here
multi-host runs are the SAME program as single-host: each host calls
``initialize()`` once at startup, after which ``jax.devices()`` spans the
whole pod slice, ``parallel.mesh.make_mesh()`` lays the global mesh over
ICI (intra-slice) + DCN (cross-host), and every ``shard_map``/``pjit``
collective in this package works unchanged — XLA routes ring ``ppermute``
hops over ICI within a host's chips and over DCN at host boundaries.

Launch pattern (one process per host):

    JAX_COORDINATOR=host0:8476 NPROC=4 PROC_ID=$i python -m \
        relationalgraphlearning_tpu.cli.train --multihost ...

On this single-chip environment the path is validated by (a) this module's
no-op fallback (single process → initialize is skipped, identical behavior)
and (b) the virtual 8-device mesh tests driving every collective the
multi-host mesh would issue. There is no multi-host hardware here to
demonstrate wall-clock scaling (BASELINE.md documents the limitation).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

log = logging.getLogger(__name__)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed from args or environment.

    Reads ``JAX_COORDINATOR`` / ``NPROC`` / ``PROC_ID`` when args are None.
    Returns True when a multi-process runtime was initialized, False for
    the single-process fallback (no-op — the framework runs identically).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("NPROC", "1"))
    if process_id is None:
        process_id = int(os.environ.get("PROC_ID", "0"))

    if coordinator_address is None or num_processes <= 1:
        log.info("single-process run (no coordinator configured)")
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    log.info("jax.distributed initialized: process %d/%d, %d global devices",
             process_id, num_processes, len(jax.devices()))
    return True


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
