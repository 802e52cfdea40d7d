"""Multi-host initialization and mesh construction.

The reference's only cross-host mechanism is LSF job arrays coordinating
through a shared MLflow server (SURVEY §2.8). The TPU-native equivalent for
sweeps larger than one host is SPMD: ``jax.distributed.initialize`` across
hosts of a pod slice, one global mesh, and the batch axis of
``parallel.sweep`` sharded over every chip in the slice (collectives ride
ICI; the file tracker stays the cross-process results bus exactly as MLflow
did for LSF).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import numpy as np

log = logging.getLogger(__name__)

__all__ = ["initialize_distributed", "global_mesh"]


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-host; no-op otherwise.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID); on Cloud TPU pods jax discovers them
    automatically and all arguments may stay None. Returns True when a
    multi-process runtime was initialized.
    """
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    n_proc = num_processes if num_processes is not None else \
        int(os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    pid = process_id if process_id is not None else \
        int(os.environ.get("JAX_PROCESS_ID", "-1"))
    if not coordinator and n_proc <= 1:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=n_proc or None,
            process_id=pid if pid >= 0 else None,
        )
        log.info("jax.distributed initialized: process %d of %d",
                 jax.process_index(), jax.process_count())
        return True
    except Exception as exc:
        log.warning("jax.distributed.initialize failed: %s", exc)
        return False


def global_mesh(axis_names: Sequence[str] = ("sweep",),
                axis_sizes: Optional[Sequence[int]] = None):
    """Mesh over ALL global devices (across hosts after initialization)."""
    import jax
    from jax.sharding import Mesh

    devices = np.array(jax.devices())
    if axis_sizes is None:
        shape = (devices.size,) + (1,) * (len(axis_names) - 1)
    else:
        shape = tuple(axis_sizes)
    return Mesh(devices.reshape(shape), tuple(axis_names))
