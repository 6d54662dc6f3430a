"""Multi-host initialization: the same ('data','model') mesh extended over a
pod slice / multiple hosts.

Single entry point around jax.distributed.initialize: on TPU pods the
coordinator/process count/id are discovered from the environment
automatically; elsewhere pass them explicitly.  After init, build the global
mesh with make_global_mesh() — data parallelism spans hosts over DCN, tensor
parallelism stays within each host's ICI domain (the model axis is kept
inside the local device block).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import factor_devices


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None):
    """No-op when already initialized or single-process."""
    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # single-process / env not set: stay local
        pass


def make_global_mesh(n_head: int = 8, max_model: int = 8) -> Mesh:
    """('data','model') mesh over ALL devices across hosts; the model axis
    divides the per-host device count so tp collectives ride ICI only."""
    devices = np.asarray(jax.devices())
    local = jax.local_device_count()
    _, model = factor_devices(local, n_head=n_head, max_model=max_model)
    grid = devices.reshape(-1, model)
    return Mesh(grid, axis_names=("data", "model"))
