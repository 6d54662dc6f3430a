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
    """Call BEFORE any other jax API (touching the backend first makes
    jax.distributed.initialize fail).  With explicit arguments, failures
    raise; with auto-detection, a single-process environment falls back to
    local execution with a warning — never silently on a real pod.
    """
    import warnings

    explicit = coordinator_address is not None
    kwargs = {}
    if explicit:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        # jax._src.distributed raises "distributed.initialize should only
        # be called once." on re-entry (message checked against the
        # installed JAX; "already" kept for other versions)
        msg = str(e).lower()
        if "only be called once" in msg or "already" in msg:
            return  # initialized earlier — fine
        raise
    except ValueError as e:
        if explicit:
            raise
        # auto-detection found no cluster environment: run single-process
        warnings.warn(f"jax.distributed auto-detection failed ({e}); "
                      f"running single-process")


def make_global_mesh(n_head: int = 8, max_model: int = 4) -> Mesh:
    """('data','model') mesh over ALL devices across hosts; the model axis
    divides the per-host device count so tp collectives ride ICI only, and
    caps at 4 like factor_devices' default — tp profit saturates at the
    d_model contractions, dp absorbs growth (docs/ARCHITECTURE.md
    'Parallelism')."""
    # sort by (process, device id): jax.devices() is process-contiguous on
    # standard pods, but the ICI-locality claim below must not rest on an
    # unenforced ordering (interleaved orders exist on some topologies)
    devices = np.asarray(sorted(jax.devices(),
                                key=lambda dev: (dev.process_index, dev.id)))
    local = jax.local_device_count()
    _, model = factor_devices(local, n_head=n_head, max_model=max_model)
    grid = devices.reshape(-1, model)
    return Mesh(grid, axis_names=("data", "model"))
