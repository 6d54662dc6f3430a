"""Multi-host execution helpers: place host-replicated values onto a global
('data','model') mesh and fetch sharded results back on every host.

Contract (the standard SPMD-input recipe): every process runs the SAME
host-side pipeline — identical seeds produce identical numpy batches — and
``to_global`` hands each device exactly its shard via
``jax.make_array_from_callback``; no host ever materializes another host's
device data.  Replicated outputs (losses, metrics) are directly readable;
data-sharded outputs (per-part eval scores) come back through
``process_allgather`` over DCN.

The reference has no multi-host story at all (nn.DataParallel is
single-process, SURVEY §2.8); here the same Trainer runs unchanged on a
multi-process global mesh (tests/multihost_trainer_worker.py).
"""

from __future__ import annotations

import jax
import numpy as np


def is_multiprocess(mesh) -> bool:
    """True when the mesh spans devices of more than one jax process."""
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def to_global(tree, shardings):
    """Host-replicated numpy pytree -> global jax.Arrays on the mesh.
    Each process contributes only the shards its local devices own."""
    def put(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, s, lambda idx, x=x: x[idx])

    return jax.tree.map(put, tree, shardings)


def fetch(x) -> np.ndarray:
    """numpy value of a possibly non-fully-addressable array: replicated /
    local arrays read directly, cross-process-sharded ones allgather."""
    if getattr(x, "is_fully_addressable", True):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
