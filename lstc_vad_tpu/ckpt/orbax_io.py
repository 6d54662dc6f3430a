"""Checkpointing via Orbax: full train state (params + optimizer state + step
+ PRNG key), mesh-agnostic pytrees.

Improves on the reference, which saves only module state_dicts gated on AUC
(Train/spatio_transformer_shanghaitech.py:180-191) — no optimizer state or
step, so its resume restarts the schedule; ours resumes exactly.  The
DataParallel "module." prefix hack (README.md:61) has no equivalent here.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp

_ASYNC_CKPTR: Optional[ocp.AsyncCheckpointer] = None


def _async_ckptr() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def save_checkpoint(path: str, state: Any, overwrite: bool = True,
                    asynchronous: bool = False):
    """``state``: any pytree (TrainState or a bare params dict).

    ``asynchronous=True``: device->host copies happen now, serialization and
    file writes continue in a background thread — the train loop keeps
    stepping during periodic autosaves.  Call ``wait_for_saves()`` (or save
    synchronously once) before reading the directory back."""
    path = os.path.abspath(path)
    if asynchronous:
        ckptr = _async_ckptr()
        ckptr.wait_until_finished()  # at most one save in flight
    else:
        ckptr = ocp.StandardCheckpointer()
    if overwrite and os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    if asynchronous:
        ckptr.save(path, args=ocp.args.StandardSave(state))
    else:
        ckptr.save(path, state)
        ckptr.wait_until_finished()


def wait_for_saves():
    """Block until every pending asynchronous save has committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree; ``target`` provides structure/shape/dtype template."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target)
