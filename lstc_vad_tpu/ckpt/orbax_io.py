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


def save_checkpoint(path: str, state: Any, overwrite: bool = True):
    """``state``: any pytree (TrainState or a bare params dict)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if overwrite and os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    ckptr.save(path, state)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree; ``target`` provides structure/shape/dtype template."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target)
