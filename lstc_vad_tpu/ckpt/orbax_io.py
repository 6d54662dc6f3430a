"""Checkpointing via Orbax: full train state (params + optimizer state + step
+ PRNG key), mesh-agnostic pytrees.

Improves on the reference, which saves only module state_dicts gated on AUC
(Train/spatio_transformer_shanghaitech.py:180-191) — no optimizer state or
step, so its resume restarts the schedule; ours resumes exactly.  The
DataParallel "module." prefix hack (README.md:61) has no equivalent here.

Multi-process (global-mesh) states are supported: every process calls save
with the same path on a SHARED filesystem (the Orbax requirement); directory
replacement is done by process 0 only, behind barriers.

Saves never destroy the previous committed checkpoint before the new one
is fully written: the new checkpoint lands in ``<path>.next`` and is
promoted over ``path`` once complete (synchronous saves promote before
returning; asynchronous ones at the next save / ``wait_for_saves()``) —
so a crash mid-write still leaves a valid checkpoint on disk.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, List, Optional, Tuple

import orbax.checkpoint as ocp

_ASYNC_CKPTR: Optional[ocp.AsyncCheckpointer] = None
_PENDING: List[Tuple[str, str, bool]] = []  # (tmp_path, final_path, multiproc)


def _async_ckptr() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def _is_multiprocess_state(state: Any) -> bool:
    import jax

    return any(not getattr(leaf, "is_fully_addressable", True)
               for leaf in jax.tree.leaves(state))


def _remove(path: str, multiproc: bool):
    """rmtree coordinated across processes: only process 0 touches the
    shared directory, everyone else waits at the barriers."""
    if not multiproc:
        if os.path.exists(path):
            shutil.rmtree(path)
        return
    import jax
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(f"ckpt_rm_enter:{path}")
    if jax.process_index() == 0 and os.path.exists(path):
        shutil.rmtree(path)
    multihost_utils.sync_global_devices(f"ckpt_rm_exit:{path}")


def _replace_keeping_old(tmp: str, final: str):
    """Swap ``tmp`` over ``final`` with one valid directory reachable at
    every instant: the previous checkpoint is parked at ``<final>.old``
    before the rename (a crash between steps leaves either ``final`` or
    ``.old``/``.next`` restorable — load_checkpoint falls back to both)."""
    old = final + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(final):
        os.replace(final, old)
    os.replace(tmp, final)
    if os.path.exists(old):
        shutil.rmtree(old)


def _promote(tmp: str, final: str, multiproc: bool):
    """Atomically (process-0-only) replace ``final`` with the committed
    ``tmp`` checkpoint."""
    if not multiproc:
        _replace_keeping_old(tmp, final)
        return
    import jax
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(f"ckpt_promote_enter:{final}")
    if jax.process_index() == 0:
        _replace_keeping_old(tmp, final)
    multihost_utils.sync_global_devices(f"ckpt_promote_exit:{final}")


def _commit_pending():
    global _ASYNC_CKPTR
    if not _PENDING:
        return
    try:
        _async_ckptr().wait_until_finished()
    except Exception:
        # The in-flight background write failed (disk full, fs error): its
        # .next directory is incomplete and must never be promoted over the
        # good checkpoint.  Drop the pending entry and the checkpointer
        # (AsyncCheckpointer pins the stored error) so the next save starts
        # clean instead of re-raising this failure forever.  close() first:
        # dropping the reference alone leaks its background thread for the
        # process lifetime.
        _PENDING.clear()
        try:
            _ASYNC_CKPTR.close()
        except Exception:
            pass  # already broken; the replacement checkpointer is the fix
        _ASYNC_CKPTR = None
        raise
    for tmp, final, multiproc in _PENDING:
        _promote(tmp, final, multiproc)
    _PENDING.clear()


def save_checkpoint(path: str, state: Any, overwrite: bool = True,
                    asynchronous: bool = False):
    """``state``: any pytree (TrainState or a bare params dict), local or
    global (multi-process) arrays.

    ``asynchronous=True``: device->host copies happen now, serialization and
    file writes continue in a background thread — the train loop keeps
    stepping during periodic autosaves.  The write goes to ``<path>.next``
    and is promoted over ``path`` on the next save / ``wait_for_saves()``,
    so the previous committed checkpoint survives a crash mid-write."""
    path = os.path.abspath(path)
    multiproc = _is_multiprocess_state(state)
    if asynchronous:
        _commit_pending()  # at most one save in flight; promotes the last
        tmp = path + ".next"
        _remove(tmp, multiproc)
        _async_ckptr().save(tmp, args=ocp.args.StandardSave(state))
        _PENDING.append((tmp, path, multiproc))
        return
    ckptr = ocp.StandardCheckpointer()
    if overwrite:
        # Never delete the existing checkpoint before the replacement is
        # fully on disk: write to <path>.next, then promote (same
        # one-valid-directory-at-every-instant guarantee as the async path).
        _commit_pending()  # a pending async save may own <path>.next
        tmp = path + ".next"
        _remove(tmp, multiproc)
        ckptr.save(tmp, state)
        ckptr.wait_until_finished()
        _promote(tmp, path, multiproc)
        return
    ckptr.save(path, state)
    ckptr.wait_until_finished()


def wait_for_saves():
    """Block until every pending asynchronous save has committed AND been
    promoted to its final path."""
    if _PENDING:
        _commit_pending()  # waits, promotes; on failure drops the dead entry
    elif _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree; ``target`` provides structure/shape/dtype template
    (global-array targets restore sharded).

    If ``path`` itself is absent (a crash landed between an async commit and
    its promotion), the uncommitted ``<path>.next`` and the parked
    ``<path>.old`` are tried in that order — with a warning naming the
    directory actually restored, so a crash-recovery resume never silently
    continues from an older or differently-stepped checkpoint."""
    import logging

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    candidates = [p for p in (path, path + ".next", path + ".old")
                  if os.path.isdir(p)] or [path]
    err = None
    for p in candidates:
        try:
            restored = ckptr.restore(p, target)
        except Exception as e:  # partial write: fall through to the next
            err = err or e
            continue
        if p != path:
            logging.getLogger("lstc_vad_tpu").warning(
                "checkpoint %s missing or unreadable; restored fallback %s "
                "(its step may differ from the last save)", path, p)
        return restored
    raise err
