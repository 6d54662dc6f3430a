"""Full-state checkpoint/resume: params + Adagrad accumulators + step + rng
round-trip through Orbax, and resumed training continues identically."""

import jax
import numpy as np
import pytest

from lstc_vad_tpu.train.driver import Trainer

import test_train_e2e as e2e


def test_save_restore_roundtrip(tmp_path):
    cfg = e2e._cfg(tmp_path, "stn")
    t1 = Trainer(cfg)
    t1.fit(epochs=1)
    path = str(tmp_path / "state_ckpt")
    t1.save_state(path)

    t2 = Trainer(e2e._cfg(tmp_path / "b", "stn"))
    t2.restore_state(path)
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t2.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(t2.state.step) == int(t1.state.step)
    for a, b in zip(jax.tree.leaves(t1.state.opt_state),
                    jax.tree.leaves(t2.state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_identically(tmp_path):
    # run 2 epochs straight vs 1 epoch + save/restore + 1 epoch
    straight = Trainer(e2e._cfg(tmp_path / "s", "stn"))
    straight.fit(epochs=2)

    first = Trainer(e2e._cfg(tmp_path / "r1", "stn"))
    first.fit(epochs=1)
    path = str(tmp_path / "mid")
    first.save_state(path)

    resumed = Trainer(e2e._cfg(tmp_path / "r2", "stn"))
    resumed.restore_state(path)
    # keep the host-side sampler stream aligned with the straight run
    resumed.dataset.rng = first.dataset.rng
    resumed.dataset._norm_perm = first.dataset._norm_perm
    resumed.dataset._abnorm_perm = first.dataset._abnorm_perm
    resumed.fit(epochs=1)

    for a, b in zip(jax.tree.leaves(straight.state.params),
                    jax.tree.leaves(resumed.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_async_autosave_restores_exactly(tmp_path):
    """fit(autosave_every) saves asynchronously (training keeps stepping
    during the background write); the committed autosave restores the exact
    state of the epoch it captured."""
    cfg = e2e._cfg(tmp_path, "stn")
    t1 = Trainer(cfg)
    t1.fit(epochs=3, autosave_every=1)  # autosaves at epochs 1 and 2

    import os

    auto = os.path.join(cfg.model_save_dir, "autosave")
    assert os.path.isdir(auto)
    t2 = Trainer(e2e._cfg(tmp_path / "b", "stn"))
    t2.restore_state(auto)
    # the last autosave fired at the top of epoch 2, i.e. 2 epochs of steps
    steps_per_epoch = int(t1.state.step) // 3
    assert int(t2.state.step) == 2 * steps_per_epoch

    # explicit async save + wait also round-trips bit-exactly
    from lstc_vad_tpu.ckpt import wait_for_saves

    path = str(tmp_path / "async_ckpt")
    t1.save_state(path, asynchronous=True)
    wait_for_saves()
    t3 = Trainer(e2e._cfg(tmp_path / "c", "stn"))
    t3.restore_state(path)
    for a, b in zip(jax.tree.leaves(t1.state.params),
                    jax.tree.leaves(t3.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_checkpoint_falls_back_to_next_and_old(tmp_path, caplog):
    """A crash between an async commit and its promotion leaves the new
    checkpoint at <path>.next (or the previous one parked at <path>.old);
    load_checkpoint restores from either when the final path is absent —
    and WARNS naming the directory actually used, so the operator knows the
    resume may not be the last save."""
    import logging

    from lstc_vad_tpu.ckpt import load_checkpoint, save_checkpoint

    tree = {"a": np.arange(6, dtype=np.float32),
            "b": np.full((2, 3), 7.0, dtype=np.float32)}
    target = {"a": np.zeros(6, np.float32), "b": np.zeros((2, 3), np.float32)}
    p = str(tmp_path / "ck")

    save_checkpoint(p + ".next", tree)  # crash before the promote rename
    with caplog.at_level(logging.WARNING, logger="lstc_vad_tpu"):
        out = load_checkpoint(p, target)
    np.testing.assert_array_equal(out["a"], tree["a"])
    assert any(p + ".next" in r.getMessage() for r in caplog.records)

    import os
    os.replace(p + ".next", p + ".old")  # crash after parking the old one
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="lstc_vad_tpu"):
        out = load_checkpoint(p, target)
    np.testing.assert_array_equal(out["b"], tree["b"])
    assert any(p + ".old" in r.getMessage() for r in caplog.records)

    save_checkpoint(p, {"a": tree["a"] + 1, "b": tree["b"]})
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="lstc_vad_tpu"):
        out = load_checkpoint(p, target)  # committed path wins over .old
    np.testing.assert_array_equal(out["a"], tree["a"] + 1)
    assert not caplog.records  # the primary path restores silently


def test_promote_keeps_one_valid_checkpoint(tmp_path):
    """_replace_keeping_old: the previous checkpoint survives at .old during
    the swap and the final path always ends up with the new one."""
    import os

    from lstc_vad_tpu.ckpt.orbax_io import _replace_keeping_old

    final, tmp = str(tmp_path / "final"), str(tmp_path / "incoming")
    os.makedirs(final)
    open(final + "/marker_old", "w").close()
    os.makedirs(tmp)
    open(tmp + "/marker_new", "w").close()
    _replace_keeping_old(tmp, final)
    assert os.path.exists(final + "/marker_new")
    assert not os.path.exists(final + ".old")  # cleaned after the swap
    assert not os.path.exists(tmp)


def test_sync_save_keeps_old_until_new_committed(tmp_path, monkeypatch):
    """Synchronous overwrite save must never delete the existing checkpoint
    before the replacement is fully written: a crash mid-serialization
    leaves the previous checkpoint restorable."""
    import orbax.checkpoint as ocp

    from lstc_vad_tpu.ckpt import load_checkpoint, save_checkpoint

    tree = {"a": np.arange(4, dtype=np.float32)}
    target = {"a": np.zeros(4, np.float32)}
    p = str(tmp_path / "ck")
    save_checkpoint(p, tree)

    def crashing_save(self, path, state):
        # partial write: the tmp directory exists but holds no valid
        # checkpoint (raising after orbax completes would corrupt its
        # global signaling contracts — and a real crash interrupts the
        # write, it doesn't finish it)
        import os

        os.makedirs(path, exist_ok=True)
        raise RuntimeError("simulated crash mid-save")

    monkeypatch.setattr(ocp.StandardCheckpointer, "save", crashing_save)
    with np.testing.assert_raises(RuntimeError):
        save_checkpoint(p, {"a": tree["a"] + 1})
    monkeypatch.undo()

    out = load_checkpoint(p, target)  # crash-window state: old one survives
    np.testing.assert_array_equal(out["a"], tree["a"])

    save_checkpoint(p, {"a": tree["a"] + 2})  # and the path still works
    out = load_checkpoint(p, target)
    np.testing.assert_array_equal(out["a"], tree["a"] + 2)


def test_failed_async_save_does_not_wedge(tmp_path):
    """A failed background write must not be promoted, must not leave a
    stale _PENDING entry re-raising forever, and must not block later
    saves."""
    import pytest

    from lstc_vad_tpu.ckpt import load_checkpoint, save_checkpoint
    from lstc_vad_tpu.ckpt import orbax_io

    tree = {"a": np.arange(3, dtype=np.float32)}
    target = {"a": np.zeros(3, np.float32)}
    p = str(tmp_path / "ck")
    save_checkpoint(p, tree)

    class FailingCkptr:
        def wait_until_finished(self):
            raise OSError("simulated disk-full background write")

    orbax_io._PENDING.append((p + ".next", p, False))
    saved = orbax_io._ASYNC_CKPTR
    orbax_io._ASYNC_CKPTR = FailingCkptr()
    try:
        with pytest.raises(OSError):
            orbax_io.wait_for_saves()
    finally:
        # unconditional: if the raise regression-fails, the FailingCkptr
        # must still never leak into later tests' async saves
        orbax_io._ASYNC_CKPTR = saved
    assert orbax_io._PENDING == []  # dead entry dropped, machinery clean

    out = load_checkpoint(p, target)  # incomplete .next never promoted
    np.testing.assert_array_equal(out["a"], tree["a"])
    save_checkpoint(p, {"a": tree["a"] + 1}, asynchronous=True)
    orbax_io.wait_for_saves()
    out = load_checkpoint(p, target)
    np.testing.assert_array_equal(out["a"], tree["a"] + 1)
