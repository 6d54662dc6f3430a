"""Trainer over a real multi-device mesh (virtual CPU devices): sharded
training matches the unsharded run."""

import jax
import numpy as np
import pytest

from lstc_vad_tpu.parallel.mesh import make_mesh
from lstc_vad_tpu.train.driver import Trainer

import test_train_e2e as e2e


def test_trainer_on_mesh_matches_single_device(tmp_path):
    assert len(jax.devices()) >= 4
    mesh = make_mesh(data=2, model=2)

    plain = Trainer(e2e._cfg(tmp_path / "plain", "stn"))
    r_plain = plain.fit(epochs=1)

    sharded = Trainer(e2e._cfg(tmp_path / "mesh", "stn"), mesh=mesh)
    r_mesh = sharded.fit(epochs=1)

    assert r_mesh.history[0]["loss"] == pytest.approx(
        r_plain.history[0]["loss"], rel=1e-4)
    assert r_mesh.history[0]["auc_test"] == pytest.approx(
        r_plain.history[0]["auc_test"], abs=1e-6)
    # params end up numerically equal too
    for a, b in zip(jax.tree.leaves(plain.state.params),
                    jax.tree.leaves(sharded.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_mesh_sharded_eval_matches(tmp_path):
    """Evaluation with data-sharded batches over the mesh gives the same AUC."""
    mesh = make_mesh(data=4, model=2)
    plain = Trainer(e2e._cfg(tmp_path / "p", "ltn"))
    sharded = Trainer(e2e._cfg(tmp_path / "m", "ltn"), mesh=mesh)
    # same params on both (fresh inits are identical: same seed)
    a = plain.evaluate("test")
    b = sharded.evaluate("test")
    assert b == pytest.approx(a, abs=1e-6)


def test_coteach_rounds_on_mesh(tmp_path):
    """A full co-teaching alternation runs with every round's Trainer
    sharded over a dp x tp mesh (CLI `coteach --mesh`)."""
    import math

    from fixtures import make_sht_like
    from lstc_vad_tpu.pseudo import CoTeachingDriver
    from test_golden_pipeline import _cfg as golden_cfg

    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30), seed=7)
    mesh = make_mesh(data=2, model=2)
    driver = CoTeachingDriver(golden_cfg("stn", fixture, tmp_path),
                              golden_cfg("ltn", fixture, tmp_path),
                              str(tmp_path / "work"), stn_threshold=0.5,
                              ltn_threshold=0.4, mesh=mesh)
    trainers = driver.run(rounds=2, stn_epochs=1, ltn_epochs=1)
    assert math.isfinite(trainers[1].evaluate("test"))
