"""Mesh/sharding: dp x tp train step over the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from lstc_vad_tpu.parallel import factor_devices, make_mesh, \
    param_sharding_rules
from lstc_vad_tpu.parallel.dryrun import run_multichip_step


def test_factor_devices():
    assert factor_devices(1) == (1, 1)
    assert factor_devices(2) == (1, 2)
    # n >= 4 keeps both axes > 1: dp all-reduce AND tp collectives exercised
    assert factor_devices(4) == (2, 2)
    assert factor_devices(8) == (2, 4)
    # tp caps at 4 (contraction profit saturates); dp absorbs growth
    assert factor_devices(16) == (4, 4)
    assert factor_devices(32) == (8, 4)
    assert factor_devices(16, max_model=8) == (2, 8)
    assert factor_devices(6, n_head=8) == (3, 2)
    assert factor_devices(3) == (3, 1)


def test_sharding_rules():
    assert param_sharding_rules(
        "encoder/layer_0/slf_attn/w_qs/kernel") == P(None, "model")
    assert param_sharding_rules(
        "encoder/layer_2/slf_attn/fc/kernel") == P("model", None)
    assert param_sharding_rules(
        "encoder/layer_0/slf_attn/relative_position_bias_table") == \
        P(None, "model")
    assert param_sharding_rules("encoder/layer_1/pos_ffn/w_1/bias") == \
        P("model")
    assert param_sharding_rules("encoder/layer_1/pos_ffn/layer_norm/scale") == P()
    assert param_sharding_rules("head/mlp/linear_2/kernel") == P()


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_multichip_step_runs(n_devices):
    assert len(jax.devices()) >= n_devices
    metrics = run_multichip_step(n_devices)
    assert np.isfinite(metrics["loss"])
    assert np.isfinite(metrics["ce"])


def test_multichip_full_surface():
    """Train step + sharded batched eval (finite frame AUC) + pseudo-gen on
    one (2, 4) mesh — the surface a real multi-chip run hits (the 4x4
    16-device factorization runs in test_graft_entry's fresh-process dryrun,
    which provisions 16 virtual devices)."""
    from lstc_vad_tpu.parallel.dryrun import run_multichip_surface

    out = run_multichip_surface(8)
    assert np.isfinite(out["loss"])
    assert 0.0 <= out["eval_auc"] <= 1.0
    assert out["n_pseudo_videos"] == 2


def test_multichip_eval_matches_unsharded():
    """The mesh-sharded eval dispatch is numerically the plain path: same
    params, same videos -> same frame AUC (GSPMD only changes layout)."""
    from lstc_vad_tpu.evaluation.drivers import evaluate_ltn
    from lstc_vad_tpu.evaluation.scoring import PartScorer
    from lstc_vad_tpu.parallel.dryrun import run_multichip_step
    from lstc_vad_tpu.parallel.mesh import batch_sharding, make_mesh

    _, (state, encoder, head, mesh, cfg) = run_multichip_step(
        8, return_state=True)
    d = cfg.data
    rng = np.random.default_rng(3)
    items = []
    for n_clips in (7, 12):
        feats = rng.standard_normal(
            (n_clips, d.n_patch, cfg.encoder.d_model)).astype(np.float32)
        anno = (rng.random(n_clips * 16) < 0.5).astype(np.float64)
        items.append((feats, anno))
    params = jax.tree.map(np.asarray, state.params)  # gather to host
    sharded = PartScorer(encoder, head, d.part_len, d.n_patch,
                         sharding=batch_sharding(make_mesh(2, 4)))
    plain = PartScorer(encoder, head, d.part_len, d.n_patch)
    auc_sharded = evaluate_ltn(state.params, sharded, items)
    auc_plain = evaluate_ltn(params, plain, items)
    assert auc_sharded == pytest.approx(auc_plain, abs=1e-6)


def test_multichip_matches_single_device():
    m8 = run_multichip_step(8, batch_size=4)   # (2, 4) mesh
    m1 = run_multichip_step(1, batch_size=4)
    # same math, different partitioning: losses agree to float32 reduction noise
    assert m8["loss"] == pytest.approx(m1["loss"], rel=1e-4)


def test_multichip_surface_non_power_of_two_devices():
    """n=6 -> (data=3, model=2): the equality dryrun must work for any
    factorization, with a batch size the data axis actually divides."""
    from math import lcm

    from lstc_vad_tpu.parallel.dryrun import (assert_surface_matches,
                                              run_multichip_surface)

    bs = 2 * lcm(factor_devices(6)[0], 1)  # = 6, divisible by 3 and 1
    base = run_multichip_surface(1, batch_size=bs)
    out = run_multichip_surface(6, batch_size=bs)
    assert_surface_matches(base, out, label="6-device")


def test_multichip_surface_matches_single_device():
    """The driver-visible dryrun contract: the FULL surface (train step,
    sharded eval AUC, pseudo-label vectors) on the (2, 4) mesh equals the
    1-device run — and the comparator actually rejects divergent results."""
    from lstc_vad_tpu.parallel.dryrun import (assert_surface_matches,
                                              run_multichip_surface)

    base = run_multichip_surface(1, batch_size=8)
    out = run_multichip_surface(8, batch_size=8)
    assert_surface_matches(base, out, label="8-device")

    broken = dict(out, loss=out["loss"] + 0.1)
    with pytest.raises(AssertionError):
        assert_surface_matches(base, broken, label="broken-loss")
    key = next(iter(out["pseudo"]))
    broken = dict(out, pseudo={**out["pseudo"],
                               key: out["pseudo"][key] + 0.05})
    with pytest.raises(AssertionError):
        assert_surface_matches(base, broken, label="broken-pseudo")


def test_make_global_mesh_matches_factor_devices_default():
    """The multihost mesh defaults to the same tp-cap-at-4 factorization as
    factor_devices (the 16-device cap itself is pinned above): on this
    8-device single-process host the global mesh is data=2 x model=4."""
    import inspect

    from lstc_vad_tpu.parallel.distributed import make_global_mesh

    mesh = make_global_mesh(n_head=8)
    assert mesh.shape["model"] == 4 and mesh.shape["data"] == 2
    # the default cap must track factor_devices' (a >=16-local-device host
    # cannot be simulated here, so pin the signature)
    assert inspect.signature(
        make_global_mesh).parameters["max_model"].default == \
        inspect.signature(factor_devices).parameters["max_model"].default
