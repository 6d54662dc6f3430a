"""AOT scorer artifacts (jax.export): save -> load -> run must reproduce the
live flax apply exactly, across batch sizes, through a serialized program."""

import numpy as np
import pytest

import jax

from lstc_vad_tpu.config import EncoderConfig
from lstc_vad_tpu.export import load_scorer, save_scorer_artifact
from lstc_vad_tpu.models import Encoder, make_head

CFG = EncoderConfig(d_model=16, d_inner=24, n_head=2, d_k=8, d_v=8,
                    n_layers=2, relative_pe=True, window_size=2,
                    window_depth=3, ffn_layernorm=True, attn_impl="xla")
TOKEN_LEN = 3 * 4  # part_len=3, n_patch=4 -> within the 3*2*2 RPE window


def _build(rng):
    encoder = Encoder(CFG)
    head = make_head("classifier", CFG.d_model, 8)
    x = rng.standard_normal((2, TOKEN_LEN, CFG.d_model)).astype(np.float32)
    params = {
        "encoder": jax.tree.map(
            np.asarray, encoder.init(jax.random.PRNGKey(0), x))["params"],
        "head": jax.tree.map(
            np.asarray, head.init(jax.random.PRNGKey(1),
                                  x[:, 0, :]))["params"],
    }
    return encoder, head, params


def test_artifact_roundtrip_matches_live_apply(rng, tmp_path):
    encoder, head, params = _build(rng)
    art = str(tmp_path / "artifact")
    save_scorer_artifact(art, encoder, head, "classifier", params,
                         TOKEN_LEN, CFG.d_model, platforms=("cpu",))

    loaded = load_scorer(art)
    for batch in (1, 3, 8):
        x = rng.standard_normal(
            (batch, TOKEN_LEN, CFG.d_model)).astype(np.float32)
        live = np.asarray(head.apply(
            {"params": params["head"]},
            encoder.apply({"params": params["encoder"]}, x,
                          deterministic=True)[:, 0, :],
            deterministic=True))[:, 1]
        np.testing.assert_allclose(loaded.score(x), live, rtol=1e-6,
                                   atol=1e-7)


def test_artifact_l2_and_regressor(rng, tmp_path):
    encoder = Encoder(CFG)
    head = make_head("regressor", CFG.d_model, 8)
    x = rng.standard_normal((4, TOKEN_LEN, CFG.d_model)).astype(np.float32)
    params = {
        "encoder": jax.tree.map(
            np.asarray, encoder.init(jax.random.PRNGKey(0), x))["params"],
        "head": jax.tree.map(
            np.asarray, head.init(jax.random.PRNGKey(1),
                                  x[:, 0, :]))["params"],
    }
    art = str(tmp_path / "artifact")
    save_scorer_artifact(art, encoder, head, "regressor", params, TOKEN_LEN,
                         CFG.d_model, l2_normalize=True, platforms=("cpu",))
    loaded = load_scorer(art)
    xn = x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
    live = np.asarray(head.apply(
        {"params": params["head"]},
        encoder.apply({"params": params["encoder"]}, xn,
                      deterministic=True)[:, 0, :],
        deterministic=True))[:, 0]
    np.testing.assert_allclose(loaded.score(x), live, rtol=1e-5, atol=1e-6)


def test_multi_length_artifact_tail_parity(rng, tmp_path):
    """Tail lengths are distinct programs (RPE slices by length): each baked
    length must reproduce the live apply at that length."""
    encoder, head, params = _build(rng)
    art = str(tmp_path / "artifact")
    save_scorer_artifact(art, encoder, head, "classifier", params,
                         TOKEN_LEN, CFG.d_model, platforms=("cpu",),
                         extra_token_lens=(4, 8))
    loaded = load_scorer(art)
    assert loaded.token_lens == [4, 8, TOKEN_LEN]
    for L in (4, 8, TOKEN_LEN):
        x = rng.standard_normal((3, L, CFG.d_model)).astype(np.float32)
        live = np.asarray(head.apply(
            {"params": params["head"]},
            encoder.apply({"params": params["encoder"]}, x,
                          deterministic=True)[:, 0, :],
            deterministic=True))[:, 1]
        np.testing.assert_allclose(loaded.score(x), live, rtol=1e-6,
                                   atol=1e-7)


def test_artifact_rejects_wrong_token_shape(rng, tmp_path):
    encoder, head, params = _build(rng)
    art = str(tmp_path / "artifact")
    save_scorer_artifact(art, encoder, head, "classifier", params,
                         TOKEN_LEN, CFG.d_model, platforms=("cpu",))
    loaded = load_scorer(art)
    with pytest.raises(ValueError, match="do not match"):
        loaded.score(np.zeros((2, TOKEN_LEN + 1, CFG.d_model), np.float32))


def test_multiplatform_export_lowable_from_cpu(rng, tmp_path):
    """platforms=('tpu','cpu') cross-lowers on a CPU-only host; if this jax
    build can't, the artifact feature still works single-platform."""
    encoder, head, params = _build(rng)
    art = str(tmp_path / "artifact")
    try:
        save_scorer_artifact(art, encoder, head, "classifier", params,
                             TOKEN_LEN, CFG.d_model,
                             platforms=("tpu", "cpu"))
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"cross-platform lowering unavailable: {e}")
    loaded = load_scorer(art)
    x = rng.standard_normal((2, TOKEN_LEN, CFG.d_model)).astype(np.float32)
    assert loaded.score(x).shape == (2,)
