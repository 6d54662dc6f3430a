"""Stochastic-rounding cast (ops/sr.py) + the encoder's cast_sr probe arm.

The SR cast is the VERDICT r4 #6 numerics lead: an UNBIASED f32->bf16 cast
for the train-time matmul inputs, replacing the biased round-to-nearest that
is the hypothesized cause of the measured bf16 AUC gap (docs/ARCHITECTURE.md
"bf16 train-compute quality study").
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lstc_vad_tpu.ops.sr import sr_cast


def _neighbors(x):
    """(floor, ceil) bf16 neighbors of f32 values (floor = truncation)."""
    bits = np.asarray(x, np.float32).view(np.uint32)
    lo = (bits & 0xFFFF0000).view(np.float32).astype(jnp.bfloat16)
    hi = ((bits & 0xFFFF0000) + 0x10000).view(np.float32).astype(jnp.bfloat16)
    return lo, hi


def test_sr_cast_lands_on_bf16_neighbors():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(256) * rng.choice([1e-3, 1.0, 1e3], 256)
         ).astype(np.float32)
    lo, hi = _neighbors(x)
    out = np.asarray(sr_cast(jnp.asarray(x), jax.random.PRNGKey(0)))
    assert out.dtype == jnp.bfloat16
    assert np.all((out == lo) | (out == hi))


def test_sr_cast_unbiased():
    """E[sr_cast(x)] == x: the mean over many keys converges to the exact
    f32 value, far inside the one-ulp gap a biased RTN cast sits at."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    n = 4096
    casts = jax.vmap(lambda k: sr_cast(x, k).astype(jnp.float32))(
        jax.random.split(jax.random.PRNGKey(42), n))
    mean = np.asarray(casts.mean(axis=0))
    lo, hi = _neighbors(x)
    # for negative x the truncated neighbor is the numerically greater one
    gap = np.abs(np.asarray(hi, np.float32) - np.asarray(lo, np.float32))
    err = np.abs(mean - np.asarray(x))
    # 5-sigma bound on a Bernoulli mean over n draws, per element
    assert np.all(err <= 5 * gap * 0.5 / np.sqrt(n) + 1e-12), err.max()


def test_sr_cast_exact_values_stable():
    """bf16-representable values return exactly, under every key."""
    exact = jnp.asarray(np.float32([0.0, 1.0, -2.5, 0.15625, 2.0 ** 15]))
    assert np.all(np.asarray(exact.astype(jnp.bfloat16), np.float32)
                  == np.asarray(exact))  # really representable
    for seed in range(4):
        out = sr_cast(exact, jax.random.PRNGKey(seed))
        assert np.all(np.asarray(out, np.float32) == np.asarray(exact))


def test_sr_cast_propagates_non_finite():
    """NaN/Inf must survive the cast: the mantissa+noise add could wrap a
    high-payload NaN through the sign bit into ±0.0, silently masking a
    training divergence."""
    x = jnp.asarray(np.array([np.nan, np.inf, -np.inf, 1.5], np.float32))
    # also an adversarial high-payload NaN whose bits sit at 0x7FFFFFFF
    evil = jax.lax.bitcast_convert_type(
        jnp.uint32(0x7FFFFFFF), jnp.float32).reshape(())
    x = jnp.concatenate([x, evil[None]])
    for seed in range(4):
        out = np.asarray(sr_cast(x, jax.random.PRNGKey(seed)), np.float32)
        assert np.isnan(out[0]) and np.isnan(out[4]), out
        assert out[1] == np.inf and out[2] == -np.inf
        assert out[3] == 1.5


def test_sr_cast_passthrough_non_f32():
    x = jnp.ones((3,), jnp.bfloat16) * 1.5
    out = sr_cast(x, jax.random.PRNGKey(0))
    assert out.dtype == jnp.bfloat16
    assert np.all(np.asarray(out) == np.asarray(x))


def test_sr_cast_straight_through_grad():
    x = jnp.asarray(np.float32([0.3, -1.7, 2.0]))
    g = jax.grad(lambda v: jnp.sum(
        sr_cast(v, jax.random.PRNGKey(0)).astype(jnp.float32) * 3.0))(x)
    np.testing.assert_allclose(np.asarray(g), 3.0, rtol=1e-6)


# ------------------------------------------------------- encoder cast_sr arm

def _enc_cfg(**kw):
    from lstc_vad_tpu.config import EncoderConfig

    return EncoderConfig(d_model=16, d_inner=32, n_head=2, d_k=8, d_v=8,
                         n_layers=2, mha_layernorm=True, ffn_layernorm=True,
                         relative_pe=True, window_size=4, window_depth=3,
                         attn_impl="xla", **kw)


def test_cast_sr_requires_bf16():
    from lstc_vad_tpu.models import Encoder

    enc = Encoder(_enc_cfg(cast_sr=True))  # compute_dtype defaults f32
    x = np.zeros((1, 12, 16), np.float32)
    with pytest.raises(ValueError, match="bfloat16"):
        enc.init(jax.random.PRNGKey(0), x, deterministic=False)


def test_cast_sr_param_tree_and_eval_unchanged():
    """cast_sr must not change the checkpoint surface or eval math: the
    param tree (names, shapes, values at equal init seed) and every
    deterministic forward are identical to the plain bf16 encoder."""
    from lstc_vad_tpu.models import Encoder

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 12, 16)).astype(np.float32)
    plain = Encoder(_enc_cfg(compute_dtype="bfloat16"))
    srenc = Encoder(_enc_cfg(compute_dtype="bfloat16", cast_sr=True))
    p0 = plain.init(jax.random.PRNGKey(7), x)["params"]
    p1 = srenc.init(jax.random.PRNGKey(7), x)["params"]
    flat0 = jax.tree_util.tree_leaves_with_path(p0)
    flat1 = jax.tree_util.tree_leaves_with_path(p1)
    assert [k for k, _ in flat0] == [k for k, _ in flat1]
    for (_, a), (_, b) in zip(flat0, flat1):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    out0 = plain.apply({"params": p0}, x, deterministic=True)
    out1 = srenc.apply({"params": p0}, x, deterministic=True)
    assert np.array_equal(np.asarray(out0), np.asarray(out1))


def test_cast_sr_train_forward_tracks_f32():
    """With dropouts at 0, the SR train-time forward stays within bf16
    matmul noise of the f32 forward (same params) — and differs across
    dropout keys (the rounding really is stochastic)."""
    from lstc_vad_tpu.models import Encoder

    zero_drop = dict(attn_dropout=0.0, fc_dropout=0.0, ffn_dropout=0.0)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 12, 16)).astype(np.float32)
    f32 = Encoder(_enc_cfg(**zero_drop))
    srenc = Encoder(_enc_cfg(compute_dtype="bfloat16", cast_sr=True,
                             **zero_drop))
    params = f32.init(jax.random.PRNGKey(0), x)["params"]
    ref = np.asarray(f32.apply({"params": params}, x, deterministic=True))

    outs = []
    for seed in (0, 1):
        out = srenc.apply({"params": params}, x, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(seed)})
        outs.append(np.asarray(out, np.float32))
        np.testing.assert_allclose(outs[-1], ref, rtol=0.08, atol=0.08)
    assert not np.array_equal(outs[0], outs[1])


def test_cast_sr_composes_with_remat():
    """remat recomputes the layer in the backward with the SAME flax rngs,
    so the SR noise must be identical in both passes: the remat'd SR train
    forward equals the plain SR forward under equal dropout keys."""
    from lstc_vad_tpu.config import replace as cfg_replace
    from lstc_vad_tpu.models import Encoder

    import jax

    base = _enc_cfg(compute_dtype="bfloat16", cast_sr=True)
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 12, 16)).astype(np.float32)
    enc = Encoder(base)
    params = enc.init(jax.random.PRNGKey(0), x)["params"]
    enc_r = Encoder(cfg_replace(base, remat=True))
    key = {"dropout": jax.random.PRNGKey(9)}
    out = enc.apply({"params": params}, x, deterministic=False, rngs=key)
    out_r = enc_r.apply({"params": params}, x, deterministic=False, rngs=key)
    assert np.array_equal(np.asarray(out), np.asarray(out_r))

    # and the full grad path through remat + SR compiles and is finite
    def loss(p):
        h = enc_r.apply({"params": p}, x, deterministic=False, rngs=key)
        return (h.astype(np.float32) ** 2).mean()

    g = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(leaf)) for leaf in
               jax.tree_util.tree_leaves(jax.tree.map(np.asarray, g)))


def test_cast_sr_train_step_runs_and_learns():
    """Full LTN train step (fwd + bwd + Adagrad) with cast_sr: finite loss,
    params move — the straight-through gradient reaches the weights."""
    from lstc_vad_tpu.parallel.dryrun import tiny_ltn_config
    from lstc_vad_tpu.config import replace
    from lstc_vad_tpu.train.state import create_train_state
    from lstc_vad_tpu.train.steps import make_ltn_train_step

    cfg = replace(tiny_ltn_config(batch_size=4),
                  **{"encoder.compute_dtype": "bfloat16",
                     "encoder.cast_sr": True})
    state, encoder, head, tx = create_train_state(cfg)
    step = make_ltn_train_step(encoder, head, cfg, tx)
    d = cfg.data
    rng = np.random.default_rng(4)
    shape = (4, d.part_num * d.part_len, d.n_patch, cfg.encoder.d_model)
    norm = rng.standard_normal(shape).astype(np.float32)
    abnorm = rng.standard_normal(shape).astype(np.float32)
    labs = rng.random((4, d.part_num * d.part_len)).astype(np.float32)

    before = np.asarray(
        state.params["encoder"]["layer_0"]["slf_attn"]["w_qs"]["kernel"])
    new_state, metrics = step(state, norm, labs, abnorm, labs)
    assert np.isfinite(float(metrics["loss"]))
    after = np.asarray(
        new_state.params["encoder"]["layer_0"]["slf_attn"]["w_qs"]["kernel"])
    assert not np.array_equal(before, after)
    assert after.dtype == np.float32  # master weights stay f32
