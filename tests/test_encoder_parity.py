"""Encoder + head forward parity vs the torch oracle (deterministic paths)."""

import jax
import numpy as np
import pytest

from lstc_vad_tpu.config import EncoderConfig
from lstc_vad_tpu.models import Encoder, make_head

from torch_oracle import encoder_forward, head_forward

SMALL = dict(d_model=64, d_inner=96, n_head=4, d_k=16, d_v=16, n_layers=2,
             attn_impl="xla")


def _run(cfg: EncoderConfig, x, mask=None, seed=0):
    model = Encoder(cfg)
    params = model.init(jax.random.PRNGKey(seed), x, mask)
    out = model.apply(params, x, mask, deterministic=True)
    oracle = encoder_forward(x, jax.tree.map(np.asarray, params)["params"],
                             cfg, mask)
    return np.asarray(out), oracle


def test_stn_config_parity(rng):
    cfg = EncoderConfig(ffn_layernorm=True, weight_init=True, **SMALL)
    x = rng.standard_normal((6, 16, 64), dtype=np.float32)
    out, oracle = _run(cfg, x)
    assert out.shape == (6, 17, 64)
    np.testing.assert_allclose(out, oracle, rtol=2e-4, atol=2e-5)


def test_ltn_config_parity_full_window(rng):
    # part_len=3, n_patch=16 -> 48 tokens + CLS = full RPE window
    cfg = EncoderConfig(mha_layernorm=True, ffn_layernorm=True,
                        relative_pe=True, window_size=4, window_depth=3,
                        **SMALL)
    x = rng.standard_normal((4, 48, 64), dtype=np.float32)
    out, oracle = _run(cfg, x)
    np.testing.assert_allclose(out, oracle, rtol=2e-4, atol=2e-5)


def test_ltn_short_sequence_slices_rpe_index(rng):
    # shorter than the window: index table sliced [:L-1, :L-1]
    cfg = EncoderConfig(mha_layernorm=True, ffn_layernorm=True,
                        relative_pe=True, window_size=4, window_depth=3,
                        **SMALL)
    x = rng.standard_normal((2, 32, 64), dtype=np.float32)
    out, oracle = _run(cfg, x)
    np.testing.assert_allclose(out, oracle, rtol=2e-4, atol=2e-5)


def test_relative_pe_2d_parity(rng):
    cfg = EncoderConfig(ffn_layernorm=True, relative_pe_2d=True,
                        window_size=4, **SMALL)
    x = rng.standard_normal((2, 16, 64), dtype=np.float32)
    out, oracle = _run(cfg, x)
    np.testing.assert_allclose(out, oracle, rtol=2e-4, atol=2e-5)


def test_cls_learned_and_position_encoding(rng):
    cfg = EncoderConfig(cls_learned=True, position_encoding=True,
                        max_position_tokens=17, input_layernorm=True,
                        ffn_layernorm=True, **SMALL)
    x = rng.standard_normal((3, 16, 64), dtype=np.float32)
    out, oracle = _run(cfg, x)
    np.testing.assert_allclose(out, oracle, rtol=2e-4, atol=2e-5)


def test_ffn_need_false(rng):
    cfg = EncoderConfig(ffn_need=False, **SMALL)
    x = rng.standard_normal((2, 16, 64), dtype=np.float32)
    out, oracle = _run(cfg, x)
    np.testing.assert_allclose(out, oracle, rtol=2e-4, atol=2e-5)


def test_mask_fill(rng):
    cfg = EncoderConfig(**SMALL)
    x = rng.standard_normal((2, 8, 64), dtype=np.float32)
    mask = np.ones((2, 1, 9, 9), dtype=np.float32)
    mask[:, :, :, -2:] = 0
    out, oracle = _run(cfg, x, mask)
    np.testing.assert_allclose(out, oracle, rtol=2e-4, atol=2e-5)


def test_cls_is_token_mean_by_default(rng):
    cfg = EncoderConfig(n_layers=0, **{k: v for k, v in SMALL.items()
                                       if k != "n_layers"})
    x = rng.standard_normal((2, 5, 64), dtype=np.float32)
    model = Encoder(cfg)
    params = model.init(jax.random.PRNGKey(0), x)
    out = np.asarray(model.apply(params, x, deterministic=True))
    np.testing.assert_allclose(out[:, 0], x.mean(1), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("kind", ["regressor", "classifier"])
def test_head_parity(rng, kind):
    head = make_head(kind, d_model=64, hidden_dim=32)
    x = rng.standard_normal((10, 64), dtype=np.float32)
    params = head.init(jax.random.PRNGKey(1), x)
    out = np.asarray(head.apply(params, x, deterministic=True))
    oracle = head_forward(x, jax.tree.map(np.asarray, params)["params"], kind)
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-6)
    if kind == "regressor":
        assert out.shape == (10, 1)
        assert (out >= 0).all() and (out <= 1).all()
    else:
        assert out.shape == (10, 2)
        np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-5)


def test_dropout_active_in_training_mode(rng):
    cfg = EncoderConfig(attn_dropout=0.5, fc_dropout=0.5, ffn_dropout=0.5,
                        **SMALL)
    x = rng.standard_normal((2, 8, 64), dtype=np.float32)
    model = Encoder(cfg)
    params = model.init(jax.random.PRNGKey(0), x)
    a = model.apply(params, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    b = model.apply(params, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(2)})
    det = model.apply(params, x, deterministic=True)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(det))


def test_bfloat16_compute_close_to_f32(rng):
    import jax.numpy as jnp
    cfg32 = EncoderConfig(ffn_layernorm=True, mha_layernorm=True,
                          relative_pe=True, window_size=4, window_depth=3,
                          **SMALL)
    cfg16 = EncoderConfig(ffn_layernorm=True, mha_layernorm=True,
                          relative_pe=True, window_size=4, window_depth=3,
                          compute_dtype="bfloat16",
                          **SMALL)
    x = rng.standard_normal((2, 48, 64), dtype=np.float32)
    m32, m16 = Encoder(cfg32), Encoder(cfg16)
    params = m32.init(jax.random.PRNGKey(0), x)
    out32 = np.asarray(m32.apply(params, x, deterministic=True))
    out16 = np.asarray(m16.apply(params, x, deterministic=True),
                       dtype=np.float32)
    # bf16 matmuls: ~2-3 decimal digits
    np.testing.assert_allclose(out16, out32, rtol=0.05, atol=0.08)


def test_return_probs_and_v(rng):
    cfg = EncoderConfig(**SMALL)
    x = rng.standard_normal((2, 8, 64), dtype=np.float32)
    model = Encoder(cfg)
    params = model.init(jax.random.PRNGKey(0), x)
    out, probs = model.apply(params, x, deterministic=True, return_probs=True)
    assert len(probs) == cfg.n_layers
    assert probs[0].shape == (2, 4, 9, 9)
    np.testing.assert_allclose(np.asarray(probs[0]).sum(-1), 1.0, rtol=1e-5)
    out2, probs2, vs = model.apply(params, x, deterministic=True,
                                   return_v=True)
    assert len(vs) == cfg.n_layers
    assert vs[0].shape == (2, 4, 9, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-6)


def test_remat_bit_identical_to_plain():
    """encoder.remat recomputes activations in the backward (jax.checkpoint
    per layer): loss AND gradients must be bit-identical to the plain path,
    with dropout active too (flax threads the same rngs through the remat)."""
    import jax.numpy as jnp
    from lstc_vad_tpu.config import EncoderConfig
    from lstc_vad_tpu.models import Encoder

    kw = dict(d_model=16, d_inner=32, n_head=2, d_k=8, d_v=8, n_layers=2,
              attn_impl="xla", mha_layernorm=True, ffn_layernorm=True,
              relative_pe=True, window_size=4, window_depth=3)
    enc = Encoder(EncoderConfig(**kw))
    enc_r = Encoder(EncoderConfig(remat=True, **kw))
    x = np.random.default_rng(0).standard_normal((4, 12, 16)).astype(np.float32)
    params = enc.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p, module, det):
        rngs = None if det else {"dropout": jax.random.PRNGKey(7)}
        h = module.apply({"params": p}, x, deterministic=det, rngs=rngs)
        return jnp.sum(h ** 2)

    for det in (True, False):
        l0, g0 = jax.value_and_grad(loss)(params, enc, det)
        l1, g1 = jax.value_and_grad(loss)(params, enc_r, det)
        assert float(l0) == float(l1)
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), g0, g1)
    # diagnostic outputs bypass remat and still work
    _, probs = enc_r.apply({"params": params}, x, deterministic=True,
                           return_probs=True)
    assert len(probs) == 2


def test_head_rejects_wrong_input_width():
    """The head's d_model is load-bearing like the reference's first Linear
    (models/Regressor.py:7): a width mismatch raises instead of silently
    shape-inferring a different module."""
    import jax
    import numpy as np
    import pytest

    from lstc_vad_tpu.models import make_head

    head = make_head("regressor", 32)
    with pytest.raises(ValueError, match="d_model=32 got input width 16"):
        head.init(jax.random.PRNGKey(0), np.zeros((2, 16), np.float32))
