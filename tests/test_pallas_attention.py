"""Pallas fused SDPA parity vs the XLA path (interpret mode on CPU; the same
kernel compiles on TPU — exercised by bench/integration on hardware)."""

import jax
import numpy as np
import pytest

from lstc_vad_tpu.ops.attention import _xla_sdpa
from lstc_vad_tpu.ops.pallas_attention import pallas_sdpa


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("b,h,length,d", [
    (8, 4, 17, 32),    # STN-like: 16 patches + CLS
    (16, 8, 49, 64),   # LTN-like: 48 tokens + CLS
    (3, 2, 9, 16),     # odd batch: exercises padding
])
def test_pallas_matches_xla(rng, b, h, length, d):
    q, k, v = (_rand(rng, b, h, length, d) for _ in range(3))
    temp = float(np.sqrt(d))
    ours = pallas_sdpa(q, k, v, temp, interpret=True)
    ref = _xla_sdpa(q, k, v, None, None, temp, 0.0, None)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_pallas_with_bias(rng):
    b, h, length, d = 8, 4, 49, 32
    q, k, v = (_rand(rng, b, h, length, d) for _ in range(3))
    bias = _rand(rng, h, length, length)
    temp = float(np.sqrt(d))
    ours = pallas_sdpa(q, k, v, temp, bias=bias, interpret=True)
    ref = _xla_sdpa(q, k, v, bias, None, temp, 0.0, None)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_pallas_grad_matches_xla(rng):
    b, h, length, d = 4, 2, 17, 16
    q, k, v = (_rand(rng, b, h, length, d) for _ in range(3))
    bias = _rand(rng, h, length, length)
    temp = float(np.sqrt(d))

    def loss_pallas(q, k, v, bias):
        return pallas_sdpa(q, k, v, temp, bias=bias, interpret=True).sum()

    def loss_xla(q, k, v, bias):
        return _xla_sdpa(q, k, v, bias, None, temp, 0.0, None).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(q, k, v, bias)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_pallas_rejects_mask(rng):
    q = _rand(rng, 2, 2, 9, 8)
    with pytest.raises(ValueError, match="mask"):
        pallas_sdpa(q, q, q, 1.0, mask=np.ones((2, 1, 9, 9)))


def test_encoder_with_pallas_impl_matches_xla(rng):
    from lstc_vad_tpu.config import EncoderConfig
    from lstc_vad_tpu.models import Encoder

    common = dict(d_model=32, d_inner=48, n_head=2, d_k=16, d_v=16,
                  n_layers=2, relative_pe=True, window_size=4, window_depth=3,
                  mha_layernorm=True, ffn_layernorm=True)
    x = rng.standard_normal((4, 24, 32)).astype(np.float32)
    m_x = Encoder(EncoderConfig(attn_impl="xla", **common))
    m_p = Encoder(EncoderConfig(attn_impl="pallas", **common))
    params = m_x.init(jax.random.PRNGKey(0), x)
    out_x = m_x.apply(params, x, deterministic=True)
    out_p = m_p.apply(params, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=2e-5, atol=2e-5)


def test_sdpa_rejects_unknown_impl(rng):
    """A typo'd attn_impl must raise, never silently run the XLA path while
    the user believes they are exercising the Pallas kernel."""
    import pytest

    from lstc_vad_tpu.ops.attention import sdpa

    q = rng.standard_normal((1, 2, 4, 8)).astype("float32")
    with pytest.raises(ValueError, match="unknown attention impl"):
        sdpa(q, q, q, temperature=2.0, impl="Pallas")
