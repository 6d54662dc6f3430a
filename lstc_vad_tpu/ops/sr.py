"""Stochastic-rounding float32 -> bfloat16 cast.

The round-4 paired-seed study (docs/ARCHITECTURE.md "bf16 train-compute
quality study") measured bf16 TRAIN compute converging ~0.03-0.08 frame-AUC
below f32 at flagship dims.  The hypothesized mechanism is the deterministic
round-to-nearest f32->bf16 casts of weights and activations in front of every
matmul: RTN is biased conditional on the value, so the same weights round the
same (wrong) way on every step and the error never averages out.  Stochastic
rounding (Gupta et al. 2015, "Deep Learning with Limited Numerical
Precision") replaces RTN with an UNBIASED cast — round up with probability
proportional to the truncated remainder — so E[sr_cast(x)] == x and the
rounding error becomes zero-mean noise the optimizer averages over steps.

bfloat16 is the top 16 bits of float32, so SR is three integer ops: add a
uniform 16-bit random value to the low mantissa bits and truncate.  Mantissa
overflow carries into the exponent, which lands exactly on the next
representable bf16 — IEEE ordering makes the carry correct for free.

Used by models/encoder.py's ``cast_sr`` train-time path (opt-in; the probe
arm of VERDICT r4 #6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sr_cast(x: jax.Array, key: jax.Array) -> jax.Array:
    """float32 -> bfloat16 with stochastic rounding; unbiased:
    E[sr_cast(x, key)] == x over keys.  Non-f32 inputs (already bf16, or
    integer) pass through ``astype(bfloat16)`` unchanged — there is no cast
    to randomize.  Values exactly representable in bf16 (low 16 bits zero)
    are returned exactly under every key.

    Differentiation is straight-through (gradient of the identity cast),
    like every rounding/quantization op: the bitcast has no derivative of
    its own and the rounding noise is zero-mean."""
    if x.dtype != jnp.float32:
        return x.astype(jnp.bfloat16)
    return _sr_cast_f32(x, key)


@jax.custom_jvp
def _sr_cast_f32(x: jax.Array, key: jax.Array) -> jax.Array:
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    noise = jax.random.bits(key, x.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    rounded = (bits + noise) & jnp.uint32(0xFFFF0000)
    sr = jax.lax.bitcast_convert_type(
        rounded, jnp.float32).astype(jnp.bfloat16)
    # non-finite inputs must PROPAGATE: the mantissa+noise add can wrap a
    # high-payload NaN's bits through the sign field into ±0.0, silently
    # masking a divergence — exactly what the SR probe arm must not hide
    return jnp.where(jnp.isfinite(x), sr, x.astype(jnp.bfloat16))


@_sr_cast_f32.defjvp
def _sr_cast_f32_jvp(primals, tangents):
    x, key = primals
    dx, _ = tangents  # key tangent is float0
    return _sr_cast_f32(x, key), dx.astype(jnp.bfloat16)
