"""Parameter initializers matching PyTorch's defaults.

- ``torch_linear_kernel`` / ``torch_linear_bias``: nn.Linear's default
  kaiming_uniform(a=sqrt(5)) collapses to U(-1/sqrt(fan_in), 1/sqrt(fan_in))
  for both weight and bias.
- ``xavier_uniform_torch``: torch's xavier with torch's fan computation, used
  when a reference script passes *_weight_init (e.g.
  Train/spatio_transformer_shanghaitech.py:226-227 -> models/Encoder.py:38-41,
  applied to every parameter with dim > 1 — including, for the LTN, the
  relative-position bias table and any learned CLS/PE tables).
- ``trunc_normal_02``: trunc_normal(std=.02) for the relative-position bias
  table when xavier init is off (models/MultiHeadAttention.py:74,90).

Note flax Dense kernels are [in, out] (transposed vs torch's [out, in]);
xavier is symmetric under transposition and the kaiming-uniform default only
depends on fan_in, so the distributions match.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_bias(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def _torch_fans(shape):
    """torch.nn.init._calculate_fan_in_and_fan_out on a torch-shaped tensor."""
    if len(shape) < 2:
        raise ValueError("fan in/out undefined for <2-D shapes")
    receptive = int(np.prod(shape[2:])) if len(shape) > 2 else 1
    fan_in = shape[1] * receptive
    fan_out = shape[0] * receptive
    return fan_in, fan_out


def xavier_uniform_torch(torch_shape=None):
    """Xavier-uniform; if ``torch_shape`` is given, fans are computed from it
    (for tables like [1, T, d] whose flax layout equals the torch layout)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _torch_fans(torch_shape or shape)
        bound = np.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def trunc_normal_02(key, shape, dtype=jnp.float32):
    """torch.nn.init.trunc_normal_(std=.02) truncates at ABSOLUTE bounds
    a=-2, b=2 — that is +/-100 sigma at std 0.02, i.e. effectively an
    untruncated N(0, 0.02^2) (MultiHeadAttention.py:74)."""
    return 0.02 * jax.random.truncated_normal(key, -100.0, 100.0, shape, dtype)


def randn(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)
