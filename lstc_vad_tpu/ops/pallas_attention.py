"""Fused SDPA(+bias) Pallas TPU kernel.

One kernel computes softmax(q·k^T/temp + bias)·v for a block of (batch, head)
pairs, keeping the [L, L] attention matrix in VMEM — it is never written to
HBM, unlike the unfused XLA lowering which materializes probs between the two
matmuls.  Sequences here are short (L = part_len*n_patch+1 <= ~81 tokens), so
a whole attention row-block fits comfortably in VMEM and no K/V streaming
(flash-attention style chunking) is needed; the kernel is blockwise over the
batch axis only, so raising part_len later just raises L until VMEM says stop.

Grid: (ceil(B / BLOCK_B), H).  Per program:
  q, k, v block [BLOCK_B, 1, L, D] (one head, BLOCK_B batch rows)
  bias block    [1, L, L]          (that head's additive bias)

The backward pass recomputes attention through the XLA path (flash-style
recompute; the training path usually runs XLA anyway because attention
dropout is on — see ops/attention.sdpa dispatch).

Mask is not supported here (the reference never passes one at runtime);
dispatch falls back to XLA when a mask is given.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_bias(q_ref, k_ref, v_ref, bias_ref, o_ref, *, inv_temp):
    q = q_ref[:][:, 0]                       # [G, L, D]
    k = k_ref[:][:, 0]
    v = v_ref[:][:, 0]
    attn = jax.lax.dot_general(
        q * inv_temp, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, L, L]
    attn = attn + bias_ref[:].astype(jnp.float32)  # [1, L, L] broadcasts
    probs = jax.nn.softmax(attn, axis=-1)
    out = jax.lax.dot_general(
        probs.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [G, L, D]
    o_ref[:] = out[:, None].astype(o_ref.dtype)


def _kernel_nobias(q_ref, k_ref, v_ref, o_ref, *, inv_temp):
    q = q_ref[:][:, 0]
    k = k_ref[:][:, 0]
    v = v_ref[:][:, 0]
    attn = jax.lax.dot_general(
        q * inv_temp, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(attn, axis=-1)
    out = jax.lax.dot_general(
        probs.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:] = out[:, None].astype(o_ref.dtype)


def _block_b(b: int, length: int, d: int, itemsize: int) -> int:
    """Largest power-of-2 batch block (<=64) keeping ~<=8MB of VMEM."""
    budget = 8 * 1024 * 1024
    per_row = itemsize * (3 * length * d + length * d) + 4 * length * length
    g = 64
    while g > 1 and (g * per_row > budget or b % g != 0):
        g //= 2
    return g


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _pallas_sdpa(q, k, v, bias, temperature, interpret):
    return _forward(q, k, v, bias, temperature, interpret)


def _forward(q, k, v, bias, temperature, interpret):
    b, h, length, d = q.shape
    g = _block_b(b, length, d, q.dtype.itemsize)
    pad = (-b) % g
    if pad:
        q, k, v = (jnp.pad(x, ((0, pad), (0, 0), (0, 0), (0, 0)))
                   for x in (q, k, v))
    bp = q.shape[0]
    grid = (bp // g, h)
    inv_temp = np.float32(1.0 / temperature)
    qkv_spec = pl.BlockSpec((g, 1, length, d), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    if bias is not None:
        out = pl.pallas_call(
            functools.partial(_kernel_bias, inv_temp=inv_temp),
            out_shape=jax.ShapeDtypeStruct((bp, h, length, d), q.dtype),
            grid=grid,
            in_specs=[qkv_spec, qkv_spec, qkv_spec,
                      pl.BlockSpec((1, length, length),
                                   lambda i, j: (j, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=qkv_spec,
            interpret=interpret,
        )(q, k, v, bias)
    else:
        out = pl.pallas_call(
            functools.partial(_kernel_nobias, inv_temp=inv_temp),
            out_shape=jax.ShapeDtypeStruct((bp, h, length, d), q.dtype),
            grid=grid,
            in_specs=[qkv_spec, qkv_spec, qkv_spec],
            out_specs=qkv_spec,
            interpret=interpret,
        )(q, k, v)
    return out[:b] if pad else out


def _xla_reference(q, k, v, bias, temperature):
    attn = jnp.einsum("bhld,bhmd->bhlm", q / temperature, k,
                      preferred_element_type=jnp.float32)
    if bias is not None:
        attn = attn + bias[None].astype(attn.dtype)
    probs = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhlm,bhmd->bhld", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _fwd(q, k, v, bias, temperature, interpret):
    out = _forward(q, k, v, bias, temperature, interpret)
    return out, (q, k, v, bias)


def _bwd(temperature, interpret, residuals, g):
    q, k, v, bias = residuals
    if bias is None:
        _, vjp = jax.vjp(lambda q, k, v: _xla_reference(q, k, v, None,
                                                        temperature), q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None
    _, vjp = jax.vjp(lambda q, k, v, bias: _xla_reference(q, k, v, bias,
                                                          temperature),
                     q, k, v, bias)
    return vjp(g)


_pallas_sdpa.defvjp(_fwd, _bwd)


def pallas_sdpa(q, k, v, temperature: float,
                bias: Optional[jnp.ndarray] = None, mask=None,
                interpret: Optional[bool] = None):
    if mask is not None:
        raise ValueError("pallas_sdpa does not support masks; "
                         "use impl='xla'")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _pallas_sdpa(q, k, v, bias, float(temperature), bool(interpret))
