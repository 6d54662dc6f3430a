"""Fused SDPA(+bias) Pallas TPU kernel with block-diagonal packing.

One kernel computes softmax(q·k^T/temp + bias)·v with the attention matrix
kept in VMEM (never materialized in HBM).  Sequences are short
(L = part_len*n_patch+1 <= ~81 tokens), which defeats the 128x128 MXU if each
(batch, head) pair is multiplied alone: a [49, 256]x[256, 49] product uses
<40% of a systolic pass.  So the kernel PACKS P = floor(128 / L) pairs along
the token axis into one [P*L, D] block and masks the off-diagonal L x L
blocks with -1e30 before the softmax:

    attn[packed] = (Q_p / temp) @ K_p^T        # [P*L, P*L] - one MXU pass
    attn += tile(bias) + block_mask            # bias on diag blocks, -inf off
    out = softmax(attn) @ V_p                  # off-blocks are exactly 0

P x fewer MXU passes for both matmuls; the extra off-diagonal FLOPs are free
(the pass is issued anyway).  For the STN (L=17) P=7, for the LTN (L=49) P=2.

No K/V streaming (flash chunking) is needed at these lengths — a whole packed
row block fits in VMEM; raising part_len later just raises L until P hits 1
and VMEM says stop.

The backward pass recomputes attention through the XLA path (flash-style
recompute); training usually runs XLA anyway because attention dropout is on
(see ops/attention.sdpa dispatch).  Masks fall back to XLA (the reference
never passes one at runtime).

MEASUREMENT (v5e, f32, H=8, D=256): at the reference's sequence lengths XLA's
batched gemms win — L=49/B=256: pallas 2.9ms vs xla 1.9ms; L=17/B=1024:
pallas 5.1ms vs xla 2.6ms per call (both packing variants; the in-kernel
reshape variant was no better).  The model's runtime is dominated by the
d_model/d_inner projections, so sdpa's impl="auto" selects XLA; this kernel
stays as an opt-in whose blockwise structure becomes profitable when
part_len pushes L toward >=128 (pack=1, true flash regime).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, inv_temp):
    # blocks are pre-packed on host: [Q, 1, P*L, D] per program, one head
    qp = q_ref[:][:, 0]                            # [Q, P*L, D]
    kp = k_ref[:][:, 0]
    vp = v_ref[:][:, 0]
    attn = jax.lax.dot_general(
        qp * inv_temp, kp,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # [Q, P*L, P*L]
    attn = attn + mask_ref[:].astype(jnp.float32)  # bias-on-diag + -inf off
    probs = jax.nn.softmax(attn, axis=-1)
    out = jax.lax.dot_general(
        probs.astype(vp.dtype), vp,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # [Q, P*L, D]
    o_ref[:] = out[:, None].astype(o_ref.dtype)


def _pack_count(length: int) -> int:
    return max(1, 128 // length)


def _block_b(b: int, length: int, d: int, itemsize: int, pack: int) -> int:
    """Batch rows per program: a multiple of ``pack``, sized so that the
    DOUBLE-BUFFERED q/k/v/o blocks plus the packed attention scratch stay
    within ~12MB of the 16MB VMEM."""
    budget = 12 * 1024 * 1024
    # 4 operands x 2 (pipeline double buffering) + attn rows (f32)
    per_row = 8 * itemsize * length * d + 4 * pack * length * length
    q = max(1, min(64 // pack, budget // max(1, per_row * pack)))
    return q * pack


def _packed_mask(bias: Optional[np.ndarray], length: int, pack: int,
                 h: int) -> jnp.ndarray:
    """[H, P*L, P*L]: bias tiled on the diagonal blocks, NEG elsewhere."""
    pl_ = pack * length
    block = np.full((pl_, pl_), NEG, dtype=np.float32)
    for i in range(pack):
        s = i * length
        block[s:s + length, s:s + length] = 0.0
    mask = jnp.asarray(block)[None]                       # [1, PL, PL]
    if bias is None:
        return jnp.broadcast_to(mask, (h, pl_, pl_))
    tiled = jnp.tile(bias, (1, pack, pack))               # [H, PL, PL]
    return jnp.where(mask == 0.0, tiled + 0.0, mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _pallas_sdpa(q, k, v, bias, temperature, interpret):
    return _forward(q, k, v, bias, temperature, interpret)


def _forward(q, k, v, bias, temperature, interpret):
    b, h, length, d = q.shape
    pack = _pack_count(length)
    g = _block_b(b, length, d, q.dtype.itemsize, pack)
    pad = (-b) % g
    if pad:
        q, k, v = (jnp.pad(x, ((0, pad), (0, 0), (0, 0), (0, 0)))
                   for x in (q, k, v))
    bp = q.shape[0]
    nq = g // pack        # packed groups per program
    npk = bp // pack      # total packed groups
    pl_ = pack * length

    def host_pack(x):
        # [B, H, L, D] -> [B/P, H, P*L, D]: one fused HBM relayout by XLA,
        # so the kernel never reshapes across tile boundaries
        x = x.reshape(npk, pack, h, length, d).transpose(0, 2, 1, 3, 4)
        return x.reshape(npk, h, pl_, d)

    qp, kp, vp = host_pack(q), host_pack(k), host_pack(v)
    grid = (npk // nq, h)
    inv_temp = np.float32(1.0 / temperature)
    mask = _packed_mask(bias, length, pack, h)
    spec = pl.BlockSpec((nq, 1, pl_, d), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, inv_temp=inv_temp),
        out_shape=jax.ShapeDtypeStruct((npk, h, pl_, d), q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((1, pl_, pl_), lambda i, j: (j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=spec,
        interpret=interpret,
    )(qp, kp, vp, mask)
    out = out.reshape(npk, h, pack, length, d).transpose(0, 2, 1, 3, 4)
    out = out.reshape(bp, h, length, d)
    return out[:b] if pad else out


def _xla_reference(q, k, v, bias, temperature):
    # the ONE source of SDPA math: a fix to the XLA path must not silently
    # diverge this kernel's backward pass (custom_vjp residual fn) from it
    from .attention import _xla_sdpa

    return _xla_sdpa(q, k, v, bias, None, temperature, 0.0, None)


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
