"""Scaled dot-product attention with additive bias — the hot op.

Semantics (reference models/MultiHeadAttention.py:103-120):
    attn = (q / temperature) @ k^T        # temperature = d_k ** 0.5
    attn = where(mask == 0, -1e9, attn)   # optional
    attn += bias                          # optional additive [H, L, L] bias
    attn = dropout(softmax(attn))
    out  = attn @ v

Two implementations:
- ``xla``:    plain jnp ops — XLA fuses the elementwise chain into the
              matmuls; always available, used on CPU and as the autodiff/
              parity reference.
- ``pallas``: fused TPU kernel (ops/pallas_attention.py) that keeps the
              [L, L] attention matrix in VMEM — never materialized in HBM.
              OPT-IN only (impl="pallas"): measured slower than XLA at this
              model's sequence lengths (L<=81), so impl="auto" resolves to
              xla — see the measurement note in sdpa().

Shapes: q, k, v: [B, H, L, D]; bias: [H, L, L] broadcast over batch;
mask: broadcastable to [B, H, L, L], nonzero = keep.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

MASK_FILL = -1e9


def _xla_sdpa(q, k, v, bias, mask, temperature, dropout_rate, dropout_rng,
              return_probs=False):
    attn = jnp.einsum("bhld,bhmd->bhlm", q / temperature, k,
                      preferred_element_type=jnp.float32)
    if mask is not None:
        attn = jnp.where(mask == 0, MASK_FILL, attn)
    if bias is not None:
        attn = attn + bias[None].astype(attn.dtype)
    probs = jax.nn.softmax(attn, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhlm,bhmd->bhld", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    if return_probs:
        return out, probs
    return out


def sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
         temperature: float,
         bias: Optional[jnp.ndarray] = None,
         mask: Optional[jnp.ndarray] = None,
         dropout_rate: float = 0.0,
         dropout_rng: Optional[jax.Array] = None,
         impl: str = "auto",
         return_probs: bool = False):
    """Dispatching SDPA. ``impl``: "auto" | "xla" | "pallas"."""
    if impl not in ("auto", "xla", "pallas"):
        # a typo'd config knob must not silently run the XLA path while the
        # user believes they are exercising the Pallas kernel
        raise ValueError(f"unknown attention impl {impl!r}; "
                         "expected 'auto', 'xla' or 'pallas'")
    if impl == "auto":
        # Measured on v5e (f32, B=256-1024, H=8, D=256): XLA's batched-gemm +
        # fusion beats the fused Pallas kernel at these sequence lengths
        # (L=17: 2.6ms vs 5.1ms; L=49: 1.9ms vs 2.9ms per call) — the model's
        # FLOPs are dominated by the d_model/d_inner projections, which XLA
        # already runs near MXU peak, and attention is too short to gain from
        # staying in VMEM.  The kernel remains available via impl="pallas"
        # (its blockwise structure pays off if part_len grows L toward 128+).
        impl = "xla"
    if impl == "pallas":
        active_dropout = dropout_rate > 0.0 and dropout_rng is not None
        if active_dropout or return_probs or mask is not None:
            # the fused kernel has no dropout/probs/mask path; keep the math
            # correct and fall back (training with attn dropout runs XLA)
            impl = "xla"
        else:
            from .pallas_attention import pallas_sdpa
            return pallas_sdpa(q, k, v, temperature=temperature, bias=bias)
    return _xla_sdpa(q, k, v, bias, mask, temperature, dropout_rate,
                     dropout_rng, return_probs=return_probs)
