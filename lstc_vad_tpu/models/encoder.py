"""Flax transformer encoder — the trunk shared by STN and LTN.

Functional re-design of the reference stack (models/Encoder.py:4-74,
models/EncoderLayer.py:4-30, models/MultiHeadAttention.py:25-132,
models/FFN.py:4-22) with identical math:

- CLS token prepended to the sequence: mean of the input tokens by default
  (Encoder.py:54), learned parameter if ``cls_learned`` (Encoder.py:16-17,52).
- optional learned absolute position table + dropout (Encoder.py:19-21,57-59).
- optional LayerNorm on the raw inputs (Encoder.py:48-49).
- N x [MHA -> optional FFN] blocks; post-LN on each residual is optional and
  off by default (MultiHeadAttention.py:125-126, FFN.py:20-21).
- 3-D (or 2-D) Swin-video relative position bias added to the attention
  logits at non-CLS positions only, with the index table sliced by the
  actual sequence length (MultiHeadAttention.py:107-117).

The attention inner loop dispatches to a fused Pallas TPU kernel via
ops.attention.sdpa; everything else is left to XLA fusion.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import EncoderConfig
from ..ops.attention import sdpa
from ..ops.sr import sr_cast
from . import initializers as init
from . import rpe


class _SRLinear(nn.Module):
    """``nn.Dense`` twin (identical param tree: f32 ``kernel`` [in, features]
    + optional ``bias`` [features]) whose f32->bf16 casts in front of the
    matmul use stochastic rounding (ops/sr.py) instead of round-to-nearest.
    The matmul runs in bfloat16 (the throughput the cast_sr probe keeps);
    the output stays bfloat16 like a ``dtype=bfloat16`` Dense.  Draws its
    randomness from the 'dropout' rng collection the train steps already
    thread (train/steps.py)."""

    features: int
    kernel_init: Callable[..., Any]
    use_bias: bool = True
    bias_init: Callable[..., Any] = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        kkey, xkey, bkey = jax.random.split(self.make_rng("dropout"), 3)
        y = jnp.matmul(sr_cast(x, xkey), sr_cast(kernel, kkey))
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + sr_cast(bias, bkey)
        return y


def _sr_active(c: EncoderConfig, deterministic: bool) -> bool:
    """cast_sr applies to TRAIN passes of a bfloat16-compute encoder only;
    deterministic (eval) passes keep the plain cast path bit-for-bit — so a
    cast_sr config whose eval twin forces f32 compute stays valid."""
    if not c.cast_sr or deterministic:
        return False
    if jnp.dtype(c.compute_dtype) != jnp.bfloat16:
        raise ValueError("encoder.cast_sr requires "
                         f"compute_dtype='bfloat16', got {c.compute_dtype!r}")
    return True


class MultiHeadAttention(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True,
                 return_probs: bool = False, return_v: bool = False):
        """``return_probs``/``return_v`` mirror the reference's
        return_attn / return_attn_v plumbing (Encoder.py:62-70,
        MultiHeadAttention.py:127-132): per-layer post-dropout attention
        maps, and the per-head V tensors [B, H, L, d_v]."""
        c = self.cfg
        b, length, _ = x.shape
        dt = jnp.dtype(c.compute_dtype)
        sr = _sr_active(c, deterministic)
        kernel_init = (init.xavier_uniform_torch() if c.weight_init
                       else init.torch_linear_kernel)
        if sr:
            # SR probe arm: matmuls in bf16 with stochastically-rounded
            # casts; activations BETWEEN ops stay f32 (elementwise is cheap)
            dense = lambda feats, name: _SRLinear(  # noqa: E731
                feats, kernel_init=kernel_init, use_bias=False, name=name)
        else:
            dense = lambda feats, name: nn.Dense(  # noqa: E731
                feats, use_bias=False, kernel_init=kernel_init, dtype=dt,
                name=name)
            x = x.astype(dt)

        residual = x
        h, dk, dv = c.n_head, c.d_k, c.d_v
        q = dense(h * dk, "w_qs")(x).reshape(b, length, h, dk).transpose(0, 2, 1, 3)
        k = dense(h * dk, "w_ks")(x).reshape(b, length, h, dk).transpose(0, 2, 1, 3)
        v = dense(h * dv, "w_vs")(x).reshape(b, length, h, dv).transpose(0, 2, 1, 3)

        bias = self._relative_bias(length)

        dropout_rng = None
        if not deterministic and c.attn_dropout > 0.0:
            dropout_rng = self.make_rng("dropout")
        out = sdpa(q, k, v, temperature=float(np.sqrt(c.d_k)), bias=bias,
                   mask=mask, dropout_rate=c.attn_dropout,
                   dropout_rng=dropout_rng, impl=c.attn_impl,
                   return_probs=return_probs or return_v)
        probs = None
        if return_probs or return_v:
            out, probs = out

        out = out.transpose(0, 2, 1, 3).reshape(b, length, h * dv)
        out = dense(c.d_model, "fc")(out)
        out = nn.Dropout(c.fc_dropout, name="fc_dropout")(
            out, deterministic=deterministic)
        out = out + residual
        if c.mha_layernorm:
            # stats in f32 for stability, output back in compute dtype
            # (f32 throughout on the SR arm — elementwise stays full precision)
            out = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(
                out.astype(jnp.float32)).astype(jnp.float32 if sr else dt)
        if return_v:
            return out, probs, v
        if return_probs:
            return out, probs
        return out

    def _relative_bias(self, length: int) -> Optional[jnp.ndarray]:
        """Additive [H, length, length] bias; zero at CLS row/col — equivalent
        to the reference's in-place add at attn[:, :, 1:, 1:]."""
        c = self.cfg
        if not (c.relative_pe or c.relative_pe_2d) or length <= 1:
            return None
        n_tok = length - 1
        if c.relative_pe:
            index = rpe.relative_position_index_3d(c.window_depth, c.window_size)
            size = rpe.table_size_3d(c.window_depth, c.window_size)
            # index sliced by the actual token count (MultiHeadAttention.py:108)
            if n_tok > index.shape[0]:
                raise ValueError(
                    f"sequence of {n_tok} tokens exceeds the relative-PE window "
                    f"({index.shape[0]} = window_depth*window_size^2)")
            index = index[:n_tok, :n_tok]
        else:
            index = rpe.relative_position_index_2d(c.window_size)
            size = rpe.table_size_2d(c.window_size)
            # the 2-D path gathers the FULL window (MultiHeadAttention.py:114)
            if n_tok != index.shape[0]:
                raise ValueError(
                    f"relative_pe_2d needs exactly window_size^2="
                    f"{index.shape[0]} tokens, got {n_tok}")
        table_init = (init.xavier_uniform_torch() if c.weight_init
                      else init.trunc_normal_02)
        table = self.param("relative_position_bias_table", table_init,
                           (size, c.n_head))
        gathered = table[index.reshape(-1)].reshape(n_tok, n_tok, c.n_head)
        gathered = gathered.transpose(2, 0, 1)                # [H, n_tok, n_tok]
        return jnp.pad(gathered, ((0, 0), (1, 0), (1, 0)))


class FeedForward(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        c = self.cfg
        dt = jnp.dtype(c.compute_dtype)
        sr = _sr_active(c, deterministic)
        if c.weight_init:
            k1 = k2 = init.xavier_uniform_torch()
        else:
            k1 = k2 = init.torch_linear_kernel
        residual = x
        if sr:
            x = _SRLinear(c.d_inner, kernel_init=k1,
                          bias_init=init.torch_linear_bias(c.d_model),
                          name="w_1")(x)
            x = nn.relu(x)
            x = _SRLinear(c.d_model, kernel_init=k2,
                          bias_init=init.torch_linear_bias(c.d_inner),
                          name="w_2")(x)
        else:
            x = nn.Dense(c.d_inner, kernel_init=k1, dtype=dt,
                         bias_init=init.torch_linear_bias(c.d_model),
                         name="w_1")(x)
            x = nn.relu(x)
            x = nn.Dense(c.d_model, kernel_init=k2, dtype=dt,
                         bias_init=init.torch_linear_bias(c.d_inner),
                         name="w_2")(x)
        x = nn.Dropout(c.ffn_dropout, name="dropout")(
            x, deterministic=deterministic)
        x = x + residual
        if c.ffn_layernorm:
            x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm")(
                x.astype(jnp.float32)).astype(jnp.float32 if sr else dt)
        return x


class EncoderLayer(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True,
                 return_probs: bool = False, return_v: bool = False):
        out = MultiHeadAttention(self.cfg, name="slf_attn")(
            x, mask, deterministic=deterministic, return_probs=return_probs,
            return_v=return_v)
        probs = v = None
        if return_v:
            out, probs, v = out
        elif return_probs:
            out, probs = out
        if self.cfg.ffn_need:
            out = FeedForward(self.cfg, name="pos_ffn")(
                out, deterministic=deterministic)
        if return_v:
            return out, probs, v
        if return_probs:
            return out, probs
        return out


class Encoder(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, x, mask=None, *, deterministic: bool = True,
                 return_probs: bool = False, return_v: bool = False):
        """x: [B, L, d_model] -> [B, L+1, d_model] (CLS at position 0).

        ``return_probs`` -> (out, [per-layer attn maps]);
        ``return_v``     -> (out, [attn maps], [per-layer V tensors])."""
        c = self.cfg
        if c.input_layernorm:
            x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="input_layer_norm")(x)

        if c.cls_learned:
            cls_init = (init.xavier_uniform_torch((1, 1, c.d_model))
                        if c.weight_init else init.randn)
            cls = self.param("cls_token", cls_init, (1, 1, c.d_model))
            cls = jnp.broadcast_to(cls, (x.shape[0], 1, c.d_model))
        else:
            cls = jnp.mean(x, axis=1, keepdims=True)
        x = jnp.concatenate([cls, x], axis=1)

        if c.position_encoding:
            pe_init = (init.xavier_uniform_torch(
                (1, c.max_position_tokens, c.d_model))
                if c.weight_init else init.randn)
            pe = self.param("position_enc", pe_init,
                            (1, c.max_position_tokens, c.d_model))
            x = x + pe[:, :x.shape[1], :]
            x = nn.Dropout(c.position_dropout, name="position_dropout")(
                x, deterministic=deterministic)

        probs_all, v_all = [], []
        # remat (jax.checkpoint): drop each layer's activations after the
        # forward and recompute them in the backward — identical math, HBM
        # for activations goes from O(n_layers) to O(1).  Diagnostic outputs
        # keep the plain path (their point is to retain the intermediates).
        use_remat = c.remat and not (return_probs or return_v)
        for i in range(c.n_layers):
            layer = EncoderLayer(c, name=f"layer_{i}")
            if use_remat:
                x = nn.remat(
                    lambda mdl, y, m: mdl(y, m, deterministic=deterministic)
                )(layer, x, mask)
                continue
            x = layer(x, mask, deterministic=deterministic,
                      return_probs=return_probs, return_v=return_v)
            if return_v:
                x, probs, v = x
                probs_all.append(probs)
                v_all.append(v)
            elif return_probs:
                x, probs = x
                probs_all.append(probs)
        if return_v:
            return x, probs_all, v_all
        if return_probs:
            return x, probs_all
        return x
