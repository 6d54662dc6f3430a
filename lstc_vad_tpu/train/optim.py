"""Optimizer: torch-parity Adagrad with two learning-rate groups.

The reference trains with torch.optim.Adagrad over two parameter groups —
encoder at lr_encoder (1e-4) and head at lr_head (1e-2) — with shared
weight_decay (Train/spatio_transformer_shanghaitech.py:76-78) and optional
per-model grad-norm clipping at 10 (:105-107).

torch's Adagrad update is  p -= lr * g' / (sqrt(sum_sq) + eps)  with
g' = g + weight_decay * p accumulated into sum_sq, eps=1e-10 and zero initial
accumulator.  optax.scale_by_rss uses rsqrt(sum + eps) which diverges for tiny
gradients, so ``adagrad_torch`` implements the exact torch rule (parity test:
tests/test_optim.py drives torch.optim.Adagrad side-by-side).

Clipping note: torch clips the raw gradients per model BEFORE the optimizer
adds weight decay; the optax chain below mirrors that order
(clip -> add_decayed_weights -> rss -> -lr).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import OptimConfig


class ScaleByRssTorchState(NamedTuple):
    sum_of_squares: optax.Updates


def scale_by_rss_torch(initial_accumulator_value: float = 0.0,
                       eps: float = 1e-10) -> optax.GradientTransformation:
    """update = g / (sqrt(sum g^2) + eps) — torch.optim.Adagrad's rule."""

    def init_fn(params):
        return ScaleByRssTorchState(
            sum_of_squares=jax.tree.map(
                lambda p: jnp.full_like(p, initial_accumulator_value), params))

    def update_fn(updates, state, params=None):
        del params
        sums = jax.tree.map(lambda g, s: s + jnp.square(g), updates,
                            state.sum_of_squares)
        updates = jax.tree.map(lambda g, s: g / (jnp.sqrt(s) + eps),
                               updates, sums)
        return updates, ScaleByRssTorchState(sum_of_squares=sums)

    return optax.GradientTransformation(init_fn, update_fn)


def adagrad_torch(lr: float, weight_decay: float = 0.0,
                  eps: float = 1e-10, initial_accumulator: float = 0.0,
                  clip_norm: Optional[float] = None) -> optax.GradientTransformation:
    parts = []
    if clip_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_norm))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(scale_by_rss_torch(initial_accumulator, eps))
    parts.append(optax.scale(-lr))
    return optax.chain(*parts)


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    """Two-group optimizer over a params pytree shaped
    {'encoder': ..., 'head': ...}."""
    clip = cfg.clip_norm if cfg.clip_grad else None

    def group(lr):
        return adagrad_torch(lr, cfg.weight_decay, cfg.adagrad_eps,
                             cfg.initial_accumulator, clip)

    def labels(params):
        return {key: jax.tree.map(lambda _: key, sub)
                for key, sub in params.items()}

    return optax.multi_transform(
        {"encoder": group(cfg.lr_encoder), "head": group(cfg.lr_head)},
        param_labels=labels)
