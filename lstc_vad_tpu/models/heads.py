"""Scoring heads.

- ``Regressor`` (STN): d -> hidden -> 32 -> 1 with Sigmoid
  (reference models/Regressor.py:4-21).  Dropout after BOTH the first
  (post-ReLU) and second linear — the second has no activation before its
  dropout, exactly as the reference Sequential is wired.
- ``Classifier`` (LTN): d -> 512 -> 32 -> 2 with Softmax INSIDE the module
  (models/Classifier.py:5-23).  Downstream losses consume these
  probabilities, not logits — the soft-CE objective reproduces torch's
  log_softmax-of-probs behavior (see objectives/losses.py).

Both apply along the last axis; the reference's flatten-to-[-1, d] is a no-op
for a Linear stack, so callers keep their leading shape.
"""

from __future__ import annotations

import jax
from flax import linen as nn

from . import initializers as init


class _MLPHead(nn.Module):
    features: tuple
    dropout: float
    weight_init: bool

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        fan_in = x.shape[-1]
        for i, feats in enumerate(self.features):
            kernel_init = (init.xavier_uniform_torch() if self.weight_init
                           else init.torch_linear_kernel)
            x = nn.Dense(feats, kernel_init=kernel_init,
                         bias_init=init.torch_linear_bias(fan_in),
                         name=f"linear_{i}")(x)
            fan_in = feats
            if i == 0:
                x = nn.relu(x)
            if i < len(self.features) - 1:
                x = nn.Dropout(self.dropout, name=f"dropout_{i}")(
                    x, deterministic=deterministic)
        return x


def _check_width(x, d_model: int):
    """The reference heads' first Linear has in_features=d_model
    (models/Regressor.py:7, models/Classifier.py:8) and errors on a width
    mismatch; flax Dense would silently shape-infer instead — enforce the
    declared width so the field is load-bearing, not decorative."""
    if x.shape[-1] != d_model:
        raise ValueError(f"head configured for d_model={d_model} got input "
                         f"width {x.shape[-1]}")


class Regressor(nn.Module):
    d_model: int = 2048
    hidden_dim: int = 512
    dropout: float = 0.6
    weight_init: bool = False

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        _check_width(x, self.d_model)
        x = _MLPHead((self.hidden_dim, 32, 1), self.dropout, self.weight_init,
                     name="mlp")(x, deterministic=deterministic)
        return jax.nn.sigmoid(x)


class Classifier(nn.Module):
    d_model: int = 2048
    hidden_dim: int = 512
    dropout: float = 0.6
    weight_init: bool = False

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        _check_width(x, self.d_model)
        x = _MLPHead((self.hidden_dim, 32, 2), self.dropout, self.weight_init,
                     name="mlp")(x, deterministic=deterministic)
        return jax.nn.softmax(x, axis=-1)


def make_head(kind: str, d_model: int, hidden_dim: int = 512,
              dropout: float = 0.6, weight_init: bool = False):
    if kind == "regressor":
        return Regressor(d_model, hidden_dim, dropout, weight_init)
    if kind == "classifier":
        return Classifier(d_model, hidden_dim, dropout, weight_init)
    raise ValueError(f"unknown head kind {kind!r}")
