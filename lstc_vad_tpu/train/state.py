"""Training state: one pytree carrying params, optimizer state, step and PRNG.

Unlike the reference (module state + optimizer object + global RNG), the state
is a pure pytree — mesh-agnostic, Orbax-serializable, donate-able through the
jitted step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from ..config import TrainConfig
from ..models import Encoder, make_head
from ..train.optim import make_optimizer


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar
    rng: jax.Array     # PRNG key threaded through dropout

    def replace(self, **kw):
        return struct.dataclasses.replace(self, **kw)


def build_models(cfg: TrainConfig):
    encoder = Encoder(cfg.encoder)
    head = make_head(cfg.head.kind, cfg.head.d_model, cfg.head.hidden_dim,
                     cfg.head.dropout, cfg.head.weight_init)
    return encoder, head


def create_train_state(cfg: TrainConfig, seed: int | None = None) -> tuple:
    """Returns (state, encoder, head, tx).  Parameter init uses a tiny
    batch of the right rank; shapes are data-independent."""
    encoder, head = build_models(cfg)
    seed = cfg.seed if seed is None else seed
    key = jax.random.PRNGKey(seed)
    k_enc, k_head, k_run = jax.random.split(key, 3)
    d = cfg.encoder.d_model
    if cfg.model.startswith("stn"):
        tokens = cfg.data.n_patch
    else:
        tokens = cfg.data.part_len * cfg.data.n_patch
    x = jnp.zeros((1, tokens, d), jnp.float32)
    enc_params = encoder.init(k_enc, x)["params"]
    head_params = head.init(k_head, jnp.zeros((1, d), jnp.float32))["params"]
    params = {"encoder": enc_params, "head": head_params}
    tx = make_optimizer(cfg.optim)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32), rng=k_run)
    return state, encoder, head, tx
