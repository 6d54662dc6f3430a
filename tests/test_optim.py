"""Adagrad parity vs torch.optim.Adagrad, incl. weight decay, two LR groups,
and grad clipping — stepping both optimizers on identical gradient streams."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp
import optax

from lstc_vad_tpu.config import OptimConfig
from lstc_vad_tpu.train.optim import adagrad_torch, make_optimizer


def test_adagrad_matches_torch_single_group(rng):
    w0 = rng.standard_normal((5, 3)).astype(np.float32)
    grads = [rng.standard_normal((5, 3)).astype(np.float32) * s
             for s in (1.0, 1e-3, 10.0, 1e-6)]

    # torch side
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adagrad([wt], lr=0.01, weight_decay=1e-3)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()

    # jax side
    tx = adagrad_torch(0.01, weight_decay=1e-3)
    params = jnp.asarray(w0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params), wt.detach().numpy(),
                               rtol=1e-5, atol=1e-7)


def test_two_group_lrs_and_clipping(rng):
    enc0 = rng.standard_normal((4, 4)).astype(np.float32)
    head0 = rng.standard_normal((4,)).astype(np.float32)
    grads = [(rng.standard_normal((4, 4)).astype(np.float32) * 50,
              rng.standard_normal((4,)).astype(np.float32) * 50)
             for _ in range(3)]

    te = torch.nn.Parameter(torch.from_numpy(enc0.copy()))
    th = torch.nn.Parameter(torch.from_numpy(head0.copy()))
    opt = torch.optim.Adagrad([{"params": [te], "lr": 1e-4},
                               {"params": [th], "lr": 1e-2}],
                              weight_decay=1e-3)
    for ge, gh in grads:
        opt.zero_grad()
        te.grad = torch.from_numpy(ge.copy())
        th.grad = torch.from_numpy(gh.copy())
        # reference clips per model at norm 10 BEFORE step
        torch.nn.utils.clip_grad_norm_([te], 10)
        torch.nn.utils.clip_grad_norm_([th], 10)
        opt.step()

    cfg = OptimConfig(lr_encoder=1e-4, lr_head=1e-2, weight_decay=1e-3,
                      clip_grad=True, clip_norm=10.0)
    tx = make_optimizer(cfg)
    params = {"encoder": jnp.asarray(enc0), "head": jnp.asarray(head0)}
    state = tx.init(params)
    for ge, gh in grads:
        g = {"encoder": jnp.asarray(ge), "head": jnp.asarray(gh)}
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params["encoder"]),
                               te.detach().numpy(), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(params["head"]),
                               th.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_update_is_jittable(rng):
    cfg = OptimConfig()
    tx = make_optimizer(cfg)
    params = {"encoder": {"k": jnp.ones((2, 2))}, "head": {"b": jnp.ones(3)}}
    state = tx.init(params)

    @jax.jit
    def step(params, state):
        g = jax.tree.map(jnp.ones_like, params)
        updates, state = tx.update(g, state, params)
        return optax.apply_updates(params, updates), state

    params2, _ = step(params, state)
    assert not np.allclose(np.asarray(params2["head"]["b"]), 1.0)
