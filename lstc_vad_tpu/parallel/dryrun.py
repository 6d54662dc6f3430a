"""Multi-chip dry run: jit the FULL training step over an n-device mesh with
real dp x tp shardings and execute one step on tiny shapes.

Used by __graft_entry__.dryrun_multichip (driver validation on a virtual CPU
mesh) and by tests/test_parallel.py.  The model is dimensionally small but
structurally identical to the flagship (3-D relative PE, both residual LNs,
classifier head), so every sharding rule is exercised.
"""

from __future__ import annotations

import jax
import numpy as np

from ..config import (DataConfig, EncoderConfig, HeadConfig, LossConfig,
                      OptimConfig, TrainConfig)
from ..train.state import create_train_state
from ..train.steps import make_ltn_train_step
from .mesh import batch_sharding, factor_devices, make_mesh, state_shardings


def tiny_ltn_config(n_head: int = 8, batch_size: int = 8) -> TrainConfig:
    part_len, n_patch = 3, 4
    return TrainConfig(
        model="ltn",
        encoder=EncoderConfig(d_model=64, d_inner=128, n_head=n_head,
                              d_k=16, d_v=16, n_layers=2,
                              mha_layernorm=True, ffn_layernorm=True,
                              relative_pe=True, window_size=4,
                              window_depth=part_len, attn_impl="xla"),
        head=HeadConfig(kind="classifier", d_model=64, hidden_dim=32),
        data=DataConfig(n_patch=n_patch, part_num=4, part_len=part_len,
                        d_model=64, batch_size=batch_size),
        optim=OptimConfig(clip_grad=True),
        loss=LossConfig(),
        donate=False,
    )


def run_multichip_step(n_devices: int, devices=None,
                       batch_size: int | None = None) -> dict:
    """Build an (data x model) mesh over ``n_devices``, shard state + batch,
    run ONE full LTN train step (fwd+bwd+Adagrad).  Returns the metrics."""
    data_ax, model_ax = factor_devices(n_devices)
    mesh = make_mesh(data_ax, model_ax, devices=devices)
    # one normal+abnormal pair per data-parallel shard
    if batch_size is None:
        batch_size = max(2 * data_ax, 2)
    cfg = tiny_ltn_config(batch_size=batch_size)

    state, encoder, head, tx = create_train_state(cfg)
    step_fn = make_ltn_train_step(encoder, head, cfg, tx)

    state = jax.device_put(state, state_shardings(state, mesh))

    d = cfg.data
    b = cfg.data.batch_size
    rng = np.random.default_rng(0)
    shape = (b, d.part_num * d.part_len, d.n_patch, cfg.encoder.d_model)
    bshard = batch_sharding(mesh)
    norm = jax.device_put(rng.standard_normal(shape, dtype=np.float32), bshard)
    abnorm = jax.device_put(rng.standard_normal(shape, dtype=np.float32),
                            bshard)
    labs = jax.device_put(
        rng.random((b, d.part_num * d.part_len)).astype(np.float32), bshard)

    state, metrics = step_fn(state, norm, labs, abnorm, labs)
    jax.block_until_ready(metrics)
    out = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(out["loss"]), out
    return out
