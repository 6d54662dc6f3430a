"""Jitted training steps for STN and LTN.

One fused device program per step: forward (encoder + head), loss, backward,
clip, Adagrad update — everything the reference does across
Train/spatio_transformer_shanghaitech.py:89-109 /
temporal_transformer_shanghaitech.py:99-142 per batch, minus the host
round-trips.  Batches arrive as fixed-shape arrays; the state pytree is
donated so parameters update in place on device.

Sharding: the steps are plain jitted functions; the parallel/ module wraps
them with mesh shardings (batch over the data axis, params replicated or
tensor-sharded) — see parallel/mesh.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..config import TrainConfig
from ..objectives.losses import (build_clip_labels, coteach_stn_mil_loss,
                                 ltn_mil_loss, soft_cross_entropy_on_probs,
                                 stn_mil_loss, weighted_bce)


def _dropout_keys(rng, impl: str):
    """Split the state's threefry key into the two per-step dropout keys,
    converted to the configured generator.

    ``impl='rbg'`` hands flax Dropout typed keys backed by XLA's native
    RngBitGenerator: mask generation stops paying threefry's per-element
    hash chain, measured +22% full-train-step throughput on v5e
    (docs/ARCHITECTURE.md).  The dropout STREAM differs from threefry, which
    is within the project's RNG-parity contract — the reference's numpy
    RNG is reproduced in distribution, never bit-for-bit (SURVEY §7).
    State/checkpoints are unaffected: ``TrainState.rng`` stays a threefry
    key; conversion happens inside the step."""
    r1, r2 = jax.random.split(rng)
    if impl == "threefry":
        return r1, r2
    if impl != "rbg":
        raise ValueError(f"unknown dropout_rng {impl!r}")
    as_rbg = lambda k: jax.random.wrap_key_data(  # noqa: E731
        jnp.tile(k if k.dtype == jnp.uint32 else jax.random.key_data(k), 2),
        impl="rbg")
    return as_rbg(r1), as_rbg(r2)


def _apply_update(tx, state, grads):
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(params=params, opt_state=opt_state,
                         step=state.step + 1)


def make_stn_train_step(encoder, head, cfg: TrainConfig, tx):
    """Batch: (norm_feats, norm_labs, abnorm_feats, abnorm_labs) with
    feats [B, pn*pl, n_patch, d].  Labels are unused by the pure-MIL STN."""
    pn, pl = cfg.data.part_num, cfg.data.part_len
    n_patch, d = cfg.data.n_patch, cfg.encoder.d_model
    lam1 = cfg.loss.lambda_1
    rng_impl = cfg.dropout_rng

    def loss_fn(params, feats, rng):
        b2 = feats.shape[0]
        x = feats.reshape(b2 * pn * pl, n_patch, d)
        r1, r2 = _dropout_keys(rng, rng_impl)
        h = encoder.apply({"params": params["encoder"]}, x,
                          deterministic=False, rngs={"dropout": r1})
        cls = h[:, 0, :]
        scores = head.apply({"params": params["head"]}, cls,
                            deterministic=False, rngs={"dropout": r2})
        scores = scores.reshape(b2, pn * pl)
        loss, err, spar = stn_mil_loss(scores, pn, pl, lam1)
        return loss, {"loss": loss, "err": err, "l1": spar}

    def step(state, norm_feats, norm_labs, abnorm_feats, abnorm_labs):
        del norm_labs, abnorm_labs
        rng = jax.random.fold_in(state.rng, state.step)
        feats = jnp.concatenate([norm_feats, abnorm_feats], axis=0)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, feats, rng)
        return _apply_update(tx, state, grads), metrics

    return jax.jit(step, donate_argnums=(0,) if cfg.donate else ())


def make_stn_bce_train_step(encoder, head, cfg: TrainConfig, tx):
    """Co-teaching STN round: MIL + class-weighted BCE on the LTN's pseudo
    labels (Train/spatio_transformer_MIL_CE.py:166-181 even rounds).

    Per-part targets are the same soft (1-p, p) build as the LTN CE; the BCE
    compares them against the regressor's part-mean score."""
    pn, pl = cfg.data.part_num, cfg.data.part_len
    n_patch, d = cfg.data.n_patch, cfg.encoder.d_model
    loss_cfg = cfg.loss
    rng_impl = cfg.dropout_rng
    # the sparsity-slice quirk is dataset-branched in the reference: UCF
    # re-views outputs to 3-D before get_MIL_loss so the slice takes the
    # abnormal HALF (MIL_CE.py:173-175); SHT/UBnormal stay flat (:176)
    flat_sparsity = cfg.data.dataset != "UCF"

    def loss_fn(params, feats, clip_labs, rng):
        b2 = feats.shape[0]
        x = feats.reshape(b2 * pn * pl, n_patch, d)
        r1, r2 = _dropout_keys(rng, rng_impl)
        h = encoder.apply({"params": params["encoder"]}, x,
                          deterministic=False, rngs={"dropout": r1})
        scores = head.apply({"params": params["head"]}, h[:, 0, :],
                            deterministic=False, rngs={"dropout": r2})
        scores = scores.reshape(b2, pn * pl)
        mil, err, spar = coteach_stn_mil_loss(scores, pn, pl,
                                              loss_cfg.lambda_1,
                                              flat_sparsity=flat_sparsity)
        part_mean = jnp.mean(scores.reshape(b2, pn, pl), axis=-1)
        bce = weighted_bce(part_mean, clip_labs, loss_cfg.lambda_normal,
                           loss_cfg.lambda_abnormal)
        loss = loss_cfg.lambda_bce * bce + mil
        return loss, {"loss": loss, "mil": mil, "bce": bce, "err": err,
                      "l1": spar}

    def step(state, norm_feats, norm_labs, abnorm_feats, abnorm_labs):
        del norm_labs
        b = norm_feats.shape[0]
        clip_labs = build_clip_labels(b, pn, pl, abnorm_labs)
        feats = jnp.concatenate([norm_feats, abnorm_feats], axis=0)
        rng = jax.random.fold_in(state.rng, state.step)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, feats, clip_labs, rng)
        return _apply_update(tx, state, grads), metrics

    return jax.jit(step, donate_argnums=(0,) if cfg.donate else ())


def make_ltn_train_step(encoder, head, cfg: TrainConfig, tx):
    """LTN: soft pseudo-label CE + MIL on the abnormal-class probability.

    Label build reproduces Train/temporal_transformer_shanghaitech.py:103-112:
    normal videos get hard (1,0) per part; abnormal parts get soft
    (1-p, p) with p = mean of the clip pseudo scores over part_len.
    """
    pn, pl = cfg.data.part_num, cfg.data.part_len
    n_patch, d = cfg.data.n_patch, cfg.encoder.d_model
    loss_cfg = cfg.loss
    rng_impl = cfg.dropout_rng

    def loss_fn(params, feats, clip_labs, rng):
        b2 = feats.shape[0]
        x = feats.reshape(b2 * pn, pl * n_patch, d)
        r1, r2 = _dropout_keys(rng, rng_impl)
        h = encoder.apply({"params": params["encoder"]}, x,
                          deterministic=False, rngs={"dropout": r1})
        cls = h[:, 0, :]
        probs = head.apply({"params": params["head"]}, cls,
                           deterministic=False, rngs={"dropout": r2})
        probs = probs.reshape(b2 * pn, 2)
        abn_score = probs[:, 1]
        mil, err, spar = ltn_mil_loss(abn_score, pn, loss_cfg.lambda_1)
        if loss_cfg.temporal_only:
            ce = jnp.zeros(())
        else:
            ce = soft_cross_entropy_on_probs(probs,
                                             clip_labs.reshape(b2 * pn, 2))
        loss = loss_cfg.lambda_mil * mil + loss_cfg.lambda_ce * ce
        return loss, {"loss": loss, "mil": mil, "ce": ce, "err": err,
                      "l1": spar}

    def step(state, norm_feats, norm_labs, abnorm_feats, abnorm_labs):
        del norm_labs
        b = norm_feats.shape[0]
        clip_labs = build_clip_labels(b, pn, pl, abnorm_labs)
        feats = jnp.concatenate([norm_feats, abnorm_feats], axis=0)
        rng = jax.random.fold_in(state.rng, state.step)
        grads, metrics = jax.grad(loss_fn, has_aux=True)(
            state.params, feats, clip_labs, rng)
        return _apply_update(tx, state, grads), metrics

    return jax.jit(step, donate_argnums=(0,) if cfg.donate else ())
