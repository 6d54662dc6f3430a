"""Full train-step parity vs torch: same params + batch (dropout off) ->
gradients through the whole model and the two-group Adagrad update must match
a torch-autograd + torch.optim.Adagrad reference step."""

import jax
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lstc_vad_tpu.config import (DataConfig, EncoderConfig, HeadConfig,
                                 LossConfig, OptimConfig, TrainConfig)
from lstc_vad_tpu.train.state import create_train_state
from lstc_vad_tpu.train.steps import make_stn_train_step

from torch_oracle import encoder_forward, head_forward

PN, PL, NP, D = 3, 2, 4, 16


def _torch_params(params_np):
    """Flax param tree -> same-structure dict of grad-enabled torch tensors."""
    return jax.tree.map(
        lambda a: torch.tensor(np.asarray(a), requires_grad=True,
                               dtype=torch.float32), params_np)


def _flatten_with_group(tree, group):
    leaves = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        leaves.append((group, "/".join(getattr(k, "key", str(k))
                                       for k in path), leaf))
    return leaves


def test_stn_train_step_matches_torch_autograd(rng):
    cfg = TrainConfig(
        model="stn",
        encoder=EncoderConfig(d_model=D, d_inner=24, n_head=2, d_k=8, d_v=8,
                              n_layers=2, ffn_layernorm=True,
                              mha_layernorm=True, weight_init=True,
                              attn_dropout=0.0, fc_dropout=0.0,
                              ffn_dropout=0.0, attn_impl="xla"),
        head=HeadConfig(kind="regressor", d_model=D, hidden_dim=8,
                        dropout=0.0),
        data=DataConfig(n_patch=NP, part_num=PN, part_len=PL, d_model=D,
                        batch_size=2),
        optim=OptimConfig(lr_encoder=1e-3, lr_head=1e-2, weight_decay=1e-3,
                          clip_grad=True, clip_norm=10.0),
        loss=LossConfig(lambda_1=0.01),
        donate=False)

    state, encoder, head, tx = create_train_state(cfg)
    step = make_stn_train_step(encoder, head, cfg, tx)

    b = cfg.data.batch_size
    norm = rng.standard_normal((b, PN * PL, NP, D)).astype(np.float32)
    abnorm = rng.standard_normal((b, PN * PL, NP, D)).astype(np.float32)
    labs = np.zeros((b, PN * PL), np.float32)

    params0 = jax.tree.map(np.asarray, state.params)
    new_state, metrics = step(state, norm, labs, abnorm, labs)

    # ---- torch reference step on identical params/batch ----
    tp = _torch_params(params0)
    feats = np.concatenate([norm, abnorm], 0).reshape(2 * b * PN * PL, NP, D)
    h = encoder_forward(feats, tp["encoder"], cfg.encoder,
                        as_tensor=True)
    scores = head_forward(h[:, 0, :], tp["head"], "regressor",
                          as_tensor=True)
    scores = scores.reshape(2 * b, PN * PL)
    video = torch.max(torch.mean(scores.view(2 * b, PN, PL), -1), -1)[0]
    err = torch.zeros(())
    for i in range(b):
        err = err + torch.sum(F.relu(1 - video[b:] + video[i]))
    err = err / b ** 2
    loss = err + cfg.loss.lambda_1 * torch.mean(scores[b:])
    assert float(loss) == pytest.approx(float(metrics["loss"]), rel=1e-4)

    loss.backward()
    enc_leaves = _flatten_with_group(tp["encoder"], "enc")
    head_leaves = _flatten_with_group(tp["head"], "head")
    opt = torch.optim.Adagrad(
        [{"params": [t for _, _, t in enc_leaves], "lr": 1e-3},
         {"params": [t for _, _, t in head_leaves], "lr": 1e-2}],
        weight_decay=1e-3)
    torch.nn.utils.clip_grad_norm_([t for _, _, t in enc_leaves], 10.0)
    torch.nn.utils.clip_grad_norm_([t for _, _, t in head_leaves], 10.0)
    opt.step()

    ours = jax.tree.map(np.asarray, new_state.params)
    for group, tree in (("enc", "encoder"), ("head", "head")):
        ref = {path: t for g, path, t in (enc_leaves if group == "enc"
                                          else head_leaves)}
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                ours[tree])[0]:
            key = "/".join(getattr(k, "key", str(k)) for k in path)
            np.testing.assert_allclose(
                np.asarray(leaf), ref[key].detach().numpy(),
                rtol=2e-4, atol=2e-6,
                err_msg=f"{tree}/{key}")


def test_ltn_train_step_matches_torch_autograd(rng):
    from lstc_vad_tpu.train.steps import make_ltn_train_step

    cfg = TrainConfig(
        model="ltn",
        encoder=EncoderConfig(d_model=D, d_inner=24, n_head=2, d_k=8, d_v=8,
                              n_layers=1, ffn_layernorm=True,
                              mha_layernorm=True, relative_pe=True,
                              window_size=4, window_depth=PL,
                              attn_dropout=0.0, fc_dropout=0.0,
                              ffn_dropout=0.0, attn_impl="xla"),
        head=HeadConfig(kind="classifier", d_model=D, hidden_dim=8,
                        dropout=0.0),
        data=DataConfig(n_patch=NP, part_num=PN, part_len=PL, d_model=D,
                        batch_size=2),
        optim=OptimConfig(lr_encoder=1e-3, lr_head=1e-2, weight_decay=1e-3),
        loss=LossConfig(lambda_1=0.01, lambda_mil=1.0, lambda_ce=0.8),
        donate=False)

    state, encoder, head, tx = create_train_state(cfg)
    step = make_ltn_train_step(encoder, head, cfg, tx)

    b = cfg.data.batch_size
    norm = rng.standard_normal((b, PN * PL, NP, D)).astype(np.float32)
    abnorm = rng.standard_normal((b, PN * PL, NP, D)).astype(np.float32)
    pseudo = rng.random((b, PN * PL)).astype(np.float32)

    params0 = jax.tree.map(np.asarray, state.params)
    new_state, metrics = step(state, norm, np.zeros_like(pseudo), abnorm,
                              pseudo)

    # ---- torch reference (temporal_transformer_shanghaitech.py:99-134) ----
    tp = _torch_params(params0)
    feats = np.concatenate([norm, abnorm], 0).reshape(2 * b * PN, PL * NP, D)
    h = encoder_forward(feats, tp["encoder"], cfg.encoder, as_tensor=True)
    probs = head_forward(h[:, 0, :], tp["head"], "classifier",
                         as_tensor=True).reshape(2 * b * PN, 2)
    abn_score = probs[:, 1]
    video = torch.max(abn_score.view(2 * b, PN), -1)[0]
    err = torch.zeros(())
    for i in range(b):
        err = err + torch.sum(F.relu(1 - video[b:] + video[i]))
    err = err / b ** 2
    mil = err + cfg.loss.lambda_1 * torch.mean(abn_score.view(-1)[b:])
    p = torch.from_numpy(pseudo).view(b, PN, PL).mean(-1)
    abn_soft = torch.stack([1 - p, p], -1)
    norm_soft = torch.zeros(b, PN, 2)
    norm_soft[:, :, 0] = 1.0
    clip_labs = torch.cat([norm_soft, abn_soft], 0).view(2 * b * PN, 2)
    ce = F.cross_entropy(probs, clip_labs)
    loss = cfg.loss.lambda_mil * mil + cfg.loss.lambda_ce * ce
    assert float(loss) == pytest.approx(float(metrics["loss"]), rel=2e-4)

    loss.backward()
    enc_leaves = _flatten_with_group(tp["encoder"], "enc")
    head_leaves = _flatten_with_group(tp["head"], "head")
    opt = torch.optim.Adagrad(
        [{"params": [t for _, _, t in enc_leaves], "lr": 1e-3},
         {"params": [t for _, _, t in head_leaves], "lr": 1e-2}],
        weight_decay=1e-3)
    opt.step()

    ours = jax.tree.map(np.asarray, new_state.params)
    for group, tree in (("enc", "encoder"), ("head", "head")):
        ref = {path: t for g, path, t in (enc_leaves if group == "enc"
                                          else head_leaves)}
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                ours[tree])[0]:
            key = "/".join(getattr(k, "key", str(k)) for k in path)
            np.testing.assert_allclose(
                np.asarray(leaf), ref[key].detach().numpy(),
                rtol=1e-3, atol=1e-5, err_msg=f"{tree}/{key}")


def test_stn_bce_train_step_matches_torch_autograd(rng):
    from lstc_vad_tpu.train.steps import make_stn_bce_train_step

    cfg = TrainConfig(
        model="stn_bce",
        encoder=EncoderConfig(d_model=D, d_inner=24, n_head=2, d_k=8, d_v=8,
                              n_layers=1, ffn_layernorm=True,
                              attn_dropout=0.0, fc_dropout=0.0,
                              ffn_dropout=0.0, attn_impl="xla"),
        head=HeadConfig(kind="regressor", d_model=D, hidden_dim=8,
                        dropout=0.0),
        data=DataConfig(n_patch=NP, part_num=PN, part_len=PL, d_model=D,
                        batch_size=2),
        optim=OptimConfig(lr_encoder=1e-3, lr_head=1e-2, weight_decay=1e-3),
        loss=LossConfig(lambda_1=0.01, lambda_bce=1.0, lambda_normal=0.2,
                        lambda_abnormal=2.0),
        donate=False)

    state, encoder, head, tx = create_train_state(cfg)
    step = make_stn_bce_train_step(encoder, head, cfg, tx)

    b = cfg.data.batch_size
    norm = rng.standard_normal((b, PN * PL, NP, D)).astype(np.float32)
    abnorm = rng.standard_normal((b, PN * PL, NP, D)).astype(np.float32)
    pseudo = rng.random((b, PN * PL)).astype(np.float32)

    params0 = jax.tree.map(np.asarray, state.params)
    new_state, metrics = step(state, norm, np.zeros_like(pseudo), abnorm,
                              pseudo)

    # torch reference: MIL_CE even round (spatio_transformer_MIL_CE.py:155-181)
    tp = _torch_params(params0)
    feats = np.concatenate([norm, abnorm], 0).reshape(2 * b * PN * PL, NP, D)
    h = encoder_forward(feats, tp["encoder"], cfg.encoder, as_tensor=True)
    scores = head_forward(h[:, 0, :], tp["head"], "regressor",
                          as_tensor=True).reshape(2 * b, PN * PL)
    video = torch.max(torch.mean(scores.view(2 * b, PN, PL), -1), -1)[0]
    err = torch.zeros(())
    for i in range(b):
        err = err + torch.sum(F.relu(1 - video[b:] + video[i]))
    err = err / b ** 2
    # flat-slice sparsity quirk: y_pred[batch_size:] on [2B*pn*pl, 1]
    mil = err + cfg.loss.lambda_1 * torch.mean(scores.reshape(-1)[b:])
    part_mean = scores.view(2 * b, PN, PL).mean(-1)
    p = torch.from_numpy(pseudo).view(b, PN, PL).mean(-1)
    labs = torch.zeros(2 * b, PN, 2)
    labs[:b, :, 0] = 1.0
    labs[b:, :, 1] = p
    labs[b:, :, 0] = 1 - p
    bce = torch.mean(-0.2 * labs[:, :, 0] * torch.log(1 - part_mean + 1e-8)
                     - 2.0 * labs[:, :, 1] * torch.log(part_mean + 1e-8))
    loss = cfg.loss.lambda_bce * bce + mil
    assert float(loss) == pytest.approx(float(metrics["loss"]), rel=2e-4)

    loss.backward()
    enc_leaves = _flatten_with_group(tp["encoder"], "enc")
    head_leaves = _flatten_with_group(tp["head"], "head")
    opt = torch.optim.Adagrad(
        [{"params": [t for _, _, t in enc_leaves], "lr": 1e-3},
         {"params": [t for _, _, t in head_leaves], "lr": 1e-2}],
        weight_decay=1e-3)
    opt.step()

    ours = jax.tree.map(np.asarray, new_state.params)
    for group, tree in (("enc", "encoder"), ("head", "head")):
        ref = {path: t for g, path, t in (enc_leaves if group == "enc"
                                          else head_leaves)}
        for path, leaf in jax.tree_util.tree_flatten_with_path(
                ours[tree])[0]:
            key = "/".join(getattr(k, "key", str(k)) for k in path)
            np.testing.assert_allclose(
                np.asarray(leaf), ref[key].detach().numpy(),
                rtol=1e-3, atol=1e-5, err_msg=f"{tree}/{key}")
