"""Loss parity vs torch implementations of the reference objectives.

The torch sides below re-state the reference loss definitions
(Train/spatio_transformer_shanghaitech.py:21-32,
Train/temporal_transformer_shanghaitech.py:21-36,
Train/spatio_transformer_MIL_CE.py:23-26) including the Python pair loop,
so the vectorized jax versions are checked value-for-value.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from lstc_vad_tpu.objectives import losses as L


def torch_mil_hinge(video_scores: torch.Tensor, lambda_1, sparsity_src):
    b = video_scores.shape[0] // 2
    nor, abn = video_scores[:b], video_scores[b:]
    err = torch.zeros(())
    for i in range(b):
        err = err + torch.sum(F.relu(1 - abn + nor[i]))
    err = err / b**2
    spar = torch.mean(sparsity_src)
    return err + lambda_1 * spar, err, spar


@pytest.mark.parametrize("bs,part_num,part_len", [(4, 5, 3), (8, 16, 7), (1, 2, 1)])
def test_stn_mil_loss(rng, bs, part_num, part_len):
    scores = rng.random((2 * bs, part_num * part_len)).astype(np.float32)
    loss, err, spar = L.stn_mil_loss(scores, part_num, part_len, lambda_1=0.01)

    t = torch.from_numpy(scores)
    video = torch.max(torch.mean(t.view(2 * bs, part_num, part_len), -1), -1)[0]
    t_loss, t_err, t_spar = torch_mil_hinge(video, 0.01, t[bs:])
    assert float(loss) == pytest.approx(float(t_loss), rel=1e-6)
    assert float(err) == pytest.approx(float(t_err), rel=1e-6)
    assert float(spar) == pytest.approx(float(t_spar), rel=1e-6)


@pytest.mark.parametrize("bs,part_num", [(4, 5), (8, 16)])
def test_ltn_mil_loss(rng, bs, part_num):
    flat = rng.random(2 * bs * part_num).astype(np.float32)
    loss, err, spar = L.ltn_mil_loss(flat, part_num, lambda_1=0.01)

    # literal reference formula (temporal_transformer_shanghaitech.py:25-36):
    # note abn_pred slices the FLAT vector at batch_size — a reference quirk
    t = torch.from_numpy(flat)
    video = torch.max(t.view(2 * bs, part_num), -1)[0]
    t_loss, t_err, t_spar = torch_mil_hinge(video, 0.01, t[bs:])
    assert float(loss) == pytest.approx(float(t_loss), rel=1e-6)
    assert float(err) == pytest.approx(float(t_err), rel=1e-6)
    assert float(spar) == pytest.approx(float(t_spar), rel=1e-6)


@pytest.mark.parametrize("bs,part_num,part_len", [(4, 5, 3), (6, 16, 7)])
def test_coteach_stn_mil_loss(rng, bs, part_num, part_len):
    scores = rng.random((2 * bs, part_num * part_len)).astype(np.float32)
    loss, err, spar = L.coteach_stn_mil_loss(scores, part_num, part_len, 0.01)

    # literal MIL_CE formula (spatio_transformer_MIL_CE.py:32-44): y_pred is
    # the flat [2B*pn*pl, 1] regressor output; abn_pred = y_pred[batch_size:]
    t = torch.from_numpy(scores.reshape(-1, 1))
    video = torch.max(torch.mean(
        t.view(2 * bs, part_num, part_len), -1), -1)[0]
    t_loss, t_err, t_spar = torch_mil_hinge(video, 0.01, t[bs:])
    assert float(loss) == pytest.approx(float(t_loss), rel=1e-6)
    assert float(err) == pytest.approx(float(t_err), rel=1e-6)
    assert float(spar) == pytest.approx(float(t_spar), rel=1e-6)


def test_soft_ce_matches_torch_cross_entropy(rng):
    # The Classifier emits softmax probabilities; the reference feeds them to
    # F.cross_entropy with SOFT labels, which log_softmaxes them again.
    probs = rng.random((64, 2)).astype(np.float32)
    probs = probs / probs.sum(-1, keepdims=True)
    p = rng.random((64,)).astype(np.float32)
    soft = np.stack([1 - p, p], -1)

    ours = float(L.soft_cross_entropy_on_probs(probs, soft))
    theirs = float(F.cross_entropy(torch.from_numpy(probs), torch.from_numpy(soft)))
    assert ours == pytest.approx(theirs, rel=1e-4)


def test_weighted_bce_matches_reference_formula(rng):
    bs, part_num = 6, 16
    probs = rng.random((2 * bs, part_num)).astype(np.float32)
    p = rng.random((2 * bs, part_num)).astype(np.float32)
    labs = np.stack([1 - p, p], -1)

    ours = float(L.weighted_bce(probs, labs, 0.2, 2.0))
    t_out, t_labs = torch.from_numpy(probs), torch.from_numpy(labs)
    theirs = float(torch.mean(
        -0.2 * t_labs[:, :, 0] * torch.log(1 - t_out + 1e-8)
        - 2.0 * t_labs[:, :, 1] * torch.log(t_out + 1e-8)))
    assert ours == pytest.approx(theirs, rel=1e-6)


def test_soft_labels_from_pseudo(rng):
    bs, part_num, part_len = 3, 4, 5
    pseudo = rng.random((bs, part_num * part_len)).astype(np.float32)
    soft = np.asarray(L.soft_labels_from_pseudo(pseudo, part_len))
    expected_p = pseudo.reshape(bs, part_num, part_len).mean(-1)
    np.testing.assert_allclose(soft[..., 1], expected_p, rtol=1e-6)
    np.testing.assert_allclose(soft[..., 0], 1 - expected_p, rtol=1e-6)
