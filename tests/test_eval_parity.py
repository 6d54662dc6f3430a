"""End-to-end evaluation parity: our batched pipeline vs a torch-oracle
re-enactment of the reference eval loops (same params), frame-for-frame."""

import jax
import numpy as np
import pytest
import torch

from lstc_vad_tpu.config import EncoderConfig
from lstc_vad_tpu.evaluation import metrics
from lstc_vad_tpu.evaluation.scoring import ClipScorer, PartScorer
from lstc_vad_tpu.models import Encoder, make_head

from torch_oracle import encoder_forward, head_forward

SMALL = dict(d_model=16, d_inner=24, n_head=2, d_k=8, d_v=8, n_layers=1,
             attn_impl="xla")


def _videos(rng, n=5, n_patch=4, d=16):
    out = []
    for _ in range(n):
        clips = int(rng.integers(7, 23))
        feat = rng.standard_normal((clips, n_patch, d)).astype(np.float32)
        anno = (rng.random(clips * 16) < 0.3).astype(np.float64)
        out.append((feat, anno))
    return out


def torch_reference_ltn_eval(params, cfg, videos, part_len, segment_len=16):
    """The reference loop (Test/evaluation_shanghaitech_ubnormal.py:70-94):
    per part: slice clips (tail re-window), flatten, encoder, CLS,
    classifier -> p_abn; expand x (end-beg)*segment_len frames."""
    scores_list, labels_list = [], []
    for feats_all, anno in videos:
        n_clips = feats_all.shape[0]
        total_len = 0
        n_part = n_clips // part_len
        if n_part * part_len < n_clips:
            n_part += 1
        for pi in range(n_part):
            beg = pi * part_len
            end = n_clips if pi == n_part - 1 else (pi + 1) * part_len
            if end - beg < part_len:
                part = feats_all[end - part_len:end]
            else:
                part = feats_all[beg:end]
            tokens = part.reshape(1, -1, part.shape[-1])
            h = encoder_forward(tokens, params["encoder"], cfg)
            probs = head_forward(h[:, 0, :], params["head"], "classifier")
            score = float(probs[0, 1])
            reps = (end - beg) * segment_len
            scores_list.extend([score] * reps)
            labels_list.extend(anno[total_len:total_len + reps].tolist())
            total_len += reps
    return np.asarray(scores_list), np.asarray(labels_list)


def test_ltn_eval_pipeline_matches_reference_loop(rng):
    part_len, n_patch, d = 3, 4, 16
    cfg = EncoderConfig(relative_pe=True, window_size=4, window_depth=part_len,
                        mha_layernorm=True, ffn_layernorm=True, **SMALL)
    enc = Encoder(cfg)
    head = make_head("classifier", d, 8)
    params_flax = {
        "encoder": enc.init(jax.random.PRNGKey(0),
                            np.zeros((1, part_len * n_patch, d),
                                     np.float32))["params"],
        "head": head.init(jax.random.PRNGKey(1),
                          np.zeros((1, d), np.float32))["params"]}
    params_np = jax.tree.map(np.asarray, params_flax)

    videos = _videos(rng)
    ref_scores, ref_labels = torch_reference_ltn_eval(
        params_np, cfg, videos, part_len)

    scorer = PartScorer(enc, head, part_len, n_patch)
    ours_scores, ours_labels = [], []
    for (part_scores, counts), (feats, anno) in zip(
            scorer.score_videos(params_flax, [f for f, _ in videos]), videos):
        s = np.repeat(part_scores, counts * 16)
        ours_scores.append(s)
        ours_labels.append(anno[:len(s)])
    ours_scores = np.concatenate(ours_scores)
    ours_labels = np.concatenate(ours_labels)

    np.testing.assert_array_equal(ours_labels, ref_labels)
    np.testing.assert_allclose(ours_scores, ref_scores, atol=2e-5)
    auc_ref = metrics.roc_auc(ref_scores, ref_labels)
    auc_ours = metrics.roc_auc(ours_scores, ours_labels)
    assert auc_ours == pytest.approx(auc_ref, abs=1e-9)


def test_stn_eval_pipeline_matches_reference_loop(rng):
    n_patch, d = 4, 16
    cfg = EncoderConfig(ffn_layernorm=True, **SMALL)
    enc = Encoder(cfg)
    head = make_head("regressor", d, 8)
    params_flax = {
        "encoder": enc.init(jax.random.PRNGKey(0),
                            np.zeros((1, n_patch, d), np.float32))["params"],
        "head": head.init(jax.random.PRNGKey(1),
                          np.zeros((1, d), np.float32))["params"]}
    params_np = jax.tree.map(np.asarray, params_flax)

    videos = _videos(rng)
    # reference: whole video through the encoder, per-clip scores x 16
    ref_scores = []
    for feats, _ in videos:
        h = encoder_forward(feats, params_np["encoder"], cfg)
        s = head_forward(h[:, 0, :], params_np["head"], "regressor")[:, 0]
        ref_scores.append(np.repeat(s, 16))
    ref_scores = np.concatenate(ref_scores)

    scorer = ClipScorer(enc, head, n_patch)
    ours = np.concatenate([
        np.repeat(s, 16) for s in
        scorer.score_videos(params_flax, [f for f, _ in videos])])
    np.testing.assert_allclose(ours, ref_scores, atol=2e-5)


def torch_reference_ucf_eval(params, cfg, videos, part_len, max_clips,
                             segment_len=16):
    """Re-enactment of Test/evaluation_UCF.py:47-86: linspace bins, per-bin
    mean pool (empty bin re-uses its start clip), short-tail beg=end-part_len
    overlap, L2 normalize, expansion x (r[end]-r[beg])*segment_len."""
    import torch.nn.functional as F

    scores_list, labels_list = [], []
    for feats_all, anno, n_frames in videos:
        t = torch.from_numpy(feats_all)
        n_clips = n_frames // segment_len
        r = np.linspace(0, n_clips, max_clips + 1, dtype=np.int32)
        n_part = max_clips // part_len
        if n_part * part_len < max_clips:
            n_part += 1
        for pi in range(n_part):
            beg = pi * part_len
            end = max_clips if pi == n_part - 1 else (pi + 1) * part_len
            if end - beg < part_len:
                beg = end - part_len
            feat_cat = None
            for r_i in range(beg, end):
                if r[r_i] == r[r_i + 1]:
                    feature = t[r[r_i]].reshape(-1, t.shape[1], t.shape[2])
                else:
                    feature = t[r[r_i]:r[r_i + 1]].mean(0, keepdim=True)
                feat_cat = feature if feat_cat is None else torch.cat(
                    [feat_cat, feature], dim=0)
            tokens = feat_cat.reshape(1, -1, t.shape[2])
            tokens = F.normalize(tokens, p=2, dim=-1)
            h = encoder_forward(tokens.numpy(), params["encoder"], cfg)
            probs = head_forward(h[:, 0, :], params["head"], "classifier")
            score = float(probs[0, 1])
            reps = int(r[end] - r[beg]) * segment_len
            scores_list.extend([score] * reps)
            labels_list.extend(
                anno[r[beg] * segment_len:r[end] * segment_len].tolist())
    return np.asarray(scores_list), np.asarray(labels_list)


def test_ucf_final_eval_matches_reference_loop(rng):
    from lstc_vad_tpu.evaluation.frame_auc import ucf_expand
    from lstc_vad_tpu.evaluation.scoring import UCFBinnedScorer

    part_len, n_patch, d, max_clips = 2, 3, 16, 8
    cfg = EncoderConfig(relative_pe=True, window_size=4,
                        window_depth=part_len, mha_layernorm=True,
                        ffn_layernorm=True, **SMALL)
    enc = Encoder(cfg)
    head = make_head("classifier", d, 8)
    params_flax = {
        "encoder": enc.init(jax.random.PRNGKey(0),
                            np.zeros((1, part_len * n_patch, d),
                                     np.float32))["params"],
        "head": head.init(jax.random.PRNGKey(1),
                          np.zeros((1, d), np.float32))["params"]}
    params_np = jax.tree.map(np.asarray, params_flax)

    videos = []
    for _ in range(4):
        clips = int(rng.integers(3, 40))
        n_frames = clips * 16 + int(rng.integers(0, 16))
        feat = rng.standard_normal((clips, n_patch, d)).astype(np.float32)
        anno = (rng.random(n_frames) < 0.3).astype(np.float64)
        videos.append((feat, anno, n_frames))

    ref_scores, ref_labels = torch_reference_ucf_eval(
        params_np, cfg, videos, part_len, max_clips)

    scorer = UCFBinnedScorer(enc, head, part_len, n_patch,
                             max_clips=max_clips, l2_normalize=True,
                             tail_rewindow=True)
    ours_scores, ours_labels = [], []
    for feat, anno, n_frames in videos:
        part_scores, parts, r = scorer.score_video(params_flax, feat,
                                                   n_frames // 16)
        vs = ucf_expand(part_scores, parts, r, anno, 16)
        ours_scores.append(vs.scores)
        ours_labels.append(vs.labels)
    ours_scores = np.concatenate(ours_scores)
    ours_labels = np.concatenate(ours_labels)

    np.testing.assert_array_equal(ours_labels, ref_labels)
    np.testing.assert_allclose(ours_scores, ref_scores, atol=2e-5)
