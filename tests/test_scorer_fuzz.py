"""Property fuzz: the cross-video batched scorers against a naive
one-part-per-call oracle (the reference's eval structure,
Test/evaluation_shanghaitech_ubnormal.py:77-91 / evaluation_UCF.py:52-85).

The batched dispatch stack — greedy exact-bucket decomposition, block-copy
part packing, double-buffered _Pipeline ordering, cross-video chunk packing,
short-tail routing — must be a pure layout optimization: every part's score
equals scoring that part alone (up to XLA's batch-shape tiling noise, the
tolerance every bucket-padding test in this repo already implies).

~270 random video shapes across PartScorer / UCFBinnedScorer /
UCFClipBinScorer, sweeping (n_videos, n_clips, part_len, max_clips,
adaptive_bins, tail_rewindow, l2_normalize) including the degenerate edges
(single-clip videos, videos shorter than part_len, n_clips < max_clips).
"""

import numpy as np
import pytest

from lstc_vad_tpu.config import EncoderConfig
from lstc_vad_tpu.evaluation.frame_auc import part_slices
from lstc_vad_tpu.evaluation.scoring import (PartScorer, UCFBinnedScorer,
                                             UCFClipBinScorer)
from lstc_vad_tpu.models import Encoder, make_head

D_MODEL, N_PATCH_STORED = 16, 3


@pytest.fixture(scope="module")
def modules():
    import jax

    enc = Encoder(EncoderConfig(
        d_model=D_MODEL, d_inner=24, n_head=2, d_k=8, d_v=8, n_layers=1,
        mha_layernorm=True, ffn_layernorm=True, attn_impl="xla"))
    cls_head = make_head("classifier", D_MODEL, 8)
    reg_head = make_head("regressor", D_MODEL, 8)
    x = np.zeros((1, 6, D_MODEL), np.float32)
    params_cls = {
        "encoder": enc.init(jax.random.PRNGKey(0), x)["params"],
        "head": cls_head.init(jax.random.PRNGKey(1),
                              np.zeros((1, D_MODEL), np.float32))["params"]}
    params_reg = {
        "encoder": params_cls["encoder"],
        "head": reg_head.init(jax.random.PRNGKey(2),
                              np.zeros((1, D_MODEL), np.float32))["params"]}
    return enc, cls_head, reg_head, params_cls, params_reg


def _video(rng, n_clips):
    return rng.standard_normal(
        (n_clips, N_PATCH_STORED, D_MODEL)).astype(np.float32)


def test_part_scorer_fuzz_vs_per_part_loop(modules):
    """PartScorer.score_videos == scoring each part alone, over random
    (n_videos, n_clips, part_len, tail_rewindow) shapes."""
    enc, cls_head, _, params, _ = modules
    rng = np.random.default_rng(42)
    n_shapes = 0
    for trial in range(40):
        part_len = int(rng.choice([1, 2, 3, 5, 7]))
        tail_rewindow = bool(rng.integers(0, 2))
        scorer = PartScorer(enc, cls_head, part_len, N_PATCH_STORED,
                            tail_rewindow=tail_rewindow)
        n_videos = int(rng.integers(1, 5))
        feats = []
        for _ in range(n_videos):
            # deliberately hit the degenerate edges: 1-clip videos and
            # videos shorter than part_len (negative-slice tail quirk)
            n_clips = int(rng.choice(
                [1, part_len - 1, part_len, part_len + 1,
                 int(rng.integers(1, 90))]))
            if n_clips < 1:
                n_clips = 1
            feats.append(_video(rng, n_clips))
        got = scorer.score_videos(params, feats)
        for f, (scores, counts) in zip(feats, got):
            idx_list, ref_counts = part_slices(len(f), part_len,
                                               tail_rewindow)
            np.testing.assert_array_equal(counts, ref_counts)
            ref = np.array([
                scorer.scorer.score_tokens(
                    params, f[idx, :N_PATCH_STORED, :].reshape(
                        1, -1, D_MODEL))[0]
                for idx in idx_list], np.float32)
            np.testing.assert_allclose(scores, ref, rtol=1e-5, atol=1e-6)
            n_shapes += 1
    assert n_shapes >= 100


def test_ucf_binned_scorer_fuzz_vs_per_part_loop(modules):
    """UCFBinnedScorer.score_videos == per-part loop over the same bin
    plan, sweeping (max_clips, part_len, adaptive_bins, tail_rewindow,
    l2_normalize, n_clips) including n_clips < max_clips."""
    enc, cls_head, _, params, _ = modules
    rng = np.random.default_rng(43)
    n_shapes = 0
    for trial in range(30):
        part_len = int(rng.choice([1, 2, 3, 5]))
        max_clips = int(rng.choice([4, 7, 8, 16, 21, 32]))
        kw = dict(max_clips=max_clips,
                  l2_normalize=bool(rng.integers(0, 2)),
                  tail_rewindow=bool(rng.integers(0, 2)),
                  adaptive_bins=bool(rng.integers(0, 2)))
        scorer = UCFBinnedScorer(enc, cls_head, part_len, N_PATCH_STORED,
                                 **kw)
        items = []
        for _ in range(int(rng.integers(1, 4))):
            n_clips = int(rng.choice(
                [1, max_clips - 1, max_clips, max_clips + 3,
                 int(rng.integers(1, 200))]))
            if n_clips < 1:
                n_clips = 1
            items.append((_video(rng, n_clips), n_clips))
        got = scorer.score_videos(params, items)
        for (f, n_clips), (scores, parts, r) in zip(items, got):
            binned, ref_parts, ref_r = scorer._plan(f, n_clips)
            assert parts == ref_parts
            np.testing.assert_array_equal(r, ref_r)
            ref = np.array([
                scorer.scorer.score_tokens(
                    params, binned[beg:end].reshape(
                        1, (end - beg) * N_PATCH_STORED, D_MODEL))[0]
                for beg, end in ref_parts], np.float32)
            np.testing.assert_allclose(scores, ref, rtol=1e-5, atol=1e-6)
            n_shapes += 1
    assert n_shapes >= 50


def test_ucf_clip_bin_scorer_fuzz_vs_per_bin_loop(modules):
    """UCFClipBinScorer.score_videos == scoring each pooled bin alone,
    including empty-bin videos (n_clips < max_clips) and the nothing-to-
    score edge (the reference skips such videos,
    Train/spatio_transformer_UCF.py:123)."""
    from lstc_vad_tpu.evaluation.frame_auc import ucf_bin_edges

    enc, _, reg_head, _, params = modules
    rng = np.random.default_rng(44)
    n_shapes = 0
    for trial in range(20):
        max_clips = int(rng.choice([4, 8, 16, 32]))
        scorer = UCFClipBinScorer(enc, reg_head, N_PATCH_STORED,
                                  max_clips=max_clips)
        items = []
        for _ in range(int(rng.integers(1, 4))):
            n_clips = int(rng.choice(
                [1, 2, max_clips, int(rng.integers(1, 120))]))
            items.append((_video(rng, max(n_clips, 1)), max(n_clips, 1)))
        got = scorer.score_videos(params, items)
        for (f, n_clips), (scores, bin_ids, r) in zip(items, got):
            ref_r = ucf_bin_edges(n_clips, max_clips)
            np.testing.assert_array_equal(r, ref_r)
            ref_ids = [i for i in range(max_clips)
                       if ref_r[i] != ref_r[i + 1]]
            np.testing.assert_array_equal(bin_ids, ref_ids)
            ref = np.array([
                scorer.scorer.score_tokens(
                    params, f[ref_r[i]:ref_r[i + 1], :N_PATCH_STORED, :]
                    .mean(axis=0)[None])[0]
                for i in ref_ids], np.float32)
            np.testing.assert_allclose(scores, ref, rtol=1e-5, atol=1e-6)
            n_shapes += 1
    assert n_shapes >= 40
