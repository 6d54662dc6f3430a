"""Pseudo-label generator parity vs torch re-enactments of the reference
generators (same params), value-for-value."""

import jax
import numpy as np
import torch

from lstc_vad_tpu.config import EncoderConfig
from lstc_vad_tpu.data.annotations import TrainRecord
from lstc_vad_tpu.evaluation.scoring import ClipScorer, PartScorer
from lstc_vad_tpu.models import Encoder, make_head
from lstc_vad_tpu.pseudo import (generate_ltn_pseudo_labels,
                                 generate_stn_pseudo_labels)

from torch_oracle import encoder_forward, head_forward

SMALL = dict(d_model=16, d_inner=24, n_head=2, d_k=8, d_v=8, n_layers=1,
             attn_impl="xla")


class ArrayStore:
    def __init__(self, videos):
        self.videos = videos

    def get(self, key, crop=None):
        return self.videos[key]

    def n_clips(self, key):
        return self.videos[key].shape[0]


def _model(kind, rpe=False, part_len=3, n_patch=4, d=16):
    kw = dict(SMALL)
    if rpe:
        kw.update(relative_pe=True, window_size=4, window_depth=part_len,
                  mha_layernorm=True)
    cfg = EncoderConfig(ffn_layernorm=True, **kw)
    enc = Encoder(cfg)
    head = make_head(kind, d, 8)
    tokens = part_len * n_patch if rpe else n_patch
    params = {
        "encoder": enc.init(jax.random.PRNGKey(0),
                            np.zeros((1, tokens, d), np.float32))["params"],
        "head": head.init(jax.random.PRNGKey(1),
                          np.zeros((1, d), np.float32))["params"]}
    return cfg, enc, head, params


def test_stn_pseudo_generator_matches_reference(rng):
    """Train/pseudo_labels_generator_spatio.py:70-89: whole video through the
    encoder, regressor score per clip, where(score > tau, score, 0)."""
    cfg, enc, head, params = _model("regressor")
    videos = {f"v{i}": rng.standard_normal((int(rng.integers(5, 15)), 4, 16))
              .astype(np.float32) for i in range(4)}
    records = [TrainRecord(key=k, is_abnormal=(i % 2 == 0))
               for i, k in enumerate(videos)]
    store = ArrayStore(videos)
    scorer = ClipScorer(enc, head, 4)
    params_np = jax.tree.map(np.asarray, params)
    tau = 0.5

    pseudo = generate_stn_pseudo_labels(params, scorer, store, records, tau)
    for key, feat in videos.items():
        h = encoder_forward(feat, params_np["encoder"], cfg)
        s = head_forward(h[:, 0, :], params_np["head"], "regressor")[:, 0]
        expected = np.where(s > tau, s, 0.0)
        np.testing.assert_allclose(pseudo[key + ".npy"], expected, atol=2e-5)


def test_ltn_pseudo_generator_matches_reference(rng):
    """Train/pseudo_labels_generator_temporal.py:109-143 (SHT path): part
    chunks WITHOUT tail re-window, classifier p_abn, threshold, score
    repeated (end-beg) times."""
    part_len, n_patch, d = 3, 4, 16
    cfg, enc, head, params = _model("classifier", rpe=True, part_len=part_len)
    videos = {f"v{i}": rng.standard_normal((int(rng.integers(5, 16)),
                                            n_patch, d)).astype(np.float32)
              for i in range(4)}
    records = [TrainRecord(key=k, is_abnormal=True) for k in videos]
    store = ArrayStore(videos)
    scorer = PartScorer(enc, head, part_len, n_patch, tail_rewindow=False)
    params_np = jax.tree.map(np.asarray, params)
    tau = 0.4

    pseudo = generate_ltn_pseudo_labels(params, scorer, store, records, tau,
                                        dataset="SHT")
    for key, feat in videos.items():
        n_clips = feat.shape[0]
        n_part = n_clips // part_len
        if n_part * part_len < n_clips:
            n_part += 1
        expected = []
        for pi in range(n_part):
            beg = pi * part_len
            end = n_clips if pi == n_part - 1 else (pi + 1) * part_len
            tokens = feat[beg:end].reshape(1, -1, d)
            h = encoder_forward(tokens, params_np["encoder"], cfg)
            p = head_forward(h[:, 0, :], params_np["head"], "classifier")[0, 1]
            p = p if p > tau else 0.0
            expected.extend([p] * (end - beg))
        np.testing.assert_allclose(pseudo[key + ".npy"],
                                   np.asarray(expected, np.float32),
                                   atol=2e-5)
