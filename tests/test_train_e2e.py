"""End-to-end training smoke on synthetic SHT-like data (CPU) + batched-scorer
parity vs naive per-part device calls."""

import os

import jax
import numpy as np
import pytest

from lstc_vad_tpu.config import (DataConfig, EncoderConfig, HeadConfig,
                                 LossConfig, OptimConfig, TrainConfig)
from lstc_vad_tpu.evaluation.scoring import PartScorer
from lstc_vad_tpu.train.driver import Trainer

from fixtures import make_sht_like

SMALL_ENC = dict(d_model=16, d_inner=32, n_head=2, d_k=8, d_v=8, n_layers=1,
                 attn_impl="xla")


def _cfg(tmp_path, model="stn", pseudo_path=None, **enc_extra):
    h5_path, train_txt, test_txt, mask_dir = make_sht_like(
        str(tmp_path), n_patch=4, d_model=16, n_clips=(14, 30))
    part_len = 3
    if model == "ltn" and not enc_extra:
        enc_extra = dict(relative_pe=True, window_size=4, window_depth=3,
                         mha_layernorm=True)
    enc = EncoderConfig(ffn_layernorm=True, weight_init=True,
                        **SMALL_ENC, **enc_extra)
    return TrainConfig(
        model=model,
        encoder=enc,
        head=HeadConfig(kind="regressor" if model == "stn" else "classifier",
                        d_model=16, hidden_dim=8),
        data=DataConfig(dataset="SHT", h5_path=h5_path, train_txt=train_txt,
                        test_txt=test_txt, test_mask_dir=mask_dir + "/",
                        n_patch=4, d_model=16, part_num=4, part_len=part_len,
                        batch_size=2, pseudo_labels_path=pseudo_path),
        optim=OptimConfig(clip_grad=True),
        loss=LossConfig(),
        epochs=2, inter_epoch=1, save_threshold=2.0,  # never save in tests
        model_save_dir=str(tmp_path / "ckpt"),
    )


def test_eval_train_split_requires_mask_dir(tmp_path):
    """eval_train_split=True + unset test_mask_dir must fail at Trainer
    construction, not after inter_epoch epochs of training."""
    from lstc_vad_tpu.config import replace

    cfg = replace(_cfg(tmp_path, "stn"), **{"data.test_mask_dir": ""})
    assert cfg.eval_train_split  # the TrainConfig default
    with pytest.raises(ValueError, match="test_mask_dir"):
        Trainer(cfg)


def test_stn_end_to_end(tmp_path):
    cfg = _cfg(tmp_path, "stn")
    trainer = Trainer(cfg)
    result = trainer.fit(epochs=2)
    assert result.steps == 2  # 3 pairs, bs=2, drop_last -> 1 batch/epoch
    assert len(result.history) == 2
    for entry in result.history:
        assert np.isfinite(entry["loss"])
        assert 0.0 <= entry["auc_test"] <= 1.0
        assert 0.0 <= entry["auc_train"] <= 1.0


def test_ltn_end_to_end_with_pseudo_labels(tmp_path):
    # build a pseudo-label artifact like the generator saves
    base = _cfg(tmp_path, "stn")
    from lstc_vad_tpu.data import FeatureStore
    from lstc_vad_tpu.data.datasets import load_train_records
    records = load_train_records("SHT", base.data.train_txt)
    store = FeatureStore(base.data.h5_path)
    rng = np.random.default_rng(0)
    pseudo = {r.key + ".npy":
              rng.random(store.n_clips(r.key)).astype(np.float32)
              for r in records}
    pseudo_path = str(tmp_path / "pseudo.npy")
    np.save(pseudo_path, pseudo)
    store.close()

    cfg = _cfg(tmp_path / "ltn_dir", "ltn", pseudo_path=pseudo_path)
    trainer = Trainer(cfg)
    result = trainer.fit(epochs=2)
    assert result.steps == 2
    for entry in result.history:
        assert np.isfinite(entry["loss"])
        assert np.isfinite(entry["ce"])
        assert 0.0 <= entry["auc_test"] <= 1.0


def test_training_is_deterministic(tmp_path):
    r1 = Trainer(_cfg(tmp_path / "a", "stn")).fit(epochs=1)
    r2 = Trainer(_cfg(tmp_path / "b", "stn")).fit(epochs=1)
    assert r1.history[0]["loss"] == pytest.approx(r2.history[0]["loss"],
                                                  rel=1e-6)
    assert r1.history[0]["auc_test"] == pytest.approx(
        r2.history[0]["auc_test"], abs=1e-12)


def test_training_changes_params(tmp_path):
    trainer = Trainer(_cfg(tmp_path, "stn"))
    before = jax.tree.map(np.array, trainer.state.params)
    trainer.fit(epochs=1)
    after = trainer.state.params
    changed = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        before, after))
    assert max(changed) > 0


def test_part_scorer_matches_naive_loop(tmp_path):
    cfg = _cfg(tmp_path, "ltn",
               relative_pe=True, window_size=4, window_depth=3,
               mha_layernorm=True)
    trainer = Trainer(cfg)
    video = trainer.test_videos[0]
    scorer = PartScorer(trainer.encoder, trainer.head, part_len=3, n_patch=4)
    batched, counts = scorer.score_video(trainer.state.params, video.feat)

    # naive: one part per call, exactly like the reference loop
    from lstc_vad_tpu.evaluation.frame_auc import part_slices
    feats = video.feat[:, :4, :].astype(np.float32)
    idx_list, counts2 = part_slices(feats.shape[0], 3, tail_rewindow=True)
    np.testing.assert_array_equal(counts, counts2)
    for i, idx in enumerate(idx_list):
        tokens = feats[idx].reshape(1, -1, 16)
        h = trainer.encoder.apply({"params": trainer.state.params["encoder"]},
                                  tokens, deterministic=True)
        probs = trainer.head.apply({"params": trainer.state.params["head"]},
                                   h[:, 0, :], deterministic=True)
        naive = float(probs[0, 1])
        assert batched[i] == pytest.approx(naive, abs=1e-5)


def test_stn_tencrop_training(tmp_path):
    from fixtures import make_sht_like
    from lstc_vad_tpu.config import (DataConfig, EncoderConfig, HeadConfig,
                                     TrainConfig)
    h5_path, train_txt, _, _ = make_sht_like(
        str(tmp_path), n_patch=4, d_model=16, n_clips=(14, 30), ten_crop=True)
    cfg = TrainConfig(
        model="stn",
        encoder=EncoderConfig(ffn_layernorm=True, **SMALL_ENC),
        head=HeadConfig(kind="regressor", d_model=16, hidden_dim=8),
        data=DataConfig(dataset="SHT", h5_path=h5_path, train_txt=train_txt,
                        test_txt="", n_patch=4, d_model=16, part_num=4,
                        part_len=3, batch_size=2, ten_crop=True),
        epochs=1, inter_epoch=1, save_threshold=2.0,
        eval_train_split=False,
        model_save_dir=str(tmp_path / "ckpt"))
    trainer = Trainer(cfg)
    result = trainer.fit(epochs=1)
    assert result.steps == 1


def test_bfloat16_transfer_dtype(tmp_path):
    from lstc_vad_tpu.config import replace
    cfg32 = _cfg(tmp_path / "a", "stn")
    cfg16 = replace(_cfg(tmp_path / "b", "stn"),
                    **{"data.transfer_dtype": "bfloat16"})
    r32 = Trainer(cfg32).fit(epochs=1)
    r16 = Trainer(cfg16).fit(epochs=1)
    assert np.isfinite(r16.history[0]["loss"])
    # bf16-rounded inputs: same loss to ~2 decimal places
    assert r16.history[0]["loss"] == pytest.approx(r32.history[0]["loss"],
                                                   abs=0.05)


def test_ltn_temporal_only_disables_ce(tmp_path):
    from lstc_vad_tpu.config import replace
    cfg = replace(_cfg(tmp_path, "ltn"), **{"loss.temporal_only": True})
    trainer = Trainer(cfg)
    result = trainer.fit(epochs=1)
    assert result.history[0]["ce"] == 0.0
    assert np.isfinite(result.history[0]["mil"])


def test_tencrop_eval_needs_explicit_crop(tmp_path):
    from fixtures import make_sht_like
    from lstc_vad_tpu.config import (DataConfig, EncoderConfig, HeadConfig,
                                     TrainConfig, replace)
    h5_path, train_txt, test_txt, mask_dir = make_sht_like(
        str(tmp_path), n_patch=4, d_model=16, n_clips=(14, 30), ten_crop=True)
    cfg = TrainConfig(
        model="stn",
        encoder=EncoderConfig(ffn_layernorm=True, **SMALL_ENC),
        head=HeadConfig(kind="regressor", d_model=16, hidden_dim=8),
        data=DataConfig(dataset="SHT", h5_path=h5_path, train_txt=train_txt,
                        test_txt=test_txt, test_mask_dir=mask_dir + "/",
                        n_patch=4, d_model=16, part_num=4, part_len=3,
                        batch_size=2, ten_crop=True),
        epochs=1, inter_epoch=1, save_threshold=2.0, eval_train_split=False,
        model_save_dir=str(tmp_path / "ckpt"))
    trainer = Trainer(cfg)
    with pytest.raises(ValueError, match="eval_crop"):
        trainer.evaluate("test")
    # with a crop chosen, eval works
    trainer2 = Trainer(replace(cfg, **{"data.eval_crop": 3}))
    auc = trainer2.evaluate("test")
    assert 0.0 <= auc <= 1.0
