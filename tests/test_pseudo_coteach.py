"""Pseudo-label generation + co-teaching alternation on synthetic data."""

import numpy as np
import pytest

from lstc_vad_tpu.config import (DataConfig, EncoderConfig, HeadConfig,
                                 TrainConfig)
from lstc_vad_tpu.data import FeatureStore
from lstc_vad_tpu.data.datasets import load_train_records
from lstc_vad_tpu.evaluation.scoring import ClipScorer, PartScorer
from lstc_vad_tpu.pseudo import (CoTeachingDriver, generate_ltn_pseudo_labels,
                                 generate_stn_pseudo_labels)
from lstc_vad_tpu.train.driver import Trainer

from fixtures import make_sht_like

SMALL_ENC = dict(d_model=16, d_inner=32, n_head=2, d_k=8, d_v=8, n_layers=1,
                 attn_impl="xla")


def _cfg(tmp_path, model, fixture=None, pseudo_path=None):
    if fixture is None:
        fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                                n_clips=(14, 30))
    h5_path, train_txt, test_txt, mask_dir = fixture
    if model == "ltn":
        enc = EncoderConfig(mha_layernorm=True, ffn_layernorm=True,
                            relative_pe=True, window_size=4, window_depth=3,
                            **SMALL_ENC)
        head = HeadConfig(kind="classifier", d_model=16, hidden_dim=8)
    else:
        enc = EncoderConfig(ffn_layernorm=True, weight_init=True, **SMALL_ENC)
        head = HeadConfig(kind="regressor", d_model=16, hidden_dim=8)
    return TrainConfig(
        model=model, encoder=enc, head=head,
        data=DataConfig(dataset="SHT", h5_path=h5_path, train_txt=train_txt,
                        test_txt=test_txt, test_mask_dir=mask_dir + "/",
                        n_patch=4, d_model=16, part_num=4, part_len=3,
                        batch_size=2, pseudo_labels_path=pseudo_path),
        epochs=1, inter_epoch=1, save_threshold=2.0,
        model_save_dir=str(tmp_path / "ckpt"))


def test_stn_pseudo_labels_threshold_and_shapes(tmp_path):
    cfg = _cfg(tmp_path, "stn")
    trainer = Trainer(cfg)
    records = load_train_records("SHT", cfg.data.train_txt)
    scorer = ClipScorer(trainer.encoder, trainer.head, 4)
    pseudo = generate_stn_pseudo_labels(trainer.state.params, scorer,
                                        trainer.store, records, threshold=0.5)
    assert set(pseudo) == {r.key + ".npy" for r in records}
    for r in records:
        scores = pseudo[r.key + ".npy"]
        assert scores.shape == (trainer.store.n_clips(r.key),)
        assert ((scores == 0) | (scores > 0.5)).all()


def test_ltn_pseudo_labels_expand_to_clips(tmp_path):
    cfg = _cfg(tmp_path, "ltn")
    trainer = Trainer(cfg)
    records = load_train_records("SHT", cfg.data.train_txt)
    scorer = PartScorer(trainer.encoder, trainer.head, 3, 4,
                        tail_rewindow=False)
    pseudo = generate_ltn_pseudo_labels(trainer.state.params, scorer,
                                        trainer.store, records, threshold=0.3)
    for r in records:
        n = trainer.store.n_clips(r.key)
        scores = pseudo[r.key + ".npy"]
        assert scores.shape == (n,)
        # constant within each part of 3 clips (except the short tail)
        for p in range(n // 3):
            part = scores[p * 3:(p + 1) * 3]
            assert (part == part[0]).all()


def test_coteaching_three_rounds(tmp_path):
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30))
    stn_cfg = _cfg(tmp_path, "stn", fixture=fixture)
    ltn_cfg = _cfg(tmp_path, "ltn", fixture=fixture)
    driver = CoTeachingDriver(stn_cfg, ltn_cfg, str(tmp_path / "work"))
    trainers = driver.run(rounds=3, stn_epochs=1, ltn_epochs=1)
    assert len(trainers) == 3
    # artifacts written
    import os
    assert os.path.exists(driver.stn_pseudo_path)
    assert os.path.exists(driver.ltn_pseudo_path)
    # round 2 used the BCE objective
    assert trainers[2].cfg.model == "stn_bce"
    pseudo = np.load(driver.stn_pseudo_path, allow_pickle=True).tolist()
    assert len(pseudo) == 7
    # LTN trainer consumed the STN pseudo labels
    assert trainers[1].cfg.data.pseudo_labels_path == driver.stn_pseudo_path
    # rounds share ONE feature store + test split (run() keeps every round's
    # Trainer alive; a per-round eager cache would grow host RSS per round)
    assert trainers[0].store is trainers[1].store is trainers[2].store
    assert trainers[0].test_videos is trainers[2].test_videos


def test_ucf_ltn_pseudo_labels_at_clip_resolution(tmp_path):
    """Regression: UCF LTN pseudo labels must index by CLIP, not bin."""
    from fixtures import make_ucf_like
    from lstc_vad_tpu.config import (DataConfig, EncoderConfig, HeadConfig,
                                     TrainConfig)
    from lstc_vad_tpu.evaluation.scoring import UCFBinnedScorer

    h5, train_txt, test_txt, gt_h5 = make_ucf_like(
        str(tmp_path), n_patch=3, d_model=16, n_clips=(35, 60))  # > 32 clips
    part_len = 2
    cfg = TrainConfig(
        model="ltn",
        encoder=EncoderConfig(mha_layernorm=True, ffn_layernorm=True,
                              relative_pe=True, window_size=4,
                              window_depth=part_len, **SMALL_ENC),
        head=HeadConfig(kind="classifier", d_model=16, hidden_dim=8),
        data=DataConfig(dataset="UCF", h5_path=h5, train_txt=train_txt,
                        test_txt=test_txt, test_mask_h5=gt_h5, n_patch=3,
                        d_model=16, part_num=4, part_len=part_len,
                        batch_size=2, eager=False),
        epochs=1, inter_epoch=1, save_threshold=2.0, eval_train_split=False,
        max_clips=8, model_save_dir=str(tmp_path / "ckpt"))
    trainer = Trainer(cfg)
    records = load_train_records("UCF", train_txt)
    scorer = UCFBinnedScorer(trainer.encoder, trainer.head, part_len, 3,
                             max_clips=8, l2_normalize=False,
                             tail_rewindow=False)
    pseudo = generate_ltn_pseudo_labels(trainer.state.params, scorer,
                                        trainer.store, records, threshold=0.3,
                                        dataset="UCF", segment_len=16)
    for r in records:
        assert len(pseudo[r.key + ".npy"]) == trainer.store.n_clips(r.key)

    # and the co-teaching STN round can consume them without IndexError
    pseudo_path = str(tmp_path / "ltn_pseudo.npy")
    np.save(pseudo_path, pseudo)
    from lstc_vad_tpu.config import replace
    stn_cfg = TrainConfig(
        model="stn_bce",
        encoder=EncoderConfig(ffn_layernorm=True, **SMALL_ENC),
        head=HeadConfig(kind="regressor", d_model=16, hidden_dim=8),
        data=DataConfig(dataset="UCF", h5_path=h5, train_txt=train_txt,
                        test_txt="", n_patch=3, d_model=16, part_num=4,
                        part_len=5, batch_size=2, eager=False,
                        pseudo_labels_path=pseudo_path),
        epochs=1, inter_epoch=1, save_threshold=2.0, eval_train_split=False,
        model_save_dir=str(tmp_path / "ckpt2"))
    result = Trainer(stn_cfg).fit(epochs=1)
    assert result.steps == 1


def test_coteaching_ucf_three_rounds(tmp_path):
    from fixtures import make_ucf_like
    from lstc_vad_tpu.config import (DataConfig, EncoderConfig, HeadConfig,
                                     TrainConfig)

    h5, train_txt, test_txt, gt_h5 = make_ucf_like(
        str(tmp_path), n_patch=3, d_model=16, n_clips=(8, 40))

    def cfg(model):
        part_len = 2 if model == "ltn" else 5
        if model == "ltn":
            enc = EncoderConfig(mha_layernorm=True, ffn_layernorm=True,
                                relative_pe=True, window_size=4,
                                window_depth=part_len, **SMALL_ENC)
            head = HeadConfig(kind="classifier", d_model=16, hidden_dim=8)
        else:
            enc = EncoderConfig(ffn_layernorm=True, **SMALL_ENC)
            head = HeadConfig(kind="regressor", d_model=16, hidden_dim=8)
        return TrainConfig(
            model=model, encoder=enc, head=head,
            data=DataConfig(dataset="UCF", h5_path=h5, train_txt=train_txt,
                            test_txt=test_txt, test_mask_h5=gt_h5, n_patch=3,
                            d_model=16, part_num=4, part_len=part_len,
                            batch_size=2, eager=False),
            epochs=1, inter_epoch=1, save_threshold=2.0,
            eval_train_split=False, max_clips=8,
            model_save_dir=str(tmp_path / "ckpt"))

    driver = CoTeachingDriver(cfg("stn"), cfg("ltn"), str(tmp_path / "work"),
                              stn_threshold=0.5, ltn_threshold=0.4)
    trainers = driver.run(rounds=3, stn_epochs=1, ltn_epochs=1)
    assert trainers[2].cfg.model == "stn_bce"
    pseudo = np.load(driver.ltn_pseudo_path, allow_pickle=True).tolist()
    # clip resolution regardless of video length
    for trainer in [trainers[0]]:
        for key, scores in pseudo.items():
            assert len(scores) == trainer.store.n_clips(key[:-4])
