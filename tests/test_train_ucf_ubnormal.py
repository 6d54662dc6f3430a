"""End-to-end Trainer on the UCF and UBnormal dataset paths."""

import numpy as np

from lstc_vad_tpu.config import (DataConfig, EncoderConfig, HeadConfig,
                                 TrainConfig)
from lstc_vad_tpu.train.driver import Trainer

from fixtures import make_ubnormal_like, make_ucf_like

SMALL_ENC = dict(d_model=16, d_inner=32, n_head=2, d_k=8, d_v=8, n_layers=1,
                 attn_impl="xla")


def test_ucf_stn_end_to_end(tmp_path):
    h5, train_txt, test_txt, gt_h5 = make_ucf_like(str(tmp_path), n_patch=3,
                                                   d_model=16, n_clips=(3, 30))
    cfg = TrainConfig(
        model="stn",
        encoder=EncoderConfig(ffn_layernorm=True, **SMALL_ENC),
        head=HeadConfig(kind="regressor", d_model=16, hidden_dim=8),
        data=DataConfig(dataset="UCF", h5_path=h5, train_txt=train_txt,
                        test_txt=test_txt, test_mask_h5=gt_h5, n_patch=3,
                        d_model=16, part_num=4, part_len=5, batch_size=2,
                        eager=False),
        epochs=1, inter_epoch=1, save_threshold=2.0, eval_train_split=False,
        max_clips=8, model_save_dir=str(tmp_path / "ckpt"))
    result = Trainer(cfg).fit(epochs=1)
    assert result.steps == 1
    assert 0.0 <= result.history[0]["auc_test"] <= 1.0


def test_ucf_ltn_end_to_end(tmp_path):
    h5, train_txt, test_txt, gt_h5 = make_ucf_like(str(tmp_path), n_patch=3,
                                                   d_model=16, n_clips=(3, 30))
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
    result = Trainer(cfg).fit(epochs=1)
    assert result.steps == 1
    assert np.isfinite(result.history[0]["ce"])
    assert 0.0 <= result.history[0]["auc_test"] <= 1.0


def test_ubnormal_ltn_end_to_end(tmp_path):
    h5, train_txt, test_txt, mask_dir = make_ubnormal_like(
        str(tmp_path), n_patch=4, d_model=8, n_clips=(12, 20))
    part_len = 5
    cfg = TrainConfig(
        model="ltn",
        encoder=EncoderConfig(d_model=8, d_inner=16, n_head=2, d_k=4, d_v=4,
                              n_layers=1, attn_impl="xla",
                              mha_layernorm=True, ffn_layernorm=True,
                              relative_pe=True, window_size=4,
                              window_depth=part_len),
        head=HeadConfig(kind="classifier", d_model=8, hidden_dim=8),
        data=DataConfig(dataset="UBnormal", h5_path=h5, train_txt=train_txt,
                        test_txt=test_txt, test_mask_dir=mask_dir + "/",
                        n_patch=4, d_model=8, part_num=3, part_len=part_len,
                        batch_size=2),
        epochs=1, inter_epoch=1, save_threshold=2.0, eval_train_split=False,
        model_save_dir=str(tmp_path / "ckpt"))
    result = Trainer(cfg).fit(epochs=1)
    assert result.steps == 1
    assert 0.0 <= result.history[0]["auc_test"] <= 1.0
