"""Golden end-to-end pipeline regression (frozen synthetic dataset + seed).

One number pins every quirk site at once: the full co-teaching pipeline
(STN MIL train -> STN pseudo labels -> LTN soft-CE train -> LTN pseudo
labels -> STN MIL+BCE co-teach round -> LTN round 2) runs on CPU and the
resulting frame AUCs must match the committed floats to 1e-6.  A regression
in ANY of the reproduced reference semantics — MIL sparsity slices, tail
re-windowing, pseudo-label expansion, soft-CE on probs, label building,
two-group Adagrad, balanced-pair sampling, frame expansion — moves these
values (reference semantics: Train/spatio_transformer_MIL_CE.py,
Test/evaluation_shanghaitech_ubnormal.py:70-95).

If an INTENDED change moves them, re-freeze: run with -s and copy the
printed values.
"""

import pytest

from lstc_vad_tpu.config import (DataConfig, EncoderConfig, HeadConfig,
                                 TrainConfig)
from lstc_vad_tpu.pseudo import CoTeachingDriver

from fixtures import make_sht_like

SMALL_ENC = dict(d_model=16, d_inner=32, n_head=2, d_k=8, d_v=8, n_layers=1,
                 attn_impl="xla")

# frozen on 2026-08-16 (jax CPU, f32, dropout_rng=rbg): see module docstring
# to re-freeze
GOLDEN = {
    "stn_round0": 0.5051674641148325,
    "ltn_round1": 0.5460287081339713,
    "stn_bce_round2": 0.5084848484848485,
    "ltn_round3": 0.5457894736842105,
}


def _cfg(model, fixture, tmp_path):
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
        model=model, encoder=enc, head=head, seed=3,
        data=DataConfig(dataset="SHT", h5_path=h5_path, train_txt=train_txt,
                        test_txt=test_txt, test_mask_dir=mask_dir + "/",
                        n_patch=4, d_model=16, part_num=4, part_len=3,
                        batch_size=2, seed=11),
        epochs=2, inter_epoch=1, save_threshold=2.0,
        model_save_dir=str(tmp_path / "ckpt"))


def test_golden_pipeline_auc(tmp_path):
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30), seed=7)
    driver = CoTeachingDriver(_cfg("stn", fixture, tmp_path),
                              _cfg("ltn", fixture, tmp_path),
                              str(tmp_path / "work"),
                              stn_threshold=0.5, ltn_threshold=0.4)
    trainers = driver.run(rounds=4, stn_epochs=2, ltn_epochs=2)

    got = {
        "stn_round0": trainers[0].evaluate("test"),
        "ltn_round1": trainers[1].evaluate("test"),
        "stn_bce_round2": trainers[2].evaluate("test"),
        "ltn_round3": trainers[3].evaluate("test"),
    }
    print({k: repr(v) for k, v in got.items()})
    # evaluation is deterministic: scoring the same params twice must agree
    # bit-for-bit (jit purity + seeded host pipeline)
    assert trainers[3].evaluate("test") == got["ltn_round3"]
    for key, want in GOLDEN.items():
        assert got[key] == pytest.approx(want, abs=1e-6), (
            f"{key}: got {got[key]!r}, golden {want!r} — a reproduced "
            "reference semantic changed (see module docstring)")
