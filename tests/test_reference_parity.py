"""Parity against the REFERENCE'S OWN torch modules.

Imports /root/reference (read-only) and checks both checkpoint directions
against the genuine models/Encoder.py + heads — stronger than the
re-implemented oracle in torch_oracle.py, because nothing on the torch side
is ours:

- export: our flax params -> torch state_dict STRICT-loads into the
  reference Encoder/Classifier/Regressor and the reference forward matches
  our flax forward;
- import: a reference module's own state_dict -> our importer -> our flax
  forward matches the reference forward.

Skipped when the reference checkout is not mounted.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax

from lstc_vad_tpu.ckpt.torch_export import export_encoder, export_head
from lstc_vad_tpu.ckpt.torch_import import import_encoder, import_head
from lstc_vad_tpu.config import EncoderConfig
from lstc_vad_tpu.models import Encoder, make_head

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")),
    reason="reference repo not mounted at /root/reference")

CFG = EncoderConfig(d_model=32, d_inner=48, n_head=2, d_k=8, d_v=8,
                    n_layers=2, mha_layernorm=True, ffn_layernorm=True,
                    input_layernorm=True, relative_pe=True, window_size=4,
                    window_depth=3, cls_learned=True, position_encoding=True,
                    max_position_tokens=25, attn_impl="xla")


@pytest.fixture(scope="module")
def ref_models():
    sys.path.insert(0, REF)
    try:
        from models.Classifier import Classifier as RefClassifier
        from models.Encoder import Encoder as RefEncoder
        from models.Regressor import Regressor as RefRegressor

        yield RefEncoder, RefClassifier, RefRegressor
    finally:
        sys.path.remove(REF)


def _ref_encoder(RefEncoder, weight_init: bool):
    return RefEncoder(n_layers=2, n_head=2, d_k=8, d_v=8, d_model=32,
                      d_inner=48, MHA_layerNorm=True, FFN_layerNorm=True,
                      weight_init=weight_init, CLS_learned=True,
                      position_encoding=True, max_position_tokens=25,
                      relative_pe=True, window_size=4, window_depth=3,
                      input_layerNorm=True)


def test_export_strict_loads_into_reference_encoder(ref_models, rng):
    RefEncoder, _, _ = ref_models
    enc = Encoder(CFG)
    x = rng.standard_normal((3, 24, 32)).astype(np.float32)
    params = jax.tree.map(np.asarray,
                          enc.init(jax.random.PRNGKey(0), x))["params"]
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in export_encoder(params, CFG).items()}

    ref = _ref_encoder(RefEncoder, weight_init=False)
    ref.load_state_dict(sd, strict=True)  # every key AND buffer present
    ref.eval()
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x)).numpy()
    ours = np.asarray(enc.apply({"params": params}, x, deterministic=True))
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=1e-4)


def test_import_reference_encoder_state_dict(ref_models, rng):
    RefEncoder, _, _ = ref_models
    torch.manual_seed(0)
    ref = _ref_encoder(RefEncoder, weight_init=True)
    ref.eval()
    x = rng.standard_normal((2, 24, 32)).astype(np.float32)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x)).numpy()

    enc = Encoder(CFG)
    params = jax.tree.map(np.asarray,
                          enc.init(jax.random.PRNGKey(1), x))["params"]
    report = {"loaded": [], "skipped": []}
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    imported = import_encoder(sd, params, report)
    assert not report["skipped"], report["skipped"]
    ours = np.asarray(enc.apply({"params": imported}, x, deterministic=True))
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=1e-4)


@pytest.mark.parametrize("kind", ["classifier", "regressor"])
def test_heads_roundtrip_against_reference(ref_models, rng, kind):
    _, RefClassifier, RefRegressor = ref_models
    # the reference Classifier hardcodes its 512 hidden dim
    hidden = 512 if kind == "classifier" else 16
    head = make_head(kind, 32, hidden)
    x = rng.standard_normal((5, 32)).astype(np.float32)
    params = jax.tree.map(np.asarray,
                          head.init(jax.random.PRNGKey(0), x))["params"]
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in export_head(params, kind).items()}

    if kind == "classifier":
        ref = RefClassifier(32, weight_init=False)
    else:
        ref = RefRegressor(32, hidden_dim=hidden, weight_init=False)
    ref.load_state_dict(sd, strict=True)
    ref.eval()
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x)).numpy()
    ours = np.asarray(head.apply({"params": params}, x, deterministic=True))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)

    # reverse: the reference module's state_dict through our importer
    torch.manual_seed(1)
    if kind == "classifier":
        ref2 = RefClassifier(32, weight_init=True)
    else:
        ref2 = RefRegressor(32, hidden_dim=hidden, weight_init=True)
    ref2.eval()
    report = {"loaded": [], "skipped": []}
    sd2 = {k: v.detach().numpy() for k, v in ref2.state_dict().items()}
    imported = import_head(sd2, params, report)
    assert not report["skipped"]
    with torch.no_grad():
        theirs2 = ref2(torch.from_numpy(x)).numpy()
    ours2 = np.asarray(head.apply({"params": imported}, x,
                                  deterministic=True))
    np.testing.assert_allclose(ours2, theirs2, rtol=1e-5, atol=1e-6)


def test_losses_match_reference_train_scripts(rng):
    """Our jitted objectives vs the GENUINE loss functions defined in the
    reference train scripts (imported read-only) on identical tensors —
    including the flat-slice sparsity quirks reproduced on purpose."""
    import argparse

    sys.path.insert(0, REF)
    try:
        from Train.spatio_transformer_MIL_CE import (
            get_BCE_loss as ref_bce, get_MIL_loss as ref_mil_ce)
        from Train.spatio_transformer_shanghaitech import (
            get_MIL_loss as ref_stn_mil)
        from Train.temporal_transformer_shanghaitech import (
            get_CE_loss as ref_ce, get_MIL_loss as ref_ltn_mil)
    finally:
        sys.path.remove(REF)

    from lstc_vad_tpu.objectives.losses import (coteach_stn_mil_loss,
                                                ltn_mil_loss,
                                                soft_cross_entropy_on_probs,
                                                stn_mil_loss, weighted_bce)

    bs, pn, pl = 3, 4, 2
    args = argparse.Namespace(batch_size=bs, part_num=pn, part_len=pl,
                              lambda_1=0.07, lambda_normal=0.2,
                              lambda_abnormal=2.0)

    # STN MIL — call-site shape [2B, pn*pl, 1]
    # (spatio_transformer_shanghaitech.py:99-100): abn_pred slices ROWS
    y = rng.random((2 * bs, pn * pl)).astype(np.float32)
    want = [float(v)
            for v in ref_stn_mil(args, torch.from_numpy(y[..., None]))]
    got = [float(v) for v in stn_mil_loss(y, pn, pl, args.lambda_1)]
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # LTN MIL incl. flat-slice sparsity quirk
    # (temporal_transformer_shanghaitech.py:25-36)
    yp = rng.random(2 * bs * pn).astype(np.float32)
    want = [float(v) for v in ref_ltn_mil(args, torch.from_numpy(yp))]
    got = [float(v) for v in ltn_mil_loss(yp, pn, args.lambda_1)]
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # co-teaching MIL: its call site passes the regressor's FLAT
    # [2B*pn*pl, 1] output (spatio_transformer_MIL_CE.py:175-179), so
    # abn_pred = y_pred[batch_size:] is the flat-slice sparsity quirk
    flat_col = torch.from_numpy(y.reshape(-1, 1))
    want = [float(v) for v in ref_mil_ce(args, flat_col, pl)]
    got = [float(v) for v in coteach_stn_mil_loss(y, pn, pl, args.lambda_1)]
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # co-teaching MIL, UCF branch: the call site re-views outputs to
    # [2B, pn*pl, 1] first (spatio_transformer_MIL_CE.py:173-175), so the
    # same y_pred[batch_size:] slice selects the abnormal HALF
    want = [float(v) for v in ref_mil_ce(args, torch.from_numpy(y[..., None]),
                                         pl)]
    got = [float(v) for v in coteach_stn_mil_loss(y, pn, pl, args.lambda_1,
                                                  flat_sparsity=False)]
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # soft CE on already-softmaxed probs
    # (temporal_transformer_shanghaitech.py:21-23)
    logits = rng.standard_normal((2 * bs * pn, 2)).astype(np.float32)
    probs = torch.softmax(torch.from_numpy(logits), dim=-1)
    p = rng.random((2 * bs * pn, 1)).astype(np.float32)
    labs = np.concatenate([1 - p, p], axis=-1)
    want = float(ref_ce(args, probs, torch.from_numpy(labs)))
    got = float(soft_cross_entropy_on_probs(probs.numpy(), labs))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # class-weighted BCE (spatio_transformer_MIL_CE.py:23-26)
    out = rng.random((bs, pn)).astype(np.float32)
    p = rng.random((bs, pn, 1)).astype(np.float32)
    soft = np.concatenate([1 - p, p], axis=-1)
    want = float(ref_bce(args, torch.from_numpy(out),
                         torch.from_numpy(soft)))
    got = float(weighted_bce(out, soft, args.lambda_normal,
                             args.lambda_abnormal))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_metric_zoo_matches_reference_eval_utils(rng):
    """Our numpy metric zoo vs the GENUINE utils/eval_utils.py functions
    (sklearn-backed) on identical arrays — including the reference's
    off-formula MCC, reproduced on purpose."""
    pytest.importorskip("sklearn")
    pytest.importorskip("matplotlib")
    sys.path.insert(0, REF)
    try:
        import utils.eval_utils as ref
    finally:
        sys.path.remove(REF)

    from lstc_vad_tpu.evaluation import metrics as ours

    scores = rng.random(400)
    labels = (rng.random(400) < 0.35).astype(np.float64)

    # cal_f1 expects pre-binarized scores (reference convention)
    binary = (scores > 0.5).astype(np.float64)
    np.testing.assert_allclose(float(ours.f1(binary, labels)),
                               float(ref.cal_f1(binary, labels)),
                               rtol=1e-9)
    pairs = [
        (ours.roc_auc, ref.cal_auc),
        (ours.rmse, ref.cal_rmse), (ours.pr_auc, ref.cal_pr_auc),
        (ours.false_alarm, ref.cal_false_alarm),
        (ours.false_neg, ref.cal_false_neg),
        (ours.precision, ref.cal_precision),
        (ours.accuracy, ref.cal_accuracy), (ours.recall, ref.cal_recall),
        (ours.specificity, ref.cal_specific),
        (ours.sensitivity, ref.cal_sensitivity),
        (ours.score_gap, ref.cal_score_gap),
        (ours.geometric_mean, ref.cal_geometric_mean),
        (ours.f_measure, ref.cal_f_measure), (ours.mcc, ref.cal_MCC),
        (ours.p_auc, ref.cal_pAUC),
        (ours.average_precision, ref.cal_AP),
    ]
    for mine, theirs in pairs:
        got = float(mine(scores, labels))
        want = float(theirs(scores, labels))
        np.testing.assert_allclose(
            got, want, rtol=1e-9, atol=1e-12,
            err_msg=f"{mine.__name__} vs {theirs.__name__}")


def test_genuine_reference_eval_script_matches_our_evaluate(
        ref_models, rng, tmp_path, monkeypatch, capsys):
    """THE end-to-end proof: the reference's OWN Test/
    evaluation_shanghaitech_ubnormal.py::evaluation() — its loader, its
    Encoder/Classifier, its part chunking and frame expansion — scores our
    exported checkpoint on a synthetic SHT fixture, and the AUC matches our
    `evaluate` CLI on the same data and weights.  (.cuda() is monkeypatched
    to a no-op: this box has no GPU; math is unchanged.)"""
    del ref_models  # ensures /root/reference modules import cleanly first
    from fixtures import make_sht_like
    from lstc_vad_tpu.ckpt.torch_export import save_torch_checkpoint
    from lstc_vad_tpu.config import preset
    from lstc_vad_tpu.cli.main import main

    h5, train_txt, test_txt, mask_dir = make_sht_like(
        str(tmp_path), n_patch=4, d_model=16, n_clips=(14, 30), seed=5)

    small = ["--set", "encoder.d_model=16", "--set", "encoder.d_inner=32",
             "--set", "encoder.n_head=2", "--set", "encoder.d_k=8",
             "--set", "encoder.d_v=8", "--set", "encoder.n_layers=1",
             "--set", "encoder.attn_impl=xla", "--set", "head.d_model=16",
             "--set", "data.n_patch=4", "--set", "data.d_model=16",
             "--set", "data.part_len=3", "--set", "encoder.window_depth=3"]
    # the genuine Classifier hardcodes its 512 hidden dim
    cfg = preset("sht_ltn")
    from lstc_vad_tpu.cli.main import _apply_common
    import argparse as _ap

    ns = _ap.Namespace(h5=None, train_txt=None, test_txt=None, mask_dir=None,
                       mask_h5=None, pseudo_labels=None, batch_size=None,
                       seed=None, epochs=None, save_dir=None,
                       metrics_jsonl=None, set=[s for i, s in
                                               enumerate(small) if i % 2])
    cfg = _apply_common(cfg, ns)

    from lstc_vad_tpu.train.state import create_train_state

    state, _, _, _ = create_train_state(cfg)
    enc_ckpt = str(tmp_path / "enc.ckpt")
    head_ckpt = str(tmp_path / "cls.ckpt")
    save_torch_checkpoint(state.params, enc_ckpt, head_ckpt, "classifier",
                          cfg.encoder)

    # ---- our side: CLI evaluate with the exported torch ckpts
    rc = main(["evaluate", "--preset", "sht_ltn", "--torch-ckpt",
               "--encoder-ckpt", enc_ckpt, "--head-ckpt", head_ckpt,
               "--h5", h5, "--test-txt", test_txt,
               "--mask-dir", mask_dir + "/"] + small)
    assert rc == 0
    ours = float([ln for ln in capsys.readouterr().out.splitlines()
                  if "auc = " in ln][-1].split("=")[-1])

    # ---- genuine reference script on the same data + ckpts
    import torch as _t
    from torch import nn as _nn

    monkeypatch.setattr(_t.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(_nn.Module, "cuda", lambda self, *a, **k: self)
    sys.path.insert(0, REF)
    try:
        from Test.evaluation_shanghaitech_ubnormal import evaluation
        args = _ap.Namespace(
            dataset="SHT", testing_txt=test_txt, test_mask_dir=mask_dir,
            dataset_path=h5, temporal_model_path=enc_ckpt,
            classifier_model_path=head_ckpt, temporal_data_parallel=False,
            temporal_n_layers=1, temporal_n_head=2, temporal_d_k=8,
            temporal_d_v=8, d_model=16, temporal_n_hidden=32,
            temporal_MHA_layerNorm=True, temporal_FFN_layerNorm=True,
            temporal_relative_position_encoding=True, window_size=4,
            part_len=3, n_patch=4, segment_len=16)
        evaluation(args)
    finally:
        sys.path.remove(REF)
    out = capsys.readouterr().out
    theirs = float([ln for ln in out.splitlines()
                    if "auc = " in ln][-1].split("=")[-1])
    assert ours == pytest.approx(theirs, abs=1e-3), (ours, theirs)


def test_genuine_ucf_eval_script_matches_our_evaluate(
        ref_models, rng, tmp_path, monkeypatch, capsys):
    """Same end-to-end proof for UCF: the reference's OWN
    Test/evaluation_UCF.py (32-bin linspace pooling, L2 normalize, part_len
    hardcoded to 2, tail overlap) scores our exported checkpoint and matches
    our `evaluate --preset ucf_ltn`."""
    del ref_models
    import argparse as _ap

    from fixtures import make_ucf_like
    from lstc_vad_tpu.ckpt.torch_export import save_torch_checkpoint
    from lstc_vad_tpu.cli.main import main, _apply_common
    from lstc_vad_tpu.config import preset
    from lstc_vad_tpu.train.state import create_train_state

    h5, train_txt, test_txt, gt_h5 = make_ucf_like(
        str(tmp_path), n_patch=3, d_model=16, n_clips=(8, 40), seed=4)
    small = ["--set", "encoder.d_model=16", "--set", "encoder.d_inner=32",
             "--set", "encoder.n_head=2", "--set", "encoder.d_k=8",
             "--set", "encoder.d_v=8", "--set", "encoder.n_layers=1",
             "--set", "encoder.attn_impl=xla", "--set", "head.d_model=16",
             "--set", "data.n_patch=3", "--set", "data.d_model=16"]
    ns = _ap.Namespace(h5=None, train_txt=None, test_txt=None, mask_dir=None,
                       mask_h5=None, pseudo_labels=None, batch_size=None,
                       seed=None, epochs=None, save_dir=None,
                       metrics_jsonl=None,
                       set=[s for i, s in enumerate(small) if i % 2])
    # final-eval shapes: part_len=2 / window_depth=2 (cmd_evaluate override)
    from lstc_vad_tpu.config import replace as _replace

    cfg = _replace(_apply_common(preset("ucf_ltn"), ns),
                   **{"encoder.window_depth": 2, "data.part_len": 2})
    state, _, _, _ = create_train_state(cfg)
    enc_ckpt = str(tmp_path / "enc.ckpt")
    head_ckpt = str(tmp_path / "cls.ckpt")
    save_torch_checkpoint(state.params, enc_ckpt, head_ckpt, "classifier",
                          cfg.encoder)

    rc = main(["evaluate", "--preset", "ucf_ltn", "--torch-ckpt",
               "--encoder-ckpt", enc_ckpt, "--head-ckpt", head_ckpt,
               "--h5", h5, "--test-txt", test_txt, "--mask-h5", gt_h5]
              + small)
    assert rc == 0
    ours = float([ln for ln in capsys.readouterr().out.splitlines()
                  if "auc = " in ln][-1].split("=")[-1])

    import torch as _t
    from torch import nn as _nn

    monkeypatch.setattr(_t.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(_nn.Module, "cuda", lambda self, *a, **k: self)
    sys.path.insert(0, REF)
    try:
        from Test.evaluation_UCF import evaluation
        args = _ap.Namespace(
            testing_txt=test_txt, dataset_path=h5, test_mask_path=gt_h5,
            temporal_model_path=enc_ckpt, classifier_model_path=head_ckpt,
            temporal_n_layers=1, temporal_n_head=2, temporal_d_k=8,
            temporal_d_v=8, d_model=16, temporal_n_hidden=32,
            temporal_MHA_layerNorm=True, temporal_FFN_layerNorm=True,
            relative_position_encoding=True, window_size=4, part_len=2,
            n_patch=3, segment_len=16)
        evaluation(args)
    finally:
        sys.path.remove(REF)
    out = capsys.readouterr().out
    theirs = float([ln for ln in out.splitlines()
                    if ln.startswith("auc=")][-1].split("=")[-1])
    assert ours == pytest.approx(theirs, abs=1e-3), (ours, theirs)


def test_genuine_pseudo_generator_matches_our_gen_pseudo(
        ref_models, rng, tmp_path, monkeypatch, capsys):
    """The reference's OWN Train/pseudo_labels_generator_spatio.py scores a
    synthetic SHT train split with our exported STN checkpoint; the saved
    {key.npy: thresholded scores} dict matches our `gen-pseudo` CLI."""
    del ref_models
    import argparse as _ap

    from fixtures import make_sht_like
    from lstc_vad_tpu.ckpt.torch_export import save_torch_checkpoint
    from lstc_vad_tpu.cli.main import main, _apply_common
    from lstc_vad_tpu.config import preset
    from lstc_vad_tpu.train.state import create_train_state

    h5, train_txt, test_txt, mask_dir = make_sht_like(
        str(tmp_path), n_patch=4, d_model=16, n_clips=(14, 30), seed=6)
    small = ["--set", "encoder.d_model=16", "--set", "encoder.d_inner=32",
             "--set", "encoder.n_head=2", "--set", "encoder.d_k=8",
             "--set", "encoder.d_v=8", "--set", "encoder.n_layers=2",
             "--set", "encoder.attn_impl=xla", "--set", "head.d_model=16",
             "--set", "data.n_patch=4", "--set", "data.d_model=16"]
    ns = _ap.Namespace(h5=None, train_txt=None, test_txt=None, mask_dir=None,
                       mask_h5=None, pseudo_labels=None, batch_size=None,
                       seed=None, epochs=None, save_dir=None,
                       metrics_jsonl=None,
                       set=[s for i, s in enumerate(small) if i % 2])
    cfg = _apply_common(preset("sht_stn"), ns)   # regressor hidden 512
    state, _, _, _ = create_train_state(cfg)
    enc_ckpt = str(tmp_path / "enc.ckpt")
    head_ckpt = str(tmp_path / "reg.ckpt")
    save_torch_checkpoint(state.params, enc_ckpt, head_ckpt, "regressor",
                          cfg.encoder)

    ours_path = str(tmp_path / "ours.npy")
    rc = main(["gen-pseudo", "--preset", "sht_stn", "--kind", "stn",
               "--threshold", "0.55", "--out", ours_path, "--torch-ckpt",
               "--encoder-ckpt", enc_ckpt, "--head-ckpt", head_ckpt,
               "--h5", h5, "--train-txt", train_txt] + small)
    assert rc == 0
    ours = np.load(ours_path, allow_pickle=True).tolist()

    import torch as _t
    from torch import nn as _nn

    monkeypatch.setattr(_t.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(_nn.Module, "cuda", lambda self, *a, **k: self)
    ref_path = str(tmp_path / "ref.npy")
    sys.path.insert(0, REF)
    try:
        from Train.pseudo_labels_generator_spatio import generator
        args = _ap.Namespace(
            dataset="SHT", dataset_path=h5, training_txt=train_txt,
            spatio_model_path=enc_ckpt, regression_model_path=head_ckpt,
            data_parallel=False, n_layers=2, n_head=2, d_k=8, d_v=8,
            d_model=16, n_hidden=32, MHA_layerNorm=False,
            FFN_layerNorm=True, position_dropout=0.1,
            encoder_weight_init=False, position_encoding=False,
            CLS_learned=False, max_position_tokens=17,
            relative_position_encoding=False, window_size=4,
            conv_patch=False, threshold=0.55, pseudo_labels_path=ref_path)
        generator(args)
    finally:
        sys.path.remove(REF)
    theirs = np.load(ref_path, allow_pickle=True).tolist()

    assert set(ours) == set(theirs)
    for key in theirs:
        np.testing.assert_allclose(
            np.ravel(ours[key]), np.ravel(theirs[key]), rtol=2e-4,
            atol=1e-5, err_msg=key)


def test_genuine_temporal_pseudo_generator_matches(
        ref_models, rng, tmp_path, monkeypatch, capsys):
    """The reference's OWN Train/pseudo_labels_generator_temporal.py (SHT
    part path: chunking WITHOUT tail re-window, per-part threshold, per-clip
    expansion) over our exported LTN checkpoint matches `gen-pseudo --kind
    ltn` clip for clip."""
    del ref_models
    import argparse as _ap

    from fixtures import make_sht_like
    from lstc_vad_tpu.ckpt.torch_export import save_torch_checkpoint
    from lstc_vad_tpu.cli.main import main, _apply_common
    from lstc_vad_tpu.config import preset
    from lstc_vad_tpu.train.state import create_train_state

    h5, train_txt, test_txt, mask_dir = make_sht_like(
        str(tmp_path), n_patch=4, d_model=16, n_clips=(14, 30), seed=8)
    small = ["--set", "encoder.d_model=16", "--set", "encoder.d_inner=32",
             "--set", "encoder.n_head=2", "--set", "encoder.d_k=8",
             "--set", "encoder.d_v=8", "--set", "encoder.n_layers=2",
             "--set", "encoder.attn_impl=xla", "--set", "head.d_model=16",
             "--set", "data.n_patch=4", "--set", "data.d_model=16",
             "--set", "data.part_len=3", "--set", "encoder.window_depth=3"]
    ns = _ap.Namespace(h5=None, train_txt=None, test_txt=None, mask_dir=None,
                       mask_h5=None, pseudo_labels=None, batch_size=None,
                       seed=None, epochs=None, save_dir=None,
                       metrics_jsonl=None,
                       set=[s for i, s in enumerate(small) if i % 2])
    cfg = _apply_common(preset("sht_ltn"), ns)  # classifier hidden 512
    state, _, _, _ = create_train_state(cfg)
    enc_ckpt = str(tmp_path / "enc.ckpt")
    head_ckpt = str(tmp_path / "cls.ckpt")
    save_torch_checkpoint(state.params, enc_ckpt, head_ckpt, "classifier",
                          cfg.encoder)

    ours_path = str(tmp_path / "ours.npy")
    rc = main(["gen-pseudo", "--preset", "sht_ltn", "--kind", "ltn",
               "--threshold", "0.45", "--out", ours_path, "--torch-ckpt",
               "--encoder-ckpt", enc_ckpt, "--head-ckpt", head_ckpt,
               "--h5", h5, "--train-txt", train_txt] + small)
    assert rc == 0
    ours = np.load(ours_path, allow_pickle=True).tolist()

    import torch as _t
    from torch import nn as _nn

    monkeypatch.setattr(_t.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(_nn.Module, "cuda", lambda self, *a, **k: self)
    ref_path = str(tmp_path / "ref.npy")
    sys.path.insert(0, REF)
    try:
        from Train.pseudo_labels_generator_temporal import generator
        args = _ap.Namespace(
            dataset="SHT", dataset_path=h5, training_txt=train_txt,
            temporal_model_path=enc_ckpt, classifier_model_path=head_ckpt,
            data_parallel=False, n_layers=2, n_head=2, d_k=8, d_v=8,
            d_model=16, n_hidden=32, MHA_layerNorm=True, FFN_layerNorm=True,
            position_dropout=0.1, encoder_weight_init=False,
            position_encoding=False, CLS_learned=False,
            max_position_tokens=17, relative_position_encoding=True,
            window_size=4, conv_patch=False, part_len=3, threshold=0.45,
            pseudo_labels_path=ref_path, segment_len=16)
        generator(args)
    finally:
        sys.path.remove(REF)
    theirs = np.load(ref_path, allow_pickle=True).tolist()

    assert set(ours) == set(theirs)
    for key in theirs:
        np.testing.assert_allclose(
            np.ravel(ours[key]), np.ravel(theirs[key]), rtol=2e-4,
            atol=1e-5, err_msg=key)


def test_genuine_ubnormal_eval_script_matches(
        ref_models, rng, tmp_path, monkeypatch, capsys):
    """The reference eval script's UBnormal branch (UBnormal_test loader,
    'abnormal' prefix classes) over our exported ckpt matches our
    `evaluate --preset ubnormal_ltn` (d_model kept tiny via --set)."""
    del ref_models
    import argparse as _ap

    from fixtures import make_ubnormal_like
    from lstc_vad_tpu.ckpt.torch_export import save_torch_checkpoint
    from lstc_vad_tpu.cli.main import main, _apply_common
    from lstc_vad_tpu.config import preset
    from lstc_vad_tpu.train.state import create_train_state

    h5, train_txt, test_txt, mask_dir = make_ubnormal_like(
        str(tmp_path), n_patch=4, d_model=16)
    small = ["--set", "encoder.d_model=16", "--set", "encoder.d_inner=32",
             "--set", "encoder.n_head=2", "--set", "encoder.d_k=8",
             "--set", "encoder.d_v=8", "--set", "encoder.n_layers=1",
             "--set", "encoder.attn_impl=xla", "--set", "head.d_model=16",
             "--set", "data.n_patch=4", "--set", "data.d_model=16",
             "--set", "data.part_len=3", "--set", "encoder.window_depth=3"]
    ns = _ap.Namespace(h5=None, train_txt=None, test_txt=None, mask_dir=None,
                       mask_h5=None, pseudo_labels=None, batch_size=None,
                       seed=None, epochs=None, save_dir=None,
                       metrics_jsonl=None,
                       set=[s for i, s in enumerate(small) if i % 2])
    cfg = _apply_common(preset("ubnormal_ltn"), ns)
    state, _, _, _ = create_train_state(cfg)
    enc_ckpt = str(tmp_path / "enc.ckpt")
    head_ckpt = str(tmp_path / "cls.ckpt")
    save_torch_checkpoint(state.params, enc_ckpt, head_ckpt, "classifier",
                          cfg.encoder)

    rc = main(["evaluate", "--preset", "ubnormal_ltn", "--torch-ckpt",
               "--encoder-ckpt", enc_ckpt, "--head-ckpt", head_ckpt,
               "--h5", h5, "--test-txt", test_txt,
               "--mask-dir", mask_dir + "/"] + small)
    assert rc == 0
    ours = float([ln for ln in capsys.readouterr().out.splitlines()
                  if "auc = " in ln][-1].split("=")[-1])

    import torch as _t
    from torch import nn as _nn

    monkeypatch.setattr(_t.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(_nn.Module, "cuda", lambda self, *a, **k: self)
    sys.path.insert(0, REF)
    try:
        from Test.evaluation_shanghaitech_ubnormal import evaluation
        args = _ap.Namespace(
            dataset="UBnormal", testing_txt=test_txt,
            test_mask_dir=mask_dir, dataset_path=h5,
            temporal_model_path=enc_ckpt, classifier_model_path=head_ckpt,
            temporal_data_parallel=False, temporal_n_layers=1,
            temporal_n_head=2, temporal_d_k=8, temporal_d_v=8, d_model=16,
            temporal_n_hidden=32, temporal_MHA_layerNorm=True,
            temporal_FFN_layerNorm=True,
            temporal_relative_position_encoding=True, window_size=4,
            part_len=3, n_patch=4, segment_len=16)
        evaluation(args)
    finally:
        sys.path.remove(REF)
    out = capsys.readouterr().out
    theirs = float([ln for ln in out.splitlines()
                    if "auc = " in ln][-1].split("=")[-1])
    assert ours == pytest.approx(theirs, abs=1e-3), (ours, theirs)


def test_export_strict_loads_with_flags_off(ref_models, rng):
    """The reference registers layer_norm (Encoder.py:32, MHA:47, FFN:10)
    and pos_ffn (EncoderLayer.py:15) UNCONDITIONALLY — it only gates their
    USE on the flags.  An export from a flags-off flax config must still
    strict-load (identity LN / zero FFN fills) and forward-match."""
    RefEncoder, _, _ = ref_models
    cfg = EncoderConfig(d_model=32, d_inner=48, n_head=2, d_k=8, d_v=8,
                        n_layers=2, mha_layernorm=False, ffn_layernorm=False,
                        input_layernorm=False, ffn_need=False,
                        relative_pe=False, cls_learned=False,
                        position_encoding=False, attn_impl="xla")
    enc = Encoder(cfg)
    x = rng.standard_normal((3, 7, 32)).astype(np.float32)
    params = jax.tree.map(np.asarray,
                          enc.init(jax.random.PRNGKey(0), x))["params"]
    sd = {k: torch.from_numpy(np.array(v))
          for k, v in export_encoder(params, cfg).items()}

    ref = RefEncoder(n_layers=2, n_head=2, d_k=8, d_v=8, d_model=32,
                     d_inner=48, MHA_layerNorm=False, FFN_layerNorm=False,
                     weight_init=False, CLS_learned=False,
                     position_encoding=False, relative_pe=False,
                     input_layerNorm=False, FFN_need=False)
    ref.load_state_dict(sd, strict=True)  # incl. the unconditional modules
    ref.eval()
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x)).numpy()
    ours = np.asarray(enc.apply({"params": params}, x, deterministic=True))
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=1e-4)
