"""CLI smoke: train / gen-pseudo / evaluate subcommands on fixture data."""

import numpy as np
import pytest

from lstc_vad_tpu.cli.main import main

from fixtures import make_sht_like

SMALL = ["--set", "encoder.d_model=16", "--set", "encoder.d_inner=32",
         "--set", "encoder.n_head=2", "--set", "encoder.d_k=8",
         "--set", "encoder.d_v=8", "--set", "encoder.n_layers=1",
         "--set", "encoder.attn_impl=xla",
         "--set", "head.d_model=16", "--set", "head.hidden_dim=8",
         "--set", "data.n_patch=4", "--set", "data.d_model=16",
         "--set", "data.part_num=4", "--set", "data.part_len=3",
         "--set", "encoder.window_depth=3",
         "--set", "save_threshold=2.0"]


def _auc_lines(text):
    return [ln for ln in text.splitlines() if "auc = " in ln]


def _common(fixture):
    h5, train_txt, test_txt, mask_dir = fixture
    return ["--h5", h5, "--train-txt", train_txt, "--test-txt", test_txt,
            "--mask-dir", mask_dir + "/", "--batch-size", "2"] + SMALL


def test_cli_train_and_pseudo_and_eval(tmp_path, capsys):
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30))
    common = _common(fixture)

    rc = main(["train", "--preset", "sht_stn", "--epochs", "1",
               "--save-dir", str(tmp_path / "ckpt")] + common)
    assert rc == 0

    out = str(tmp_path / "stn_pseudo.npy")
    rc = main(["gen-pseudo", "--preset", "sht_stn", "--kind", "stn",
               "--threshold", "0.5", "--out", out] + common)
    assert rc == 0
    pseudo = np.load(out, allow_pickle=True).tolist()
    assert len(pseudo) == 7

    rc = main(["evaluate", "--preset", "sht_ltn"] + common)
    assert rc == 0
    captured = capsys.readouterr()
    assert "auc = " in captured.out


def test_cli_export_torch_roundtrip(tmp_path, capsys):
    """export-torch writes reference-format state_dicts; evaluating them via
    --torch-ckpt reproduces the Orbax checkpoint's AUC exactly."""
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30))
    common = _common(fixture)
    state_dir = str(tmp_path / "state")
    rc = main(["train", "--preset", "sht_stn", "--epochs", "1",
               "--save-state", state_dir] + common)
    assert rc == 0

    enc_out = str(tmp_path / "enc.ckpt")
    head_out = str(tmp_path / "head.ckpt")
    rc = main(["export-torch", "--preset", "sht_stn", "--ckpt", state_dir,
               "--encoder-out", enc_out, "--head-out", head_out] + common)
    assert rc == 0

    rc = main(["evaluate", "--preset", "sht_stn", "--ckpt", state_dir]
              + common)
    assert rc == 0
    from_orbax = _auc_lines(capsys.readouterr().out)
    rc = main(["evaluate", "--preset", "sht_stn", "--torch-ckpt",
               "--encoder-ckpt", enc_out, "--head-ckpt", head_out] + common)
    assert rc == 0
    from_torch = _auc_lines(capsys.readouterr().out)
    assert from_orbax and from_orbax == from_torch


def test_cli_export_aot(tmp_path, capsys):
    """export-aot writes a loadable StableHLO artifact whose scores match
    the live model."""
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30))
    common = _common(fixture)
    state_dir = str(tmp_path / "state")
    rc = main(["train", "--preset", "sht_stn", "--epochs", "1",
               "--save-state", state_dir] + common)
    assert rc == 0
    art = str(tmp_path / "artifact")
    rc = main(["export-aot", "--preset", "sht_stn", "--ckpt", state_dir,
               "--out", art, "--platforms", "cpu"] + common)
    assert rc == 0

    from lstc_vad_tpu.export import load_scorer
    loaded = load_scorer(art)
    assert loaded.meta["token_len"] == 4 and loaded.meta["kind"] == "regressor"
    x = np.random.default_rng(0).standard_normal((5, 4, 16)).astype(np.float32)
    scores = loaded.score(x)
    assert scores.shape == (5,) and np.all((scores >= 0) & (scores <= 1))

    # full offline eval straight from the artifact == eval from the ckpt
    rc = main(["evaluate", "--preset", "sht_stn", "--ckpt", state_dir]
              + common)
    assert rc == 0
    from_ckpt = _auc_lines(capsys.readouterr().out)
    rc = main(["evaluate", "--preset", "sht_stn", "--artifact", art]
              + common)
    assert rc == 0
    from_artifact = _auc_lines(capsys.readouterr().out)
    assert from_ckpt and from_ckpt == from_artifact

    # artifact + ckpt flags conflict
    with pytest.raises(SystemExit, match="already contains the params"):
        main(["evaluate", "--preset", "sht_stn", "--artifact", art,
              "--ckpt", state_dir] + common)


def test_cli_metrics_jsonl(tmp_path):
    import json

    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30))
    common = _common(fixture)
    path = str(tmp_path / "metrics.jsonl")
    rc = main(["train", "--preset", "sht_stn", "--epochs", "2",
               "--metrics-jsonl", path] + common)
    assert rc == 0
    lines = [json.loads(ln) for ln in open(path)]
    kinds = [ln["kind"] for ln in lines]
    assert kinds.count("train") == 2 and "eval" in kinds
    train0 = next(ln for ln in lines if ln["kind"] == "train")
    assert {"ts", "epoch", "step", "loss", "snippets_per_sec"} <= set(train0)
    ev = next(ln for ln in lines if ln["kind"] == "eval")
    assert {"auc_test", "auc_train", "epoch"} <= set(ev)

    rc = main(["evaluate", "--preset", "sht_ltn",
               "--metrics-jsonl", path] + common)
    assert rc == 0
    last = json.loads(open(path).read().splitlines()[-1])
    assert last["kind"] == "final_eval" and 0.0 <= last["auc"] <= 1.0


def test_cli_save_best_checkpoint(tmp_path, capsys):
    """--save-best keeps the best-gate epoch's params (the reference's
    AUC-gated save, spatio_transformer_shanghaitech.py:177-191), not the
    final epoch's: evaluating the saved dir reproduces the best per-epoch
    test AUC from the metrics log."""
    import json

    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30))
    common = _common(fixture)
    best_dir = str(tmp_path / "best")
    metrics = str(tmp_path / "metrics.jsonl")
    rc = main(["train", "--preset", "sht_stn", "--epochs", "3",
               "--set", "inter_epoch=1", "--set", "eval_train_split=false",
               "--save-best", best_dir, "--metrics-jsonl", metrics]
              + common)
    assert rc == 0
    aucs = [json.loads(ln)["auc_test"] for ln in open(metrics)
            if json.loads(ln)["kind"] == "eval"]
    assert len(aucs) == 3
    capsys.readouterr()
    rc = main(["evaluate", "--preset", "sht_stn", "--ckpt", best_dir]
              + common)
    assert rc == 0
    got = float(_auc_lines(capsys.readouterr().out)[-1].split("auc = ")[-1])
    assert got == pytest.approx(max(aucs), abs=1e-6)


def test_cli_compile_cache_env(tmp_path, monkeypatch):
    """LSTC_VAD_COMPILE_CACHE turns on the persistent XLA cache: the jitted
    train-step binaries land in the directory and later processes reuse
    them."""
    import os

    import jax

    cache = tmp_path / "xla_cache"
    monkeypatch.setenv("LSTC_VAD_COMPILE_CACHE", str(cache))
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30))
    try:
        rc = main(["train", "--preset", "sht_stn", "--epochs", "1"]
                  + _common(fixture))
        assert rc == 0
        assert jax.config.jax_compilation_cache_dir == str(cache)
        assert os.path.isdir(cache) and len(os.listdir(cache)) > 0
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_cli_set_overrides(tmp_path):
    from lstc_vad_tpu.cli.main import _apply_common, _coerce
    from lstc_vad_tpu.config import preset

    cfg = preset("sht_stn")
    assert _coerce(cfg, "optim.lr_encoder", "3e-4") == 3e-4
    assert _coerce(cfg, "encoder.n_layers", "2") == 2
    assert _coerce(cfg, "optim.clip_grad", "true") is True
    assert _coerce(cfg, "data.sample", "random") == "random"


def test_cli_evaluate_with_torch_ckpt(tmp_path, capsys):
    import torch
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30))
    common = _common(fixture)

    # synthesize reference-format state_dicts at the small dims
    rng = np.random.default_rng(3)
    t = lambda *s: torch.from_numpy(  # noqa: E731
        (0.05 * rng.standard_normal(s)).astype(np.float32))
    sd_enc = {}
    table = (2 * 3 - 1) * (2 * 4 - 1) ** 2
    for i in range(1):
        p = f"layer_stack.{i}"
        sd_enc |= {
            f"{p}.slf_attn.w_qs.weight": t(16, 16),
            f"{p}.slf_attn.w_ks.weight": t(16, 16),
            f"{p}.slf_attn.w_vs.weight": t(16, 16),
            f"{p}.slf_attn.fc.weight": t(16, 16),
            f"{p}.slf_attn.layer_norm.weight": t(16).abs() + 1,
            f"{p}.slf_attn.layer_norm.bias": t(16),
            f"{p}.slf_attn.relative_position_bias_table": t(table, 2),
            f"{p}.pos_ffn.w_1.weight": t(32, 16),
            f"{p}.pos_ffn.w_1.bias": t(32),
            f"{p}.pos_ffn.w_2.weight": t(16, 32),
            f"{p}.pos_ffn.w_2.bias": t(16),
            f"{p}.pos_ffn.layer_norm.weight": t(16).abs() + 1,
            f"{p}.pos_ffn.layer_norm.bias": t(16),
        }
    sd_head = {"classifier.0.weight": t(8, 16), "classifier.0.bias": t(8),
               "classifier.3.weight": t(32, 8), "classifier.3.bias": t(32),
               "classifier.5.weight": t(2, 32), "classifier.5.bias": t(2)}
    enc_path = str(tmp_path / "enc.ckpt")
    head_path = str(tmp_path / "head.ckpt")
    torch.save(sd_enc, enc_path)
    torch.save(sd_head, head_path)

    rc = main(["evaluate", "--preset", "sht_ltn", "--torch-ckpt",
               "--encoder-ckpt", enc_path, "--head-ckpt", head_path] + common)
    assert rc == 0
    out = capsys.readouterr().out
    assert "auc = " in out
    auc = float(out.strip().split("auc = ")[-1])
    assert 0.0 <= auc <= 1.0


def test_cli_gen_pseudo_from_orbax_ckpt(tmp_path, capsys):
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30))
    common = _common(fixture)
    state_path = str(tmp_path / "state")
    rc = main(["train", "--preset", "sht_stn", "--epochs", "1",
               "--save-dir", str(tmp_path / "ckpt"),
               "--save-state", state_path] + common)
    assert rc == 0
    out = str(tmp_path / "p.npy")
    rc = main(["gen-pseudo", "--preset", "sht_stn", "--kind", "stn",
               "--threshold", "0.5", "--out", out,
               "--ckpt", state_path] + common)
    assert rc == 0
    pseudo = np.load(out, allow_pickle=True).tolist()
    assert len(pseudo) == 7


def test_cli_rejects_torch_flags_without_marker(tmp_path):
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16)
    common = _common(fixture)
    with pytest.raises(SystemExit):
        main(["evaluate", "--preset", "sht_ltn",
              "--encoder-ckpt", "whatever"] + common)


def test_cli_coerce_optional_fields():
    from lstc_vad_tpu.cli.main import _coerce
    from lstc_vad_tpu.config import preset

    cfg = preset("sht_stn")
    assert _coerce(cfg, "data.eval_crop", "3") == 3
    assert _coerce(cfg, "data.eval_crop", "None") is None
    assert _coerce(cfg, "data.pseudo_labels_path", "x.npy") == "x.npy"


def test_cli_evaluate_dump_scores(tmp_path, capsys):
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30))
    common = _common(fixture)
    out = str(tmp_path / "scores.npz")
    rc = main(["evaluate", "--preset", "sht_ltn",
               "--dump-scores", out] + common)
    assert rc == 0
    data = np.load(out)
    assert len(data.files) == 7
    for key in data.files:
        assert data[key].ndim == 1 and len(data[key]) > 0


def test_cli_coerce_rejects_unknown_path_and_bad_type():
    from lstc_vad_tpu.cli.main import _coerce
    from lstc_vad_tpu.config import preset

    cfg = preset("sht_stn")
    with pytest.raises(SystemExit, match="unknown config path"):
        _coerce(cfg, "data.no_such_field", "1")
    with pytest.raises(SystemExit, match="Valid paths.*data.h5_path"):
        _coerce(cfg, "optim.lr_encodr", "3e-4")  # typo'd path lists valid ones
    with pytest.raises(SystemExit, match="unknown config path"):
        _coerce(cfg, "model.nested", "x")  # str field has no children
    with pytest.raises(SystemExit, match="expected int"):
        _coerce(cfg, "encoder.n_layers", "two")
    with pytest.raises(SystemExit, match="expected float"):
        _coerce(cfg, "optim.lr_encoder", "fast")
    with pytest.raises(SystemExit, match="expected a bool"):
        _coerce(cfg, "optim.clip_grad", "maybe")


def test_cli_coerce_annotation_driven():
    from lstc_vad_tpu.cli.main import _coerce, _parse_typed
    from lstc_vad_tpu.config import preset
    from typing import Optional, Tuple

    cfg = preset("sht_stn")
    # Optional[str] stays a string; "None" clears it
    assert _coerce(cfg, "data.pseudo_labels_path", "None") is None
    assert _coerce(cfg, "data.pseudo_labels_path", "123") == "123"
    # bool accepts the negative spellings too
    assert _coerce(cfg, "optim.clip_grad", "off") is False
    # tuple parsing (no tuple config fields today; the parser supports them)
    assert _parse_typed("1,2", Tuple[int, int], "x") == (1, 2)
    assert _parse_typed("(0.5, 1.5, 2.5)", Tuple[float, ...], "x") == \
        (0.5, 1.5, 2.5)
    assert _parse_typed("None", Optional[int], "x") is None


def test_cli_evaluate_eval_crop_mean(tmp_path, capsys):
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30), ten_crop=True)
    common = _common(fixture)
    npz = str(tmp_path / "mean_scores.npz")
    rc = main(["evaluate", "--preset", "sht_ltn", "--eval-crop", "mean",
               "--set", "data.ten_crop=true", "--bootstrap", "25",
               "--dump-scores", npz] + common)
    assert rc == 0
    out = capsys.readouterr().out
    assert "95% CI [" in out  # bootstrap works on the averaged per-video eval
    auc_mean = float(_auc_lines(out)[-1].split("auc = ")[-1])
    assert 0.0 <= auc_mean <= 1.0
    dumped = np.load(npz)
    assert len(dumped.files) == 7  # averaged frame scores, one per video

    # single-crop eval through the same flag takes the int path
    rc = main(["evaluate", "--preset", "sht_ltn", "--eval-crop", "2",
               "--set", "data.ten_crop=true"] + common)
    assert rc == 0
    auc_crop2 = float(capsys.readouterr().out.strip().split("auc = ")[-1])
    assert 0.0 <= auc_crop2 <= 1.0
    assert auc_mean != auc_crop2  # averaging actually changed the scores


def test_cli_evaluate_per_class_ucf(tmp_path, capsys):
    from fixtures import make_ucf_like
    h5, train_txt, test_txt, gt_h5 = make_ucf_like(str(tmp_path), n_patch=3,
                                                   d_model=16)
    rc = main(["evaluate", "--preset", "ucf_ltn", "--per-class",
               "--n-anomaly-classes", "1",
               "--h5", h5, "--train-txt", train_txt, "--test-txt", test_txt,
               "--mask-h5", gt_h5,
               "--set", "encoder.d_model=16", "--set", "encoder.d_inner=32",
               "--set", "encoder.n_head=2", "--set", "encoder.d_k=8",
               "--set", "encoder.d_v=8", "--set", "encoder.n_layers=1",
               "--set", "encoder.attn_impl=xla", "--set", "head.d_model=16",
               "--set", "head.hidden_dim=8", "--set", "data.n_patch=3",
               "--set", "data.d_model=16", "--set", "max_clips=8"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Normal FAR" in out and "mean PR-AUC" in out


def test_cli_per_class_rejected_for_stn(tmp_path):
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16)
    with pytest.raises(SystemExit, match="per-anomaly-class"):
        main(["evaluate", "--preset", "sht_stn", "--per-class"]
             + _common(fixture))


def test_cli_eval_crop_validation_and_dump_scores_conflict(tmp_path):
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            ten_crop=True)
    common = _common(fixture) + ["--set", "data.ten_crop=true"]
    with pytest.raises(SystemExit, match="0-9 or 'mean'"):
        main(["evaluate", "--preset", "sht_ltn", "--eval-crop", "men"]
             + common)
    with pytest.raises(SystemExit, match="out of range"):
        main(["evaluate", "--preset", "sht_ltn", "--eval-crop", "10"]
             + common)
    # --dump-scores/--bootstrap now work with --eval-crop mean (averaged
    # per-video scores); only --per-class remains incompatible
    with pytest.raises(SystemExit, match="cannot be combined"):
        main(["evaluate", "--preset", "ucf_ltn", "--per-class",
              "--dump-scores", str(tmp_path / "s.npz")] + common)


def test_parse_typed_pep604_union():
    from lstc_vad_tpu.cli.main import _parse_typed
    assert _parse_typed("3", int | None, "x") == 3
    assert _parse_typed("None", int | None, "x") is None


def test_cli_profile(tmp_path):
    """profile captures a steady-state XProf trace of the real step."""
    import os

    out = str(tmp_path / "trace")
    rc = main(["profile", "--preset", "sht_stn", "--mode", "train",
               "--steps", "2", "--out", out, "--batch-size", "2"] + SMALL)
    assert rc == 0
    found = [os.path.join(r, f) for r, _, fs in os.walk(out) for f in fs]
    assert found, "no trace files written"

    rc = main(["profile", "--preset", "sht_ltn", "--mode", "eval",
               "--steps", "2", "--eval-batch", "4",
               "--out", str(tmp_path / "trace_eval")] + SMALL)
    assert rc == 0


def test_cli_export_aot_ucf_final_eval_shapes(tmp_path, capsys):
    """export-aot applies the UCF LTN final-eval override (part_len=2,
    window_depth=2) like cmd_evaluate, so the artifact serves
    `evaluate --artifact` end-to-end."""
    from fixtures import make_ucf_like

    h5, train_txt, test_txt, gt_h5 = make_ucf_like(
        str(tmp_path), n_patch=3, d_model=16, n_clips=(8, 40))
    small = ["--set", "encoder.d_model=16", "--set", "encoder.d_inner=32",
             "--set", "encoder.n_head=2", "--set", "encoder.d_k=8",
             "--set", "encoder.d_v=8", "--set", "encoder.n_layers=1",
             "--set", "encoder.attn_impl=xla", "--set", "head.d_model=16",
             "--set", "head.hidden_dim=8", "--set", "data.n_patch=3",
             "--set", "data.d_model=16", "--set", "data.part_num=4",
             "--set", "max_clips=8", "--set", "save_threshold=2.0",
             "--set", "eval_train_split=false",
             "--set", "loss.temporal_only=true",
             "--h5", h5, "--train-txt", train_txt, "--test-txt", test_txt,
             "--mask-h5", gt_h5, "--batch-size", "2"]
    # train at the final-eval shapes (the reference's released UCF ckpt is
    # part_len=2-shaped; cmd_evaluate loads ckpts into that skeleton)
    state_dir = str(tmp_path / "state")
    rc = main(["train", "--preset", "ucf_ltn", "--epochs", "1",
               "--save-state", state_dir, "--set", "data.part_len=2",
               "--set", "encoder.window_depth=2"] + small)
    assert rc == 0
    art = str(tmp_path / "artifact")
    rc = main(["export-aot", "--preset", "ucf_ltn", "--ckpt", state_dir,
               "--out", art, "--l2", "--platforms", "cpu"] + small)
    assert rc == 0

    from lstc_vad_tpu.export import load_scorer
    meta = load_scorer(art).meta
    assert meta["part_len"] == 2 and meta["token_len"] == 6
    assert meta["l2_normalize"] is True

    rc = main(["evaluate", "--preset", "ucf_ltn", "--ckpt", state_dir,
               "--set", "data.part_len=2", "--set", "encoder.window_depth=2"]
              + small)
    assert rc == 0
    from_ckpt = _auc_lines(capsys.readouterr().out)
    rc = main(["evaluate", "--preset", "ucf_ltn", "--artifact", art] + small)
    assert rc == 0
    from_artifact = _auc_lines(capsys.readouterr().out)
    assert from_ckpt and from_ckpt == from_artifact


def test_cli_evaluate_artifact_shape_guards(tmp_path):
    """Wrong-shape artifacts die upfront with a SystemExit, not mid-eval."""

    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30))
    common = _common(fixture)
    state_dir = str(tmp_path / "state")
    rc = main(["train", "--preset", "sht_ltn", "--epochs", "1",
               "--save-state", state_dir, "--set",
               "loss.temporal_only=true"] + common)
    assert rc == 0
    # artifact exported at part_len=3 shapes (12 tokens, no tail programs);
    # the part_len=1 eval override below needs a 4-token program it lacks
    art = str(tmp_path / "artifact")
    rc = main(["export-aot", "--preset", "sht_ltn", "--ckpt", state_dir,
               "--out", art, "--platforms", "cpu"] + common)
    assert rc == 0
    with pytest.raises(SystemExit, match="no program for 4-token"):
        # the part_len=1 override must come after common's part_len=3
        # (--set applies in order)
        main(["evaluate", "--preset", "sht_ltn", "--artifact", art] + common
             + ["--set", "data.part_len=1"])


def test_cli_mesh_train_and_evaluate(tmp_path, capsys):
    """--mesh 2x2 shards the CLI train step and eval scoring over the
    virtual device mesh (conftest provides 8 CPU devices)."""
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30))
    common = _common(fixture)
    rc = main(["train", "--preset", "sht_stn", "--epochs", "1",
               "--mesh", "2x2"] + common)
    assert rc == 0

    rc = main(["evaluate", "--preset", "sht_ltn", "--mesh", "2x2"] + common)
    assert rc == 0
    meshed = [ln for ln in capsys.readouterr().out.splitlines()
              if "auc = " in ln]
    rc = main(["evaluate", "--preset", "sht_ltn"] + common)
    assert rc == 0
    plain = [ln for ln in capsys.readouterr().out.splitlines()
             if "auc = " in ln]
    assert meshed == plain  # GSPMD changes layout, not the math

    out = str(tmp_path / "pseudo.npy")
    rc = main(["gen-pseudo", "--preset", "sht_stn", "--kind", "stn",
               "--threshold", "0.5", "--out", out, "--mesh", "2x2"] + common)
    assert rc == 0
    assert len(np.load(out, allow_pickle=True).tolist()) == 7

    with pytest.raises(SystemExit, match="must divide the head count"):
        main(["evaluate", "--preset", "sht_ltn", "--mesh", "2x3"] + common)


def test_cli_sweep(tmp_path, capsys):
    """sweep trains the cartesian grid, ranks by AUC, writes JSONL."""
    import json

    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30))
    common = _common(fixture)
    out = str(tmp_path / "sweep.jsonl")
    rc = main(["sweep", "--preset", "sht_stn", "--epochs", "1",
               "--grid", "optim.lr_head=1e-2,3e-2",
               "--grid", "loss.lambda_1=0.01,0.1",
               "--out", out] + common)
    assert rc == 0
    lines = [json.loads(ln) for ln in open(out)]
    assert len(lines) == 4  # 2 x 2 grid
    assert {"optim.lr_head", "loss.lambda_1", "best_test_auc"} <= set(lines[0])
    assert len({(ln["optim.lr_head"], ln["loss.lambda_1"])
                for ln in lines}) == 4
    text = capsys.readouterr().out
    assert "rank  gate_auc  test_auc  overrides" in text

    with pytest.raises(SystemExit, match="at least one --grid"):
        main(["sweep", "--preset", "sht_stn", "--epochs", "1"] + common)


def test_cli_evaluate_bootstrap_ci(tmp_path, capsys):
    import json

    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30))
    common = _common(fixture)
    mpath = str(tmp_path / "m.jsonl")
    rc = main(["evaluate", "--preset", "sht_ltn", "--bootstrap", "50",
               "--metrics-jsonl", mpath] + common)
    assert rc == 0
    out = capsys.readouterr().out
    assert "95% CI [" in out and "50 video-level bootstrap" in out
    rec = json.loads(open(mpath).read().splitlines()[-1])
    assert rec["auc_ci_lo"] <= rec["auc"] <= rec["auc_ci_hi"]
    assert rec["n_bootstrap"] == 50


def test_cli_bootstrap_and_grid_validation(tmp_path):

    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30))
    common = _common(fixture)
    with pytest.raises(SystemExit, match="N >= 1"):
        main(["evaluate", "--preset", "sht_ltn", "--bootstrap", "-5"]
             + common)
    with pytest.raises(SystemExit, match="duplicate axis"):
        main(["sweep", "--preset", "sht_stn", "--epochs", "1",
              "--grid", "optim.lr_head=1e-2,3e-2",
              "--grid", "optim.lr_head=1e-3"] + common)


def test_cli_gen_pseudo_from_artifact(tmp_path):
    """gen-pseudo --artifact produces the identical pseudo-label dict as the
    ckpt path, for both the STN clip path and the LTN tail path (--tails
    artifact)."""
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30))
    common = _common(fixture)
    state_dir = str(tmp_path / "state")
    rc = main(["train", "--preset", "sht_stn", "--epochs", "1",
               "--save-state", state_dir] + common)
    assert rc == 0

    art = str(tmp_path / "stn_artifact")
    rc = main(["export-aot", "--preset", "sht_stn", "--ckpt", state_dir,
               "--out", art, "--platforms", "cpu"] + common)
    assert rc == 0
    a, b = str(tmp_path / "a.npy"), str(tmp_path / "b.npy")
    rc = main(["gen-pseudo", "--preset", "sht_stn", "--kind", "stn",
               "--threshold", "0.5", "--out", a, "--ckpt", state_dir]
              + common)
    assert rc == 0
    rc = main(["gen-pseudo", "--preset", "sht_stn", "--kind", "stn",
               "--threshold", "0.5", "--out", b, "--artifact", art] + common)
    assert rc == 0
    da = np.load(a, allow_pickle=True).tolist()
    db = np.load(b, allow_pickle=True).tolist()
    assert set(da) == set(db)
    for k in da:
        np.testing.assert_allclose(da[k], db[k], atol=1e-6, err_msg=k)

    # LTN: tails required for the no-rewindow part path
    state2 = str(tmp_path / "state_ltn")
    rc = main(["train", "--preset", "sht_ltn", "--epochs", "1",
               "--save-state", state2, "--set", "loss.temporal_only=true"]
              + common)
    assert rc == 0
    art2 = str(tmp_path / "ltn_artifact")
    rc = main(["export-aot", "--preset", "sht_ltn", "--ckpt", state2,
               "--out", art2, "--tails", "--platforms", "cpu"] + common)
    assert rc == 0
    c, e = str(tmp_path / "c.npy"), str(tmp_path / "e.npy")
    rc = main(["gen-pseudo", "--preset", "sht_ltn", "--kind", "ltn",
               "--threshold", "0.4", "--out", c, "--ckpt", state2] + common)
    assert rc == 0
    rc = main(["gen-pseudo", "--preset", "sht_ltn", "--kind", "ltn",
               "--threshold", "0.4", "--out", e, "--artifact", art2]
              + common)
    assert rc == 0
    dc = np.load(c, allow_pickle=True).tolist()
    de = np.load(e, allow_pickle=True).tolist()
    assert set(dc) == set(de)
    for k in dc:
        np.testing.assert_allclose(dc[k], de[k], atol=1e-6, err_msg=k)


def _ucf_small(fixture):
    h5, train_txt, test_txt, gt_h5 = fixture
    return ["--set", "encoder.d_model=16", "--set", "encoder.d_inner=32",
            "--set", "encoder.n_head=2", "--set", "encoder.d_k=8",
            "--set", "encoder.d_v=8", "--set", "encoder.n_layers=1",
            "--set", "encoder.attn_impl=xla", "--set", "head.d_model=16",
            "--set", "head.hidden_dim=8", "--set", "data.n_patch=3",
            "--set", "data.d_model=16", "--set", "data.part_num=4",
            "--set", "max_clips=8", "--set", "save_threshold=2.0",
            "--set", "eval_train_split=false",
            "--h5", h5, "--train-txt", train_txt, "--test-txt", test_txt,
            "--mask-h5", gt_h5, "--batch-size", "2"]


def test_cli_ucf_stn_bootstrap_and_dump_scores(tmp_path, capsys):
    """UCF STN eval assembles scores AND labels per video (the reference
    loop is per-video, Train/spatio_transformer_UCF.py:120-137), so
    --bootstrap and --dump-scores work like every other eval path."""
    import json

    from fixtures import make_ucf_like

    fixture = make_ucf_like(str(tmp_path), n_patch=3, d_model=16,
                            n_clips=(8, 40))
    small = _ucf_small(fixture)
    npz = str(tmp_path / "scores.npz")
    mpath = str(tmp_path / "m.jsonl")
    rc = main(["evaluate", "--preset", "ucf_stn", "--bootstrap", "30",
               "--dump-scores", npz, "--metrics-jsonl", mpath] + small)
    assert rc == 0
    out = capsys.readouterr().out
    assert "95% CI [" in out and "30 video-level bootstrap" in out
    rec = json.loads(open(mpath).read().splitlines()[-1])
    assert rec["auc_ci_lo"] <= rec["auc"] <= rec["auc_ci_hi"]
    dumped = np.load(npz)
    assert len(dumped.files) == 6  # one entry per test video


def test_cli_gen_pseudo_honors_max_clips(tmp_path):
    """cfg.max_clips reaches the LTN pseudo generator's binned scorer (the
    reference hardcodes 32, Train/pseudo_labels_generator_temporal.py:70;
    a --set override must change the artifact, matching the eval path)."""
    from fixtures import make_ucf_like

    fixture = make_ucf_like(str(tmp_path), n_patch=3, d_model=16,
                            n_clips=(20, 40))
    small = _ucf_small(fixture)  # max_clips=8 baseline
    a, b = str(tmp_path / "a.npy"), str(tmp_path / "b.npy")
    rc = main(["gen-pseudo", "--preset", "ucf_ltn", "--kind", "ltn",
               "--threshold", "0.0", "--out", a] + small)
    assert rc == 0
    rc = main(["gen-pseudo", "--preset", "ucf_ltn", "--kind", "ltn",
               "--threshold", "0.0", "--out", b] + small
              + ["--set", "max_clips=4"])
    assert rc == 0
    da = np.load(a, allow_pickle=True).tolist()
    db = np.load(b, allow_pickle=True).tolist()
    assert set(da) == set(db)
    assert any(not np.array_equal(da[k], db[k]) for k in da), \
        "max_clips override did not change the pseudo labels"


def test_cli_gen_pseudo_ucf_artifact_train_shapes(tmp_path):
    """UCF LTN pseudo generation through an AOT artifact needs the TRAINING
    part shapes (part_len=3), not the final-eval override (part_len=2):
    export-aot --train-shapes produces it, and the artifact path matches the
    ckpt path dict-identically.  Mismatched artifacts die up front."""

    from fixtures import make_ucf_like

    fixture = make_ucf_like(str(tmp_path), n_patch=3, d_model=16,
                            n_clips=(8, 40))
    small = _ucf_small(fixture) + ["--set", "loss.temporal_only=true"]
    state_dir = str(tmp_path / "state")
    rc = main(["train", "--preset", "ucf_ltn", "--epochs", "1",
               "--save-state", state_dir] + small)
    assert rc == 0

    # final-eval-shaped artifact (part_len=2, from an eval-shaped ckpt like
    # the released ones): rejected by gen-pseudo before any scoring
    eval_shapes = ["--set", "data.part_len=2",
                   "--set", "encoder.window_depth=2"]
    state_eval = str(tmp_path / "state_eval")
    rc = main(["train", "--preset", "ucf_ltn", "--epochs", "1",
               "--save-state", state_eval] + small + eval_shapes)
    assert rc == 0
    art_eval = str(tmp_path / "art_eval")
    rc = main(["export-aot", "--preset", "ucf_ltn", "--ckpt", state_eval,
               "--out", art_eval, "--tails", "--platforms", "cpu"] + small)
    assert rc == 0
    with pytest.raises(SystemExit, match="no program for 9-token"):
        main(["gen-pseudo", "--preset", "ucf_ltn", "--kind", "ltn",
              "--threshold", "0.0", "--out", str(tmp_path / "x.npy"),
              "--artifact", art_eval] + small)

    # train-shaped but WITHOUT --tails: the 8-bin % 3-part tail (6 tokens)
    # is guaranteed to occur -> up-front error, not a mid-run death
    art_notails = str(tmp_path / "art_notails")
    rc = main(["export-aot", "--preset", "ucf_ltn", "--ckpt", state_dir,
               "--out", art_notails, "--train-shapes", "--platforms", "cpu"]
              + small)
    assert rc == 0
    with pytest.raises(SystemExit, match="lacks programs for tail parts"):
        main(["gen-pseudo", "--preset", "ucf_ltn", "--kind", "ltn",
              "--threshold", "0.0", "--out", str(tmp_path / "y.npy"),
              "--artifact", art_notails] + small)

    # the producible artifact: --train-shapes --tails == the ckpt path
    art = str(tmp_path / "art")
    rc = main(["export-aot", "--preset", "ucf_ltn", "--ckpt", state_dir,
               "--out", art, "--train-shapes", "--tails", "--platforms",
               "cpu"] + small)
    assert rc == 0
    from lstc_vad_tpu.export import load_scorer
    loaded = load_scorer(art)
    assert loaded.meta["token_len"] == 9 and {3, 6} <= set(loaded.token_lens)

    a, b = str(tmp_path / "a.npy"), str(tmp_path / "b.npy")
    rc = main(["gen-pseudo", "--preset", "ucf_ltn", "--kind", "ltn",
               "--threshold", "0.0", "--out", a, "--ckpt", state_dir]
              + small)
    assert rc == 0
    rc = main(["gen-pseudo", "--preset", "ucf_ltn", "--kind", "ltn",
               "--threshold", "0.0", "--out", b, "--artifact", art] + small)
    assert rc == 0
    da = np.load(a, allow_pickle=True).tolist()
    db = np.load(b, allow_pickle=True).tolist()
    assert set(da) == set(db)
    for k in da:
        np.testing.assert_allclose(da[k], db[k], atol=1e-6, err_msg=k)


def test_cli_sweep_rank_by(tmp_path, capsys):
    """--rank-by gate (default) orders by the preset's model-selection AUC;
    --rank-by test restores the test-AUC ordering."""
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30))
    common = _common(fixture)
    rc = main(["sweep", "--preset", "sht_stn", "--epochs", "1",
               "--grid", "optim.lr_head=1e-2,3e-2", "--rank-by", "test"]
              + common)
    assert rc == 0
    assert "rank  gate_auc  test_auc  overrides" in capsys.readouterr().out


def test_cli_info(capsys):
    rc = main(["info"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "lstc_vad_tpu" in out and "backend" in out
    assert "--mesh auto would build" in out
    assert "presets:" in out


def test_cli_serve(tmp_path, capsys, monkeypatch):
    """serve: JSONL requests on stdin -> JSONL scores on stdout, ckpt-backed
    scores equal the offline part semantics for the same weights."""
    import io
    import json

    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30))
    common = _common(fixture)
    state_dir = str(tmp_path / "state")
    rc = main(["train", "--preset", "sht_ltn", "--epochs", "1",
               "--save-state", state_dir] + common)
    assert rc == 0

    rng = np.random.default_rng(3)
    video = rng.standard_normal((6, 4, 16)).astype(np.float32)
    # one flush drains BOTH buffered parts (serve_jsonl loops until no
    # stream is ready)
    script = [{"op": "push", "stream": "cam", "feat": c.tolist()}
              for c in video] + [{"op": "flush"}]
    monkeypatch.setattr("sys.stdin",
                        io.StringIO("\n".join(map(json.dumps, script)) + "\n"))
    capsys.readouterr()  # drop the train output
    rc = main(["serve", "--preset", "sht_ltn", "--ckpt", state_dir,
               "--max-streams", "2"] + SMALL)
    assert rc == 0
    replies = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    scores = [r["score"] for r in replies if "score" in r]
    assert len(scores) == 2 and {"flushed": 2} in replies

    # the same weights through the offline scorer stack
    from lstc_vad_tpu.cli.main import _apply_common, _load_orbax_params
    from lstc_vad_tpu.evaluation.scoring import PartScorer
    from lstc_vad_tpu.models import Encoder, make_head
    from lstc_vad_tpu.train.state import create_train_state

    class _A:  # the SMALL overrides as an args namespace
        preset = "sht_ltn"
        set = [s for i, s in enumerate(SMALL) if SMALL[i - 1] == "--set"]
    for k in ("h5", "train_txt", "test_txt", "mask_dir", "mask_h5",
              "pseudo_labels", "batch_size", "seed", "epochs", "save_dir",
              "log_dir", "metrics_jsonl"):
        setattr(_A, k, None)
    from lstc_vad_tpu.config import preset as _preset
    cfg = _apply_common(_preset("sht_ltn"), _A)
    state, encoder, head, _ = create_train_state(cfg)
    params = _load_orbax_params(state_dir, state)
    offline = PartScorer(encoder, head, cfg.data.part_len, cfg.data.n_patch)
    expected, _counts = offline.score_video(params, video)
    np.testing.assert_allclose(scores, expected[:2], atol=1e-5)


def test_cli_serve_validation(tmp_path):

    with pytest.raises(SystemExit, match="--artifact already contains"):
        main(["serve", "--preset", "sht_ltn", "--artifact",
              str(tmp_path / "a"), "--ckpt", str(tmp_path / "c")] + SMALL)
    with pytest.raises(SystemExit, match="--max-streams"):
        main(["serve", "--preset", "sht_ltn", "--max-streams", "0"] + SMALL)


def test_cli_serve_stn_single_clip(capsys, monkeypatch):
    """STN presets serve single clips (part_len=1, regressor head): each
    pushed clip scores on the next flush, scores in [0, 1]."""
    import io
    import json

    rng = np.random.default_rng(5)
    clips = rng.standard_normal((3, 4, 16)).astype(np.float32)
    script = ([{"op": "push", "stream": "cam", "feat": c.tolist()}
               for c in clips] + [{"op": "flush"}] * 3)
    monkeypatch.setattr("sys.stdin",
                        io.StringIO("\n".join(map(json.dumps, script)) + "\n"))
    rc = main(["serve", "--preset", "sht_stn"] + SMALL)
    assert rc == 0
    replies = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    scores = [r["score"] for r in replies if "score" in r]
    # part_len=1: serve_jsonl's flush drains the whole backlog, so the
    # first flush emits all 3 clip scores and the later two emit none
    assert len(scores) == 3
    assert all(0.0 <= s <= 1.0 for s in scores)  # sigmoid regressor range


def test_gen_pseudo_kind_preset_mismatch_fails_fast(tmp_path):
    """--kind must match the preset's model: the artifact fail-fast and the
    scorer shapes key off the preset, so a mismatch would pass pre-checks
    against the wrong token length and die mid-run."""
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30))
    with pytest.raises(SystemExit, match="does not match the preset"):
        main(["gen-pseudo", "--preset", "sht_stn", "--kind", "ltn",
              "--out", str(tmp_path / "p.npy")] + _common(fixture))


def test_evaluate_and_gen_pseudo_warn_on_random_init(tmp_path, capsys):
    """Scoring with no checkpoint flags is smoke-test-only: both commands
    must say so on stderr (a silent 'auc = 0.5x' or a garbage pseudo-label
    artifact looks legitimate otherwise)."""
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30))
    rc = main(["evaluate", "--preset", "sht_ltn"] + _common(fixture))
    assert rc == 0
    assert "RANDOM-INIT" in capsys.readouterr().err

    rc = main(["gen-pseudo", "--preset", "sht_stn", "--kind", "stn",
               "--out", str(tmp_path / "p.npy")] + _common(fixture))
    assert rc == 0
    assert "RANDOM-INIT" in capsys.readouterr().err


def test_evaluate_no_rewindow_artifact_tail_precheck(tmp_path, capsys):
    """evaluate --artifact with eval_tail_rewindow=false warns up front when
    the artifact lacks tail programs (same fail-fast gen-pseudo has) —
    BEFORE the store walk reaches the short tail that then fails."""
    fixture = make_sht_like(str(tmp_path), n_patch=4, d_model=16,
                            n_clips=(14, 30))
    common = _common(fixture)
    state_dir = str(tmp_path / "state")
    rc = main(["train", "--preset", "sht_ltn", "--epochs", "1",
               "--save-state", state_dir,
               "--set", "loss.temporal_only=true"] + common)
    assert rc == 0
    art = str(tmp_path / "artifact")
    rc = main(["export-aot", "--preset", "sht_ltn", "--ckpt", state_dir,
               "--out", art, "--platforms", "cpu"] + common)  # no --tails
    assert rc == 0
    with pytest.raises(ValueError):  # a short tail does occur mid-run
        main(["evaluate", "--preset", "sht_ltn", "--artifact", art,
              "--set", "eval_tail_rewindow=false"] + common)
    assert "lacks programs for tail parts" in capsys.readouterr().err
