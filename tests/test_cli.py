"""CLI smoke: train / gen-pseudo / evaluate subcommands on fixture data."""

import numpy as np

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
    import pytest
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
