"""docs/PARITY_RUNBOOK.md cannot bit-rot (VERDICT r4 #4): this test
extracts the EXACT command lines from the runbook's preflight and parity
code fences and runs them through the real CLI entry point against
synthetic stand-ins for the (environment-absent) real artifacts.

Only two kinds of substitution are applied to each extracted command:
- artifact filenames (h5 / txt / mask / ckpt paths) -> fixture paths; every
  expected filename MUST appear verbatim, so renaming an artifact in the doc
  without updating this map fails here;
- appended ``--set`` dimension overrides (scale-only: none of them touches a
  flag the runbook spells out), so the commands run in seconds on one CPU
  core instead of at d_model 1024-2048.

The stand-in checkpoints are reference-format torch state_dicts produced by
our own exporter (proven strict=True-compatible with the reference modules
in test_reference_parity.py), so ``--torch-ckpt`` exercises the same import
path the real released .ckpt files will take.
"""

import re
import shlex

import numpy as np
import pytest
import torch

import jax

from fixtures import make_sht_like, make_ubnormal_like, make_ucf_like
from lstc_vad_tpu.ckpt.torch_export import export_encoder, export_head
from lstc_vad_tpu.cli.main import _ucf_final_eval_shapes, main
from lstc_vad_tpu.config import preset, replace
from lstc_vad_tpu.models import Encoder, make_head

RUNBOOK = "/root/repo/docs/PARITY_RUNBOOK.md"

# scale-only overrides (dicts drive BOTH the --set args and the ckpt build,
# so the CLI config and the stand-in checkpoints cannot diverge)
_DIMS = {"encoder.d_model": 16, "encoder.d_inner": 32, "encoder.n_head": 2,
         "encoder.d_k": 8, "encoder.d_v": 8, "encoder.n_layers": 1,
         "encoder.attn_impl": "xla", "head.d_model": 16,
         "head.hidden_dim": 8, "data.d_model": 16}
_SMALL = {
    "sht_ltn": dict(_DIMS, **{"data.n_patch": 4}),
    "ucf_ltn": dict(_DIMS, **{"data.n_patch": 3}),
    "ubnormal_ltn": dict(_DIMS, **{"data.n_patch": 4}),
}


def _runbook_commands():
    """The `python -m lstc_vad_tpu ...` commands of Step 0 + Step 1, with
    backslash continuations joined — exactly as a user would paste them."""
    text = open(RUNBOOK).read()
    steps = text.split("## Step 2")[0]
    cmds = []
    for fence in re.findall(r"```shell\n(.*?)```", steps, re.S):
        joined = fence.replace("\\\n", " ")
        for line in joined.splitlines():
            line = line.strip()
            if line.startswith("python -m lstc_vad_tpu"):
                cmds.append(shlex.split(line)[3:])  # argv after the module
    return cmds


def _make_torch_ckpts(tmp_path, preset_name):
    """Reference-format encoder+classifier state_dicts at the small dims of
    ``preset_name`` (UCF gets the final-eval part_len=2 shapes, the shapes
    the released UCF ckpt carries — Test/evaluation_UCF.py:33,42)."""
    cfg = replace(preset(preset_name), **_SMALL[preset_name])
    cfg = _ucf_final_eval_shapes(cfg)
    enc = Encoder(cfg.encoder)
    d = cfg.encoder.d_model
    tokens = cfg.data.part_len * cfg.data.n_patch
    x = np.zeros((1, tokens, d), np.float32)
    enc_params = jax.tree.map(
        np.asarray, enc.init(jax.random.PRNGKey(0), x))["params"]
    head = make_head("classifier", d, cfg.head.hidden_dim)
    head_params = jax.tree.map(
        np.asarray,
        head.init(jax.random.PRNGKey(1), np.zeros((1, d), np.float32))
    )["params"]
    enc_path = str(tmp_path / f"{preset_name}_enc.ckpt")
    head_path = str(tmp_path / f"{preset_name}_head.ckpt")
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in
                export_encoder(enc_params, cfg.encoder).items()}, enc_path)
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in
                export_head(head_params, "classifier").items()}, head_path)
    return enc_path, head_path


def test_runbook_commands_run_end_to_end(tmp_path, capsys):
    sht = make_sht_like(str(tmp_path / "sht"), n_patch=4, d_model=16,
                        n_clips=(14, 30))
    ucf = make_ucf_like(str(tmp_path / "ucf"), n_patch=3, d_model=16,
                        n_clips=(4, 40))
    ub = make_ubnormal_like(str(tmp_path / "ub"), n_patch=4, d_model=16,
                            n_clips=(12, 24))
    sht_ck = _make_torch_ckpts(tmp_path, "sht_ltn")
    ucf_ck = _make_torch_ckpts(tmp_path, "ucf_ltn")
    ub_ck = _make_torch_ckpts(tmp_path, "ubnormal_ltn")

    # runbook artifact name -> stand-in path (exact-token substitution)
    subs = {
        "SHT_I3D_16PATCH.h5": sht[0],
        "data/SH_Test_NEW.txt": sht[2],
        "data/SHT/test_frame_mask/": sht[3] + "/",
        "shanghaitech_temporal_model_oneCrop_I3D_RGB_0.9779.ckpt": sht_ck[0],
        "shanghaitech_classifier_model_oneCrop_I3D_RGB_0.9779.ckpt":
            sht_ck[1],
        "UCF_I3D_9PATCH.h5": ucf[0],
        "data/Test_Annotation.txt": ucf[2],
        "UCF_Crime_gt.h5": ucf[3],
        "UCF_temporal_model_oneCrop_I3D_RGB_0.8570.ckpt": ucf_ck[0],
        "UCF_classifier_model_oneCrop_I3D_RGB_0.8570.ckpt": ucf_ck[1],
        "UBnormal_I3D_16PATCH.h5": ub[0],
        "data/test_video_names_frames.txt": ub[2],
        "data/UBnormal/test_frame_mask/": ub[3] + "/",
        "UBnormal_temporal_model_oneCrop_I3D_RGB_0.7551.ckpt": ub_ck[0],
        "UBnormal_classifier_model_oneCrop_I3D_RGB_0.7551.ckpt": ub_ck[1],
    }

    cmds = _runbook_commands()
    assert len(cmds) == 6, [c[:2] for c in cmds]
    assert [c[0] for c in cmds] == ["validate-data"] * 3 + ["evaluate"] * 3

    seen = set()
    aucs = {}
    for argv in cmds:
        preset_name = argv[argv.index("--preset") + 1]
        resolved = []
        for arg in argv:
            if arg in subs:
                seen.add(arg)
                arg = subs[arg]
            resolved.append(arg)
        for k, v in _SMALL[preset_name].items():
            resolved += ["--set", f"{k}={v}"]
        rc = main(resolved)
        out = capsys.readouterr().out
        assert rc == 0, (argv[0], preset_name, out)
        if argv[0] == "evaluate":
            assert "auc = " in out, out
            aucs[preset_name] = float(out.strip().split("auc = ")[-1])

    # every runbook artifact name was actually present in the commands —
    # a doc rename without a test update fails here
    assert seen == set(subs), sorted(set(subs) - seen)
    assert set(aucs) == {"sht_ltn", "ucf_ltn", "ubnormal_ltn"}
    for name, auc in aucs.items():
        assert 0.0 <= auc <= 1.0, (name, auc)


def test_runbook_targets_match_baseline():
    """The runbook's expected AUCs stay pinned to the reference's released
    numbers (/root/reference/README.md:51-59 via BASELINE.md)."""
    text = open(RUNBOOK).read()
    for target in ("0.9779", "0.8570", "0.7551"):
        assert target in text, target
