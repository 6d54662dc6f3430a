"""Torch state_dict exporter: the inverse of torch_import.

Round trip (export -> torch.save -> load -> import onto a DIFFERENT init)
must reproduce the original params exactly, and the exported tensors driven
through reference-semantics torch math must match our forward.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax

from lstc_vad_tpu.ckpt.torch_export import (export_encoder, export_head,
                                            save_torch_checkpoint)
from lstc_vad_tpu.ckpt.torch_import import (import_encoder, import_head,
                                            load_torch_state_dict)
from lstc_vad_tpu.models import Encoder, make_head

from test_torch_import import CFG, _torch_sd_encoder


def _init_encoder_params(seed, x):
    model = Encoder(CFG)
    return model, jax.tree.map(
        np.asarray, model.init(jax.random.PRNGKey(seed), x))["params"]


def test_encoder_roundtrip_exact(rng, tmp_path):
    x = rng.standard_normal((2, 24, 32)).astype(np.float32)
    model, params = _init_encoder_params(0, x)
    _, other = _init_encoder_params(1, x)

    sd = export_encoder(params, CFG)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, tmp_path / "enc.ckpt")
    report = {"loaded": [], "skipped": []}
    imported = import_encoder(load_torch_state_dict(str(tmp_path / "enc.ckpt")),
                              other, report)
    assert not report["skipped"]

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(imported))
    for path, leaf in flat_a:
        np.testing.assert_array_equal(leaf, flat_b[path], err_msg=str(path))


def test_exported_sd_matches_torch_semantics(rng):
    x = rng.standard_normal((3, 24, 32)).astype(np.float32)
    model, params = _init_encoder_params(2, x)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_encoder(params, CFG).items()}
    ours = np.asarray(model.apply({"params": params}, x, deterministic=True))
    theirs = _torch_sd_encoder(sd, CFG, x)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=1e-4)


def test_exported_sd_strict_loads_into_reference_layout(rng):
    """The sd carries the persistent relative_position_index buffers the
    reference registers (models/MultiHeadAttention.py:55-74), so a
    strict=True torch load over a reference-shaped module would find every
    buffer key."""
    x = np.zeros((1, 24, 32), np.float32)
    _, params = _init_encoder_params(3, x)
    sd = export_encoder(params, CFG)
    for i in range(CFG.n_layers):
        key = f"layer_stack.{i}.slf_attn.relative_position_index"
        assert key in sd and sd[key].dtype == np.int64
        n = CFG.window_depth * CFG.window_size ** 2
        assert sd[key].shape == (n, n)


def test_head_roundtrip_and_semantics(rng, tmp_path):
    for kind in ("regressor", "classifier"):
        head = make_head(kind, 32, 16)
        x = rng.standard_normal((4, 32)).astype(np.float32)
        params = jax.tree.map(
            np.asarray, head.init(jax.random.PRNGKey(0), x))["params"]
        other = jax.tree.map(
            np.asarray, head.init(jax.random.PRNGKey(1), x))["params"]

        sd = export_head(params, kind)
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                    for k, v in sd.items()}, tmp_path / f"{kind}.ckpt")
        report = {"loaded": [], "skipped": []}
        imported = import_head(
            load_torch_state_dict(str(tmp_path / f"{kind}.ckpt")), other,
            report)
        assert not report["skipped"]
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_leaves_with_path(params),
                jax.tree_util.tree_leaves_with_path(imported)):
            assert pa == pb
            np.testing.assert_array_equal(a, b)

        sdt = {k: torch.from_numpy(v) for k, v in sd.items()}
        xt = torch.from_numpy(x)
        h = F.relu(F.linear(xt, sdt[f"{kind}.0.weight"], sdt[f"{kind}.0.bias"]))
        h = F.linear(h, sdt[f"{kind}.3.weight"], sdt[f"{kind}.3.bias"])
        h = F.linear(h, sdt[f"{kind}.5.weight"], sdt[f"{kind}.5.bias"])
        theirs = (torch.sigmoid(h) if kind == "regressor"
                  else F.softmax(h, dim=-1)).numpy()
        ours = np.asarray(head.apply({"params": params}, x,
                                     deterministic=True))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_save_torch_checkpoint_files(rng, tmp_path):
    x = np.zeros((1, 24, 32), np.float32)
    _, enc_params = _init_encoder_params(4, x)
    head = make_head("classifier", 32, 16)
    head_params = jax.tree.map(
        np.asarray,
        head.init(jax.random.PRNGKey(0), np.zeros((1, 32), np.float32))
    )["params"]
    params = {"encoder": enc_params, "head": head_params}
    save_torch_checkpoint(params, str(tmp_path / "e.ckpt"),
                          str(tmp_path / "h.ckpt"), "classifier", CFG)
    enc_sd = load_torch_state_dict(str(tmp_path / "e.ckpt"))
    head_sd = load_torch_state_dict(str(tmp_path / "h.ckpt"))
    assert "cls_token" in enc_sd
    assert "classifier.0.weight" in head_sd
