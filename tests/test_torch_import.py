"""Torch state_dict importer: our forward on imported params must match a
torch forward computed directly FROM the state_dict tensors."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax

from lstc_vad_tpu.ckpt.torch_import import (import_encoder, import_head,
                                            load_torch_state_dict)
from lstc_vad_tpu.config import EncoderConfig
from lstc_vad_tpu.models import Encoder, make_head, rpe

CFG = EncoderConfig(d_model=32, d_inner=48, n_head=2, d_k=8, d_v=8,
                    n_layers=2, mha_layernorm=True, ffn_layernorm=True,
                    input_layernorm=True, relative_pe=True, window_size=4,
                    window_depth=3, cls_learned=True, position_encoding=True,
                    max_position_tokens=25, attn_impl="xla")


def _make_torch_state_dict(rng, cfg: EncoderConfig):
    """Random tensors with the reference Encoder's state_dict layout."""
    t = lambda *s: torch.from_numpy(rng.standard_normal(s).astype(np.float32))
    sd = {"cls_token": t(1, 1, cfg.d_model),
          "position_enc": t(1, cfg.max_position_tokens, cfg.d_model),
          "layer_norm.weight": t(cfg.d_model).abs(),
          "layer_norm.bias": t(cfg.d_model) * 0.1}
    table = (2 * cfg.window_depth - 1) * (2 * cfg.window_size - 1) ** 2
    for i in range(cfg.n_layers):
        p = f"layer_stack.{i}"
        sd |= {
            f"{p}.slf_attn.w_qs.weight": t(cfg.n_head * cfg.d_k, cfg.d_model),
            f"{p}.slf_attn.w_ks.weight": t(cfg.n_head * cfg.d_k, cfg.d_model),
            f"{p}.slf_attn.w_vs.weight": t(cfg.n_head * cfg.d_v, cfg.d_model),
            f"{p}.slf_attn.fc.weight": t(cfg.d_model, cfg.n_head * cfg.d_v),
            f"{p}.slf_attn.layer_norm.weight": t(cfg.d_model).abs(),
            f"{p}.slf_attn.layer_norm.bias": t(cfg.d_model) * 0.1,
            f"{p}.slf_attn.relative_position_bias_table": t(table, cfg.n_head) * 0.02,
            f"{p}.pos_ffn.w_1.weight": t(cfg.d_inner, cfg.d_model),
            f"{p}.pos_ffn.w_1.bias": t(cfg.d_inner) * 0.1,
            f"{p}.pos_ffn.w_2.weight": t(cfg.d_model, cfg.d_inner),
            f"{p}.pos_ffn.w_2.bias": t(cfg.d_model) * 0.1,
            f"{p}.pos_ffn.layer_norm.weight": t(cfg.d_model).abs(),
            f"{p}.pos_ffn.layer_norm.bias": t(cfg.d_model) * 0.1,
        }
    return sd


def _torch_sd_encoder(sd, cfg: EncoderConfig, x_np):
    """Reference Encoder math driven directly by the state_dict tensors."""
    x = torch.from_numpy(x_np)
    ln = lambda x, p: F.layer_norm(x, (cfg.d_model,), sd[p + ".weight"],
                                   sd[p + ".bias"], 1e-6)
    x = ln(x, "layer_norm")
    cls = sd["cls_token"].expand(x.shape[0], -1, -1)
    x = torch.cat([cls, x], dim=1)
    x = x + sd["position_enc"][:, :x.shape[1], :]
    index = torch.from_numpy(
        rpe.relative_position_index_3d(cfg.window_depth, cfg.window_size))
    for i in range(cfg.n_layers):
        p = f"layer_stack.{i}"
        b, L, _ = x.shape
        residual = x
        q = F.linear(x, sd[f"{p}.slf_attn.w_qs.weight"]).view(
            b, L, cfg.n_head, cfg.d_k).transpose(1, 2)
        k = F.linear(x, sd[f"{p}.slf_attn.w_ks.weight"]).view(
            b, L, cfg.n_head, cfg.d_k).transpose(1, 2)
        v = F.linear(x, sd[f"{p}.slf_attn.w_vs.weight"]).view(
            b, L, cfg.n_head, cfg.d_v).transpose(1, 2)
        attn = q / cfg.d_k ** 0.5 @ k.transpose(2, 3)
        tbl = sd[f"{p}.slf_attn.relative_position_bias_table"]
        n_tok = L - 1
        bias = tbl[index[:n_tok, :n_tok].reshape(-1)].reshape(n_tok, n_tok, -1)
        attn[:, :, 1:, 1:] += bias.permute(2, 0, 1).unsqueeze(0)
        out = (F.softmax(attn, dim=-1) @ v).transpose(1, 2).reshape(b, L, -1)
        x = F.linear(out, sd[f"{p}.slf_attn.fc.weight"]) + residual
        x = ln(x, f"{p}.slf_attn.layer_norm")
        residual = x
        h = F.linear(F.relu(F.linear(x, sd[f"{p}.pos_ffn.w_1.weight"],
                                     sd[f"{p}.pos_ffn.w_1.bias"])),
                     sd[f"{p}.pos_ffn.w_2.weight"], sd[f"{p}.pos_ffn.w_2.bias"])
        x = ln(h + residual, f"{p}.pos_ffn.layer_norm")
    return x.numpy()


def test_encoder_import_matches_torch(rng, tmp_path):
    sd = _make_torch_state_dict(rng, CFG)
    torch.save(sd, tmp_path / "enc.ckpt")

    x = rng.standard_normal((3, 24, 32)).astype(np.float32)
    model = Encoder(CFG)
    params = jax.tree.map(np.asarray,
                          model.init(jax.random.PRNGKey(0), x))["params"]
    report = {"loaded": [], "skipped": []}
    loaded_sd = load_torch_state_dict(str(tmp_path / "enc.ckpt"))
    imported = import_encoder(loaded_sd, params, report)
    assert not report["skipped"], report["skipped"]
    assert len(report["loaded"]) == len(sd)

    ours = np.asarray(model.apply({"params": imported}, x,
                                  deterministic=True))
    theirs = _torch_sd_encoder({k: torch.from_numpy(v)
                                for k, v in loaded_sd.items()}, CFG, x)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=1e-4)


def test_module_prefix_stripped(rng, tmp_path):
    sd = {"module.cls_token":
          torch.from_numpy(rng.standard_normal((1, 1, 32)).astype(np.float32))}
    torch.save(sd, tmp_path / "dp.ckpt")
    loaded = load_torch_state_dict(str(tmp_path / "dp.ckpt"))
    assert set(loaded) == {"cls_token"}


@pytest.mark.parametrize("kind,prefix", [("regressor", "regressor"),
                                         ("classifier", "classifier")])
def test_head_import_matches_torch(rng, tmp_path, kind, prefix):
    d, hidden = 32, 16
    out_dim = 1 if kind == "regressor" else 2
    t = lambda *s: torch.from_numpy(rng.standard_normal(s).astype(np.float32))
    sd = {f"{prefix}.0.weight": t(hidden, d), f"{prefix}.0.bias": t(hidden),
          f"{prefix}.3.weight": t(32, hidden), f"{prefix}.3.bias": t(32),
          f"{prefix}.5.weight": t(out_dim, 32), f"{prefix}.5.bias": t(out_dim)}
    torch.save(sd, tmp_path / "head.ckpt")

    head = make_head(kind, d, hidden)
    x = rng.standard_normal((5, d)).astype(np.float32)
    params = jax.tree.map(np.asarray,
                          head.init(jax.random.PRNGKey(0), x))["params"]
    report = {"loaded": [], "skipped": []}
    imported = import_head(load_torch_state_dict(str(tmp_path / "head.ckpt")),
                           params, report)
    assert not report["skipped"]

    ours = np.asarray(head.apply({"params": imported}, x, deterministic=True))
    xt = torch.from_numpy(x)
    h = F.relu(F.linear(xt, sd[f"{prefix}.0.weight"], sd[f"{prefix}.0.bias"]))
    h = F.linear(h, sd[f"{prefix}.3.weight"], sd[f"{prefix}.3.bias"])
    h = F.linear(h, sd[f"{prefix}.5.weight"], sd[f"{prefix}.5.bias"])
    theirs = (torch.sigmoid(h) if kind == "regressor"
              else F.softmax(h, dim=-1)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
