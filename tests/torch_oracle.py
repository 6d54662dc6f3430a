"""Functional torch oracle of the reference model math, used only by tests.

Re-states the forward semantics of models/Encoder.py / MultiHeadAttention.py /
FFN.py / Regressor.py / Classifier.py as plain tensor algebra over the FLAX
parameter tree (flax Dense kernels are [in, out], so x @ kernel == torch
Linear with weight = kernel.T).  Dropout is omitted (parity is checked
deterministically).
"""

import numpy as np
import torch
import torch.nn.functional as F

from lstc_vad_tpu.models import rpe


def _t(a):
    if isinstance(a, torch.Tensor):
        return a  # pass grad-enabled leaves through untouched
    return torch.from_numpy(np.asarray(a, dtype=np.float32))


def _linear(x, p):
    out = x @ _t(p["kernel"])
    if "bias" in p:
        out = out + _t(p["bias"])
    return out


def _layer_norm(x, p, eps=1e-6):
    return F.layer_norm(x, (x.shape[-1],), _t(p["scale"]), _t(p["bias"]), eps)


def mha_forward(x, p, cfg, mask=None):
    b, length, _ = x.shape
    h, dk, dv = cfg.n_head, cfg.d_k, cfg.d_v
    residual = x
    q = _linear(x, p["w_qs"]).view(b, length, h, dk).transpose(1, 2)
    k = _linear(x, p["w_ks"]).view(b, length, h, dk).transpose(1, 2)
    v = _linear(x, p["w_vs"]).view(b, length, h, dv).transpose(1, 2)
    attn = torch.matmul(q / (dk ** 0.5), k.transpose(2, 3))
    if mask is not None:
        attn = attn.masked_fill(_t(mask) == 0, -1e9)
    if cfg.relative_pe and length > 1:
        index = torch.from_numpy(
            rpe.relative_position_index_3d(cfg.window_depth, cfg.window_size))
        table = _t(p["relative_position_bias_table"])
        n_tok = length - 1
        bias = table[index[:n_tok, :n_tok].reshape(-1)].reshape(n_tok, n_tok, -1)
        attn[:, :, 1:, 1:] += bias.permute(2, 0, 1).unsqueeze(0)
    if cfg.relative_pe_2d and length > 1:
        index = torch.from_numpy(rpe.relative_position_index_2d(cfg.window_size))
        table = _t(p["relative_position_bias_table"])
        n = cfg.window_size * cfg.window_size
        bias = table[index.reshape(-1)].reshape(n, n, -1)
        attn[:, :, 1:, 1:] += bias.permute(2, 0, 1).unsqueeze(0)
    attn = F.softmax(attn, dim=-1)
    out = torch.matmul(attn, v)
    out = out.transpose(1, 2).contiguous().view(b, length, -1)
    out = _linear(out, p["fc"])
    out = out + residual
    if cfg.mha_layernorm:
        out = _layer_norm(out, p["layer_norm"])
    return out


def ffn_forward(x, p, cfg):
    residual = x
    x = _linear(F.relu(_linear(x, p["w_1"])), p["w_2"])
    x = x + residual
    if cfg.ffn_layernorm:
        x = _layer_norm(x, p["layer_norm"])
    return x


def encoder_forward(x_np, params, cfg, mask=None, as_tensor=False):
    x = _t(x_np)
    if cfg.input_layernorm:
        x = _layer_norm(x, params["input_layer_norm"])
    if cfg.cls_learned:
        cls = _t(params["cls_token"]).expand(x.shape[0], -1, -1)
    else:
        cls = torch.mean(x, dim=1, keepdim=True)
    x = torch.cat([cls, x], dim=1)
    if cfg.position_encoding:
        x = x + _t(params["position_enc"])[:, :x.shape[1], :]
    for i in range(cfg.n_layers):
        p = params[f"layer_{i}"]
        x = mha_forward(x, p["slf_attn"], cfg, mask)
        if cfg.ffn_need:
            x = ffn_forward(x, p["pos_ffn"], cfg)
    return x if as_tensor else x.numpy()


def head_forward(x_np, params, kind, as_tensor=False):
    x = _t(x_np)
    p = params["mlp"]
    x = F.relu(_linear(x, p["linear_0"]))
    x = _linear(x, p["linear_1"])
    x = _linear(x, p["linear_2"])
    out = torch.sigmoid(x) if kind == "regressor" else F.softmax(x, dim=-1)
    return out if as_tensor else out.numpy()
