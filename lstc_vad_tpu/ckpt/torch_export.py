"""Flax param tree -> PyTorch state_dict exporter (inverse of torch_import).

Lets TPU-trained weights be scored by the reference's torch pipeline
(Test/evaluation_shanghaitech_ubnormal.py:35-62 rebuilds Encoder + head from
two state_dict files), closing the round trip the importer opened: a user of
the reference can train here and evaluate there, or vice versa.

Key mapping is the exact inverse of torch_import (flax Dense kernels are
[in, out]; torch Linear weights are [out, in] -> transpose back).  When an
``EncoderConfig`` is supplied, everything the reference registers
UNCONDITIONALLY but our flax modules gate on flags is emitted too, so even a
``strict=True`` torch load succeeds:

- the ``relative_position_index`` buffer (models/MultiHeadAttention.py:55-74);
- identity LayerNorm weights for ``layer_norm`` at the Encoder top
  (models/Encoder.py:32), per-layer MHA (MultiHeadAttention.py:47) and FFN
  (FFN.py:10) — the reference creates these modules always and only gates
  their *use* on the flags, so a flag-off export must still carry the keys
  (identity values: the reference never calls them under the same flags);
- zero-filled ``pos_ffn`` Linears when ``ffn_need=False`` (EncoderLayer.py:15
  registers the FFN regardless; its params are unused at runtime).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..config import EncoderConfig
from ..models import rpe


def _np(x) -> np.ndarray:
    return np.asarray(x)


def export_encoder(enc_params: dict,
                   cfg: Optional[EncoderConfig] = None
                   ) -> Dict[str, np.ndarray]:
    """Flax encoder subtree -> reference Encoder state_dict (numpy values)."""
    sd: Dict[str, np.ndarray] = {}
    index = None
    if cfg is not None and (cfg.relative_pe or cfg.relative_pe_2d):
        index = (rpe.relative_position_index_3d(cfg.window_depth,
                                                cfg.window_size)
                 if cfg.relative_pe
                 else rpe.relative_position_index_2d(cfg.window_size))
        index = index.astype(np.int64)

    for name, sub in enc_params.items():
        if name == "input_layer_norm":
            sd["layer_norm.weight"] = _np(sub["scale"])
            sd["layer_norm.bias"] = _np(sub["bias"])
        elif name in ("cls_token", "position_enc"):
            sd[name] = _np(sub)
        elif name.startswith("layer_"):
            i = name[len("layer_"):]
            for mod, modp in sub.items():          # slf_attn | pos_ffn
                for pname, leaf in modp.items():
                    key = f"layer_stack.{i}.{mod}.{pname}"
                    if pname == "relative_position_bias_table":
                        sd[key] = _np(leaf)
                        if index is not None:
                            sd[f"layer_stack.{i}.{mod}."
                               "relative_position_index"] = index
                    elif pname == "layer_norm":
                        sd[key + ".weight"] = _np(leaf["scale"])
                        sd[key + ".bias"] = _np(leaf["bias"])
                    else:                          # w_qs/w_ks/w_vs/fc/w_1/w_2
                        sd[key + ".weight"] = _np(leaf["kernel"]).T
                        if "bias" in leaf:
                            sd[key + ".bias"] = _np(leaf["bias"])
        else:
            raise ValueError(f"unknown encoder param {name!r}")
    if cfg is not None:
        _fill_unconditional_modules(sd, cfg)
    return sd


def _fill_unconditional_modules(sd: Dict[str, np.ndarray],
                                cfg: EncoderConfig):
    """Emit the keys the reference registers regardless of flags (see module
    docstring) with identity/zero values, so strict=True loads succeed for
    flag-off configs too."""
    d, h = cfg.d_model, cfg.d_inner

    def fill(key: str, arr: np.ndarray):
        sd.setdefault(key, arr)

    fill("layer_norm.weight", np.ones(d, np.float32))
    fill("layer_norm.bias", np.zeros(d, np.float32))
    for i in range(cfg.n_layers):
        p = f"layer_stack.{i}."
        fill(p + "slf_attn.layer_norm.weight", np.ones(d, np.float32))
        fill(p + "slf_attn.layer_norm.bias", np.zeros(d, np.float32))
        fill(p + "pos_ffn.layer_norm.weight", np.ones(d, np.float32))
        fill(p + "pos_ffn.layer_norm.bias", np.zeros(d, np.float32))
        # unused when ffn_need=False, but registered by the reference
        fill(p + "pos_ffn.w_1.weight", np.zeros((h, d), np.float32))
        fill(p + "pos_ffn.w_1.bias", np.zeros(h, np.float32))
        fill(p + "pos_ffn.w_2.weight", np.zeros((d, h), np.float32))
        fill(p + "pos_ffn.w_2.bias", np.zeros(d, np.float32))


def export_head(head_params: dict, kind: str) -> Dict[str, np.ndarray]:
    """Flax head subtree -> reference Regressor/Classifier state_dict.
    The reference heads are one nn.Sequential attribute named after the
    module (models/Regressor.py:6, models/Classifier.py:7); Linears sit at
    Sequential indices 0/3/5."""
    if kind not in ("regressor", "classifier"):
        raise ValueError(f"unknown head kind {kind!r}")
    linear_to_seq = {"linear_0": "0", "linear_1": "3", "linear_2": "5"}
    sd: Dict[str, np.ndarray] = {}
    for name, leaf in head_params["mlp"].items():
        seq = linear_to_seq[name]
        sd[f"{kind}.{seq}.weight"] = _np(leaf["kernel"]).T
        sd[f"{kind}.{seq}.bias"] = _np(leaf["bias"])
    return sd


def save_torch_checkpoint(params: dict, encoder_path: str, head_path: str,
                          head_kind: str,
                          encoder_cfg: Optional[EncoderConfig] = None):
    """Write the {'encoder','head'} param tree as the two torch .ckpt files
    the reference's evaluation and pseudo-label scripts load."""
    import torch

    # np.array copies: jax-backed leaves are non-writable views, which
    # torch.from_numpy warns about
    enc_sd = {k: torch.from_numpy(np.array(v))
              for k, v in export_encoder(params["encoder"],
                                         encoder_cfg).items()}
    head_sd = {k: torch.from_numpy(np.array(v))
               for k, v in export_head(params["head"], head_kind).items()}
    torch.save(enc_sd, encoder_path)
    torch.save(head_sd, head_path)
