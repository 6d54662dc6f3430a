"""PyTorch state_dict -> flax param tree importer.

Lets the reference's released checkpoints (README.md:51-59, e.g.
``shanghaitech_temporal_model_oneCrop_I3D_RGB_0.9779.ckpt``) be re-scored on
TPU for metric parity.

Key mapping (torch Linear weights are [out, in]; flax Dense kernels are
[in, out] -> transpose):

  layer_stack.{i}.slf_attn.w_qs.weight      -> layer_{i}/slf_attn/w_qs/kernel^T
  layer_stack.{i}.slf_attn.fc.weight        -> layer_{i}/slf_attn/fc/kernel^T
  layer_stack.{i}.slf_attn.layer_norm.*     -> .../layer_norm/{scale,bias}
  layer_stack.{i}.slf_attn.relative_position_bias_table -> same orientation
  layer_stack.{i}.pos_ffn.w_{1,2}.{weight,bias} -> .../pos_ffn/w_{1,2}/*
  layer_stack.{i}.pos_ffn.layer_norm.*      -> .../pos_ffn/layer_norm/*
  layer_norm.*      (encoder input LN)      -> input_layer_norm/* (if used)
  cls_token / position_enc                  -> same names
  {classifier|regressor}.{0,3,5}.*          -> mlp/linear_{0,1,2}/*

``relative_position_index`` buffers are dropped (recomputed statically).
A DataParallel "module." prefix is stripped (the reference's loaders do the
same, Train/pseudo_labels_generator_spatio.py:28-32).  Like the reference's
``load_state_dict(..., strict=False)``, unknown torch keys are ignored and
missing ones keep their current (freshly initialized) values — but both are
reported so silent drift is visible.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = v.detach().cpu().numpy()
    return out


def _assign(tree: dict, path: Tuple[str, ...], value: np.ndarray,
            report: dict):
    node = tree
    for p in path[:-1]:
        if not isinstance(node, dict) or p not in node:
            report["skipped"].append("/".join(path))
            return
        node = node[p]
    leaf = path[-1]
    if not isinstance(node, dict) or leaf not in node:
        report["skipped"].append("/".join(path))
        return
    current = node[leaf]
    if tuple(current.shape) != tuple(value.shape):
        raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                         f"{current.shape} vs {value.shape}")
    node[leaf] = value.astype(np.asarray(current).dtype)
    report["loaded"].append("/".join(path))


def import_encoder(sd: Dict[str, np.ndarray], enc_params: dict,
                   report: dict) -> dict:
    """Merge a torch Encoder state_dict into a (copied) flax param subtree."""
    import copy

    out = copy.deepcopy(enc_params)
    for key, val in sd.items():
        parts = key.split(".")
        if parts[-1] == "relative_position_index":
            continue
        if parts[0] == "layer_stack":
            i = parts[1]
            sub = parts[2]            # slf_attn | pos_ffn
            name = parts[3]           # w_qs | fc | layer_norm | w_1 | ...
            if name == "relative_position_bias_table":
                _assign(out, (f"layer_{i}", sub, name), val, report)
            elif parts[-1] == "weight" and name != "layer_norm":
                _assign(out, (f"layer_{i}", sub, name, "kernel"), val.T,
                        report)
            elif parts[-1] == "bias" and name != "layer_norm":
                _assign(out, (f"layer_{i}", sub, name, "bias"), val, report)
            elif name == "layer_norm":
                leaf = "scale" if parts[-1] == "weight" else "bias"
                _assign(out, (f"layer_{i}", sub, "layer_norm", leaf), val,
                        report)
            else:
                report["skipped"].append(key)
        elif parts[0] == "layer_norm":
            leaf = "scale" if parts[-1] == "weight" else "bias"
            _assign(out, ("input_layer_norm", leaf), val, report)
        elif parts[0] in ("cls_token", "position_enc"):
            _assign(out, (parts[0],), val, report)
        else:
            report["skipped"].append(key)
    return out


def import_head(sd: Dict[str, np.ndarray], head_params: dict,
                report: dict) -> dict:
    """Merge a torch Regressor/Classifier state_dict (Sequential indices
    0/3/5 are the three Linears) into the flax head subtree."""
    import copy

    out = copy.deepcopy(head_params)
    seq_to_linear = {"0": "linear_0", "3": "linear_1", "5": "linear_2"}
    for key, val in sd.items():
        parts = key.split(".")
        if len(parts) == 3 and parts[1] in seq_to_linear:
            linear = seq_to_linear[parts[1]]
            if parts[2] == "weight":
                _assign(out, ("mlp", linear, "kernel"), val.T, report)
            else:
                _assign(out, ("mlp", linear, "bias"), val, report)
        else:
            report["skipped"].append(key)
    return out


def import_torch_checkpoint(encoder_path: str, head_path: str,
                            params: dict) -> Tuple[dict, dict]:
    """Full import: {'encoder', 'head'} param tree + report."""
    report = {"loaded": [], "skipped": []}
    out = {
        "encoder": import_encoder(load_torch_state_dict(encoder_path),
                                  params["encoder"], report),
        "head": import_head(load_torch_state_dict(head_path),
                            params["head"], report),
    }
    return out, report
