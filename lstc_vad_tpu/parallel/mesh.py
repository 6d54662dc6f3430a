"""Device mesh + sharding: data parallel x tensor parallel over ICI.

The reference's only parallelism is single-process nn.DataParallel
(Train/spatio_transformer_shanghaitech.py:69-71, replicate-scatter-gather).
Here parallelism is declarative: a 2-D ('data', 'model') jax Mesh; batches
sharded on 'data'; attention-head and FFN-hidden dimensions sharded on
'model'.  XLA GSPMD inserts the all-reduces (gradient sync over 'data',
activation collectives over 'model') — no user-level communication code, and
they ride ICI on a real slice (SURVEY §2.8).

Pipeline/sequence/expert parallelism are deliberately absent: the model is a
3-layer encoder over <=~81 tokens (SURVEY §5 'long-context') — the scalable
axes are batch (dp) and the d_model=2048/d_inner=4096 contractions (tp).

Multi-host: the same mesh built over jax.devices() after
jax.distributed.initialize() extends dp over DCN unchanged.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def factor_devices(n: int, n_head: int = 8, max_model: int = 4) -> Tuple[int, int]:
    """Split n devices into (data, model).  The model axis must divide the
    head count (attention heads shard evenly) and is the largest power of 2
    <= max_model that still leaves data >= 2 whenever n >= 4; the REST goes
    to data: the batch is the embarrassingly-parallel scalable axis of this
    workload (docs/ARCHITECTURE.md 'Parallelism'), while tp profit saturates
    once the d_model=2048/d_inner=4096 contractions stop amortizing the
    per-layer activation collectives — so tp caps at 4 and dp absorbs
    growth: 4 -> (2, 2), 8 -> (2, 4), 16 -> (4, 4), 32 -> (8, 4)."""
    model = 1
    m = 2
    while m <= max_model and n % m == 0 and n_head % m == 0:
        if n // m >= 2 or n <= 2:
            model = m
        m *= 2
    return n // model, model


def make_mesh(data: int, model: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if devices.size < data * model:
        raise ValueError(f"need {data * model} devices, have {devices.size}")
    grid = devices[: data * model].reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis split over 'data', replicated over 'model'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# (regex on the param path) -> PartitionSpec.  First match wins.
_TP_RULES = (
    # attention input projections: [d_model, n_head*d_k] -> split heads
    (r"slf_attn/w_[qkv]s/kernel$", P(None, "model")),
    # attention output projection: [n_head*d_v, d_model] -> split input
    (r"slf_attn/fc/kernel$", P("model", None)),
    # relative position bias table: [table, n_head] -> split heads
    (r"relative_position_bias_table$", P(None, "model")),
    # FFN: hidden dim sharded
    (r"pos_ffn/w_1/kernel$", P(None, "model")),
    (r"pos_ffn/w_1/bias$", P("model")),
    (r"pos_ffn/w_2/kernel$", P("model", None)),
    # head MLP first layer: [d_model, hidden] -> split hidden
    (r"mlp/linear_0/kernel$", P(None, "model")),
    (r"mlp/linear_0/bias$", P("model")),
    (r"mlp/linear_1/kernel$", P("model", None)),
)


def param_sharding_rules(path: str) -> P:
    for pattern, spec in _TP_RULES:
        if re.search(pattern, path):
            return spec
    return P()  # replicate everything else (LNs, small biases, CLS/PE)


def _path_str(key_path) -> str:
    return "/".join(getattr(k, "key", str(k)) for k in key_path)


def tree_shardings(tree, mesh: Mesh):
    """NamedSharding pytree for a params-shaped tree using the TP rules."""
    return jax.tree_util.tree_map_with_path(
        lambda kp, _: NamedSharding(mesh, param_sharding_rules(_path_str(kp))),
        tree)


def shard_params(params, mesh: Mesh):
    """device_put the param tree with tp shardings over the mesh."""
    return jax.device_put(params, tree_shardings(params, mesh))


def state_shardings(state, mesh: Mesh):
    """Shardings for a full TrainState: params + optimizer accumulators get
    the param specs (Adagrad state mirrors params), scalars replicated."""
    def match(leaf_path, leaf):
        path = _path_str(leaf_path)
        if leaf is None:
            return None
        spec = param_sharding_rules(path)
        # only apply a non-trivial spec if the leaf has matching rank
        if spec != P() and getattr(leaf, "ndim", 0) < len(spec):
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(match, state)
