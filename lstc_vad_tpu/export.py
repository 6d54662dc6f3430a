"""AOT inference export: serialized StableHLO artifacts via ``jax.export``.

The reference deploys by shipping Python model code + torch checkpoints and
re-building modules at load time (Test/evaluation_shanghaitech_ubnormal.py:
35-62).  Here the full eval-path scorer program — encoder + head, the exact
math of ``evaluation.scoring.VideoScorer`` — is lowered once and serialized
together with its params into a single directory artifact:

    artifact/
      program_L{n}.bin   jax.export serialization, one per token length
      params.npz         flattened param leaves keyed by tree path
      meta.json          token_lens/d_model/head kind/l2 flag/platforms

Loading needs ONLY jax + numpy — no flax, no model code, no config, no
retrace: ``load_scorer(path)`` deserializes the programs and calls them.
The batch axis is exported symbolically, so one program serves every batch
size; several TOKEN lengths can be baked into one artifact (they are
genuinely distinct programs: the relative-position bias is sliced by the
actual sequence length, models/MultiHeadAttention.py:108 — this is how LTN
tail parts shorter than part_len are scored offline).  ``platforms=("tpu",
"cpu")`` (the default) makes the same artifact runnable on chip and in CPU
CI/serving hosts.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Sequence

import numpy as np

_META = "meta.json"
_PARAMS = "params.npz"


def _program_file(token_len: int) -> str:
    return f"program_L{token_len}.bin"


def _scorer_fn(encoder, head, kind: str, l2_normalize: bool):
    import jax.numpy as jnp

    def fn(params, x):
        if l2_normalize:
            norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
            x = x / jnp.maximum(norm, 1e-12)
        h = encoder.apply({"params": params["encoder"]}, x,
                          deterministic=True)
        out = head.apply({"params": params["head"]}, h[:, 0, :],
                         deterministic=True)
        return out[:, 1] if kind == "classifier" else out[:, 0]

    return fn


def _flatten_params(params) -> Dict[str, np.ndarray]:
    import jax

    flat = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_params(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for key, val in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def export_scorer(encoder, head, kind: str, params, token_len: int,
                  d_model: int, l2_normalize: bool = False,
                  platforms: Sequence[str] = ("tpu", "cpu")):
    """Lower the scorer to a shape-polymorphic ``jax.export.Exported``:
    input [b, token_len, d_model] with symbolic batch b."""
    import jax

    fn = _scorer_fn(encoder, head, kind, l2_normalize)
    (b,) = jax.export.symbolic_shape("b")
    x_spec = jax.ShapeDtypeStruct((b, token_len, d_model), np.float32)
    # shape/dtype only — never np.asarray(a), which would fetch the whole
    # param tree device->host once per exported token length
    p_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(
            np.shape(a), getattr(a, "dtype", None) or np.asarray(a).dtype),
        params)
    return jax.export.export(jax.jit(fn), platforms=list(platforms))(
        p_spec, x_spec)


def save_scorer_artifact(path: str, encoder, head, kind: str, params,
                         token_len: int, d_model: int,
                         l2_normalize: bool = False,
                         platforms: Sequence[str] = ("tpu", "cpu"),
                         extra_token_lens: Sequence[int] = (),
                         extra_meta: dict | None = None) -> None:
    """``extra_token_lens``: additional sequence lengths to bake in (e.g.
    LTN tail parts l*n_patch for l < part_len — distinct programs because
    the relative-PE index slices by length).  ``extra_meta``: merged into
    meta.json (e.g. n_patch/part_len so serving.StreamingScorer.from_artifact
    can reconstruct the clip layout)."""
    token_lens = sorted({token_len, *extra_token_lens})
    os.makedirs(path, exist_ok=True)
    for length in token_lens:
        exported = export_scorer(encoder, head, kind, params, length,
                                 d_model, l2_normalize, platforms)
        with open(os.path.join(path, _program_file(length)), "wb") as f:
            f.write(exported.serialize())
    np.savez(os.path.join(path, _PARAMS), **_flatten_params(params))
    with open(os.path.join(path, _META), "w") as f:
        json.dump({"token_len": token_len, "token_lens": token_lens,
                   "d_model": d_model, "kind": kind,
                   "l2_normalize": l2_normalize,
                   "platforms": list(platforms), **(extra_meta or {})},
                  f, indent=1)


class LoadedScorer:
    """A deserialized scorer artifact.  ``score(tokens[B, L, d]) -> [B]``
    for any baked-in token length L.

    Depends only on jax + numpy: the programs are already lowered, so the
    model code/config that produced them is not needed.  Batches are padded
    up to power-of-two buckets to bound the number of XLA compilations (each
    program is shape-polymorphic in the batch axis)."""

    def __init__(self, exported_by_len: dict, params: dict, meta: dict):
        import jax

        self.meta = meta
        self._params = params
        self._calls = {length: jax.jit(e.call)
                       for length, e in exported_by_len.items()}

    @property
    def token_lens(self):
        return sorted(self._calls)

    def score(self, tokens: np.ndarray) -> np.ndarray:
        n, length, d = tokens.shape
        call = self._calls.get(length)
        if call is None or d != self.meta["d_model"]:
            raise ValueError(
                f"tokens [{length}, {d}] do not match the exported programs "
                f"(token_lens={self.token_lens}, d_model="
                f"{self.meta['d_model']})")
        bucket = 1 << max(0, (n - 1)).bit_length()
        if bucket != n:
            pad = np.zeros((bucket - n, length, d), tokens.dtype)
            tokens = np.concatenate([tokens, pad], axis=0)
        return np.asarray(call(self._params, tokens))[:n]


def load_scorer(path: str) -> LoadedScorer:
    import jax

    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    exported = {}
    for length in meta.get("token_lens", [meta["token_len"]]):
        with open(os.path.join(path, _program_file(length)), "rb") as f:
            exported[length] = jax.export.deserialize(f.read())
    with np.load(os.path.join(path, _PARAMS)) as z:
        params = _unflatten_params({k: z[k] for k in z.files})
    return LoadedScorer(exported, params, meta)
