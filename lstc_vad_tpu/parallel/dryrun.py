"""Multi-chip dry run: jit the FULL multi-chip surface over an n-device mesh
with real dp x tp shardings and execute it on tiny shapes — the training
step (fwd + bwd + two-group Adagrad), the sharded batched EVAL path
(PartScorer.score_videos through VideoScorer._dispatch's mesh branch, i.e.
the semantics of Test/evaluation_shanghaitech_ubnormal.py:70-95 under
GSPMD), and a pseudo-label generation pass (the co-teaching hand-off).

Used by __graft_entry__.dryrun_multichip (driver validation on a virtual CPU
mesh) and by tests/test_parallel.py.  The model is dimensionally small but
structurally identical to the flagship (3-D relative PE, both residual LNs,
classifier head), so every sharding rule is exercised.
"""

from __future__ import annotations

import jax
import numpy as np

from ..config import (DataConfig, EncoderConfig, HeadConfig, LossConfig,
                      OptimConfig, TrainConfig)
from ..train.state import create_train_state
from ..train.steps import make_ltn_train_step
from .mesh import batch_sharding, factor_devices, make_mesh, state_shardings


def tiny_ltn_config(n_head: int = 8, batch_size: int = 8) -> TrainConfig:
    part_len, n_patch = 3, 4
    return TrainConfig(
        model="ltn",
        encoder=EncoderConfig(d_model=64, d_inner=128, n_head=n_head,
                              d_k=16, d_v=16, n_layers=2,
                              mha_layernorm=True, ffn_layernorm=True,
                              relative_pe=True, window_size=4,
                              window_depth=part_len, attn_impl="xla"),
        head=HeadConfig(kind="classifier", d_model=64, hidden_dim=32),
        data=DataConfig(n_patch=n_patch, part_num=4, part_len=part_len,
                        d_model=64, batch_size=batch_size),
        optim=OptimConfig(clip_grad=True),
        loss=LossConfig(),
        donate=False,
    )


def run_multichip_step(n_devices: int, devices=None,
                       batch_size: int | None = None,
                       return_state: bool = False):
    """Build an (data x model) mesh over ``n_devices``, shard state + batch,
    run ONE full LTN train step (fwd+bwd+Adagrad).  Returns the metrics
    (plus (state, encoder, head, mesh, cfg) when ``return_state`` — the
    sharded artifacts the eval/pseudo surface below continues from)."""
    data_ax, model_ax = factor_devices(n_devices)
    mesh = make_mesh(data_ax, model_ax, devices=devices)
    # one normal+abnormal pair per data-parallel shard
    if batch_size is None:
        batch_size = max(2 * data_ax, 2)
    cfg = tiny_ltn_config(batch_size=batch_size)

    state, encoder, head, tx = create_train_state(cfg)
    step_fn = make_ltn_train_step(encoder, head, cfg, tx)

    state = jax.device_put(state, state_shardings(state, mesh))

    d = cfg.data
    b = cfg.data.batch_size
    rng = np.random.default_rng(0)
    shape = (b, d.part_num * d.part_len, d.n_patch, cfg.encoder.d_model)
    bshard = batch_sharding(mesh)
    norm = jax.device_put(rng.standard_normal(shape, dtype=np.float32), bshard)
    abnorm = jax.device_put(rng.standard_normal(shape, dtype=np.float32),
                            bshard)
    labs = jax.device_put(
        rng.random((b, d.part_num * d.part_len)).astype(np.float32), bshard)

    state, metrics = step_fn(state, norm, labs, abnorm, labs)
    jax.block_until_ready(metrics)
    out = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(out["loss"]), out
    if return_state:
        return out, (state, encoder, head, mesh, cfg)
    return out


class _ArrayStore:
    """Minimal in-memory FeatureStore for the pseudo-gen dry run."""

    def __init__(self, feats: dict):
        self._feats = feats

    def get(self, key):
        return self._feats[key]

    def n_clips(self, key):
        return len(self._feats[key])


def run_multichip_surface(n_devices: int, devices=None,
                          batch_size: int | None = None) -> dict:
    """The FULL multi-chip surface on one mesh: train step, then the sharded
    batched eval path (PartScorer.score_videos -> frame AUC, the semantics
    of Test/evaluation_shanghaitech_ubnormal.py:70-95 under GSPMD — tp-
    sharded params, dp-sharded part batches), then an LTN pseudo-label
    generation pass (tail fed short, the co-teaching hand-off).  Returns
    {'loss', 'eval_auc', 'n_pseudo_videos', 'pseudo'}; asserts everything
    finite.  Pass a common ``batch_size`` to make runs on different meshes
    comparable (see ``assert_surface_matches``)."""
    from ..data.annotations import TrainRecord
    from ..evaluation.drivers import evaluate_ltn
    from ..evaluation.scoring import PartScorer
    from ..pseudo.generator import generate_ltn_pseudo_labels

    metrics, (state, encoder, head, mesh, cfg) = run_multichip_step(
        n_devices, devices=devices, batch_size=batch_size,
        return_state=True)
    d = cfg.data
    bshard = batch_sharding(mesh)
    rng = np.random.default_rng(1)

    # eval: ragged synthetic videos (tail re-window + short-video edges all
    # exercised) scored through the mesh-sharded dispatch
    scorer = PartScorer(encoder, head, d.part_len, d.n_patch, sharding=bshard)
    items = []
    for n_clips in (2 * d.part_len + 1, 5 * d.part_len, d.part_len - 1):
        feats = rng.standard_normal(
            (n_clips, d.n_patch, cfg.encoder.d_model)).astype(np.float32)
        anno = (rng.random(n_clips * 16) < 0.5).astype(np.float64)
        items.append((feats, anno))
    auc = evaluate_ltn(state.params, scorer, items)
    assert np.isfinite(auc), auc

    # pseudo generation: the no-re-window scorer over a tiny store
    gen_scorer = PartScorer(encoder, head, d.part_len, d.n_patch,
                            tail_rewindow=False, sharding=bshard)
    store = _ArrayStore({
        f"v{i}": rng.standard_normal(
            (n, d.n_patch, cfg.encoder.d_model)).astype(np.float32)
        for i, n in enumerate((2 * d.part_len, 3 * d.part_len + 2))})
    records = [TrainRecord("v0", False), TrainRecord("v1", True)]
    threshold = 0.4
    pseudo = generate_ltn_pseudo_labels(state.params, gen_scorer, store,
                                        records, threshold=threshold)
    assert set(pseudo) == {"v0.npy", "v1.npy"}
    for key, scores in pseudo.items():
        assert len(scores) == store.n_clips(key[:-4]), (key, len(scores))
        assert np.all(np.isfinite(scores)), key

    return {"loss": metrics["loss"], "eval_auc": float(auc),
            "n_pseudo_videos": len(pseudo),
            "pseudo_threshold": threshold,
            "pseudo": {k: np.asarray(v) for k, v in pseudo.items()}}


def assert_surface_matches(base: dict, out: dict, label: str = "") -> None:
    """Assert two ``run_multichip_surface`` results (same seeds, same
    ``batch_size``, different meshes) agree: GSPMD partitioning must only
    change layout, never the math (the DP semantics of
    /root/reference/Train/spatio_transformer_shanghaitech.py:69-71 —
    replicas do not change results).  Tolerances allow f32 reduction-order
    noise only; a wrong sharding rule moves loss/scores far beyond them."""
    lb, lo = base["loss"], out["loss"]
    assert abs(lo - lb) <= 1e-4 * max(abs(lb), 1e-8), (
        f"{label}: sharded loss {lo!r} != single-device loss {lb!r}")
    assert abs(out["eval_auc"] - base["eval_auc"]) <= 5e-3, (
        f"{label}: sharded eval AUC {out['eval_auc']!r} != "
        f"single-device {base['eval_auc']!r}")
    assert set(out["pseudo"]) == set(base["pseudo"]), label
    thr = base.get("pseudo_threshold", 0.4)
    for key in base["pseudo"]:
        a, b = base["pseudo"][key], out["pseudo"][key]
        close = np.isclose(a, b, rtol=1e-3, atol=1e-4)
        # pseudo labels are THRESHOLDED (score-or-0): a score within f32
        # reduction noise of the threshold may legitimately zero on one
        # mesh and not the other — that straddle is not a sharding bug
        straddle = (((a == 0) | (b == 0))
                    & (np.abs(np.maximum(a, b) - thr) < 1e-3))
        assert np.all(close | straddle), (
            f"{label}: pseudo labels for {key} diverge under sharding: "
            f"{a} vs {b}")
