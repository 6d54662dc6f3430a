"""Evaluation drivers on fixture data: UCF binned paths, per-class breakdown,
and UCF STN bin expansion semantics."""

import numpy as np
import pytest

from lstc_vad_tpu.config import EncoderConfig
from lstc_vad_tpu.data import FeatureStore, load_test_videos
from lstc_vad_tpu.data.annotations import parse_ucf_test
from lstc_vad_tpu.evaluation.drivers import (evaluate_ucf_ltn,
                                             evaluate_ucf_per_class,
                                             evaluate_ucf_stn)
from lstc_vad_tpu.evaluation.frame_auc import (ucf_bin_edges, ucf_bin_pool,
                                               ucf_part_plan)
from lstc_vad_tpu.evaluation.scoring import UCFBinnedScorer, UCFClipBinScorer
from lstc_vad_tpu.models import Encoder, make_head

from fixtures import make_ucf_like

import jax

SMALL = dict(d_model=16, d_inner=24, n_head=2, d_k=8, d_v=8, n_layers=1,
             attn_impl="xla")


@pytest.fixture(scope="module")
def ucf(tmp_path_factory):
    root = tmp_path_factory.mktemp("ucf")
    h5, train_txt, test_txt, gt_h5 = make_ucf_like(str(root), n_patch=3,
                                                   d_model=16)
    store = FeatureStore(h5)
    videos = load_test_videos("UCF", test_txt, store, mask_h5=gt_h5)
    records = parse_ucf_test(test_txt)
    return videos, records


@pytest.fixture(scope="module")
def ltn_model():
    cfg = EncoderConfig(relative_pe=True, window_size=4, window_depth=2,
                        mha_layernorm=True, ffn_layernorm=True, **SMALL)
    enc = Encoder(cfg)
    head = make_head("classifier", 16, 8)
    params = {
        "encoder": enc.init(jax.random.PRNGKey(0),
                            np.zeros((1, 6, 16), np.float32))["params"],
        "head": head.init(jax.random.PRNGKey(1),
                          np.zeros((1, 16), np.float32))["params"]}
    return enc, head, params


def test_ucf_ltn_final_eval(ucf, ltn_model):
    videos, _ = ucf
    enc, head, params = ltn_model
    scorer = UCFBinnedScorer(enc, head, part_len=2, n_patch=3, max_clips=8,
                             l2_normalize=True, tail_rewindow=True)
    items = [(v.feat, v.anno, v.n_frames // 16) for v in videos]
    auc = evaluate_ucf_ltn(params, scorer, items)
    assert 0.0 <= auc <= 1.0


def test_ucf_ltn_training_eval_flags(ucf, ltn_model):
    videos, _ = ucf
    enc, head, params = ltn_model
    scorer = UCFBinnedScorer(enc, head, part_len=2, n_patch=3, max_clips=8,
                             l2_normalize=False, tail_rewindow=False,
                             adaptive_bins=True)
    items = [(v.feat, v.anno, v.feat.shape[0]) for v in videos]
    auc = evaluate_ucf_ltn(params, scorer, items)
    assert 0.0 <= auc <= 1.0


def test_ucf_per_class(ucf, ltn_model):
    videos, records = ucf
    enc, head, params = ltn_model
    scorer = UCFBinnedScorer(enc, head, part_len=2, n_patch=3, max_clips=8)
    items = [(v.feat, v.anno, v.n_frames // 16) for v in videos]
    classes = [r.class_name for r in records]
    far, mean_ap = evaluate_ucf_per_class(params, scorer, items, classes,
                                          n_anomaly_classes=1)
    assert 0.0 <= far <= 1.0
    assert mean_ap > 0.0


def test_ucf_stn_eval(ucf):
    videos, _ = ucf
    cfg = EncoderConfig(ffn_layernorm=True, **SMALL)
    enc = Encoder(cfg)
    head = make_head("regressor", 16, 8)
    params = {
        "encoder": enc.init(jax.random.PRNGKey(0),
                            np.zeros((1, 3, 16), np.float32))["params"],
        "head": head.init(jax.random.PRNGKey(1),
                          np.zeros((1, 16), np.float32))["params"]}
    scorer = UCFClipBinScorer(enc, head, n_patch=3, max_clips=8)
    items = [(v.feat, v.anno, v.n_frames // 16) for v in videos]
    auc = evaluate_ucf_stn(params, scorer, items)
    assert 0.0 <= auc <= 1.0


def test_ucf_bin_pool_empty_bins():
    feats = np.arange(3 * 2 * 4, dtype=np.float32).reshape(3, 2, 4)
    r = ucf_bin_edges(3, 8)  # more bins than clips -> empty bins
    binned = ucf_bin_pool(feats, r)
    assert binned.shape == (8,) + feats.shape[1:]
    # an empty bin re-uses the clip at its start
    for i in range(8):
        if r[i] == r[i + 1]:
            np.testing.assert_array_equal(binned[i], feats[r[i]])


def test_ucf_part_plan_tail_overlap():
    # 8 bins, part_len 3 -> parts (0,3), (3,6), tail re-windowed to (5,8)
    assert ucf_part_plan(8, 3) == [(0, 3), (3, 6), (5, 8)]
    assert ucf_part_plan(6, 3) == [(0, 3), (3, 6)]


def test_scorer_apply_cache_shared_across_instances(ltn_model):
    from lstc_vad_tpu.evaluation.scoring import VideoScorer
    enc, head, _ = ltn_model
    a = VideoScorer(enc, head, "classifier")
    b = VideoScorer(enc, head, "classifier")
    assert a._apply is b._apply  # same compiled program, no re-trace
    c = VideoScorer(enc, head, "classifier", l2_normalize=True)
    assert c._apply is not a._apply


def test_apply_cache_is_bounded():
    """The process-wide jitted-apply cache is a small LRU: a sweep over many
    encoder shapes cannot accumulate compiled programs for the whole process
    lifetime.  Eviction never invalidates a live scorer — each VideoScorer
    pins its own fn via cached_property."""
    from lstc_vad_tpu.evaluation import scoring

    first = scoring.VideoScorer(
        Encoder(EncoderConfig(**SMALL)), make_head("regressor", 16, 8),
        "regressor")
    pinned = first._apply  # enters the cache; instance keeps a strong ref
    for i in range(scoring._APPLY_CACHE_MAX + 5):
        cfg = EncoderConfig(**{**SMALL, "d_inner": 24 + 8 * i})
        s = scoring.VideoScorer(Encoder(cfg), make_head("regressor", 16, 8),
                                "regressor")
        s._apply  # touch: distinct config -> distinct cache entry
    assert len(scoring._APPLY_CACHE) <= scoring._APPLY_CACHE_MAX
    assert first._apply is pinned  # evicted from the LRU, still usable


def test_score_tokens_bucket_decomposition():
    """Batches far from a bucket size ship as exact-bucket prefix + rest
    (padding rows are real H2D bytes on a remote-attached chip); results
    are identical to the one-padded-call path, and small waste stays one
    call."""
    from lstc_vad_tpu.evaluation import scoring

    enc = Encoder(EncoderConfig(**SMALL))
    head = make_head("regressor", 16, 8)
    s = scoring.VideoScorer(enc, head, "regressor")
    real = s._apply
    sizes = []

    def recording(params, x):
        sizes.append(x.shape[0])
        return real(params, x)

    s.__dict__["_apply"] = recording  # override the cached_property
    params = {
        "encoder": enc.init(jax.random.PRNGKey(0),
                            np.zeros((1, 4, 16), np.float32))["params"],
        "head": head.init(jax.random.PRNGKey(1),
                          np.zeros((1, 16), np.float32))["params"]}
    rng = np.random.default_rng(0)
    tokens = rng.standard_normal((544, 4, 16)).astype(np.float32)

    got = s.score_tokens(params, tokens)
    assert sizes == [512, 32]  # 512 exact + 32 exact, NOT one padded 1024
    assert got.shape == (544,)

    sizes.clear()
    got_small = s.score_tokens(params, tokens[:17])
    assert sizes == [32]  # waste <= 256 rows: one padded call
    # per-row scores agree across batch sizes up to XLA tiling noise (the
    # same tolerance bucket padding always implied)
    np.testing.assert_allclose(got_small, got[:17], rtol=1e-5)

    # padding rows do not leak into real scores: one padded 1024-row call
    # (the pre-decomposition behavior) matches the decomposed result
    padded = np.concatenate([tokens, np.zeros((480, 4, 16), np.float32)])
    sizes.clear()
    ref = s.score_tokens(params, padded)[:544]
    assert sizes == [1024]
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_transfer_dtype_bf16_scores_close(tmp_path):
    """transfer_dtype='bfloat16' halves H2D bytes; the device upcasts and
    computes f32, so scores match the f32-wire path to bf16 input rounding
    (opt-in: eval defaults stay f32 for reference parity)."""
    import ml_dtypes

    from lstc_vad_tpu.evaluation import scoring

    enc = Encoder(EncoderConfig(**SMALL))
    head = make_head("regressor", 16, 8)
    params = {
        "encoder": enc.init(jax.random.PRNGKey(0),
                            np.zeros((1, 4, 16), np.float32))["params"],
        "head": head.init(jax.random.PRNGKey(1),
                          np.zeros((1, 16), np.float32))["params"]}
    rng = np.random.default_rng(1)
    tokens = rng.standard_normal((33, 4, 16)).astype(np.float32)

    f32 = scoring.VideoScorer(enc, head, "regressor")
    bf16 = scoring.VideoScorer(enc, head, "regressor",
                               transfer_dtype="bfloat16")
    # spy on the batch actually handed to the jitted apply: the bf16 cast
    # must happen on host, BEFORE the H2D transfer
    sent = {}
    orig_apply = bf16._apply  # materialize the cached_property

    def spy_apply(p, t):
        sent.setdefault("dtype", np.asarray(t).dtype)
        return orig_apply(p, t)

    bf16.__dict__["_apply"] = spy_apply

    a = f32.score_tokens(params, tokens)
    b = bf16.score_tokens(params, tokens)
    assert sent["dtype"] == ml_dtypes.bfloat16
    np.testing.assert_allclose(a, b, atol=2e-2)
    assert not np.allclose(a, b, atol=1e-9)  # genuinely different wire dtype
    # the TRAIN wire knob (data.transfer_dtype) must NOT leak into eval
    # scorers: eval has its own opt-in (data.eval_transfer_dtype), so a
    # training throughput lever can never silently shift eval scores/AUC
    from fixtures import make_sht_like
    from lstc_vad_tpu.config import preset
    from lstc_vad_tpu.train.driver import Trainer
    h5, _, test_txt, mask_dir = make_sht_like(str(tmp_path), n_patch=3,
                                              d_model=16)
    small = {
        "encoder.d_model": 16, "encoder.d_inner": 24, "encoder.n_head": 2,
        "encoder.d_k": 8, "encoder.d_v": 8, "encoder.n_layers": 1,
        "encoder.window_size": 2, "head.d_model": 16, "head.hidden_dim": 8,
        "data.h5_path": h5, "data.test_txt": test_txt,
        "data.test_mask_dir": mask_dir, "data.n_patch": 3,
        "data.d_model": 16}
    tr = Trainer(preset("sht_ltn", **small,
                        **{"data.transfer_dtype": "bfloat16"}),
                 eval_only=True)
    assert tr.scorer.scorer.transfer_dtype == "float32"
    tr = Trainer(preset("sht_ltn", **small,
                        **{"data.eval_transfer_dtype": "bfloat16"}),
                 eval_only=True)
    assert tr.scorer.scorer.transfer_dtype == "bfloat16"


def test_eval_compute_stays_f32_under_bf16_training(tmp_path):
    """encoder.compute_dtype=bfloat16 (the recommended TRAIN throughput
    config) must not touch evaluation: the Trainer's eval scorers run an
    f32-compute encoder, so eval scores are bit-identical to an f32-config
    trainer holding the same params (reference parity — the torch eval
    scripts are f32 regardless of how training ran)."""
    from fixtures import make_sht_like
    from lstc_vad_tpu.config import preset
    from lstc_vad_tpu.train.driver import Trainer

    h5, _, test_txt, mask_dir = make_sht_like(str(tmp_path), n_patch=3,
                                              d_model=16)
    small = {
        "encoder.d_model": 16, "encoder.d_inner": 24, "encoder.n_head": 2,
        "encoder.d_k": 8, "encoder.d_v": 8, "encoder.n_layers": 1,
        "encoder.window_size": 2, "head.d_model": 16, "head.hidden_dim": 8,
        "data.h5_path": h5, "data.test_txt": test_txt,
        "data.test_mask_dir": mask_dir, "data.n_patch": 3,
        "data.d_model": 16}
    tr_bf16 = Trainer(preset(
        "sht_ltn", **small,
        **{"encoder.compute_dtype": "bfloat16", "encoder.remat": True}),
        eval_only=True)
    tr_f32 = Trainer(preset("sht_ltn", **small), eval_only=True)
    assert tr_bf16.eval_encoder.cfg.compute_dtype == "float32"
    assert tr_bf16.eval_encoder.cfg.remat is False
    # identical params -> bit-identical eval (shared f32 program)
    tr_bf16.state = tr_bf16.state.replace(params=tr_f32.state.params)
    assert tr_bf16.evaluate("test") == tr_f32.evaluate("test")


def test_part_scorer_double_buffers_dispatches():
    """Cross-video scoring overlaps transfer with compute: chunk N+1 is
    DISPATCHED before chunk N's scores are fetched (bounded at 2 in-flight
    device batches), and results land in order."""
    from lstc_vad_tpu.evaluation import scoring

    cfg = EncoderConfig(relative_pe=True, window_size=2, window_depth=3,
                        mha_layernorm=True, ffn_layernorm=True, **SMALL)
    enc = Encoder(cfg)
    head = make_head("classifier", 16, 8)
    params = {
        "encoder": enc.init(jax.random.PRNGKey(0),
                            np.zeros((1, 12, 16), np.float32))["params"],
        "head": head.init(jax.random.PRNGKey(1),
                          np.zeros((1, 16), np.float32))["params"]}
    scorer = scoring.PartScorer(enc, head, part_len=3, n_patch=4)
    events = []
    real_async = scorer.scorer.score_tokens_async

    def spy_async(p, tokens):
        i = len([e for e in events if e[0] == "dispatch"])
        events.append(("dispatch", i))
        resolve = real_async(p, tokens)

        def wrapped():
            events.append(("resolve", i))
            return resolve()

        return wrapped

    scorer.scorer.score_tokens_async = spy_async
    rng = np.random.default_rng(0)
    # 3 videos x 1700 parts -> 5100 full parts = 2 full 2048-chunks + tail
    feats = [rng.standard_normal((5100, 4, 16)).astype(np.float32)
             for _ in range(3)]
    results = scorer.score_videos(params, feats)
    assert len(results) == 3 and all(len(s) == 1700 for s, _ in results)
    assert ("dispatch", 1) in events and ("resolve", 0) in events
    # chunk 1 dispatched BEFORE chunk 0 resolved: transfer/compute overlap
    assert events.index(("dispatch", 1)) < events.index(("resolve", 0))
    # FIFO: resolutions happen in dispatch order
    resolves = [i for kind, i in events if kind == "resolve"]
    assert resolves == sorted(resolves)

    # numerics identical to the unpipelined single-video path
    direct, _ = scorer.score_video(params, feats[0])
    np.testing.assert_allclose(results[0][0], direct, rtol=1e-5)


def test_score_videos_shorts_grouped_by_length():
    """Short tails across videos are scored in per-length batches (one
    score_tokens call per distinct tail length), never one synchronous
    batch-1 call per video — and bit-match the per-video path."""
    from lstc_vad_tpu.evaluation import scoring

    cfg = EncoderConfig(relative_pe=True, window_size=5, window_depth=3,
                        mha_layernorm=True, ffn_layernorm=True, **SMALL)
    enc = Encoder(cfg)
    head = make_head("classifier", 16, 8)
    params = {
        "encoder": enc.init(jax.random.PRNGKey(0),
                            np.zeros((1, 12, 16), np.float32))["params"],
        "head": head.init(jax.random.PRNGKey(1),
                          np.zeros((1, 16), np.float32))["params"]}
    scorer = scoring.PartScorer(enc, head, part_len=3, n_patch=4,
                                tail_rewindow=False)
    rng = np.random.default_rng(1)
    # 8 videos, tails of 1 or 2 clips (never 0): 2 distinct tail lengths
    feats = [rng.standard_normal((6 + 1 + (v % 2), 4, 16))
             .astype(np.float32) for v in range(8)]
    sync_calls = []
    real = scorer.scorer.score_tokens
    scorer.scorer.score_tokens = (
        lambda p, t: (sync_calls.append(t.shape), real(p, t))[1])
    batched = scorer.score_videos(params, feats)
    assert len(sync_calls) == 2  # one per distinct tail length, not 8
    scorer.scorer.score_tokens = real
    for (s, c), f in zip(batched, feats):
        s1, c1 = scorer.score_video(params, f)
        # tails ride a different batch/bucket padding than the per-video
        # path: same program, float-level reduction-order differences only
        np.testing.assert_allclose(s, s1, atol=1e-6)
        np.testing.assert_array_equal(c, c1)


def test_empty_eval_raises_clearly(ltn_model):
    """Zero test items is a clear 'no videos to evaluate' error, not an
    obscure np.concatenate ValueError."""
    from lstc_vad_tpu.evaluation.drivers import evaluate_ltn
    from lstc_vad_tpu.evaluation.scoring import PartScorer

    enc, head, params = ltn_model
    scorer = PartScorer(enc, head, part_len=2, n_patch=3)
    with pytest.raises(ValueError, match="no videos to evaluate"):
        evaluate_ltn(params, scorer, [])
