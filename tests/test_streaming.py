"""Streaming test-split evaluation: a UCF-scale split (many long videos)
must never be materialized in RAM at once — the scorers pull one lazy video
at a time through the chunk buffer (VERDICT round 1, item 5).

The SyntheticStore synthesizes features on demand and counts how many
feature arrays are alive concurrently (weakref.finalize fires on free), so
the assertion is deterministic: at most the current video + the one being
swapped in.
"""

import weakref

import jax
import numpy as np

from lstc_vad_tpu.config import EncoderConfig
from lstc_vad_tpu.data.datasets import TestVideo
from lstc_vad_tpu.evaluation.drivers import (evaluate_ltn, evaluate_stn,
                                             evaluate_ucf_ltn)
from lstc_vad_tpu.evaluation.scoring import (ClipScorer, PartScorer,
                                             UCFBinnedScorer)
from lstc_vad_tpu.models import Encoder, make_head

SMALL = dict(d_model=16, d_inner=24, n_head=2, d_k=8, d_v=8, n_layers=1,
             attn_impl="xla")


class SyntheticStore:
    """Feature store that fabricates [n_clips, n_patch, d] arrays on demand
    and tracks the number of concurrently-live ones."""

    def __init__(self, n_clips: int, n_patch: int, d: int):
        self._shape = (n_clips, n_patch, d)
        self.live = 0
        self.max_live = 0
        self.reads = 0

    def get(self, key, crop=None):
        rng = np.random.default_rng(abs(hash(key)) % 2**32)
        feat = rng.standard_normal(self._shape).astype(np.float32)
        self.reads += 1
        self.live += 1
        self.max_live = max(self.max_live, self.live)
        weakref.finalize(feat, self._freed)
        return feat

    def _freed(self):
        self.live -= 1

    def n_clips(self, key):
        return self._shape[0]


def _videos(store, n_videos, n_clips, segment_len=16):
    out = []
    for i in range(n_videos):
        key = f"v{i:03d}"
        anno = np.zeros(n_clips * segment_len)
        if i % 2:
            anno[::7] = 1.0
        out.append(TestVideo(key, anno, bool(i % 2), n_clips * segment_len,
                             n_clips, (lambda k=key: store.get(k))))
    return out


def _ltn_model():
    cfg = EncoderConfig(relative_pe=True, window_size=2, window_depth=3,
                        mha_layernorm=True, ffn_layernorm=True, **SMALL)
    enc = Encoder(cfg)
    head = make_head("classifier", 16, 8)
    params = {
        "encoder": enc.init(jax.random.PRNGKey(0),
                            np.zeros((1, 12, 16), np.float32))["params"],
        "head": head.init(jax.random.PRNGKey(1),
                          np.zeros((1, 16), np.float32))["params"]}
    return enc, head, params


def test_ltn_eval_streams_one_video_at_a_time():
    # 40 videos x 600 clips: eager materialization would hold 40 arrays
    store = SyntheticStore(n_clips=600, n_patch=4, d=16)
    videos = _videos(store, n_videos=40, n_clips=600)
    enc, head, params = _ltn_model()
    scorer = PartScorer(enc, head, part_len=3, n_patch=4)
    items = [(v.loader, v.anno) for v in videos]
    auc = evaluate_ltn(params, scorer, items)
    assert 0.0 <= auc <= 1.0
    assert store.reads == 40
    assert store.max_live <= 3, (
        f"{store.max_live} feature arrays alive at once — test split "
        "materialized instead of streamed")


def test_stn_eval_streams_one_video_at_a_time():
    store = SyntheticStore(n_clips=600, n_patch=4, d=16)
    videos = _videos(store, n_videos=40, n_clips=600)
    cfg = EncoderConfig(ffn_layernorm=True, **SMALL)
    enc = Encoder(cfg)
    head = make_head("regressor", 16, 8)
    params = {
        "encoder": enc.init(jax.random.PRNGKey(0),
                            np.zeros((1, 4, 16), np.float32))["params"],
        "head": head.init(jax.random.PRNGKey(1),
                          np.zeros((1, 16), np.float32))["params"]}
    scorer = ClipScorer(enc, head, n_patch=4)
    items = [(v.loader, v.anno) for v in videos]
    auc = evaluate_stn(params, scorer, items)
    assert 0.0 <= auc <= 1.0
    assert store.max_live <= 3


def test_ucf_ltn_eval_streams_one_video_at_a_time():
    # UCF-scale: 30 hour-scale videos; only the <=32-bin pooled form is kept
    store = SyntheticStore(n_clips=2000, n_patch=4, d=16)
    videos = _videos(store, n_videos=30, n_clips=2000)
    enc, head, params = _ltn_model()
    scorer = UCFBinnedScorer(enc, head, part_len=3, n_patch=4, max_clips=8,
                             l2_normalize=True, tail_rewindow=True)
    items = [(v.loader, v.anno, v.n_clips) for v in videos]
    auc = evaluate_ucf_ltn(params, scorer, items)
    assert 0.0 <= auc <= 1.0
    # binned scoring interleaves pooling with the read-ahead pipeline:
    # steady state is current + queued + worker-in-flight (3), plus one
    # transient raw array during the thread handoff — still O(1), vs the
    # O(n_videos) binned residency this bound exists to forbid
    assert store.max_live <= 4


def test_trainer_test_items_are_lazy(tmp_path):
    """Trainer._test_items must hand the scorers zero-arg loaders, not
    arrays (the driver-side half of the streaming contract)."""
    from fixtures import make_sht_like
    from lstc_vad_tpu.config import preset, replace
    from lstc_vad_tpu.train.driver import Trainer

    h5, train_txt, test_txt, mask_dir = make_sht_like(str(tmp_path),
                                                      n_patch=3, d_model=16)
    cfg = preset("sht_ltn", **{
        "encoder.d_model": 16, "encoder.d_inner": 24, "encoder.n_head": 2,
        "encoder.d_k": 8, "encoder.d_v": 8, "encoder.n_layers": 1,
        "encoder.window_size": 2, "head.d_model": 16, "head.hidden_dim": 8,
        "data.h5_path": h5, "data.test_txt": test_txt,
        "data.test_mask_dir": mask_dir, "data.n_patch": 3,
        "data.d_model": 16})
    trainer = Trainer(cfg, eval_only=True)
    items = trainer._test_items()
    assert items and all(callable(f) for f, _ in items)
    feat = items[0][0]()
    assert feat.ndim == 3


def test_testvideo_cache_memoizes_and_trainer_flags_it(tmp_path):
    """cache=True reads the store once and keeps the array (in-training
    eval residency); eval_only trainers stream (cache off)."""
    store = SyntheticStore(n_clips=20, n_patch=4, d=16)
    v = TestVideo("k", np.zeros(320), False, 320, 20,
                  lambda: store.get("k"), cache=True)
    a, b = v.feat, v.feat
    assert store.reads == 1 and a is b
    v2 = TestVideo("k", np.zeros(320), False, 320, 20,
                   lambda: store.get("k"))
    v2.feat, v2.feat
    assert store.reads == 3  # uncached: one read per access

    from fixtures import make_sht_like
    from lstc_vad_tpu.config import preset
    from lstc_vad_tpu.train.driver import Trainer
    h5, train_txt, test_txt, mask_dir = make_sht_like(str(tmp_path),
                                                      n_patch=3, d_model=16)
    small = {"encoder.d_model": 16, "encoder.d_inner": 24,
             "encoder.n_head": 2, "encoder.d_k": 8, "encoder.d_v": 8,
             "encoder.n_layers": 1, "encoder.window_size": 2,
             "head.d_model": 16, "head.hidden_dim": 8, "data.h5_path": h5,
             "data.test_txt": test_txt, "data.test_mask_dir": mask_dir,
             "data.n_patch": 3, "data.d_model": 16}
    eval_tr = Trainer(preset("sht_ltn", **small), eval_only=True)
    assert all(not v.cache for v in eval_tr.test_videos)
    train_tr = Trainer(preset("sht_ltn", **{**small,
                                            "data.train_txt": train_txt}))
    assert all(v.cache for v in train_tr.test_videos)  # eager preset


class SyntheticTenCropStore(SyntheticStore):
    """tenCrop layout: 4-D [n_clips, 10, n_patch, d] arrays on demand."""

    def __init__(self, n_clips: int, n_patch: int, d: int):
        super().__init__(n_clips, n_patch, d)
        self._shape = (n_clips, 10, n_patch, d)


def test_multicrop_mean_eval_streams_per_crop(tmp_path):
    """--eval-crop mean semantics: crop-major iteration with per-crop lazy
    reads — each video's 4-D tenCrop array is re-read per crop pass and
    freed as soon as its crop slice is copied out, so peak residency stays
    near ONE video (VERDICT r2: the cache=True loop pinned the whole split's
    10-crop arrays)."""
    from lstc_vad_tpu.data.datasets import TestVideo
    from lstc_vad_tpu.evaluation.drivers import evaluate_multicrop_mean

    store = SyntheticTenCropStore(n_clips=60, n_patch=4, d=16)
    n_videos = 12
    videos = []
    for i in range(n_videos):
        key = f"v{i:03d}"
        anno = np.zeros(60 * 16)
        if i % 2:
            anno[::7] = 1.0
        videos.append(TestVideo(key, anno, bool(i % 2), 60 * 16, 60,
                                (lambda k=key: store.get(k))))
    enc, head, params = _ltn_model()
    scorer = PartScorer(enc, head, part_len=3, n_patch=4)

    def items_for_crop(c):
        # mirrors cmd_evaluate's items_for_crop: lazy re-read, crop slice
        return [((lambda v=v, c=c: v.feat[:, c]), v.anno) for v in videos]

    auc = evaluate_multicrop_mean(evaluate_ltn, params, scorer,
                                  items_for_crop)
    assert 0.0 <= auc <= 1.0
    assert store.reads == 10 * n_videos  # one lazy read per (crop, video)
    assert store.max_live <= 3, (
        f"{store.max_live} tenCrop arrays alive at once — the 10-crop eval "
        "materialized the split instead of streaming")


def test_read_ahead_propagates_loader_errors():
    """A failing lazy loader (missing h5 key, truncated file) surfaces in
    the caller, not silently in the reader thread."""
    import pytest

    from lstc_vad_tpu.evaluation.scoring import _read_ahead

    def boom():
        raise KeyError("missing_video.npy")

    good = np.zeros((4, 2, 8), np.float32)
    it = _read_ahead([lambda: good, boom, lambda: good])
    np.testing.assert_array_equal(next(it), good)
    with pytest.raises(KeyError, match="missing_video"):
        list(it)


def test_read_ahead_bounds_live_arrays():
    """depth=1 read-ahead keeps at most current + next arrays alive."""
    from lstc_vad_tpu.evaluation.scoring import _read_ahead

    store = SyntheticStore(n_clips=50, n_patch=4, d=16)
    loaders = [(lambda k=f"v{i}": store.get(k)) for i in range(20)]
    for feats in _read_ahead(loaders):
        assert feats.shape == (50, 4, 16)
        del feats
    assert store.reads == 20
    assert store.max_live <= 3


def test_read_ahead_releases_on_abandoned_consumer():
    """An abandoned generator (scoring exception mid score_videos, early
    close) must stop the reader thread and free every parked array — the
    worker previously blocked forever on a full queue, pinning depth+1
    resolved feature arrays for the process lifetime."""
    import gc
    import threading
    import time

    from lstc_vad_tpu.evaluation.scoring import _read_ahead

    before = set(threading.enumerate())
    resolved = []

    def loader(i):
        def f():
            a = np.full((1000, 4, 4), float(i), np.float32)
            resolved.append(weakref.ref(a))
            return a
        return f

    gen = _read_ahead([loader(i) for i in range(10)], depth=1)
    first = next(gen)
    gen.close()  # consumer abandons: stop is signalled, queue drained
    del first

    deadline = time.time() + 5.0
    while set(threading.enumerate()) - before and time.time() < deadline:
        time.sleep(0.05)
    assert not (set(threading.enumerate()) - before), \
        "reader thread still alive after consumer abandoned"
    gc.collect()
    alive = sum(1 for r in resolved if r() is not None)
    assert alive == 0, f"{alive} resolved arrays still pinned"
    # the worker never raced far past the abandoned consumer
    assert len(resolved) <= 4, resolved
