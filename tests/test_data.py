"""Data pipeline: parsers, sampler arithmetic, paired dataset, prefetch."""

import numpy as np
import pytest

from lstc_vad_tpu.data import (BatchIterator, FeatureStore, PairedTrainDataset,
                               Prefetcher, load_test_videos,
                               parse_sht_test, parse_sht_train,
                               parse_ubnormal, parse_ucf_test, parse_ucf_train)
from lstc_vad_tpu.data.datasets import load_train_records
from lstc_vad_tpu.data.sampler import maybe_double_short, sample_part_indices

from fixtures import make_sht_like, make_ubnormal_like, make_ucf_like


# ---------------------------------------------------------------- sampler

class FixedRng:
    """np.random.Generator stand-in returning scripted integers."""

    def __init__(self, values):
        self.values = list(values)

    def integers(self, low, high=None, size=None):
        v = self.values.pop(0)
        if size is None:
            return v
        return np.full(size, v, dtype=int)


def reference_uniform(feat_len, part_num, part_len, move):
    chosen = np.linspace(0, feat_len - part_len, num=part_num + 1,
                         dtype=int) + move
    chosen = chosen.repeat(part_len).reshape([-1, part_len]) \
        + np.arange(0, part_len, 1, dtype=int)
    return chosen.reshape([-1])[:part_num * part_len]


@pytest.mark.parametrize("feat_len,part_num,part_len", [
    (100, 16, 7), (30, 16, 3), (12, 16, 7), (7, 16, 7), (40, 4, 5)])
def test_uniform_matches_reference_arithmetic(feat_len, part_num, part_len):
    bound = (feat_len - part_len) // (part_num + 1)
    move = bound - 1 if bound >= 1 else 0  # largest valid draw
    rng = FixedRng([move])
    idx = sample_part_indices(feat_len, part_num, part_len, "uniform", rng)
    expected = reference_uniform(feat_len, part_num, part_len, move)
    np.testing.assert_array_equal(idx, expected)
    assert idx.max() < feat_len and idx.min() >= 0


def test_random_mode_matches_reference_arithmetic():
    feat_len, part_num, part_len = 100, 8, 4
    anchors = np.linspace(0, feat_len - part_len, num=part_num + 1, dtype=int)
    stride = anchors[1] - anchors[0]
    move = 2
    assert stride > move
    rng = FixedRng([move])
    idx = sample_part_indices(feat_len, part_num, part_len, "random", rng)
    expected = (anchors.repeat(part_len).reshape(-1, part_len)
                + np.arange(part_len) + move).reshape(-1)[:part_num * part_len]
    np.testing.assert_array_equal(idx, expected)


def test_sampler_windows_are_consecutive(rng):
    idx = sample_part_indices(200, 16, 7, "random", rng)
    win = idx.reshape(16, 7)
    assert (np.diff(win, axis=1) == 1).all()
    assert idx.max() < 200


def test_sampler_uniform_shared_shift(rng):
    a = sample_part_indices(300, 16, 7, "uniform", rng).reshape(16, 7)
    base = np.linspace(0, 300 - 7, num=17, dtype=int)[:16]
    shift = a[:, 0] - base
    assert (shift == shift[0]).all()


def test_sampler_short_video_raises(rng):
    with pytest.raises(ValueError):
        sample_part_indices(3, 4, 7, "uniform", rng)


def test_maybe_double_short():
    feat = np.arange(6).reshape(3, 2)
    doubled = maybe_double_short(feat, 3)
    assert doubled.shape == (6, 2)
    np.testing.assert_array_equal(doubled[0], doubled[1])
    same = maybe_double_short(np.zeros((5, 2)), 3)
    assert same.shape == (5, 2)


# ---------------------------------------------------------------- parsers

def test_sht_parsers(tmp_path):
    _, train_txt, test_txt, _ = make_sht_like(str(tmp_path))
    train = parse_sht_train(train_txt)
    assert sum(r.is_abnormal for r in train) == 3
    assert sum(not r.is_abnormal for r in train) == 4
    test = parse_sht_test(test_txt)
    for r in test:
        if r.is_abnormal:
            assert r.n_frames == -1
        else:
            assert r.n_frames > 0


def test_ucf_parsers(tmp_path):
    _, train_txt, test_txt, _ = make_ucf_like(str(tmp_path))
    train = parse_ucf_train(train_txt)
    assert all(r.key.startswith("Normal") != r.is_abnormal for r in train)
    test = parse_ucf_test(test_txt)
    for r in test:
        if r.is_abnormal:
            assert len(r.events) == 1
            s, e = r.events[0]
            assert 0 <= s < e <= r.n_frames
        else:
            assert r.events == ()


def test_ubnormal_parser(tmp_path):
    _, train_txt, _, _ = make_ubnormal_like(str(tmp_path))
    recs = parse_ubnormal(train_txt)
    assert sum(r.is_abnormal for r in recs) == 3
    assert all((r.key.split("_")[0] == "abnormal") == r.is_abnormal
               for r in recs)


# ---------------------------------------------------------------- datasets

def _sht_dataset(tmp_path, **kw):
    h5_path, train_txt, _, _ = make_sht_like(str(tmp_path))
    records = load_train_records("SHT", train_txt)
    store = FeatureStore(h5_path, eager_keys=[r.key for r in records])
    defaults = dict(part_num=4, part_len=3, n_patch=4, sample="uniform")
    defaults.update(kw)
    return PairedTrainDataset(records, store, **defaults)


def test_paired_dataset_shapes_and_labels(tmp_path):
    ds = _sht_dataset(tmp_path)
    assert len(ds) == 3  # min(4 normal, 3 abnormal)
    nf, nl, af, al = ds[0]
    assert nf.shape == (12, 4, 16) and af.shape == (12, 4, 16)
    assert nl.shape == (12,) and al.shape == (12,)
    assert (nl == 0).all() and (al == 1).all()


def test_paired_dataset_reshuffle_changes_pairing(tmp_path):
    ds = _sht_dataset(tmp_path)
    p1 = ds._norm_perm.copy()
    ds.shuffle_keys()
    for _ in range(10):
        if not np.array_equal(p1, ds._norm_perm):
            break
        ds.shuffle_keys()
    assert not np.array_equal(p1, ds._norm_perm)


def test_paired_dataset_pseudo_labels(tmp_path):
    h5_path, train_txt, _, _ = make_sht_like(str(tmp_path))
    records = load_train_records("SHT", train_txt)
    store = FeatureStore(h5_path)
    pseudo = {r.key + ".npy":
              np.linspace(0, 1, store.n_clips(r.key)).astype(np.float32)
              for r in records}
    ds = PairedTrainDataset(records, store, part_num=4, part_len=3, n_patch=4,
                            sample="uniform", pseudo_labels=pseudo)
    _, nl, _, al = ds[0]
    assert 0 <= nl.min() and al.max() <= 1
    assert not (al == 1).all()  # real scores, not the constant fill


def test_ucf_dataset_double_short(tmp_path):
    h5_path, train_txt, _, _ = make_ucf_like(str(tmp_path), n_clips=(3, 6))
    records = load_train_records("UCF", train_txt)
    store = FeatureStore(h5_path)
    ds = PairedTrainDataset(records, store, part_num=4, part_len=5, n_patch=3,
                            sample="uniform", double_short=True)
    nf, _, af, _ = ds[0]
    assert nf.shape == (20, 3, 16)


def test_load_test_videos_sht(tmp_path):
    h5_path, _, test_txt, mask_dir = make_sht_like(str(tmp_path))
    store = FeatureStore(h5_path)
    vids = load_test_videos("SHT", test_txt, store, mask_dir=mask_dir)
    assert len(vids) == 7
    for v in vids:
        if v.is_abnormal:
            # the fixture writes Bernoulli(0.4) 0/1 masks over >=190 frames:
            # a real mask has both classes and covers every clip's frames
            assert v.anno.max() == 1 and v.anno.min() == 0
            assert len(v.anno) == v.feat.shape[0] * 16
        else:
            assert (v.anno == 0).all()
            assert len(v.anno) == v.feat.shape[0] * 16


def test_load_test_videos_ucf(tmp_path):
    h5_path, _, test_txt, gt_h5 = make_ucf_like(str(tmp_path))
    store = FeatureStore(h5_path)
    vids = load_test_videos("UCF", test_txt, store, mask_h5=gt_h5)
    for v in vids:
        assert len(v.anno) > 0
        if v.is_abnormal:
            assert v.anno.sum() > 0


def test_load_test_videos_ubnormal(tmp_path):
    h5_path, _, test_txt, mask_dir = make_ubnormal_like(str(tmp_path))
    store = FeatureStore(h5_path)
    vids = load_test_videos("UBnormal", test_txt, store, mask_dir=mask_dir)
    assert sum(v.is_abnormal for v in vids) == 3


# ---------------------------------------------------------------- pipeline

def test_batch_iterator_drop_last(tmp_path):
    ds = _sht_dataset(tmp_path)
    batches = list(BatchIterator(ds, batch_size=2, drop_last=True))
    assert len(batches) == 1
    nf, nl, af, al = batches[0]
    assert nf.shape == (2, 12, 4, 16)
    assert al.shape == (2, 12)


def test_prefetcher_matches_direct_iteration(tmp_path):
    ds = _sht_dataset(tmp_path / "a")
    it = BatchIterator(ds, batch_size=1, drop_last=False)
    direct = list(it)
    ds2 = _sht_dataset(tmp_path / "b")
    it2 = BatchIterator(ds2, batch_size=1, drop_last=False)
    fetched = list(Prefetcher(it2, to_device=False))
    assert len(direct) == len(fetched)
    for a, b in zip(direct, fetched):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_prefetcher_propagates_errors():
    def boom():
        yield (np.zeros(1),) * 4
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(Prefetcher(boom(), to_device=False))


def test_part_slices_fuzz_vs_reference_bounds(rng):
    """part_slices reproduces the reference chunk loop for random shapes."""
    from lstc_vad_tpu.evaluation.frame_auc import part_slices

    for _ in range(200):
        n_clips = int(rng.integers(1, 60))
        part_len = int(rng.integers(1, 9))
        idx_list, counts = part_slices(n_clips, part_len, tail_rewindow=True)
        # reference loop (Test/evaluation_shanghaitech_ubnormal.py:74-86)
        n_part = n_clips // part_len
        if n_part * part_len < n_clips:
            n_part += 1
        assert len(idx_list) == n_part
        clips = np.arange(n_clips)
        total = 0
        for pi, (idx, cnt) in enumerate(zip(idx_list, counts)):
            beg = pi * part_len
            end = n_clips if pi == n_part - 1 else (pi + 1) * part_len
            assert cnt == end - beg
            if end - beg < part_len:
                expected = clips[end - part_len:end]  # python slice semantics
            else:
                expected = clips[beg:end]
            np.testing.assert_array_equal(idx, expected)
            total += cnt
        assert total == n_clips


def test_double_short_also_doubles_pseudo_labels(tmp_path, rng):
    """Regression: short UCF videos with pseudo labels must not IndexError."""
    h5_path, train_txt, _, _ = make_ucf_like(str(tmp_path), n_clips=(3, 5),
                                             n_patch=3)
    records = load_train_records("UCF", train_txt)
    store = FeatureStore(h5_path)
    pseudo = {r.key + ".npy":
              rng.random(store.n_clips(r.key)).astype(np.float32)
              for r in records}
    ds = PairedTrainDataset(records, store, part_num=4, part_len=7, n_patch=3,
                            sample="uniform", pseudo_labels=pseudo,
                            double_short=True)
    nf, nl, af, al = ds[0]
    assert nf.shape[0] == 28 and nl.shape == (28,)
    assert np.isfinite(al).all()


def test_sht_train_nonzero_label_is_abnormal(tmp_path):
    """The reference buckets label==0 normal and EVERYTHING else abnormal
    (utils/load_dataset.py:41-46) — a label of 2 must not flip to normal."""
    txt = str(tmp_path / "t.txt")
    with open(txt, "w") as f:
        f.write("vid_a,0\nvid_b,1\nvid_c,2\nvid_d,-1\n")
    recs = parse_sht_train(txt)
    assert [r.is_abnormal for r in recs] == [False, True, True, True]
