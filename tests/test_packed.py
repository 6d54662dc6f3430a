"""Packed store: format round-trip, native vs numpy fallback parity,
batch gather, h5 conversion, dataset integration."""

import numpy as np
import pytest

from lstc_vad_tpu.data.packed import (PackedStore, ensure_native, pack_h5,
                                      write_pack)

from fixtures import make_sht_like


def _sample_videos(rng, n=5):
    return [(f"vid_{i:02d}",
             rng.standard_normal((int(rng.integers(5, 20)), 4, 8))
             .astype(np.float32))
            for i in range(n)]


@pytest.fixture(scope="module")
def native_available():
    return ensure_native() is not None


def test_pack_roundtrip_numpy(tmp_path, rng):
    videos = _sample_videos(rng)
    path = str(tmp_path / "feats.lstcpack")
    write_pack(path, videos)
    store = PackedStore(path, use_native=False)
    for key, feat in videos:
        np.testing.assert_array_equal(store.get(key), feat)
        assert store.n_clips(key) == feat.shape[0]


def test_pack_roundtrip_native(tmp_path, rng, native_available):
    if not native_available:
        pytest.skip("no C++ toolchain")
    videos = _sample_videos(rng)
    path = str(tmp_path / "feats.lstcpack")
    write_pack(path, videos)
    store = PackedStore(path, use_native=True)
    assert store.native
    for key, feat in videos:
        np.testing.assert_array_equal(store.get(key), feat)
    store.close()


def test_gather_native_matches_numpy(tmp_path, rng, native_available):
    if not native_available:
        pytest.skip("no C++ toolchain")
    videos = _sample_videos(rng)
    path = str(tmp_path / "feats.lstcpack")
    write_pack(path, videos)
    native = PackedStore(path, use_native=True)
    fallback = PackedStore(path, use_native=False)
    for key, feat in videos:
        idx = rng.integers(0, feat.shape[0], size=7)
        a = native.gather(key, idx, n_patch_out=3)
        b = fallback.gather(key, idx, n_patch_out=3)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, feat[idx, :3, :])
    native.close()


def test_gather_batch(tmp_path, rng, native_available):
    videos = _sample_videos(rng, n=6)
    path = str(tmp_path / "feats.lstcpack")
    write_pack(path, videos)
    store = PackedStore(path, use_native=native_available)
    keys = [k for k, _ in videos]
    idx = np.stack([rng.integers(0, min(f.shape[0] for _, f in videos),
                                 size=4) for _ in keys])
    out = store.gather_batch(keys, idx, n_patch_out=4, d_model=8)
    assert out.shape == (6, 4, 4, 8)
    for i, (key, feat) in enumerate(videos):
        np.testing.assert_array_equal(out[i], feat[idx[i]])


def test_gather_bad_key_and_index(tmp_path, rng, native_available):
    if not native_available:
        pytest.skip("no C++ toolchain")
    videos = _sample_videos(rng, n=2)
    path = str(tmp_path / "feats.lstcpack")
    write_pack(path, videos)
    store = PackedStore(path)
    with pytest.raises(KeyError):
        store.gather("nope", np.array([0]), 2)
    with pytest.raises(KeyError):
        store.gather(videos[0][0], np.array([10**6]), 2)
    store.close()


def test_pack_h5_conversion(tmp_path, rng):
    h5_path, train_txt, _, _ = make_sht_like(str(tmp_path), n_patch=4,
                                             d_model=8)
    pack_path = str(tmp_path / "conv.lstcpack")
    pack_h5(h5_path, pack_path)
    import h5py

    store = PackedStore(pack_path, use_native=False)
    with h5py.File(h5_path, "r") as h5:
        for name in h5.keys():
            key = name[:-4]
            np.testing.assert_array_equal(store.get(key), h5[name][:])


def test_packed_store_in_dataset(tmp_path, rng):
    h5_path, train_txt, _, _ = make_sht_like(str(tmp_path), n_patch=4,
                                             d_model=16, n_clips=(14, 30))
    pack_path = str(tmp_path / "ds.lstcpack")
    pack_h5(h5_path, pack_path)

    from lstc_vad_tpu.data import PairedTrainDataset
    from lstc_vad_tpu.data.datasets import load_train_records

    records = load_train_records("SHT", train_txt)
    store = PackedStore(pack_path)
    ds = PairedTrainDataset(records, store, part_num=4, part_len=3,
                            n_patch=4, sample="uniform")
    nf, nl, af, al = ds[0]
    assert nf.shape == (12, 4, 16)
    assert nf.dtype == np.float32


def test_batch_fast_path_matches_per_item(tmp_path, rng, native_available):
    h5_path, train_txt, _, _ = make_sht_like(str(tmp_path), n_patch=4,
                                             d_model=16, n_clips=(14, 30))
    pack_path = str(tmp_path / "fp.lstcpack")
    pack_h5(h5_path, pack_path)

    from lstc_vad_tpu.data import BatchIterator, PairedTrainDataset
    from lstc_vad_tpu.data.datasets import load_train_records

    records = load_train_records("SHT", train_txt)
    kw = dict(part_num=4, part_len=3, n_patch=4, sample="uniform", seed=7)
    fast = PairedTrainDataset(records, PackedStore(pack_path), **kw)
    slow = PairedTrainDataset(records, PackedStore(pack_path), **kw)

    batch_fast = fast.get_batch(0, 2)
    assert batch_fast is not None
    items = [slow[i] for i in range(2)]
    batch_slow = tuple(np.stack([it[j] for it in items]) for j in range(4))
    for a, b in zip(batch_fast, batch_slow):
        np.testing.assert_array_equal(a, b)

    # and through the BatchIterator
    it_fast = list(BatchIterator(
        PairedTrainDataset(records, PackedStore(pack_path), **kw), 2))
    assert len(it_fast) == 1
    for a, b in zip(it_fast[0], batch_slow):
        np.testing.assert_array_equal(a, b)


def test_gather_batch_rejects_heterogeneous_d_model(tmp_path, rng,
                                                    native_available):
    if not native_available:
        pytest.skip("no C++ toolchain")
    videos = [("a", rng.standard_normal((5, 4, 8)).astype(np.float32)),
              ("b", rng.standard_normal((5, 4, 16)).astype(np.float32))]
    path = str(tmp_path / "het.lstcpack")
    write_pack(path, videos)
    store = PackedStore(path, use_native=True)
    idx = np.zeros((2, 3), dtype=np.int64)
    with pytest.raises(RuntimeError, match="rc=-4"):
        store.gather_batch(["a", "b"], idx, n_patch_out=4, d_model=8)
    store.close()
