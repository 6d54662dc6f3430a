"""Packed store: format round-trip, native vs numpy fallback parity,
batch gather, h5 conversion, dataset integration, corrupt-pack rejection."""

import struct

import numpy as np
import pytest

from lstc_vad_tpu.data.packed import (PackedStore, PackFormatError,
                                      ensure_native, pack_h5, write_pack)

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


# ------------------------------------------------------------ corruption
# A corrupt pack must be a clean Python exception at PackedStore
# construction — never a native segfault or out-of-bounds read
# (csrc/packstore.cpp ps_open_checked; data/packed.py _NumpyPack).


def _write_sample_pack(tmp_path, rng, name="c.lstcpack"):
    path = str(tmp_path / name)
    write_pack(path, _sample_videos(rng, n=3))
    return path


def _open_both(path, native_available):
    """Construct with BOTH readers (the native open runs after the numpy
    validation, so use_native=True exercises both)."""
    PackedStore(path, use_native=False)
    if native_available:
        PackedStore(path, use_native=True).close()


def test_truncation_fuzz(tmp_path, rng, native_available):
    """Every truncation point — header, payload, mid-index — either opens a
    smaller-but-valid pack (impossible here: extents break first) or raises
    PackFormatError.  Sweeps ~40 deterministic cut points over the whole
    file plus every byte of the first index entry."""
    path = _write_sample_pack(tmp_path, rng)
    data = open(path, "rb").read()
    index_offset, = struct.unpack_from("<Q", data, 12)
    cuts = sorted({0, 1, 7, 8, 12, 19, 20, len(data) - 1,
                   index_offset - 1, index_offset,
                   *range(index_offset + 1, min(index_offset + 30,
                                                len(data))),
                   *np.linspace(21, len(data) - 2, 15).astype(int).tolist()})
    for cut in cuts:
        trunc = str(tmp_path / "trunc.lstcpack")
        with open(trunc, "wb") as f:
            f.write(data[:cut])
        with pytest.raises(PackFormatError):
            PackedStore(trunc, use_native=False)
        if native_available:
            with pytest.raises(PackFormatError):
                PackedStore(trunc, use_native=True)


def test_corrupt_fields_rejected(tmp_path, rng, native_available):
    """Targeted bit-flips: hostile key_len, payload offset/extent, index
    offset, magic — each must raise, in both readers."""
    path = _write_sample_pack(tmp_path, rng)
    data = bytearray(open(path, "rb").read())
    index_offset, = struct.unpack_from("<Q", data, 12)

    def corrupted(mutate):
        buf = bytearray(data)
        mutate(buf)
        out = str(tmp_path / "mut.lstcpack")
        with open(out, "wb") as f:
            f.write(buf)
        return out

    mutations = [
        lambda b: b.__setitem__(slice(0, 8), b"XXXXXXXX"),        # magic
        lambda b: struct.pack_into("<Q", b, 12, len(data) + 50),  # index ptr
        lambda b: struct.pack_into("<I", b, index_offset,         # key_len
                                   2**31),
        lambda b: struct.pack_into(                               # huge clips
            "<I", b, index_offset + 4
            + struct.unpack_from("<I", data, index_offset)[0] + 8,
            2**32 - 1),
        lambda b: struct.pack_into(                               # bad offset
            "<Q", b, index_offset + 4
            + struct.unpack_from("<I", data, index_offset)[0],
            len(data) * 2),
    ]
    for mutate in mutations:
        bad = corrupted(mutate)
        with pytest.raises(PackFormatError):
            PackedStore(bad, use_native=False)
        if native_available:
            with pytest.raises(PackFormatError):
                PackedStore(bad, use_native=True)


def test_overflowing_extent_rejected(tmp_path, native_available):
    """Hostile dims whose byte count overflows 64 bits must not wrap around
    the extent check: craft an index entry with n_clips=n_patch=d_model=
    2^32-1 (product * 4 overflows u64)."""
    key = b"evil"
    header = b"LSTCPK01" + struct.pack("<I", 1) + struct.pack("<Q", 20)
    entry = (struct.pack("<I", len(key)) + key +
             struct.pack("<QIII", 20, 2**32 - 1, 2**32 - 1, 2**32 - 1))
    path = str(tmp_path / "evil.lstcpack")
    with open(path, "wb") as f:
        f.write(header + entry)
    with pytest.raises(PackFormatError):
        PackedStore(path, use_native=False)
    if native_available:
        with pytest.raises(PackFormatError):
            PackedStore(path, use_native=True)


def test_empty_and_tiny_files_rejected(tmp_path, native_available):
    for content in (b"", b"LST", b"LSTCPK01"):
        path = str(tmp_path / f"tiny{len(content)}.lstcpack")
        with open(path, "wb") as f:
            f.write(content)
        with pytest.raises(PackFormatError):
            PackedStore(path, use_native=False)
        if native_available:
            with pytest.raises(PackFormatError):
                PackedStore(path, use_native=True)


def test_random_corruption_fuzz(tmp_path, rng, native_available):
    """200 random single-region corruptions (flip 1-8 bytes anywhere): the
    store either opens AND serves every key correctly-shaped, or raises
    PackFormatError/KeyError — never crashes.  Payload flips are allowed to
    change VALUES (payload bytes carry no structure); structural flips must
    be caught by validation."""
    path = _write_sample_pack(tmp_path, rng)
    data = open(path, "rb").read()
    for trial in range(200):
        buf = bytearray(data)
        pos = int(rng.integers(0, len(buf)))
        n = int(rng.integers(1, 9))
        for off in range(n):
            if pos + off < len(buf):
                buf[pos + off] ^= int(rng.integers(1, 256))
        bad = str(tmp_path / "fuzz.lstcpack")
        with open(bad, "wb") as f:
            f.write(buf)
        for use_native in ([False, True] if native_available else [False]):
            try:
                store = PackedStore(bad, use_native=use_native)
            except PackFormatError:
                continue
            try:
                for key in store.keys():
                    shape = store.shape(key)
                    got = store.get(key)
                    assert got.shape == shape
            except (PackFormatError, KeyError):
                pass  # e.g. a flipped key byte renames an entry
            finally:
                if use_native:
                    store.close()


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


def test_ps_err_io_degrades_to_numpy(tmp_path, rng, monkeypatch):
    """PS_ERR_IO (code 1: fd limit / mmap exhaustion) on a pack the numpy
    reader just validated degrades to the numpy path — only FORMAT codes
    (>= 2) raise the reader-disagreement error."""
    import ctypes

    from lstc_vad_tpu.data import packed as pk

    path = _write_sample_pack(tmp_path, rng)

    class _IOFailLib:
        def ps_open_checked(self, _path, err_ref):
            # ctypes.byref result: write through the underlying object
            err_ref._obj.value = 1  # PS_ERR_IO
            return None

    monkeypatch.setattr(pk, "_load_lib", lambda: _IOFailLib())
    store = pk.PackedStore(str(path))
    assert store.native is False  # degraded, not raised
    assert store.get("vid_00").shape == store._np.view("vid_00").shape

    class _FormatFailLib:
        def ps_open_checked(self, _path, err_ref):
            err_ref._obj.value = 3  # PS_ERR_INDEX: a real disagreement
            return None

    monkeypatch.setattr(pk, "_load_lib", lambda: _FormatFailLib())
    with pytest.raises(pk.PackFormatError, match="code 3"):
        pk.PackedStore(str(path))


def test_prebuilt_lib_without_checked_open(tmp_path, rng, monkeypatch):
    """A prebuilt libpackstore.so predating ps_open_checked still works:
    plain ps_open is safe because _NumpyPack validates the format first."""
    from lstc_vad_tpu.data import packed as pk

    path = _write_sample_pack(tmp_path, rng)
    real = pk._load_lib()
    if real is None:
        pytest.skip("no native toolchain")

    class _OldLib:
        """Forwards everything EXCEPT ps_open_checked (AttributeError,
        like a ctypes CDLL missing the symbol)."""

        def __getattr__(self, name):
            if name == "ps_open_checked":
                raise AttributeError(name)
            return getattr(real, name)

    monkeypatch.setattr(pk, "_load_lib", lambda: _OldLib())
    store = pk.PackedStore(str(path))
    assert store.native is True  # opened via plain ps_open
    np.testing.assert_array_equal(store.get("vid_00"),
                                  store._np.view("vid_00"))


def test_tencrop_n_clips_total_size_based(tmp_path):
    """PackedStore.n_clips under tenCrop must agree with get()'s own
    reshape(-1, 10, p, d) for BOTH valid stored layouts: first-axis-stacked
    [10*n, p, d] and patch-folded [n, 10*p, d] (FeatureStore already counts
    by total size, feature_store.py:67-68)."""
    n, p, d = 6, 4, 8
    stacked = np.arange(10 * n * p * d, dtype=np.float32).reshape(
        10 * n, p, d)
    folded = np.arange(n * 10 * p * d, dtype=np.float32).reshape(
        n, 10 * p, d)
    path = str(tmp_path / "tc.lstcpack")
    write_pack(path, [("stacked", stacked), ("folded", folded)])
    store = PackedStore(path, ten_crop=True, n_patch=p, d_model=d)
    for key in ("stacked", "folded"):
        assert store.n_clips(key) == n
        assert store.get(key).shape == (n, 10, p, d)
        assert store.get(key, crop=3).shape == (n, p, d)
    store.close()


def test_duplicate_key_pack_rejected(tmp_path, rng):
    """Readers must agree which entry wins for a key; they don't (native
    map keeps the first, a dict the last), so a duplicate-key pack — which
    write_pack also refuses to produce — is rejected at open in BOTH
    readers, never a shape disagreement that overflows a caller buffer."""
    feat_a = rng.standard_normal((9, 4, 8)).astype(np.float32)
    feat_b = rng.standard_normal((2, 4, 8)).astype(np.float32)
    path = str(tmp_path / "dup.lstcpack")
    with pytest.raises(ValueError, match="duplicate key"):
        write_pack(path, [("v", feat_a), ("v", feat_b)])

    # forge one anyway: write two distinct keys of equal length, then patch
    # the second key's bytes IN THE INDEX REGION to collide with the first
    # (searching from byte 0 could hit the needle in random payload bytes)
    write_pack(path, [("va", feat_a), ("vb", feat_b)])
    raw = bytearray(open(path, "rb").read())
    index_offset, = struct.unpack_from("<Q", bytes(raw[:20]), 12)
    idx = raw.index(b"vb", index_offset)
    raw[idx:idx + 2] = b"va"
    open(path, "wb").write(bytes(raw))
    with pytest.raises(PackFormatError, match="duplicate key"):
        PackedStore(path)

    if ensure_native(rebuild=True):
        # the native validator rejects it too (numpy layer bypassed)
        import ctypes

        from lstc_vad_tpu.data.packed import _load_lib
        lib = _load_lib()
        err = ctypes.c_int32(0)
        handle = lib.ps_open_checked(path.encode(), ctypes.byref(err))
        assert not handle and err.value == 5  # PS_ERR_DUPKEY
