"""Packed feature store: flat binary pack + native (C++) mmap gather.

``pack_h5`` converts a reference-format HDF5 feature file into the
``.lstcpack`` layout once; ``PackedStore`` then serves the training hot loop
through csrc/packstore.cpp (ctypes) — zero-copy mmap reads, batch gather in
one native call, no h5py lock, no per-item Python allocation churn.  Falls
back to a pure-numpy ``np.memmap`` implementation when the shared library
has not been built (``ensure_native()`` builds it with g++).

Drop-in for data.FeatureStore: implements get(key[, crop]) / n_clips(key).
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Dict, Iterable, Optional, Tuple

import numpy as np

MAGIC = b"LSTCPK01"
_ALIGN = 64


class PackFormatError(ValueError):
    """Raised for a structurally invalid .lstcpack (truncated, bit-flipped,
    or hostile): both readers fully validate the header, the index walk and
    every payload extent at open, so corruption is a clean Python exception
    — never a native crash or an out-of-bounds read."""

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.abspath(os.path.join(_CSRC, "libpackstore.so"))


# ---------------------------------------------------------------- writer

def write_pack(path: str, videos: Iterable[Tuple[str, np.ndarray]]):
    """videos: iterable of (key, float32 [n_clips, n_patch, d_model])."""
    index = []
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<I", 0))   # n_videos placeholder
        f.write(struct.pack("<Q", 0))   # index_offset placeholder
        seen = set()
        for key, feat in videos:
            feat = np.ascontiguousarray(feat, dtype=np.float32)
            if feat.ndim != 3:
                raise ValueError(f"{key}: expected 3-D [clips, patch, d], "
                                 f"got {feat.shape}")
            if key in seen:
                raise ValueError(f"duplicate key {key!r} (readers reject "
                                 "duplicate-key packs)")
            seen.add(key)
            pad = (-f.tell()) % _ALIGN
            f.write(b"\0" * pad)
            index.append((key, f.tell()) + feat.shape)
            f.write(feat.tobytes())
        index_offset = f.tell()
        for key, offset, n_clips, n_patch, d_model in index:
            kb = key.encode()
            f.write(struct.pack("<I", len(kb)))
            f.write(kb)
            f.write(struct.pack("<QIII", offset, n_clips, n_patch, d_model))
        f.seek(len(MAGIC))
        f.write(struct.pack("<I", len(index)))
        f.write(struct.pack("<Q", index_offset))


def pack_h5(h5_path: str, pack_path: str, keys: Optional[Iterable[str]] = None):
    """Convert a reference h5 (datasets named '<key>.npy') into a pack."""
    import h5py

    with h5py.File(h5_path, "r") as h5:
        names = list(h5.keys()) if keys is None else [k + ".npy" for k in keys]

        def gen():
            for name in names:
                key = name[:-4] if name.endswith(".npy") else name
                yield key, h5[name][:]

        write_pack(pack_path, gen())


# ---------------------------------------------------------------- native

def ensure_native(rebuild: bool = False) -> Optional[str]:
    """Build csrc/libpackstore.so with make/g++ if missing or stale (source
    newer than the library); returns the path or None without a toolchain."""
    src = os.path.join(os.path.abspath(_CSRC), "packstore.cpp")
    if os.path.exists(_LIB_PATH) and not rebuild:
        # source may be absent in a binary deployment: the prebuilt lib wins
        if (not os.path.exists(src)
                or os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src)):
            return _LIB_PATH
    try:
        subprocess.run(["make", "-C", os.path.abspath(_CSRC)],
                       check=True, capture_output=True)
    except (OSError, subprocess.CalledProcessError):
        return None
    return _LIB_PATH if os.path.exists(_LIB_PATH) else None


def _load_lib() -> Optional[ctypes.CDLL]:
    path = ensure_native()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.ps_open.restype = ctypes.c_void_p
    lib.ps_open.argtypes = [ctypes.c_char_p]
    try:
        lib.ps_open_checked.restype = ctypes.c_void_p
        lib.ps_open_checked.argtypes = [ctypes.c_char_p,
                                        ctypes.POINTER(ctypes.c_int32)]
    except AttributeError:
        # prebuilt .so predating the validated open (binary deployments
        # keep the shipped lib, see ensure_native): PackedStore falls back
        # to ps_open — safe because _NumpyPack validates the format first
        pass
    lib.ps_close.argtypes = [ctypes.c_void_p]
    lib.ps_shape.restype = ctypes.c_int64
    lib.ps_shape.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                             ctypes.POINTER(ctypes.c_int32),
                             ctypes.POINTER(ctypes.c_int32)]
    lib.ps_get.restype = ctypes.c_int
    lib.ps_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                           ctypes.POINTER(ctypes.c_float)]
    lib.ps_gather.restype = ctypes.c_int
    lib.ps_gather.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                              ctypes.POINTER(ctypes.c_int64),
                              ctypes.c_int32, ctypes.c_int32,
                              ctypes.POINTER(ctypes.c_float)]
    lib.ps_gather_pair_batch.restype = ctypes.c_int
    lib.ps_gather_pair_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float), ctypes.c_int32]
    return lib


class _NumpyPack:
    """Pure-numpy fallback reader for the pack format.

    Mirrors the native reader's validation (csrc/packstore.cpp ps_open_
    checked): bounds-checked index walk + payload-extent checks, so a
    corrupt pack raises PackFormatError at construction."""

    def __init__(self, path: str):
        try:
            self._mm = np.memmap(path, dtype=np.uint8, mode="r")
        except (OSError, ValueError) as e:  # empty file raises ValueError
            raise PackFormatError(f"{path}: unreadable pack: {e}") from e
        size = self._mm.shape[0]
        if size < 20 or bytes(self._mm[:8]) != MAGIC:
            raise PackFormatError(f"{path}: not a LSTCPK01 pack "
                                  f"(size {size})")
        raw = bytes(self._mm[:20])
        n_videos, = struct.unpack_from("<I", raw, 8)
        index_offset, = struct.unpack_from("<Q", raw, 12)
        if index_offset > size:
            raise PackFormatError(
                f"{path}: index offset {index_offset} beyond file size "
                f"{size}")
        self.index: Dict[str, Tuple[int, int, int, int]] = {}
        buf = bytes(self._mm[index_offset:])
        pos = 0
        for i in range(n_videos):
            if pos + 4 > len(buf):
                raise PackFormatError(
                    f"{path}: truncated index at entry {i}/{n_videos}")
            key_len, = struct.unpack_from("<I", buf, pos)
            pos += 4
            if pos + key_len + 20 > len(buf):
                raise PackFormatError(
                    f"{path}: truncated index entry {i}/{n_videos} "
                    f"(key_len {key_len})")
            try:
                key = buf[pos:pos + key_len].decode()
            except UnicodeDecodeError as e:
                raise PackFormatError(
                    f"{path}: undecodable key in entry {i}") from e
            pos += key_len
            offset, n_clips, n_patch, d_model = struct.unpack_from(
                "<QIII", buf, pos)
            pos += 20
            nbytes = n_clips * n_patch * d_model * 4  # py ints: no overflow
            if offset + nbytes > size:
                raise PackFormatError(
                    f"{path}: entry {key!r} extent [{offset}, "
                    f"{offset + nbytes}) beyond file size {size}")
            if key in self.index:
                # both readers must agree which entry wins; the native map
                # keeps the first, a dict would keep the last — a shape
                # disagreement there is a caller-buffer overflow in ps_get
                raise PackFormatError(f"{path}: duplicate key {key!r} "
                                      f"at index entry {i}")
            self.index[key] = (offset, n_clips, n_patch, d_model)

    def shape(self, key):
        _, n_clips, n_patch, d_model = self.index[key]
        return n_clips, n_patch, d_model

    def view(self, key) -> np.ndarray:
        offset, n_clips, n_patch, d_model = self.index[key]
        nbytes = n_clips * n_patch * d_model * 4
        return self._mm[offset:offset + nbytes].view(np.float32).reshape(
            n_clips, n_patch, d_model)


class PackedStore:
    """FeatureStore-compatible reader over a .lstcpack file."""

    def __init__(self, pack_path: str, use_native: bool = True,
                 ten_crop: bool = False, n_patch: Optional[int] = None,
                 d_model: Optional[int] = None):
        self.path = pack_path
        self._ten_crop = ten_crop
        self._tc_patch = n_patch
        self._tc_d = d_model
        self._lib = _load_lib() if use_native else None
        self._np = _NumpyPack(pack_path)  # validates the format up front
        self.native = False
        if self._lib is not None:
            checked = getattr(self._lib, "ps_open_checked", None)
            if checked is None:
                # prebuilt lib without the validated open: _NumpyPack above
                # already validated the format, so plain ps_open is safe
                self._handle = self._lib.ps_open(pack_path.encode())
            else:
                err = ctypes.c_int32(0)
                self._handle = checked(pack_path.encode(), ctypes.byref(err))
                if not self._handle and err.value >= 2:
                    # FORMAT disagreement (HEADER/INDEX/EXTENT): the numpy
                    # reader accepted a pack the native walk rejects — must
                    # never silently degrade to the slow path (codes:
                    # csrc/packstore.cpp ps_open enum).  PS_ERR_IO (1) is a
                    # resource failure (fd limit, mmap exhaustion) on a pack
                    # numpy just validated: degrade to the numpy reader.
                    raise PackFormatError(
                        f"{pack_path}: native reader rejected the pack "
                        f"(code {err.value}) that the fallback validated")
            self.native = bool(self._handle)

    # -- FeatureStore interface

    def shape(self, key: str):
        """(n_clips, n_patch, d_model) as stored (pre-tenCrop reshape)."""
        return self._np.shape(key)

    def keys(self):
        """All video keys in the pack."""
        return list(self._np.index.keys())

    def n_clips(self, key: str) -> int:
        shape = self._np.shape(key)
        if self._ten_crop:
            # total-size based, like FeatureStore.n_clips and get()'s own
            # reshape(-1, 10, p, d): correct for both first-axis-stacked
            # [10*n, p, d] and patch-folded [n, 10*p, d] layouts
            return int(np.prod(shape)) // (10 * self._tc_patch * self._tc_d)
        return shape[0]

    def get(self, key: str, crop: Optional[int] = None) -> np.ndarray:
        n_clips, n_patch, d_model = self._np.shape(key)
        if self.native:
            out = np.empty((n_clips, n_patch, d_model), np.float32)
            rc = self._lib.ps_get(self._handle, key.encode(),
                                  out.ctypes.data_as(
                                      ctypes.POINTER(ctypes.c_float)))
            if rc != 0:
                raise KeyError(key)
        else:
            out = np.array(self._np.view(key))
        if self._ten_crop:
            out = out.reshape(-1, 10, self._tc_patch, self._tc_d)
            if crop is not None:
                out = out[:, crop]
        return out

    # -- native fast paths

    def gather(self, key: str, indices: np.ndarray,
               n_patch_out: int) -> np.ndarray:
        """Selected clips, sliced to n_patch_out patches — the sampler's
        window gather, in one native call."""
        n_clips, n_patch, d_model = self._np.shape(key)
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        if not self.native:
            return np.array(self._np.view(key)[indices, :n_patch_out, :])
        out = np.empty((len(indices), n_patch_out, d_model), np.float32)
        rc = self._lib.ps_gather(
            self._handle, key.encode(),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(indices), n_patch_out,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if rc != 0:
            raise KeyError(f"{key} (rc={rc})")
        return out

    def gather_batch(self, keys, indices: np.ndarray, n_patch_out: int,
                     d_model: int, n_threads: int = 0) -> np.ndarray:
        """One native call per training batch.
        indices: [n_items, idx_per_item] int64 -> out [n_items, idx_per_item,
        n_patch_out, d_model] float32."""
        indices = np.ascontiguousarray(indices, dtype=np.int64)
        n_items, idx_per_item = indices.shape
        out = np.empty((n_items, idx_per_item, n_patch_out, d_model),
                       np.float32)
        if not self.native:
            for i, key in enumerate(keys):
                out[i] = self.gather(key, indices[i], n_patch_out)
            return out
        key_arr = (ctypes.c_char_p * n_items)(
            *[k.encode() for k in keys])
        rc = self._lib.ps_gather_pair_batch(
            self._handle, key_arr, n_items,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            idx_per_item, n_patch_out, d_model,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
        if rc != 0:
            raise RuntimeError(f"gather_batch failed rc={rc}")
        return out

    def close(self):
        if self.native:
            self._lib.ps_close(self._handle)
            self.native = False
