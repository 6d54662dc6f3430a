"""Feature stores: pre-extracted I3D clip features keyed by "<video>.npy".

The reference reads h5py files either eagerly into RAM (SHT/UBnormal,
utils/load_dataset.py:29-48) or lazily per item (UCF and the mutual-training
dataset, :285-286,409-415).  This store unifies both behind ``get(key)`` and
adds the tenCrop layout (reshape to [-1, 10, n_patch, d], crop selected by the
caller; :168,172,413).

A packed flat-binary store (data/packed.py + csrc/) provides the same
interface with mmap + native multi-threaded gather for the hot training path.
"""

from __future__ import annotations

import threading
from typing import Dict, Iterable, Optional

import numpy as np


class FeatureStore:
    """HDF5-backed feature store.

    Keys are stored WITHOUT the ".npy" suffix; ``get`` appends it, matching
    the reference's ``h5[key + '.npy']`` convention.
    """

    def __init__(self, h5_path: str, eager_keys: Optional[Iterable[str]] = None,
                 ten_crop: bool = False, n_patch: Optional[int] = None,
                 d_model: Optional[int] = None):
        import h5py

        self._h5_path = h5_path
        self._ten_crop = ten_crop
        self._n_patch = n_patch
        self._d_model = d_model
        self._cache: Dict[str, np.ndarray] = {}
        self._lock = threading.Lock()
        self._h5 = h5py.File(h5_path, "r")
        if eager_keys is not None:
            for key in eager_keys:
                self._cache[key] = self._read(key)

    def _read(self, key: str) -> np.ndarray:
        with self._lock:  # h5py handles are not thread-safe
            feat = self._h5[key + ".npy"][:]
        if self._ten_crop:
            feat = feat.reshape(-1, 10, self._n_patch, self._d_model)
        return feat

    def get(self, key: str, crop: Optional[int] = None) -> np.ndarray:
        feat = self._cache.get(key)
        if feat is None:
            feat = self._read(key)
        if self._ten_crop and crop is not None:
            feat = feat[:, crop]
        return feat

    def n_clips(self, key: str) -> int:
        """Clip count from h5 metadata only — no feature read (lazy test
        split: data/datasets.py TestVideo)."""
        feat = self._cache.get(key)
        if feat is not None:
            return feat.shape[0]
        with self._lock:
            shape = self._h5[key + ".npy"].shape
        if self._ten_crop:
            return int(np.prod(shape)) // (10 * self._n_patch * self._d_model)
        return shape[0]

    def shape(self, key: str):
        """Raw stored shape (pre-tenCrop reshape), metadata-only."""
        with self._lock:
            return tuple(self._h5[key + ".npy"].shape)

    def keys(self):
        """All video keys in the store (".npy" suffix stripped)."""
        with self._lock:
            return [k[:-4] if k.endswith(".npy") else k
                    for k in self._h5.keys()]

    def close(self):
        self._h5.close()


class CropView:
    """Fix one tenCrop crop index over any store: get() returns 3-D
    [n_clips, n_patch, d] features.  Used by eval/pseudo paths that need a
    deterministic crop (the reference ships no tenCrop eval semantics)."""

    def __init__(self, store, crop: int):
        self._store = store
        self._crop = crop

    def get(self, key: str, crop: Optional[int] = None) -> np.ndarray:
        return self._store.get(key, crop=self._crop if crop is None else crop)

    def n_clips(self, key: str) -> int:
        return self._store.n_clips(key)
