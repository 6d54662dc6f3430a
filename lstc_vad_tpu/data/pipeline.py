"""Batching + background prefetch feeding fixed-shape device arrays.

Replaces the reference's torch DataLoader worker processes
(Train/spatio_transformer_shanghaitech.py:45) with a host thread that builds
the next batch (h5 gather + snippet sampling) while the TPU executes the
current step, then device_puts with an optional NamedSharding so batches land
already sharded across the mesh.

Batch layout matches the reference collation: four stacked arrays
(norm_feats [B, pn*pl, n_patch, d], norm_labs [B, pn*pl], abnorm_feats,
abnorm_labs); iteration order is sequential over the per-epoch permutation
(torch's default sampler), with drop_last=True.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Tuple

import jax
import numpy as np

Batch = Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]


class BatchIterator:
    """Sequential fixed-size batches over a PairedTrainDataset epoch."""

    def __init__(self, dataset, batch_size: int, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last \
            else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Batch]:
        n = len(self.dataset)
        end = n - n % self.batch_size if self.drop_last else n
        get_batch = getattr(self.dataset, "get_batch", None)
        for start in range(0, end, self.batch_size):
            stop = min(start + self.batch_size, n)
            if get_batch is not None:
                batch = get_batch(start, stop)
                if batch is not None:
                    yield batch
                    continue
            items = [self.dataset[i] for i in range(start, stop)]
            yield tuple(np.stack([it[j] for it in items]) for j in range(4))


class Prefetcher:
    """Wraps a batch iterable; a daemon thread stays ``depth`` batches ahead,
    transferring to device (optionally sharded) as soon as a batch is built."""

    _SENTINEL = object()

    def __init__(self, iterable, depth: int = 2, sharding=None,
                 to_device: bool = True, feature_dtype=None,
                 multiprocess: bool = False):
        """``feature_dtype``: cast batch elements 0 and 2 (the feature
        tensors) before transfer — e.g. ml_dtypes.bfloat16 halves H2D bytes;
        labels keep their dtype.

        ``multiprocess``: the sharding spans a multi-host global mesh; each
        process builds the SAME batch (identical pipeline seeds) and places
        only its local shards (parallel/multihost.py::to_global)."""
        self.iterable = iterable
        self.depth = depth
        self.sharding = sharding
        self.to_device = to_device
        self.feature_dtype = feature_dtype
        self.multiprocess = multiprocess
        if multiprocess:
            from ..parallel.multihost import to_global

            self._to_global = to_global

    def _put(self, batch):
        if self.feature_dtype is not None and isinstance(batch, tuple):
            batch = tuple(
                np.asarray(a).astype(self.feature_dtype)
                if i in (0, 2) else a for i, a in enumerate(batch))
        if not self.to_device:
            return batch
        if self.sharding is not None:
            if self.multiprocess:
                return jax.tree.map(
                    lambda a: self._to_global(a, self.sharding), batch)
            return jax.tree.map(
                lambda a: jax.device_put(a, self.sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        err: list = []
        stop = threading.Event()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for batch in self.iterable:
                    if not put(self._put(batch)):
                        return  # consumer went away: stop cleanly
            except BaseException as e:  # propagate to consumer
                err.append(e)
            finally:
                put(self._SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is self._SENTINEL:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            # consumer exited early (exception in the train step, interrupt):
            # release the worker and drop any staged batches so the thread
            # and its device buffers don't leak
            stop.set()
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=5)
