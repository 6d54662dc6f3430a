"""Batched on-device scorers for evaluation and pseudo-label generation.

The reference scores one part per device call in a Python loop
(Test/evaluation_shanghaitech_ubnormal.py:77-91 — batch size 1, a D2H sync per
part).  Here a video's parts are gathered on host into ONE fixed-shape batch,
padded up to a small set of bucket sizes (so XLA compiles a handful of
programs, not one per video length), and scored in a single device call.
Scores are numerically identical per part: attention never mixes parts, so
batching parts changes nothing but throughput.

Variable-length tails (paths without tail re-windowing, e.g. the pseudo-label
generators) are scored at their true length in a separate call — shorter
sequences change the relative-PE slice, so padding them would NOT be
equivalent (models/MultiHeadAttention.py:108).
"""

from __future__ import annotations

import collections
import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .frame_auc import part_slices, ucf_bin_edges, ucf_bin_pool, ucf_part_plan

BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096)

# (encoder, head, kind, l2) -> jitted apply.  LRU-bounded: a `sweep` over
# many encoder shapes would otherwise accumulate compiled programs for the
# whole process lifetime (each live VideoScorer still holds its own fn via
# cached_property, so eviction never invalidates an in-use scorer).
_APPLY_CACHE_MAX = 16
_APPLY_CACHE = collections.OrderedDict()


def _resolve(feats):
    """Accept an array OR a zero-arg callable returning one: the lazy test
    split (data/datasets.py TestVideo.loader) streams each video's features
    through the scorer and lets them be freed before the next video loads."""
    return feats() if callable(feats) else feats


def _read_ahead(feats_list, depth: int = 1):
    """Yield resolved feature arrays, loading ``depth`` videos ahead in a
    reader thread: video N+1's h5/pack read overlaps video N's host copy and
    device dispatch (the 1-core host would serialize IO with everything else
    otherwise).  Steady-state liveness is current + depth + 1 arrays (the
    consumer's, the queue's, and the worker's in-flight read blocked on the
    full queue), plus at most one transient during the thread handoff — the
    streaming guarantee (tests/test_streaming.py) is preserved.  Loader
    exceptions re-raise in the consumer.

    If the consumer abandons the generator (a scoring exception mid
    score_videos, or an early close), the finally block signals the worker
    and drains the queue: the thread exits within its put-poll interval and
    every parked array is released — nothing stays pinned for the process
    lifetime."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    done = object()
    stop = threading.Event()

    def put(item) -> bool:
        """Bounded put that gives up once the consumer signalled stop."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.05)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for f in feats_list:
                if not put((None, _resolve(f))):
                    return
        except BaseException as e:  # surface in the consuming thread
            put((e, None))
            return
        put((None, done))

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            err, item = q.get()
            if err is not None:
                raise err
            if item is done:
                return
            yield item
            # drop our reference BEFORE blocking in the next get: holding it
            # across the wait would make worst-case liveness depth+3 (the
            # consumed array + the next one + queue + worker in-flight)
            # instead of the documented depth+2
            del item
    finally:
        stop.set()
        while True:  # release anything still parked in the queue
            try:
                q.get_nowait()
            except queue.Empty:
                break


def _scorer_apply(encoder, head, kind, l2, params, x):
    # bf16-transferred batches are upcast on device: the compute path stays
    # f32 regardless of the wire dtype (cf. data.transfer_dtype for training)
    x = x.astype(jnp.float32)
    if l2:
        # UCF eval-only quirk: F.normalize(p=2) on the raw features
        # (Test/evaluation_UCF.py:77)
        norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
        x = x / jnp.maximum(norm, 1e-12)
    h = encoder.apply({"params": params["encoder"]}, x, deterministic=True)
    out = head.apply({"params": params["head"]}, h[:, 0, :],
                     deterministic=True)
    if kind == "classifier":
        return out[:, 1]
    return out[:, 0]


def get_apply(encoder, head, kind: str, l2: bool):
    """The process-level jitted apply for an (encoder, head, kind, l2)
    config — flax Modules are frozen dataclasses, so equal configs share one
    compiled program across every scorer instance (offline VideoScorers,
    co-teaching rounds, AND serving.StreamingScorer) instead of re-tracing."""
    key = (encoder, head, kind, l2)
    fn = _APPLY_CACHE.get(key)
    if fn is None:
        fn = _APPLY_CACHE[key] = jax.jit(
            functools.partial(_scorer_apply, encoder, head, kind, l2))
        while len(_APPLY_CACHE) > _APPLY_CACHE_MAX:
            _APPLY_CACHE.popitem(last=False)
    else:
        _APPLY_CACHE.move_to_end(key)
    return fn


def pad_to_bucket(n: int) -> int:
    for b in BUCKETS:
        if n <= b:
            return b
    return -(-n // BUCKETS[-1]) * BUCKETS[-1]


class VideoScorer:
    """Jitted encoder+head apply over [B, T, d] token batches, bucket-padded
    on the B axis.  ``head_select``: 'regressor' -> squeeze(-1),
    'classifier' -> probs[:, 1] (abnormal class)."""

    def __init__(self, encoder, head, kind: str, l2_normalize: bool = False,
                 sharding=None, transfer_dtype: str = "float32"):
        """``sharding``: optional NamedSharding for the token batch (e.g.
        parallel.mesh.batch_sharding(mesh)) — evaluation then runs
        data-parallel across the mesh; params may be tp-sharded, GSPMD
        inserts the collectives.

        ``transfer_dtype``: 'bfloat16' casts the host batch before the H2D
        copy — halves wire bytes on transfer-bound links (remote-attached
        chips; same knob as data.transfer_dtype for training).  The device
        upcasts and computes in f32, but the features lose bf16 precision:
        scores shift at ~1e-2 relative, so the default stays f32 for
        reference parity."""
        self.encoder = encoder
        self.head = head
        self.kind = kind
        self.l2_normalize = l2_normalize
        self.sharding = sharding
        self.transfer_dtype = transfer_dtype
        self._multiprocess = None  # derived once on first sharded call

    @functools.cached_property
    def _apply(self):
        return get_apply(self.encoder, self.head, self.kind,
                         self.l2_normalize)

    def _dispatch(self, params, tokens: np.ndarray):
        """ONE bucket-padded device dispatch (no host sync): returns a
        zero-arg resolve() -> scores [n].  jax dispatch is asynchronous —
        H2D copy and compute are enqueued here and only the resolve call
        blocks, so a caller that defers resolution keeps the next batch's
        transfer in flight while this one computes."""
        n = tokens.shape[0]
        bucket = pad_to_bucket(n)
        if self.transfer_dtype != "float32" \
                and str(tokens.dtype) != self.transfer_dtype:
            from ..utils.misc import resolve_np_dtype

            tokens = tokens.astype(resolve_np_dtype(self.transfer_dtype))
        if self.sharding is not None:
            # the data-sharded leading axis must divide evenly over the mesh
            div = int(np.prod([self.sharding.mesh.shape[ax]
                               for ax in self.sharding.spec if ax]))
            bucket = -(-bucket // div) * div
        if bucket != n:
            pad = np.zeros((bucket - n,) + tokens.shape[1:], tokens.dtype)
            tokens = np.concatenate([tokens, pad], axis=0)
        if self.sharding is not None:
            from ..parallel.multihost import (fetch, is_multiprocess,
                                              to_global)

            if self._multiprocess is None:  # scan the mesh devices ONCE
                self._multiprocess = is_multiprocess(self.sharding.mesh)
            if self._multiprocess:
                # global mesh: all processes run this same code on the same
                # tokens; scores come back via allgather (synchronous — the
                # collective fetch must run in program order on every
                # process, so no deferral on this path)
                tokens = to_global(tokens, self.sharding)
                out = fetch(self._apply(params, tokens))[:n]
                return lambda: out
            tokens = jax.device_put(tokens, self.sharding)
        scores = self._apply(params, tokens)
        return lambda: np.asarray(scores)[:n]

    def _plan_segments(self, n: int):
        """Split a batch of n rows into dispatch segment sizes.
        Large batches are chunked so one device program never exceeds the
        top bucket.  Batches far from a bucket size are scored as the
        largest exact-bucket prefix + the remainder (greedy decomposition):
        padding rows are real H2D bytes, and on a remote-attached chip the
        transfer dominates — e.g. 544 parts padded to 1024 would ship 88%
        dead rows; 512+32 ships none.  Small waste (<=256 rows) stays one
        padded call: an extra dispatch costs more than the bytes."""
        chunk = BUCKETS[-2]
        segs = []
        while n > 0:
            if n >= chunk:
                take = chunk
            else:
                bucket = pad_to_bucket(n)
                take = (max(x for x in BUCKETS if x <= n)
                        if bucket - n > 256 else n)
            segs.append(take)
            n -= take
        return segs

    def score_tokens_async(self, params, tokens: np.ndarray):
        """Dispatch every segment of the batch WITHOUT blocking; returns a
        zero-arg resolve() -> scores [B].  All segments' transfers/computes
        are enqueued back-to-back (they pipeline on device), and callers
        scoring many batches can double-buffer: dispatch batch N+1 before
        resolving batch N."""
        resolvers, pos = [], 0
        for s in self._plan_segments(tokens.shape[0]):
            resolvers.append(self._dispatch(params, tokens[pos:pos + s]))
            pos += s
        if not resolvers:
            return lambda: np.empty(0, np.float32)
        if len(resolvers) == 1:
            return resolvers[0]
        return lambda: np.concatenate([r() for r in resolvers])

    def score_tokens(self, params, tokens: np.ndarray) -> np.ndarray:
        """tokens: [B, T, d] float32 -> scores [B] (host numpy)."""
        return self.score_tokens_async(params, tokens)()


class _Pipeline:
    """Bounded dispatch pipeline for the cross-video scorers: batch N+1's
    H2D transfer and compute are enqueued before batch N's scores are
    fetched (score_tokens_async), overlapping transfer with compute.
    ``max_inflight`` bounds live device batches (a 2048-part LTN chunk is
    ~0.8 GB of HBM)."""

    def __init__(self, max_inflight: int = 2):
        self._q = collections.deque()
        self._max = max_inflight

    def add(self, resolve, sink):
        """``resolve``: zero-arg -> scores; ``sink``: consumes them."""
        self._q.append((resolve, sink))
        while len(self._q) >= self._max:
            self._pop()

    def _pop(self):
        resolve, sink = self._q.popleft()
        sink(resolve())

    def drain(self):
        while self._q:
            self._pop()


class ArtifactVideoScorer:
    """VideoScorer drop-in backed by an AOT artifact (export.load_scorer):
    the program and params are already serialized, so ``score_tokens``
    ignores the ``params`` argument.  Slots into any scorer's ``.scorer``
    attribute — the whole offline eval stack then runs without flax/model
    code (CLI ``evaluate --artifact``)."""

    def __init__(self, loaded):
        self.loaded = loaded
        self.sharding = None

    def score_tokens(self, params, tokens: np.ndarray) -> np.ndarray:
        del params
        tokens = np.asarray(tokens, dtype=np.float32)
        chunk = BUCKETS[-2]
        if len(tokens) > chunk:
            return np.concatenate([
                self.score_tokens(None, tokens[i:i + chunk])
                for i in range(0, len(tokens), chunk)])
        return self.loaded.score(tokens)

    def score_tokens_async(self, params, tokens: np.ndarray):
        """Pipeline-interface shim: the serialized jax.export call is
        synchronous, so 'dispatch' computes eagerly and resolve just
        returns."""
        out = self.score_tokens(params, tokens)
        return lambda: out


class ClipScorer:
    """STN: every clip of a video scored in one call
    (cf. Train/spatio_transformer_shanghaitech.py:133-137 per-video call,
    which was already whole-video — kept batched + bucket-padded here).

    ``kind='classifier'`` serves the reference's n_layers==1 pseudo-generator
    switch, which scores clips with a Classifier's abnormal-class probability
    (Train/pseudo_labels_generator_spatio.py:54-61,81-84)."""

    def __init__(self, encoder, head, n_patch: int, sharding=None,
                 kind: str = "regressor", transfer_dtype: str = "float32"):
        self.scorer = VideoScorer(encoder, head, kind, sharding=sharding,
                                  transfer_dtype=transfer_dtype)
        self.n_patch = n_patch

    def score_video(self, params, feats: np.ndarray) -> np.ndarray:
        feats = _resolve(feats)
        tokens = np.ascontiguousarray(feats[:, :self.n_patch, :],
                                      dtype=np.float32)
        return self.scorer.score_tokens(params, tokens)

    def score_videos(self, params, feats_list: List[np.ndarray]
                     ) -> List[np.ndarray]:
        """All clips of all videos in large batches (one device call per
        chunk instead of per video).  Streams chunk-sized buffers — never
        materializes the whole test set's clips at once (lazy feats load
        one video at a time)."""
        chunk = BUCKETS[-2]
        lengths = []
        flat_parts, buf, filled = [], None, 0
        pipe = _Pipeline()  # overlap chunk N+1's H2D with chunk N's compute
        for f in _read_ahead(feats_list):
            t = np.ascontiguousarray(f[:, :self.n_patch, :], dtype=np.float32)
            del f
            lengths.append(t.shape[0])
            pos = 0
            while pos < len(t):
                if buf is None:
                    buf = np.empty((chunk,) + t.shape[1:], np.float32)
                    filled = 0
                take = min(chunk - filled, len(t) - pos)
                buf[filled:filled + take] = t[pos:pos + take]
                filled += take
                pos += take
                if filled == chunk:
                    pipe.add(self.scorer.score_tokens_async(params, buf),
                             flat_parts.append)
                    buf, filled = None, 0
        if buf is not None and filled:
            pipe.add(self.scorer.score_tokens_async(params, buf[:filled]),
                     flat_parts.append)
        pipe.drain()
        flat = np.concatenate(flat_parts) if flat_parts else np.empty(0)
        out, cursor = [], 0
        for n in lengths:
            out.append(flat[cursor:cursor + n])
            cursor += n
        return out


class PartScorer:
    """LTN: chunk a video into parts of part_len clips, score all parts in
    one batch.  Returns (part_scores [n_parts], counts [n_parts])."""

    def __init__(self, encoder, head, part_len: int, n_patch: int,
                 tail_rewindow: bool = True, sharding=None,
                 transfer_dtype: str = "float32"):
        self.scorer = VideoScorer(encoder, head, "classifier",
                                  sharding=sharding,
                                  transfer_dtype=transfer_dtype)
        self.part_len = part_len
        self.n_patch = n_patch
        self.tail_rewindow = tail_rewindow

    def score_video(self, params, feats: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
        feats = np.ascontiguousarray(_resolve(feats)[:, :self.n_patch, :],
                                     dtype=np.float32)
        n_clips, n_patch, d = feats.shape
        idx_list, counts = part_slices(n_clips, self.part_len,
                                       self.tail_rewindow)
        scores = np.empty(len(idx_list), dtype=np.float32)
        # group parts by token length; full-length parts batch together
        by_len = {}
        for i, idx in enumerate(idx_list):
            by_len.setdefault(len(idx), []).append(i)
        for length, part_ids in by_len.items():
            gathered = np.stack([feats[idx_list[i]] for i in part_ids])
            tokens = gathered.reshape(len(part_ids), length * n_patch, d)
            scores[part_ids] = self.scorer.score_tokens(params, tokens)
        return scores, counts

    def score_videos(self, params, feats_list: List[np.ndarray]
                     ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Score MANY videos in large cross-video part batches: one H2D
        transfer and one device call per chunk instead of per video; parts
        stream through a chunk-sized buffer (the whole test set's tokens are
        never materialized at once).  Returns [(part_scores, counts)]
        aligned with ``feats_list``."""
        chunk = BUCKETS[-2]
        out: List[np.ndarray] = []
        all_counts: List[np.ndarray] = []
        shorts: List[Tuple[int, int, np.ndarray]] = []
        buf = None
        pending: List[Tuple[int, int]] = []
        pipe = _Pipeline()  # overlap chunk N+1's H2D with chunk N's compute

        def flush():
            nonlocal buf
            if pending:
                targets = list(pending)

                def sink(scores, targets=targets):
                    for (v, i), s in zip(targets, scores):
                        out[v][i] = s

                pipe.add(self.scorer.score_tokens_async(
                    params, buf[:len(pending)]), sink)
            buf = None
            pending.clear()

        for v, feats in enumerate(_read_ahead(feats_list)):
            feats = np.ascontiguousarray(feats[:, :self.n_patch, :],
                                         dtype=np.float32)
            n_clips, n_patch, d = feats.shape
            idx_list, counts = part_slices(n_clips, self.part_len,
                                           self.tail_rewindow)
            all_counts.append(counts)
            out.append(np.empty(len(idx_list), dtype=np.float32))
            # parts 0..n_aligned-1 are stride-aligned slices: pack them into
            # the chunk buffer with block copies off one reshape VIEW of the
            # video (no per-part gather; ~30% less host copy time on the
            # one-core host).  The re-windowed tail (full-length but
            # unaligned) and short tails take the per-part path below.
            n_aligned = n_clips // self.part_len
            full_view = feats[:n_aligned * self.part_len].reshape(
                n_aligned, self.part_len * n_patch, d)
            pos = 0
            while pos < n_aligned:
                if buf is None:
                    buf = np.empty((chunk, self.part_len * n_patch, d),
                                   np.float32)
                take = min(chunk - len(pending), n_aligned - pos)
                buf[len(pending):len(pending) + take] = \
                    full_view[pos:pos + take]
                pending.extend((v, i) for i in range(pos, pos + take))
                pos += take
                if len(pending) == chunk:
                    flush()
            del full_view  # a view of feats: holding it across the next
            # video's read-ahead would keep this video's array alive
            for i in range(n_aligned, len(idx_list)):
                idx = idx_list[i]
                if len(idx) != self.part_len:
                    shorts.append((v, i, feats[idx]))
                    continue
                if buf is None:
                    buf = np.empty((chunk, self.part_len * n_patch, d),
                                   np.float32)
                buf[len(pending)] = feats[idx].reshape(-1, d)
                pending.append((v, i))
                if len(pending) == chunk:
                    flush()
        flush()
        pipe.drain()
        # short tails grouped by length, like score_video's by_len: one
        # batched call per distinct tail length instead of one synchronous
        # batch-1 round-trip per video (pseudo generation over hundreds of
        # train videos has ~one short tail each)
        shorts_by_len: Dict[int, List[Tuple[int, int, np.ndarray]]] = {}
        for v, i, gathered in shorts:
            shorts_by_len.setdefault(gathered.shape[0], []).append(
                (v, i, gathered))
        for entries in shorts_by_len.values():
            tokens = np.stack([g for _, _, g in entries])
            tokens = tokens.reshape(len(entries), -1, tokens.shape[-1])
            scores = self.scorer.score_tokens(params, tokens)
            for (v, i, _), s in zip(entries, scores):
                out[v][i] = s
        return list(zip(out, all_counts))


class UCFBinnedScorer:
    """UCF long-video path: linspace-compress to max_clips bins, mean-pool,
    optional L2 norm, part-chunk in bin space (Test/evaluation_UCF.py:44-85;
    Train/pseudo_labels_generator_temporal.py:72-107 without re-windowing).

    Returns (part_scores, parts [(beg, end) in bin space], bin_edges r).
    """

    def __init__(self, encoder, head, part_len: int, n_patch: int,
                 max_clips: int = 32, l2_normalize: bool = True,
                 tail_rewindow: bool = True, adaptive_bins: bool = False,
                 sharding=None, transfer_dtype: str = "float32"):
        """Three reference variants map onto the flags:
        - final eval (Test/evaluation_UCF.py): l2_normalize=True,
          tail_rewindow=True, adaptive_bins=False, n_clips from n_frames//16;
        - in-training eval (Train/temporal_transformer_UCF.py:144-172):
          l2_normalize=False, tail_rewindow=False, adaptive_bins=True,
          n_clips from the feature array length;
        - pseudo-label gen (Train/pseudo_labels_generator_temporal.py:72-107):
          l2_normalize=False, tail_rewindow=False, adaptive_bins=False."""
        self.scorer = VideoScorer(encoder, head, "classifier",
                                  l2_normalize=l2_normalize,
                                  sharding=sharding,
                                  transfer_dtype=transfer_dtype)
        self.part_len = part_len
        self.n_patch = n_patch
        self.max_clips = max_clips
        self.tail_rewindow = tail_rewindow
        self.adaptive_bins = adaptive_bins

    # flush the cross-video groups every this-many accumulated parts: bounds
    # resident binned arrays to a window (~120 UCF-scale videos) while still
    # batching far beyond one video per device call
    _FLUSH_PARTS = 2048

    def score_video(self, params, feats: np.ndarray, n_clips: int):
        scores, parts, r = self.score_videos(params, [(feats, n_clips)])[0]
        return scores, parts, r

    def _plan(self, feats: np.ndarray, n_clips: int):
        feats = np.ascontiguousarray(_resolve(feats)[:, :self.n_patch, :],
                                     dtype=np.float32)
        bins = min(self.max_clips, n_clips) if self.adaptive_bins \
            else self.max_clips
        r = ucf_bin_edges(n_clips, bins)
        binned = ucf_bin_pool(feats, r)
        if self.tail_rewindow:
            parts = ucf_part_plan(bins, self.part_len)
        else:
            from .frame_auc import part_bounds
            parts = part_bounds(bins, self.part_len)
        return binned, parts, r

    def score_videos(self, params, items):
        """Cross-video batched variant: items = [(feats, n_clips)].
        Returns [(part_scores, parts, r)] aligned with items — one device
        call per token-length group per flush window.

        Groups are flushed every ``_FLUSH_PARTS`` accumulated parts so the
        binned feature arrays of only a window of videos stay resident (the
        token rows are VIEWS into each video's binned array): the UCF train
        split is ~1600 videos whose binned features would otherwise all be
        held simultaneously, against the one-video-resident streaming the
        other scorers (and pseudo/generator.py) promise."""
        items = list(items)
        metas = []   # (parts, r) per video — small, kept for the return
        outs = []
        groups: dict = {}
        pending_parts = 0

        def flush():
            nonlocal pending_parts
            for length, entries in groups.items():
                tokens = np.stack([tok for _, _, tok in entries])
                flat = self.scorer.score_tokens(params, tokens)
                for (v, i, _), s in zip(entries, flat):
                    outs[v][i] = s
            groups.clear()  # drops the token views -> binned arrays free
            pending_parts = 0

        for v, (feats, (_, n)) in enumerate(
                zip(_read_ahead([f for f, _ in items]), items)):
            binned, parts, r = self._plan(feats, n)
            del feats  # raw video array: only the pooled ``binned`` is kept
            metas.append((parts, r))
            outs.append(np.empty(len(parts), np.float32))
            for i, (beg, end) in enumerate(parts):
                d = binned.shape[-1]
                tok = binned[beg:end].reshape((end - beg) * self.n_patch, d)
                groups.setdefault(end - beg, []).append((v, i, tok))
            pending_parts += len(parts)
            if pending_parts >= self._FLUSH_PARTS:
                flush()
        flush()
        return [(outs[v], parts, r) for v, (parts, r) in enumerate(metas)]


class UCFClipBinScorer:
    """UCF STN eval: each non-empty bin mean-pooled to ONE clip and scored by
    the regressor (Train/spatio_transformer_UCF.py:120-135).

    Returns (scores [n_non_empty], bin_ids [n_non_empty], r)."""

    def __init__(self, encoder, head, n_patch: int, max_clips: int = 32,
                 sharding=None, transfer_dtype: str = "float32"):
        self.scorer = VideoScorer(encoder, head, "regressor",
                                  sharding=sharding,
                                  transfer_dtype=transfer_dtype)
        self.n_patch = n_patch
        self.max_clips = max_clips

    def score_video(self, params, feats: np.ndarray, n_clips: int):
        feats = np.ascontiguousarray(_resolve(feats)[:, :self.n_patch, :],
                                     dtype=np.float32)
        r = ucf_bin_edges(n_clips, self.max_clips)
        bin_ids = [i for i in range(self.max_clips) if r[i] != r[i + 1]]
        if not bin_ids:
            # n_frames < segment_len: the reference loop scores nothing for
            # this video and moves on (Train/spatio_transformer_UCF.py:123)
            return (np.empty(0, np.float32), np.empty(0, np.int64), r)
        tokens = np.stack([feats[r[i]:r[i + 1]].mean(axis=0)
                           for i in bin_ids])
        scores = self.scorer.score_tokens(params, tokens)
        return scores, np.asarray(bin_ids), r

    def score_videos(self, params, items):
        """Cross-video batched variant: items = [(feats, n_clips)] ->
        [(scores, bin_ids, r)].  All videos' pooled bin tokens go through
        chunked score_tokens calls instead of one dispatch per video."""
        items = list(items)
        plans = []
        all_tokens = []
        for feats, (_, n_clips) in zip(_read_ahead([f for f, _ in items]),
                                       items):
            feats = np.ascontiguousarray(feats[:, :self.n_patch, :],
                                         dtype=np.float32)
            r = ucf_bin_edges(n_clips, self.max_clips)
            bin_ids = [i for i in range(self.max_clips) if r[i] != r[i + 1]]
            for i in bin_ids:
                all_tokens.append(feats[r[i]:r[i + 1]].mean(axis=0))
            plans.append((np.asarray(bin_ids, np.int64), r))
        flat = (self.scorer.score_tokens(params, np.stack(all_tokens))
                if all_tokens else np.empty(0, np.float32))
        out, cursor = [], 0
        for bin_ids, r in plans:
            n = len(bin_ids)
            out.append((flat[cursor:cursor + n], bin_ids, r))
            cursor += n
        return out
