"""Online / streaming inference for deployment.

The reference only has offline batch evaluation; a production anomaly
detector consumes video streams clip by clip.  ``StreamingScorer`` serves S
concurrent streams with ONE fixed-shape jitted device call per step:

- each stream pushes one clip's features [n_patch, d] per video timestep;
- when a stream has accumulated ``part_len`` clips, its part is scored on
  the next flush; streams are batched into a [S, part_len*n_patch, d] call
  (XLA-friendly static shape — inactive slots are masked, not re-traced);
- emitted scores follow the offline part semantics exactly (LTN classifier
  abnormal-class probability per part), so online and offline scores for
  the same video are identical (tested in tests/test_serving.py).

For the STN (per-clip scoring) use ``part_len=1`` with a regressor head.
"""

from __future__ import annotations

import base64
import json
from typing import Dict, List, Optional, Tuple

import numpy as np


class StreamingScorer:
    def __init__(self, encoder, head, params, part_len: int, n_patch: int,
                 d_model: int, max_streams: int = 64,
                 head_kind: str = "classifier",
                 transfer_dtype: str = "float32"):
        """``transfer_dtype='bfloat16'`` stores stream buffers AND ships
        flush batches in bf16 — halves both buffer RAM and the H2D bytes of
        the flush (which is transfer-bound on remote-attached chips, see
        docs/ARCHITECTURE.md).  Compute stays f32 on device; scores shift
        by the bf16 rounding of the features, so the default stays f32."""
        self.encoder = encoder
        self.head = head
        self.params = params
        self.part_len = part_len
        self.n_patch = n_patch
        self.d_model = d_model
        self.max_streams = max_streams
        self.head_kind = head_kind
        self.transfer_dtype = transfer_dtype
        # live jitted applies want ONE compiled batch shape -> pad every
        # group to max_streams; applies that pad for themselves (AOT
        # artifacts, serving_mp.RemoteApply) set this False and receive
        # only the real rows
        self.pad_batches = True
        self._buffers: Dict[str, List[np.ndarray]] = {}
        self._apply = self._build()

    @property
    def _wire_dtype(self):
        if self.transfer_dtype == "float32":
            return np.float32
        from .utils.misc import resolve_np_dtype

        return resolve_np_dtype(self.transfer_dtype)

    @classmethod
    def from_artifact(cls, path: str, max_streams: int = 64,
                      part_len: Optional[int] = None):
        """Serve straight from an AOT artifact (CLI ``export-aot``): the
        serving process needs only jax + numpy — no flax, no model code, no
        config, no retrace.  The artifact must bake the flush token length
        (part_len*n_patch); if streams may end on partial parts, each tail
        length too (``export-aot --tails``)."""
        from .export import load_scorer

        loaded = load_scorer(path)
        meta = loaded.meta
        if meta.get("l2_normalize", False):
            # online scores must equal the offline part semantics WITHOUT
            # the UCF final-eval L2 quirk; an --l2 artifact would silently
            # diverge from the live StreamingScorer
            raise ValueError(
                "artifact was exported with --l2 (UCF final-eval feature "
                "normalize); streaming serves the plain part semantics — "
                "export without --l2")
        meta_pl = meta.get("part_len")
        if part_len is not None and meta_pl is not None \
                and int(part_len) != int(meta_pl):
            # the baked token_len is part_len*n_patch: a different part_len
            # would silently recompute n_patch and truncate every pushed
            # clip — reject instead of serving garbage scores
            raise ValueError(
                f"artifact was exported with part_len={meta_pl}; the "
                f"part_len={part_len} override would re-window its baked "
                f"programs — drop the override or re-export")
        part_len = meta_pl if meta_pl is not None else part_len
        if part_len is None:
            raise ValueError("artifact meta has no part_len — pass part_len=")
        token_len = meta["token_len"]
        if token_len % part_len:
            raise ValueError(f"token_len {token_len} is not divisible by "
                             f"part_len {part_len}")
        self = cls.__new__(cls)
        self.encoder = self.head = None
        self.params = None
        self.part_len = int(part_len)
        self.n_patch = token_len // int(part_len)
        self.d_model = meta["d_model"]
        self.max_streams = max_streams
        self.head_kind = meta["kind"]
        self.transfer_dtype = "float32"  # exported programs take f32 input
        self.pad_batches = False  # LoadedScorer.score pads for itself
        self._buffers = {}
        # LoadedScorer.score handles batch padding and returns host numpy of
        # the input batch size; params are baked into the loaded artifact
        self._apply = lambda _params, tokens: loaded.score(
            np.asarray(tokens, dtype=np.float32))
        return self

    def _build(self):
        # the SAME cached jitted apply the offline scorers use (bf16 wire
        # upcasts on device there too): a process serving and evaluating the
        # same config compiles one program, and the eval-apply semantics
        # (f32 upcast, head select) cannot drift between the two paths
        from .evaluation.scoring import get_apply

        return get_apply(self.encoder, self.head, self.head_kind, False)

    def push(self, stream_id: str, clip_feat: np.ndarray) -> None:
        """Append one clip's features [n_patch, d] to a stream's buffer."""
        # validate BEFORE touching _buffers: a rejected push must not leak
        # an empty buffer entry per bad stream id in a long-running server
        clip = np.ascontiguousarray(clip_feat[:self.n_patch, :],
                                    dtype=self._wire_dtype)
        if clip.shape != (self.n_patch, self.d_model):
            raise ValueError(f"clip shape {clip.shape} != "
                             f"({self.n_patch}, {self.d_model})")
        self._buffers.setdefault(stream_id, []).append(clip)

    def end_stream(self, stream_id: str) -> List[float]:
        """Finish one stream; see end_streams."""
        return self.end_streams([stream_id])[stream_id]

    def end_streams(self, stream_ids) -> Dict[str, List[float]]:
        """Finish MANY streams with batched device calls: every buffered
        full part_len part rides the SAME padded [max_streams, L, d] program
        the flush path compiled (no per-part dispatch, no new shapes); short
        tails are scored at their true length — the offline no-re-window
        semantics (the relative-PE index slices to the shorter sequence,
        models/MultiHeadAttention.py:108) — grouped by length so each
        distinct tail length costs one program, not one call per stream.
        Returns {stream_id: scores in push order} ([] for empty buffers)."""
        out: Dict[str, List[float]] = {}
        full_parts: List[Tuple[str, np.ndarray]] = []
        tails: Dict[int, List[Tuple[str, np.ndarray]]] = {}
        popped: Dict[str, List[np.ndarray]] = {}
        for sid in stream_ids:
            buf = self._buffers.pop(sid, None)
            out[sid] = []
            if not buf:
                continue
            popped[sid] = buf
            n_full = len(buf) - len(buf) % self.part_len
            for start in range(0, n_full, self.part_len):
                full_parts.append((sid, np.concatenate(
                    buf[start:start + self.part_len], axis=0)))
            if len(buf) > n_full:
                tails.setdefault(len(buf) - n_full, []).append(
                    (sid, np.concatenate(buf[n_full:], axis=0)))

        def score_groups(entries, tok_len):
            # dispatch every group before fetching any: jax dispatch is
            # asynchronous, so group N+1's H2D overlaps group N's compute
            # (the same double-buffering the offline _Pipeline does)
            dispatched = []
            for start in range(0, len(entries), self.max_streams):
                group = entries[start:start + self.max_streams]
                n_rows = self.max_streams if self.pad_batches else len(group)
                tokens = np.zeros((n_rows, tok_len, self.d_model),
                                  self._wire_dtype)
                for i, (_, tok) in enumerate(group):
                    tokens[i] = tok
                dispatched.append((group, self._apply(self.params, tokens)))
            for group, device_scores in dispatched:
                scores = np.asarray(device_scores)[:len(group)]
                for (sid, _), s in zip(group, scores):
                    out[sid].append(float(s))

        # full parts first (per-stream push order is preserved within the
        # ordered full_parts list), then each stream's single tail
        try:
            score_groups(full_parts, self.part_len * self.n_patch)
            for tail_len, entries in sorted(tails.items()):
                score_groups(entries, tail_len * self.n_patch)
        except Exception:
            # a device/transfer error must not lose buffered clips: restore
            # every popped buffer so a retry re-ends the same streams
            self._buffers.update(popped)
            raise
        return out

    def streams(self) -> List[str]:
        """Every stream currently holding buffered clips (push order)."""
        return list(self._buffers)

    def ready(self) -> List[str]:
        return [sid for sid, buf in self._buffers.items()
                if len(buf) >= self.part_len]

    def flush(self) -> List[Tuple[str, float]]:
        """Score every stream holding >= part_len clips; one device call per
        max_streams group, all groups dispatched before any fetch (transfer
        overlaps compute).  Returns [(stream_id, score)] in scoring order."""
        ready = self.ready()
        taken: Dict[str, List[np.ndarray]] = {}
        try:
            dispatched = []
            for start in range(0, len(ready), self.max_streams):
                group = ready[start:start + self.max_streams]
                # preallocate the batch (like end_streams' score_groups):
                # a short final group fills rows in place instead of
                # re-copying the whole batch via concatenate
                n_rows = self.max_streams if self.pad_batches else len(group)
                tokens = np.zeros((n_rows,
                                   self.part_len * self.n_patch,
                                   self.d_model), self._wire_dtype)
                for i, sid in enumerate(group):
                    part = self._buffers[sid][:self.part_len]
                    del self._buffers[sid][:self.part_len]
                    if not self._buffers[sid]:
                        # drop drained entries: a long-running server cycling
                        # many stream ids must not accumulate empty buffers
                        del self._buffers[sid]
                    taken[sid] = part
                    tokens[i] = np.concatenate(part, axis=0)
                dispatched.append((group, self._apply(self.params, tokens)))
            results: List[Tuple[str, float]] = []
            for group, device_scores in dispatched:
                scores = np.asarray(device_scores)[:len(group)]
                results.extend(zip(group, scores.tolist()))
        except Exception:
            # a device/transfer error mid-flush (any group) must not lose
            # buffered clips: re-prepend every popped part so a retry
            # rescores the exact same state
            for sid, part in taken.items():
                self._buffers.setdefault(sid, [])[:0] = part
            raise
        return results


def _decode_feat(feat, n_patch: int, d_model: int) -> np.ndarray:
    """One clip's features from the wire: a base64 string of raw
    little-endian f32 bytes (row-major [n_patch, d_model]) or a nested
    list.  Exact-size checked — a truncated payload is a protocol error,
    never a silently reshaped array."""
    if isinstance(feat, str):
        raw = base64.b64decode(feat, validate=True)
        expect = n_patch * d_model * 4
        if len(raw) != expect:
            raise ValueError(
                f"feat payload is {len(raw)} bytes, expected {expect} "
                f"(little-endian f32 [{n_patch}, {d_model}])")
        return np.frombuffer(raw, dtype="<f4").reshape(n_patch, d_model)
    arr = np.asarray(feat, dtype=np.float32)
    if arr.shape != (n_patch, d_model):
        raise ValueError(f"feat shape {arr.shape} != ({n_patch}, {d_model})")
    return arr


def serve_jsonl(scorer: StreamingScorer, in_stream, out_stream,
                flush_every: int = 0) -> Tuple[int, int]:
    """Line-oriented JSON serving loop (CLI ``serve``): one request object
    per input line, one reply object per output line — the process protocol
    for running the online scorer behind a socket, a shell pipe, or a
    sidecar without writing Python.

    Requests:
      {"op": "push", "stream": ID, "feat": FEAT}   buffer one clip
      {"op": "flush"}                              score every ready stream
      {"op": "end",  "stream": ID}                 finish one stream
      {"op": "end_all"}                            finish every stream

    ``FEAT`` is base64 of raw little-endian f32 bytes ([n_patch, d_model]
    row-major — the zero-dependency producer format) or a nested list.

    Replies (flushed after every request so a pipe peer can read
    synchronously):
      push     -> nothing (or the flush replies, when --flush-every fires)
      flush    -> {"stream": ID, "score": S} per scored part — EVERY
                  buffered full part (drained until no stream is ready) —
                  then {"flushed": N}
      end(s)   -> {"stream": ID, "scores": [...], "ended": true} per stream
                  (tails scored at true length — the offline no-re-window
                  semantics, see end_streams); end_all then terminates the
                  burst with {"ended_streams": N} (possibly N=0)
      error    -> {"error": "..."} ; the loop continues (a malformed line
                  must not kill the other streams)

    EOF implicitly ends every remaining stream.  ``flush_every=K`` also
    flushes after every K pushes (when some stream is ready).  Returns
    (n_pushes, n_scores)."""
    n_push = n_scores = 0

    def emit(obj):
        out_stream.write(json.dumps(obj) + "\n")
        out_stream.flush()

    def do_flush():
        # drain EVERY buffered full part (flush() scores one part per ready
        # stream per call): a server that falls behind the push rate must
        # catch up in one flush, not leak one retained part per cycle
        nonlocal n_scores
        total = 0
        while True:
            results = scorer.flush()
            for sid, s in results:
                emit({"stream": sid, "score": s})
            total += len(results)
            if not results or not scorer.ready():
                break
        emit({"flushed": total})
        n_scores += total

    def do_end(sids, terminator=False):
        nonlocal n_scores
        outs = scorer.end_streams(sids)
        for sid in sids:
            emit({"stream": sid, "scores": outs[sid], "ended": True})
            n_scores += len(outs[sid])
        if terminator:
            # end_all's reply count is data-dependent (one line per stream,
            # possibly zero): a synchronous pipe peer needs a terminator to
            # know the burst is over, like flush's {"flushed": N}
            emit({"ended_streams": len(sids)})

    for line in in_stream:
        line = line.strip()
        if not line:
            continue
        try:
            msg = json.loads(line)
            op = msg.get("op")
            if op == "push":
                scorer.push(str(msg["stream"]),
                            _decode_feat(msg["feat"], scorer.n_patch,
                                         scorer.d_model))
                n_push += 1
                if flush_every and n_push % flush_every == 0 \
                        and scorer.ready():
                    do_flush()
            elif op == "flush":
                do_flush()
            elif op == "end":
                do_end([str(msg["stream"])])
            elif op == "end_all":
                do_end(scorer.streams(), terminator=True)
            else:
                raise ValueError(f"unknown op {op!r}")
        except Exception as e:  # malformed input must not kill the server
            emit({"error": f"{type(e).__name__}: {e}"})
    if scorer.streams():
        try:
            do_end(scorer.streams(), terminator=True)
        except Exception as e:
            # the implicit EOF cleanup must not crash the loop's return (an
            # artifact without tail programs raises here for partial tails):
            # report like any other request error and return the counts
            emit({"error": f"{type(e).__name__}: {e}"})
    return n_push, n_scores
