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

from typing import Dict, List, Optional, Tuple

import jax
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
        part_len = part_len if part_len is not None else meta.get("part_len")
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
        self._buffers = {}
        # LoadedScorer.score handles batch padding and returns host numpy of
        # the input batch size; params are baked into the loaded artifact
        self._apply = lambda _params, tokens: loaded.score(
            np.asarray(tokens, dtype=np.float32))
        return self

    def _build(self):
        encoder, head, kind = self.encoder, self.head, self.head_kind

        @jax.jit
        def apply(params, tokens):
            import jax.numpy as jnp

            tokens = tokens.astype(jnp.float32)  # bf16 wire upcasts on device
            h = encoder.apply({"params": params["encoder"]}, tokens,
                              deterministic=True)
            out = head.apply({"params": params["head"]}, h[:, 0, :],
                             deterministic=True)
            return out[:, 1] if kind == "classifier" else out[:, 0]

        return apply

    def push(self, stream_id: str, clip_feat: np.ndarray) -> None:
        """Append one clip's features [n_patch, d] to a stream's buffer."""
        buf = self._buffers.setdefault(stream_id, [])
        clip = np.ascontiguousarray(clip_feat[:self.n_patch, :],
                                    dtype=self._wire_dtype)
        if clip.shape != (self.n_patch, self.d_model):
            raise ValueError(f"clip shape {clip.shape} != "
                             f"({self.n_patch}, {self.d_model})")
        buf.append(clip)

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
        for sid in stream_ids:
            buf = self._buffers.pop(sid, None)
            out[sid] = []
            if not buf:
                continue
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
                tokens = np.zeros((self.max_streams, tok_len, self.d_model),
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
        score_groups(full_parts, self.part_len * self.n_patch)
        for tail_len, entries in sorted(tails.items()):
            score_groups(entries, tail_len * self.n_patch)
        return out

    def ready(self) -> List[str]:
        return [sid for sid, buf in self._buffers.items()
                if len(buf) >= self.part_len]

    def flush(self) -> List[Tuple[str, float]]:
        """Score every stream holding >= part_len clips; one device call per
        max_streams group, all groups dispatched before any fetch (transfer
        overlaps compute).  Returns [(stream_id, score)] in scoring order."""
        ready = self.ready()
        dispatched = []
        for start in range(0, len(ready), self.max_streams):
            group = ready[start:start + self.max_streams]
            tokens = np.zeros((len(group), self.part_len * self.n_patch,
                               self.d_model), self._wire_dtype)
            for i, sid in enumerate(group):
                part = self._buffers[sid][:self.part_len]
                del self._buffers[sid][:self.part_len]
                tokens[i] = np.concatenate(part, axis=0)
            pad = self.max_streams - len(group)
            if pad:
                tokens = np.concatenate(
                    [tokens, np.zeros((pad,) + tokens.shape[1:],
                                      self._wire_dtype)])
            dispatched.append((group, self._apply(self.params, tokens)))
        results: List[Tuple[str, float]] = []
        for group, device_scores in dispatched:
            scores = np.asarray(device_scores)[:len(group)]
            results.extend(zip(group, scores.tolist()))
        return results
