"""Misc utilities completing the reference's utils surface
(utils/utils.py:12-23,118-131 — both unused by the committed drivers but part
of the public API)."""

from __future__ import annotations

import numpy as np


def resolve_np_dtype(name: str) -> np.dtype:
    """Numpy dtype from a config string, resolving ml_dtypes names
    ('bfloat16', 'float8_e4m3fn', ...) that plain np.dtype rejects — the
    one lookup behind every transfer_dtype knob (training pipeline, eval
    scorers, streaming serving)."""
    import ml_dtypes

    return np.dtype(getattr(ml_dtypes, name, name))


def random_perturb(v_len: int, num_segments: int,
                   rng: np.random.Generator) -> np.ndarray:
    """Per-segment random index sampler (utils/utils.py:118-131): segment i
    picks a random index within [i*v_len/num_segments, (i+1)*v_len/num_segments]."""
    points = np.arange(num_segments) * v_len / num_segments
    out = np.empty(num_segments, dtype=int)
    for i in range(num_segments):
        lo = int(points[i])
        hi = int(points[i + 1]) if i < num_segments - 1 else v_len - 1
        out[i] = rng.integers(lo, hi + 1) if hi > lo else lo
    return out


def decode_and_patchify(frames, patch_per_height: int, patch_per_width: int):
    """JPEG-decode frames and split into a grid of patches — how the
    reference's patch features were produced offline (utils/utils.py:12-23).
    Requires cv2; gated because the runtime pipeline never needs it."""
    try:
        import cv2
    except ImportError as e:  # pragma: no cover
        raise ImportError("decode_and_patchify needs opencv-python") from e
    out = []
    for frame in frames:
        img = cv2.cvtColor(
            cv2.imdecode(np.frombuffer(frame, np.uint8), cv2.IMREAD_COLOR),
            cv2.COLOR_BGR2RGB)
        h = img.shape[0] // patch_per_height
        w = img.shape[1] // patch_per_width
        patches = [img[i * h:(i + 1) * h, j * w:(j + 1) * w]
                   for i in range(patch_per_height)
                   for j in range(patch_per_width)]
        out.append(patches)
    return out
