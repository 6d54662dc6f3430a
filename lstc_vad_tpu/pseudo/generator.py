"""Pseudo-label generators — the co-teaching hand-off artifact.

Each network scores every TRAIN video; scores above a threshold are kept,
the rest zeroed; the dict {key+'.npy': scores} is saved via np.save
(Train/pseudo_labels_generator_spatio.py:22-89,
Train/pseudo_labels_generator_temporal.py:22-146).  Thresholds from the
README pipeline: STN->LTN 0.9, LTN->STN 0.65 (README.md:27,35).

TPU-native: ALL train videos' clips (STN) / parts (LTN) stream through the
cross-video batched scorers — chunk-sized device calls, one video's features
resident at a time (lazy store fetch).  Scoring is identical to the
reference per-clip/per-part loops (scorer parity tests).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..data.annotations import TrainRecord
from ..data.feature_store import FeatureStore
from ..evaluation.scoring import ClipScorer


def _threshold(scores: np.ndarray, threshold: float) -> np.ndarray:
    """score if score > tau else 0 (pseudo_labels_generator_spatio.py:85-86)."""
    return np.where(scores > threshold, scores, 0.0).astype(np.float32)


def generate_stn_pseudo_labels(params, scorer: ClipScorer,
                               store: FeatureStore,
                               records: List[TrainRecord],
                               threshold: float = 0.9) -> Dict[str, np.ndarray]:
    """One clip-level score per train clip, thresholded.

    ``scorer`` may wrap a Regressor (n_layers>1 path) or a Classifier head
    whose abnormal-class probability is taken (the reference's n_layers==1
    switch, pseudo_labels_generator_spatio.py:54-61,81-84) — pick via the
    scorer's head kind."""
    lazy = [(lambda key=rec.key: store.get(key)) for rec in records]
    per_video = scorer.score_videos(params, lazy)
    return {rec.key + ".npy": _threshold(scores, threshold)
            for rec, scores in zip(records, per_video)}


def generate_ltn_pseudo_labels(params, scorer, store: FeatureStore,
                               records: List[TrainRecord],
                               threshold: float = 0.65,
                               dataset: str = "SHT",
                               segment_len: int = 16) -> Dict[str, np.ndarray]:
    """Part-level scores expanded back to clip (SHT/UBnormal,
    pseudo_labels_generator_temporal.py:109-143 — NO tail re-window) or bin
    (UCF, :66-107) resolution, thresholded per part before expansion.

    ``scorer``: PartScorer(tail_rewindow=False) for SHT/UBnormal,
    UCFBinnedScorer(l2_normalize=False, tail_rewindow=False) for UCF."""
    out = {}
    lazy = [(lambda key=rec.key: store.get(key)) for rec in records]
    if dataset == "UCF":
        items = [(f, rec.n_frames // segment_len)
                 for f, rec in zip(lazy, records)]
        for rec, (part_scores, parts, r) in zip(
                records, scorer.score_videos(params, items)):
            part_scores = _threshold(part_scores, threshold)
            # The reference saves BIN-resolution scores here (<=32 entries,
            # pseudo_labels_generator_temporal.py:106-107) which its own
            # train dataset then indexes with CLIP indices — a latent
            # IndexError for videos longer than 32 clips.  We expand each
            # part score over its bins' clip widths (r[end]-r[beg]) and pad/
            # trim to the stored clip count so co-teaching actually works.
            clip_scores = np.repeat(
                part_scores,
                [int(r[end] - r[beg]) for beg, end in parts]).astype(
                    np.float32)
            feat_len = store.n_clips(rec.key)
            if len(clip_scores) < feat_len:
                pad = np.full(feat_len - len(clip_scores),
                              clip_scores[-1] if len(clip_scores) else 0.0,
                              np.float32)
                clip_scores = np.concatenate([clip_scores, pad])
            out[rec.key + ".npy"] = clip_scores[:feat_len]
        return out
    for rec, (part_scores, counts) in zip(
            records, scorer.score_videos(params, lazy)):
        part_scores = _threshold(part_scores, threshold)
        out[rec.key + ".npy"] = np.repeat(part_scores, counts)
    return out


def save_pseudo_labels(path: str, pseudo: Dict[str, np.ndarray]):
    np.save(path, pseudo)  # np.load(..., allow_pickle=True).tolist() reads it
