"""Dataset-level evaluation drivers -> frame-level AUC.

Each function reproduces one reference eval loop's score/label assembly
(file:line cited per function), with the per-part device calls replaced by the
batched scorers in evaluation/scoring.py.  Scores are truncated to the
annotation length where the reference would desync (it assumes annotations
cover all scored frames).
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Tuple

import numpy as np

from .frame_auc import expand_scores_to_frames, ucf_expand
from .metrics import roc_auc
from .scoring import (ClipScorer, PartScorer, UCFBinnedScorer,
                      UCFClipBinScorer)

Item = Tuple[np.ndarray, Optional[np.ndarray]]  # (feats, per-frame anno|None)


def _concat_auc(scores: List[np.ndarray], labels: List[np.ndarray]) -> float:
    if not scores:
        raise ValueError("no videos to evaluate (the item list is empty — "
                         "check the test split / filters)")
    return roc_auc(np.concatenate(scores), np.concatenate(labels))


def _result(all_scores, all_labels, return_scores, return_labels=False,
            compute_auc=True):
    # compute_auc=False skips the O(F log F) full-test-set ranking when the
    # caller only wants scores (the 10-crop mean path ranks once at the end)
    auc = _concat_auc(all_scores, all_labels) if compute_auc else None
    if return_labels:
        # (auc, per-video frame scores, per-video frame labels) — the pairs
        # video-level bootstrap resampling needs (metrics.bootstrap_auc_ci)
        return auc, all_scores, all_labels
    if return_scores:
        return auc, all_scores
    return auc


def evaluate_stn(params, scorer: ClipScorer, items: Iterable[Item],
                 segment_len: int = 16,
                 return_scores: bool = False,
                 return_labels: bool = False,
                 compute_auc: bool = True):
    """STN whole-video eval: clip scores x segment_len vs annotation head
    (Train/spatio_transformer_shanghaitech.py:133-143; anno=None -> zeros,
    the normal-video train-split branch :164-165).  All videos' clips are
    scored in large cross-video batches."""
    items = list(items)
    per_video = scorer.score_videos(params, [feats for feats, _ in items])
    all_scores, all_labels = [], []
    for clip_scores, (_, anno) in zip(per_video, items):
        s = np.repeat(clip_scores, segment_len)
        lab = np.zeros(len(s)) if anno is None else np.asarray(
            anno[:len(s)], dtype=np.float64)
        all_scores.append(s[:len(lab)])
        all_labels.append(lab)
    return _result(all_scores, all_labels, return_scores, return_labels,
                   compute_auc)


def evaluate_ltn(params, scorer: PartScorer, items: Iterable[Item],
                 segment_len: int = 16,
                 return_scores: bool = False,
                 return_labels: bool = False,
                 compute_auc: bool = True):
    """LTN part-chunked eval with tail re-window
    (Test/evaluation_shanghaitech_ubnormal.py:70-95).  All videos' parts are
    scored in large cross-video batches (scorer.score_videos)."""
    items = list(items)
    results = scorer.score_videos(params, [feats for feats, _ in items])
    all_scores, all_labels = [], []
    for (part_scores, counts), (_, anno) in zip(results, items):
        s = expand_scores_to_frames(part_scores, counts, segment_len)
        lab = np.zeros(len(s)) if anno is None else np.asarray(
            anno[:len(s)], dtype=np.float64)
        all_scores.append(s[:len(lab)])
        all_labels.append(lab)
    return _result(all_scores, all_labels, return_scores, return_labels,
                   compute_auc)


def evaluate_multicrop_mean(eval_fn, params, scorer, items_for_crop,
                            segment_len: int = 16, n_crops: int = 10,
                            return_scores: bool = False,
                            return_labels: bool = False):
    """10-crop averaged evaluation: per-video frame scores averaged over the
    crops, then one frame AUC.  The reference ships tenCrop TEST loaders
    (utils/load_dataset.py:338-362,731-755) but no eval script; this is the
    standard averaged-crop semantics, opt-in via the CLI's --eval-crop mean.

    ``eval_fn``: evaluate_stn or evaluate_ltn.  ``items_for_crop(c)`` yields
    that crop's (feats, anno) items (feats may be lazy loaders).  Scores and
    labels assemble per video, so --bootstrap / --dump-scores work here like
    every other eval path."""
    score_sum, annos = None, None
    for crop in range(n_crops):
        items = list(items_for_crop(crop))
        _, scores = eval_fn(params, scorer, items, segment_len,
                            return_scores=True, compute_auc=False)
        if score_sum is None:
            score_sum = [np.asarray(s, np.float64) for s in scores]
            annos = [anno for _, anno in items]
        else:
            score_sum = [a + np.asarray(s, np.float64)
                         for a, s in zip(score_sum, scores)]
    all_scores, all_labels = [], []
    for s, anno in zip(score_sum, annos):
        s = s / n_crops
        lab = (np.zeros(len(s)) if anno is None
               else np.asarray(anno[:len(s)], dtype=np.float64))
        all_scores.append(s[:len(lab)])
        all_labels.append(lab)
    return _result(all_scores, all_labels, return_scores, return_labels)


def evaluate_ucf_ltn(params, scorer: UCFBinnedScorer,
                     items: Iterable[Tuple[np.ndarray, np.ndarray, int]],
                     segment_len: int = 16, return_scores: bool = False,
                     return_labels: bool = False):
    """UCF binned eval: linspace compression + part grouping
    (Test/evaluation_UCF.py:44-87 with the scorer's final-eval flags;
    Train/temporal_transformer_UCF.py:139-172 with in-training flags).
    items: (feats, anno, n_clips)."""
    items = list(items)
    results = scorer.score_videos(params,
                                  [(f, n) for f, _, n in items])
    all_scores, all_labels = [], []
    for (part_scores, parts, r), (_, anno, _) in zip(results, items):
        vs = ucf_expand(part_scores, parts, r, anno, segment_len)
        n = min(len(vs.scores), len(vs.labels))
        all_scores.append(vs.scores[:n])
        all_labels.append(vs.labels[:n])
    return _result(all_scores, all_labels, return_scores, return_labels)


def evaluate_ucf_per_class(params, scorer: UCFBinnedScorer,
                           items, class_names, segment_len: int = 16,
                           n_anomaly_classes: int = 13, logger=None):
    """Per-anomaly-class breakdown (reference eval_each_part,
    utils/eval_utils.py:97-122): per-class AUC / PR-AUC / FAR / score gap,
    plus the Normal class's false-alarm rate.  items: (feats, anno, n_clips)
    aligned with class_names.  Returns (normal_far, mean_pr_auc)."""
    from .metrics import eval_each_part

    items = list(items)
    results = scorer.score_videos(params, [(f, n) for f, _, n in items])
    scores_dict, labels_dict = {}, {}
    for (part_scores, parts, r), (_, anno, _), cls in zip(
            results, items, class_names):
        vs = ucf_expand(part_scores, parts, r, anno, segment_len)
        n = min(len(vs.scores), len(vs.labels))
        scores_dict.setdefault(cls, []).extend(vs.scores[:n])
        labels_dict.setdefault(cls, []).extend(vs.labels[:n])
    return eval_each_part(labels_dict, scores_dict,
                          n_anomaly_classes=n_anomaly_classes, logger=logger)


def evaluate_ucf_stn(params, scorer: UCFClipBinScorer,
                     items: Iterable[Tuple[np.ndarray, np.ndarray, int]],
                     segment_len: int = 16, return_scores: bool = False,
                     return_labels: bool = False):
    """UCF STN eval: per-bin regressor scores expanded x bin width
    (Train/spatio_transformer_UCF.py:120-137).  items: (feats, anno, n_clips).
    Scores AND labels assemble per video (the reference loop is per-video),
    so bootstrap CIs / score export work like every other eval path."""
    items = list(items)
    results = scorer.score_videos(params, [(f, n) for f, _, n in items])
    all_scores, all_labels = [], []
    for (scores, bin_ids, r), (_, anno, _) in zip(results, items):
        video_scores, video_labels = [], []
        for score, i in zip(scores, bin_ids):
            width = int(r[i + 1] - r[i]) * segment_len
            lab = np.asarray(anno[r[i] * segment_len:r[i + 1] * segment_len],
                             dtype=np.float64)
            n = min(width, len(lab))
            video_scores.append(np.full(n, score))
            video_labels.append(lab[:n])
        all_scores.append(np.concatenate(video_scores) if video_scores
                          else np.empty(0))
        all_labels.append(np.concatenate(video_labels) if video_labels
                          else np.empty(0))
    return _result(all_scores, all_labels, return_scores, return_labels)
