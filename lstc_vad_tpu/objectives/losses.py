"""Training objectives — vectorized, jit-friendly.

Reproduces the reference losses exactly (values match the torch versions to
float32 precision; verified in tests/test_losses.py against torch):

- MIL ranking hinge + L1 sparsity
  (Train/spatio_transformer_shanghaitech.py:21-32,
   Train/temporal_transformer_shanghaitech.py:25-36).
  The reference's Python loop over the batch is replaced by one broadcasted
  pairwise hinge — same sum over all batch_size^2 (normal, abnormal) pairs,
  same normalization.

- Soft-label cross-entropy applied to the Classifier's ALREADY-SOFTMAXED
  outputs (Train/temporal_transformer_shanghaitech.py:21-23; the Classifier
  ends in Softmax, models/Classifier.py:10).  torch's soft-label
  F.cross_entropy applies log_softmax to its input again, so the effective
  objective is CE(log_softmax(probs), soft_targets).  We reproduce that exact
  objective rather than an idealized CE.

- Class-weighted BCE on pseudo labels for co-teaching
  (Train/spatio_transformer_MIL_CE.py:23-26).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def mil_ranking_loss(video_scores: jnp.ndarray,
                     abnormal_snippet_scores: jnp.ndarray,
                     lambda_1: float) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pairwise MIL ranking hinge.

    Args:
      video_scores: [2B] — per-video score, normal videos first
        (max-pooled over parts by the caller).
      abnormal_snippet_scores: all raw snippet/part scores of the abnormal
        half, any shape — its mean is the L1 sparsity term.
      lambda_1: sparsity weight.

    Returns (loss, hinge_err, sparsity).
    """
    b = video_scores.shape[0] // 2
    nor = video_scores[:b]
    abn = video_scores[b:]
    # sum_i sum_j relu(1 - abn_j + nor_i) / B^2  — all pairs at once.
    hinge = jax.nn.relu(1.0 - abn[None, :] + nor[:, None])
    err = jnp.sum(hinge) / (b * b)
    spar = jnp.mean(abnormal_snippet_scores)
    return err + lambda_1 * spar, err, spar


def stn_mil_loss(snippet_scores: jnp.ndarray, part_num: int, part_len: int,
                 lambda_1: float) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """STN MIL loss on regressor outputs.

    ``snippet_scores``: [2B, part_num*part_len] (or [2B, part_num*part_len, 1]).
    Video score = max over part_num of (mean over part_len)
    (Train/spatio_transformer_shanghaitech.py:22).
    """
    b2 = snippet_scores.shape[0]
    scores = snippet_scores.reshape(b2, part_num, part_len)
    video = jnp.max(jnp.mean(scores, axis=-1), axis=-1)
    return mil_ranking_loss(video, snippet_scores[b2 // 2:], lambda_1)


def ltn_mil_loss(part_scores: jnp.ndarray, part_num: int,
                 lambda_1: float) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """LTN MIL loss on the classifier's abnormal-class probability.

    ``part_scores``: [2B*part_num] flat, normal half first.  Video score =
    max over part_num — no part_len mean
    (Train/temporal_transformer_shanghaitech.py:26).

    REFERENCE QUIRK, reproduced on purpose: the sparsity term slices the
    FLAT score vector at index batch_size (``abn_pred = y_pred[batch_size:]``,
    temporal_transformer_shanghaitech.py:33, where y_pred is [2B*P]) — so it
    averages most of the NORMAL videos' part scores too, not just the
    abnormal half.  We reproduce that exact objective (see PARITY.md).
    """
    scores = part_scores.reshape(-1, part_num)
    video = jnp.max(scores, axis=-1)
    b = scores.shape[0] // 2
    flat = part_scores.reshape(-1)
    return mil_ranking_loss(video, flat[b:], lambda_1)


def coteach_stn_mil_loss(snippet_scores: jnp.ndarray, part_num: int,
                         part_len: int, lambda_1: float,
                         flat_sparsity: bool = True
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Co-teaching round's STN MIL (Train/spatio_transformer_MIL_CE.py:32-44):
    same video score as stn_mil_loss; the sparsity term depends on the
    dataset branch of the CALLER's reshape:

    - SHT/UBnormal (``flat_sparsity=True``): regressor outputs stay flat
      [2B*pn*pl, 1] (MIL_CE.py:176), so ``abn_pred = y_pred[batch_size:]``
      (:40-41) slices the FLAT tensor — the flat-slice quirk, averaging
      nearly all normal-video snippet scores too.
    - UCF (``flat_sparsity=False``): outputs are re-viewed to
      [2B, pn*pl, d] first (MIL_CE.py:174-175), so the same slice selects
      the abnormal HALF of the batch — the standard MIL sparsity."""
    b2 = snippet_scores.shape[0]
    scores = snippet_scores.reshape(b2, part_num, part_len)
    video = jnp.max(jnp.mean(scores, axis=-1), axis=-1)
    if flat_sparsity:
        spar_src = snippet_scores.reshape(-1)[b2 // 2:]
    else:
        spar_src = snippet_scores[b2 // 2:].reshape(-1)
    return mil_ranking_loss(video, spar_src, lambda_1)


def soft_cross_entropy_on_probs(probs: jnp.ndarray,
                                soft_labels: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.functional.cross_entropy(probs, soft_labels) semantics.

    ``probs`` are the Classifier's softmax outputs in [0,1]; torch re-applies
    log_softmax to them (soft-target branch of F.cross_entropy), so:
        loss = mean_n( -sum_c soft[n,c] * log_softmax(probs)[n,c] )
    """
    logp = jax.nn.log_softmax(probs, axis=-1)
    return jnp.mean(-jnp.sum(soft_labels * logp, axis=-1))


def weighted_bce(probs: jnp.ndarray, soft_labels: jnp.ndarray,
                 lambda_normal: float, lambda_abnormal: float,
                 eps: float = 1e-8) -> jnp.ndarray:
    """Class-weighted BCE on regressor scores vs soft pseudo labels.

    ``probs``: [2B, P]; ``soft_labels``: [2B, P, 2] with
    soft_labels[..., 0] = 1 - p, soft_labels[..., 1] = p
    (Train/spatio_transformer_MIL_CE.py:23-26).
    """
    return jnp.mean(
        -lambda_normal * soft_labels[..., 0] * jnp.log(1.0 - probs + eps)
        - lambda_abnormal * soft_labels[..., 1] * jnp.log(probs + eps))


def build_clip_labels(batch_size: int, part_num: int, part_len: int,
                      abnorm_pseudo: jnp.ndarray) -> jnp.ndarray:
    """[2B, part_num, 2] soft targets: normal videos hard (1,0), abnormal
    parts soft (1-p, p) from clip pseudo scores
    (temporal_transformer_shanghaitech.py:103-112, shared by the LTN CE and
    the co-teaching BCE builds)."""
    norm = jnp.zeros((batch_size, part_num, 2),
                     jnp.float32).at[:, :, 0].set(1.0)
    abnorm = soft_labels_from_pseudo(
        abnorm_pseudo.reshape(batch_size, part_num * part_len), part_len)
    return jnp.concatenate([norm, abnorm], axis=0)


def soft_labels_from_pseudo(pseudo: jnp.ndarray, part_len: int) -> jnp.ndarray:
    """Clip-level pseudo scores -> per-part soft (1-p, p) targets.

    ``pseudo``: [B, part_num*part_len] clip pseudo scores of abnormal videos.
    Returns [B, part_num, 2]; p = mean over part_len
    (Train/temporal_transformer_shanghaitech.py:106-111).
    """
    b = pseudo.shape[0]
    p = jnp.mean(pseudo.reshape(b, -1, part_len), axis=-1)
    return jnp.stack([1.0 - p, p], axis=-1)
