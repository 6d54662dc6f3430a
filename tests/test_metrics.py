"""Metric zoo vs sklearn (the reference's metric backend, utils/eval_utils.py)."""

import numpy as np
import pytest
from sklearn import metrics as skm

from lstc_vad_tpu.evaluation import metrics as M


def _data(rng, n=500, ties=False):
    labels = (rng.random(n) < 0.3).astype(float)
    scores = rng.random(n)
    if ties:
        scores = np.round(scores, 1)
    return scores, labels


@pytest.mark.parametrize("ties", [False, True])
def test_roc_auc_matches_sklearn(rng, ties):
    scores, labels = _data(rng, ties=ties)
    fpr, tpr, _ = skm.roc_curve(labels, scores, pos_label=1)
    expected = skm.auc(fpr, tpr)
    assert M.roc_auc(scores, labels) == pytest.approx(expected, abs=1e-12)


def test_roc_auc_perfect_and_random(rng):
    labels = np.array([0, 0, 1, 1], dtype=float)
    assert M.roc_auc([0.1, 0.2, 0.8, 0.9], labels) == 1.0
    assert M.roc_auc([0.9, 0.8, 0.2, 0.1], labels) == 0.0
    assert M.roc_auc([0.5, 0.5, 0.5, 0.5], labels) == 0.5


@pytest.mark.parametrize("ties", [False, True])
def test_pr_auc_matches_sklearn(rng, ties):
    scores, labels = _data(rng, ties=ties)
    precision, recall, _ = skm.precision_recall_curve(labels, scores, pos_label=1)
    expected = skm.auc(recall, precision)
    assert M.pr_auc(scores, labels) == pytest.approx(expected, abs=1e-10)


def test_average_precision_matches_sklearn(rng):
    scores, labels = _data(rng)
    expected = skm.average_precision_score(labels, scores)
    assert M.average_precision(scores, labels) == pytest.approx(expected, abs=1e-10)


def test_threshold_metrics(rng):
    scores, labels = _data(rng)
    binar = (scores > 0.5).astype(float)
    tp = np.sum(binar * labels)
    fp = np.sum(binar * (1 - labels))
    fn = np.sum((1 - binar) * labels)
    tn = np.sum((1 - binar) * (1 - labels))
    assert M.false_alarm(scores, labels) == pytest.approx(fp / (fp + tn))
    assert M.false_neg(scores, labels) == pytest.approx(fn / (fn + tp))
    assert M.precision(scores, labels) == pytest.approx(tp / (tp + fp))
    assert M.recall(scores, labels) == pytest.approx(tp / (tp + fn))
    assert M.accuracy(scores, labels) == pytest.approx((tp + tn) / len(labels))
    assert M.specificity(scores, labels) == pytest.approx(tn / (tn + fp))
    assert M.sensitivity(scores, labels) == pytest.approx(tp / (tp + fn))
    # reference-quirk MCC: denominator uses (fp+fn), not (tp+fn)
    ref_mcc = (tp * tn - fp * fn) / np.sqrt(
        (tp + fp) * (fp + fn) * (tn + fp) * (tn + fn))
    assert M.mcc(scores, labels) == pytest.approx(ref_mcc, abs=1e-10)
    assert M.mcc_standard(scores, labels) == pytest.approx(
        skm.matthews_corrcoef(labels, binar), abs=1e-10)
    assert M.geometric_mean(scores, labels) == pytest.approx(
        np.sqrt((tp / (tp + fn)) * (tn / (tn + fp))))
    f = M.f_measure(scores, labels)
    assert f == pytest.approx(skm.f1_score(labels, binar), abs=1e-10)


def test_f1_rmse_gap(rng):
    scores, labels = _data(rng)
    binar = (scores > 0.5).astype(float)
    assert M.f1(binar, labels) == pytest.approx(skm.f1_score(labels, binar))
    assert M.rmse(scores, labels) == pytest.approx(
        np.sqrt(skm.mean_squared_error(labels, scores)))
    gap = np.mean(scores[labels == 1]) - np.mean(scores[labels == 0])
    assert M.score_gap(scores, labels) == pytest.approx(gap)


def test_eval_frame_auc_is_roc_auc(rng):
    scores, labels = _data(rng)
    assert M.eval_frame_auc(list(scores), list(labels)) == M.roc_auc(scores, labels)


def test_classification_accuracies(rng):
    logits = rng.standard_normal((50, 2))
    labels = (rng.random(50) < 0.5).astype(float)
    acc = M.classification_accuracy(logits, labels)
    expected = np.mean(np.argmax(logits, 1) == labels)
    assert acc == pytest.approx(expected)

    scores = rng.random(50)
    acc_b = M.classification_accuracy_binary(scores, labels)
    expected_b = np.mean(((labels == 1) & (scores > 0.5))
                         | ((labels == 0) & (scores < 0.5)))
    assert acc_b == pytest.approx(expected_b)


def test_bootstrap_auc_ci_contains_point_and_is_deterministic():
    from lstc_vad_tpu.evaluation.metrics import bootstrap_auc_ci, roc_auc

    rng = np.random.default_rng(0)
    scores, labels = [], []
    for _ in range(12):
        lab = (rng.random(200) < 0.3).astype(np.float64)
        scores.append(np.clip(lab * 0.4 + rng.random(200) * 0.6, 0, 1))
        labels.append(lab)
    point = roc_auc(np.concatenate(scores), np.concatenate(labels))
    lo, hi = bootstrap_auc_ci(scores, labels, n_boot=300, seed=1)
    assert lo <= point <= hi and 0.0 < lo < hi < 1.0
    assert (lo, hi) == bootstrap_auc_ci(scores, labels, n_boot=300, seed=1)
    assert (lo, hi) != bootstrap_auc_ci(scores, labels, n_boot=300, seed=2)


def test_bootstrap_auc_ci_degenerate():
    from lstc_vad_tpu.evaluation.metrics import bootstrap_auc_ci

    # all-normal videos: every resample is single-class -> nan interval
    scores = [np.random.default_rng(0).random(50) for _ in range(3)]
    labels = [np.zeros(50) for _ in range(3)]
    lo, hi = bootstrap_auc_ci(scores, labels, n_boot=20)
    assert np.isnan(lo) and np.isnan(hi)
    lo2, hi2 = bootstrap_auc_ci([], [], n_boot=5)
    assert np.isnan(lo2) and np.isnan(hi2)
