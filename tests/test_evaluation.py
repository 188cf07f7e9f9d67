"""Classifier evaluation (stages/evaluation.py): exact tie-corrected
AUC vs a brute-force pairwise reference, threshold confusion,
degenerate input guard, quantization, partition invariance."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.evaluation import binary_eval


def _brute_auc(scores, labels):
    """Pairwise definition: P(s_pos > s_neg) + 0.5 P(s_pos == s_neg)."""
    pos = scores[labels]
    neg = scores[~labels]
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


def _ds(scores, labels, parts=3):
    return rd.from_pandas(
        pd.DataFrame({"score": scores, "label": labels})
    ).repartition(parts)


def test_auc_matches_brute_force_with_ties(ray_session):
    rng = np.random.default_rng(11)
    scores = rng.integers(0, 12, 400) / 16.0  # heavy ties
    labels = rng.random(400) < (0.2 + scores)
    if labels.all() or not labels.any():
        labels[0] = not labels[0]
    out = binary_eval(_ds(scores, labels))
    assert out.auc.iloc[0] == pytest.approx(_brute_auc(scores, labels), abs=1e-6)
    assert int(out.n_pos.iloc[0]) == int(labels.sum())
    assert int(out.n_neg.iloc[0]) == int((~labels).sum())


def test_threshold_confusion(ray_session):
    scores = np.array([0.1, 0.4, 0.6, 0.9])
    labels = np.array([False, True, False, True])
    out = binary_eval(_ds(scores, labels, parts=2), threshold=0.5)
    assert (int(out.tp.iloc[0]), int(out.fp.iloc[0]),
            int(out.fn.iloc[0]), int(out.tn.iloc[0])) == (1, 1, 1, 1)
    assert out.accuracy.iloc[0] == pytest.approx(0.5)
    assert out.prec.iloc[0] == pytest.approx(0.5)
    assert out.rec.iloc[0] == pytest.approx(0.5)
    # perfect separation
    out2 = binary_eval(_ds(scores, np.array([False, False, True, True])))
    assert out2.auc.iloc[0] == 1.0


def test_degenerate_raises(ray_session):
    with pytest.raises(ValueError, match="positive and one negative"):
        binary_eval(_ds(np.array([0.1, 0.2]), np.array([True, True])))


def test_decimals_quantization(ray_session):
    scores = np.array([0.10004, 0.10006, 0.5, 0.9])
    labels = np.array([False, True, False, True])
    out = binary_eval(_ds(scores, labels), decimals=3)
    # 0.10004 and 0.10006 collapse to 0.1 — a tie appears
    q = np.round(scores, 3)
    assert out.auc.iloc[0] == pytest.approx(_brute_auc(q, labels), abs=1e-6)


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(5)
    scores = rng.integers(0, 8, 100) / 8.0
    labels = rng.random(100) < 0.4
    if labels.all() or not labels.any():
        labels[0] = not labels[0]
    a = binary_eval(_ds(scores, labels, parts=1))
    b = binary_eval(_ds(scores, labels, parts=7))
    pd.testing.assert_frame_equal(a, b)
