"""Logistic-regression quality classifier (stages/classifier.py):
distributed-vs-single-process equivalence, learning sanity (separates
planted classes), determinism, scoring invariants."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.classifier import (
    logreg_score,
    logreg_train,
    logreg_train_reference,
)

# planted two-class corpus: "good" docs share quality words, "bad" docs
# share junk words; both share filler so the task isn't trivial
GOOD = [f"measured results analysis figure section filler{i % 3}" for i in range(24)]
BAD = [f"click cheap deal win prize filler{i % 3}" for i in range(24)]
TEXTS = GOOD + BAD
LABELS = [1] * len(GOOD) + [0] * len(BAD)
DIM = 1 << 12


def _ds(n_blocks=1):
    t = pa.table(
        {
            "doc_id": list(range(len(TEXTS))),
            "text": pa.array(TEXTS, type=pa.string()),
            "label": pa.array(LABELS, type=pa.int64()),
        }
    )
    ds = rd.from_arrow(t)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def test_matches_single_process_reference(ray_session):
    w, b = logreg_train(_ds(), label_col="label", dim=DIM, n_iter=10)
    wr, br = logreg_train_reference(TEXTS, LABELS, dim=DIM, n_iter=10)
    np.testing.assert_allclose(w, wr, atol=1e-12)
    assert b == pytest.approx(br, abs=1e-12)


def test_multi_block_drift_is_float_only(ray_session):
    """Across block layouts only float addition order changes: the
    gradients (hence weights) agree to near machine epsilon."""
    w1, b1 = logreg_train(_ds(), label_col="label", dim=DIM, n_iter=10)
    w5, b5 = logreg_train(_ds(5), label_col="label", dim=DIM, n_iter=10)
    np.testing.assert_allclose(w1, w5, atol=1e-9)
    assert b1 == pytest.approx(b5, abs=1e-9)


def test_learns_the_planted_separation(ray_session):
    w, b = logreg_train(_ds(4), label_col="label", dim=DIM, n_iter=40)
    scored = logreg_score(_ds(), w, b).to_pandas()
    good = scored[scored.label == 1]["prob"].to_numpy()
    bad = scored[scored.label == 0]["prob"].to_numpy()
    assert good.min() > bad.max()  # perfect separation on the planted task
    assert good.mean() > 0.6
    assert bad.mean() < 0.4


def test_presence_mode_matches_reference(ray_session):
    w, b = logreg_train(
        _ds(3), label_col="label", dim=DIM, n_iter=10, mode="presence"
    )
    wr, br = logreg_train_reference(
        TEXTS, LABELS, dim=DIM, n_iter=10, mode="presence"
    )
    np.testing.assert_allclose(w, wr, atol=1e-9)
    assert b == pytest.approx(br, abs=1e-9)
    # presence mode also separates the planted classes
    scored = logreg_score(_ds(), w, b, mode="presence").to_pandas()
    assert (
        scored[scored.label == 1]["prob"].min()
        > scored[scored.label == 0]["prob"].max()
    )


def test_scores_are_probabilities(ray_session):
    w, b = logreg_train(_ds(), label_col="label", dim=DIM, n_iter=5)
    scored = logreg_score(_ds(), w, b).to_pandas()
    assert len(scored) == len(TEXTS)
    assert ((scored["prob"] > 0) & (scored["prob"] < 1)).all()
    # input columns pass through
    assert {"doc_id", "text", "label", "prob"} <= set(scored.columns)


def test_empty_dataset_raises(ray_session):
    empty = rd.from_arrow(
        pa.table({"text": pa.array([], type=pa.string()),
                  "label": pa.array([], type=pa.int64())})
    )
    with pytest.raises(Exception, match="empty"):
        logreg_train(empty, label_col="label", dim=DIM, n_iter=1)


def test_training_is_deterministic(ray_session):
    """The sorted canonical fold (linalg.fold_sparse_partials) makes the
    update a pure function of the gradient-partial multiset; the only
    residual jitter source is the streaming executor occasionally
    composing materialized blocks differently (different batch
    boundaries → different partial multiset), which bounds drift at
    float-epsilon scale."""
    w1, b1 = logreg_train(_ds(3), label_col="label", dim=DIM, n_iter=8)
    w2, b2 = logreg_train(_ds(3), label_col="label", dim=DIM, n_iter=8)
    np.testing.assert_allclose(w1, w2, atol=1e-12)
    assert b1 == pytest.approx(b2, abs=1e-12)
