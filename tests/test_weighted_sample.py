"""Efraimidis-Spirakis weighted sampling (stages/sampling.weighted_sample)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.hashing import splitmix64
from ai_service_ocr_grading_handler_ray.stages.sampling import weighted_sample


def _ds(ids, ws):
    return rd.from_items(
        [{"doc_id": int(i), "w": int(v)} for i, v in zip(ids, ws)]
    )


def _reference_es(ids, ws, k, seed):
    """The textbook formulation: k largest u^(1/w) — a monotone twin of
    the engine's ln(u)/w key (same selected set, same order)."""
    h = splitmix64(np.asarray(ids, dtype=np.int64).view(np.uint64) + np.uint64(seed))
    u = (h.astype(np.float64) + 1.0) / 2.0**64
    key = u ** (1.0 / np.asarray(ws, dtype=np.float64))
    order = sorted(range(len(ids)), key=lambda j: (-key[j], ids[j]))
    return [ids[j] for j in order[:k]]


def test_matches_textbook_es_selection():
    ids = list(range(200))
    ws = [(i % 13) + 1 for i in ids]
    got = weighted_sample(_ds(ids, ws), k=20, weight_col="w", seed=3)
    assert list(got["doc_id"]) == _reference_es(ids, ws, 20, 3)


def test_partitioning_invariance():
    ids = list(range(300))
    ws = [(i % 7) + 1 for i in ids]
    one = weighted_sample(_ds(ids, ws), k=25, weight_col="w", seed=1)
    many = weighted_sample(
        _ds(ids, ws).repartition(7), k=25, weight_col="w", seed=1
    )
    pd.testing.assert_frame_equal(
        one.reset_index(drop=True), many.reset_index(drop=True)
    )


def test_inclusion_probability_tracks_weight():
    # 3 items, weights 1:2:4, k=1 → first-draw probabilities 1/7, 2/7, 4/7
    ids, ws = [10, 20, 30], [1, 2, 4]
    wins = {i: 0 for i in ids}
    for seed in range(600):
        wins[_reference_es(ids, ws, 1, seed)[0]] += 1
    # ES first draw is exactly weight-proportional; allow sampling noise
    assert wins[30] > wins[20] > wins[10]
    assert abs(wins[30] / 600 - 4 / 7) < 0.07
    assert abs(wins[10] / 600 - 1 / 7) < 0.05


def test_seed_changes_the_draw():
    ids = list(range(100))
    ws = [1] * 100
    a = weighted_sample(_ds(ids, ws), k=10, weight_col="w", seed=0)
    b = weighted_sample(_ds(ids, ws), k=10, weight_col="w", seed=1)
    assert list(a["doc_id"]) != list(b["doc_id"])


def test_keep_cols_pass_through():
    ds = rd.from_items(
        [{"doc_id": i, "w": 1, "lang": "en" if i % 2 else "de"} for i in range(50)]
    )
    got = weighted_sample(
        ds, k=5, weight_col="w", seed=0, keep_cols=("lang",)
    )
    assert set(got.columns) == {"doc_id", "w", "lang"}
    assert set(got["lang"]) <= {"en", "de"}


def test_rejects_nonpositive_weights():
    with pytest.raises(Exception):
        weighted_sample(_ds([1, 2], [1, 0]), k=1, weight_col="w").head()
