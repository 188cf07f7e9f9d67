"""Lateness audit + NTILE (stages/sequence.py) and session co-pairs
(stages/markov.py): hand-computed fixtures, NTILE remainder semantics,
no-late-events NULLs, session-boundary pair isolation."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.markov import session_copairs
from ai_service_ocr_grading_handler_ray.stages.sequence import (
    lateness_audit,
    ntile_by_group,
)

US = 1_000_000
MIN = 60 * US


def _events(rows):
    """rows: (event_id, user_id, ts_us, event_type, value)."""
    return rd.from_pandas(
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "user_id": [r[1] for r in rows],
                "ts": pd.to_datetime([r[2] for r in rows], unit="us"),
                "event_type": [r[3] for r in rows],
                "value": [float(r[4]) for r in rows],
            }
        )
    )


def test_lateness_hand_computed(ray_session):
    # user 1 arrivals (by event_id): ts 10, 20, 5 (late by 15), 30
    ds = _events(
        [
            (1, 1, 10 * US, "a", 0),
            (2, 1, 20 * US, "a", 0),
            (3, 1, 5 * US, "a", 0),
            (4, 1, 30 * US, "a", 0),
        ]
    )
    out = lateness_audit(ds, num_parts=4).to_pandas()
    assert out.loc[0, "n_events"] == 4
    assert out.loc[0, "n_late"] == 1
    assert out.loc[0, "max_late_s"] == 15.0
    assert out.loc[0, "mean_late_s"] == 15.0


def test_lateness_no_late_events_nulls(ray_session):
    ds = _events([(i, 1, i * US, "a", 0) for i in range(1, 5)])
    out = lateness_audit(ds, num_parts=2).to_pandas()
    assert out.loc[0, "n_late"] == 0
    assert np.isnan(out.loc[0, "max_late_s"])
    assert np.isnan(out.loc[0, "mean_late_s"])


def test_lateness_equal_ts_not_late(ray_session):
    # ts == watermark is NOT late (strict <)
    ds = _events([(1, 1, 10 * US, "a", 0), (2, 1, 10 * US, "a", 0)])
    out = lateness_audit(ds, num_parts=1).to_pandas()
    assert out.loc[0, "n_late"] == 0


def test_ntile_remainder_semantics(ray_session):
    # n=10, k=4 → tile sizes 3,3,2,2
    ds = _events([(i, 1, 0, "a", float(i)) for i in range(10)])
    out = (
        ntile_by_group(ds, k=4, key_col="user_id", num_parts=2)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(out["tile"]) == [1, 1, 1, 2, 2, 2, 3, 3, 4, 4]


def test_ntile_fewer_rows_than_tiles(ray_session):
    ds = _events([(1, 1, 0, "a", 2.0), (2, 1, 0, "a", 1.0)])
    out = (
        ntile_by_group(ds, k=5, key_col="user_id", num_parts=1)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # value order: id2 (1.0) → tile 1, id1 (2.0) → tile 2
    assert list(out["tile"]) == [2, 1]


def test_ntile_validates(ray_session):
    ds = _events([(1, 1, 0, "a", 1.0)])
    with pytest.raises(ValueError, match="k must be"):
        ntile_by_group(ds, k=0, key_col="user_id")


def test_copairs_within_session_only(ray_session):
    # user 1 session 1: view+click; session 2 (2h later): purchase alone
    # → (click, view) co-occurs once; nothing pairs with purchase
    ds = _events(
        [
            (1, 1, 0, "view", 0),
            (2, 1, 5 * MIN, "click", 0),
            (3, 1, 180 * MIN, "purchase", 0),
        ]
    )
    out = session_copairs(ds, gap_s=1800, top_k=10, num_parts=4)
    assert len(out) == 1
    assert out.loc[0, "type_a"] == "click" and out.loc[0, "type_b"] == "view"
    assert out.loc[0, "n_sessions"] == 1


def test_copairs_distinct_per_session(ray_session):
    # repeated types inside one session count the pair ONCE
    ds = _events(
        [
            (1, 1, 0, "view", 0),
            (2, 1, 1 * MIN, "view", 0),
            (3, 1, 2 * MIN, "click", 0),
            (4, 1, 3 * MIN, "click", 0),
        ]
    )
    out = session_copairs(ds, gap_s=1800, top_k=10, num_parts=2)
    assert out.loc[0, "n_sessions"] == 1


def test_copairs_counts_across_users(ray_session):
    ds = _events(
        [
            (1, 1, 0, "view", 0),
            (2, 1, MIN, "click", 0),
            (3, 2, 0, "view", 0),
            (4, 2, MIN, "click", 0),
        ]
    )
    out = session_copairs(ds, gap_s=1800, top_k=10, num_parts=4)
    assert out.loc[0, "n_sessions"] == 2


def test_lateness_null_ts(ray_session):
    # a NULL ts row counts in n_events, is never late, and never
    # advances the watermark (SQL window-max/comparison semantics)
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "user_id": [1, 1, 1],
            "ts": pd.to_datetime([10 * US, None, 30 * US], unit="us"),
        }
    )
    from ai_service_ocr_grading_handler_ray.stages.sequence import (
        lateness_audit,
    )

    out = lateness_audit(rd.from_pandas(df), num_parts=2).to_pandas()
    assert out.loc[0, "n_events"] == 3
    assert out.loc[0, "n_late"] == 0
    assert np.isnan(out.loc[0, "mean_late_s"])


def test_copairs_null_ts_stays_in_session(ray_session):
    # SQL lag semantics: a null-ts row sorts last and stays in the
    # previous session (NULL gap is not > gap_s), so the pair survives
    df = pd.DataFrame(
        {
            "event_id": [1, 2],
            "user_id": [1, 1],
            "ts": pd.to_datetime([0, None], unit="us"),
            "event_type": ["view", "click"],
        }
    )
    out = session_copairs(rd.from_pandas(df), gap_s=1800, top_k=5,
                          num_parts=2)
    assert len(out) == 1
    assert out.loc[0, "type_a"] == "click" and out.loc[0, "type_b"] == "view"
