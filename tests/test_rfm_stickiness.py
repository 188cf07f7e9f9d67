"""RFM segmentation (stages/rfm.py) and DAU/MAU stickiness
(stages/trend.py): hand-computed fixtures, integer-metric exactness,
quintile-threshold semantics, calendar bucketing."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.rfm import rfm_segments
from ai_service_ocr_grading_handler_ray.stages.trend import stickiness

US = 1_000_000
DAY = 86_400 * US


def _ev(rows):
    """rows: (user_id, ts_us, value)."""
    return rd.from_pandas(
        pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
                "value": [float(r[2]) for r in rows],
            }
        )
    )


def test_rfm_single_user_is_5s_inverted_r(ray_session):
    # one user: every threshold equals its own value, strict-above
    # counts nothing -> f=m=1, r=6-1=5
    out = rfm_segments(_ev([(1, 0, 10.0), (1, DAY, 20.0)]))
    assert len(out) == 1
    assert out.iloc[0][["r_score", "f_score", "m_score"]].to_list() == [5, 1, 1]
    assert out.iloc[0]["n_users"] == 1
    assert out.iloc[0]["avg_monetary"] == 30.0


def test_rfm_recency_orders_scores(ray_session):
    # 5 users active on days 0..4, one event of equal value each:
    # recency days = 4,3,2,1,0 -> r_score = 1,2,3,4,5 respectively
    out = rfm_segments(
        _ev([(u, u * DAY, 1.0) for u in range(5)])
    )
    assert sorted(out["r_score"].tolist()) == [1, 2, 3, 4, 5]
    # frequency/monetary identical for all -> all score 1
    assert set(out["f_score"]) == {1} and set(out["m_score"]) == {1}
    assert out["n_users"].sum() == 5


def test_rfm_cents_exactness(ray_session):
    # 0.1 + 0.2 style float traps: cents conversion keeps sums exact
    out = rfm_segments(_ev([(1, 0, 0.1), (1, 0 + US, 0.2)]))
    assert out.iloc[0]["avg_monetary"] == pytest.approx(0.3)


def test_stickiness_hand_computed(ray_session):
    # type 'a': user 1 active day0+day1, user 2 active day0
    #   dau = [2, 1] -> avg 1.5 ; mau = 2 -> stickiness 0.75
    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "event_type": ["a"] * 3,
                "ts": pd.to_datetime([0, DAY, 0], unit="us"),
                "user_id": [1, 1, 2],
            }
        )
    )
    out = stickiness(ds)
    row = out.iloc[0]
    assert row["n_days"] == 2 and row["n_months"] == 1
    assert row["avg_dau"] == 1.5 and row["avg_mau"] == 2.0
    assert row["stickiness"] == 0.75


def test_stickiness_dedups_within_day(ray_session):
    # same user firing 5 times in one day counts once
    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "event_type": ["a"] * 5,
                "ts": pd.to_datetime([i * US for i in range(5)], unit="us"),
                "user_id": [7] * 5,
            }
        )
    )
    out = stickiness(ds)
    assert out.iloc[0]["avg_dau"] == 1.0
    assert out.iloc[0]["stickiness"] == 1.0


def test_stickiness_month_boundary(ray_session):
    # one user active jan 31 and feb 1: 2 days, 2 months ->
    # avg_dau 1, avg_mau 1, stickiness 1
    jan31 = pd.Timestamp("2024-01-31").value // 1000
    feb1 = pd.Timestamp("2024-02-01").value // 1000
    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "event_type": ["a", "a"],
                "ts": pd.to_datetime([jan31, feb1], unit="us"),
                "user_id": [1, 1],
            }
        )
    )
    out = stickiness(ds)
    assert out.iloc[0]["n_days"] == 2
    assert out.iloc[0]["n_months"] == 2
    assert out.iloc[0]["stickiness"] == 1.0
