"""Interval union coverage (intervals.union_coverage) and longest
daily streak (sequence.longest_daily_streak): overlap merging, exact
µs arithmetic, gaps-and-islands runs, within-day dedup."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.intervals import union_coverage
from ai_service_ocr_grading_handler_ray.stages.sequence import (
    longest_daily_streak,
)

US = 1_000_000
MIN5 = 300 * US
DAY = 86_400 * US


def _ev(rows):
    """rows: (user_id, ts_us)."""
    return rd.from_pandas(
        pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
            }
        )
    )


def _cov(rows, **kw):
    return union_coverage(_ev(rows), key_col="user_id", ts_col="ts",
                          **kw).to_pandas().set_index("user_id")


def test_coverage_single_event_is_window(ray_session):
    out = _cov([(1, 0)])
    assert out.loc[1]["covered_us"] == MIN5
    assert out.loc[1]["n_events"] == 1


def test_coverage_overlap_merges(ray_session):
    # events 60 s apart: union = 60 s + full window = 360 s
    out = _cov([(1, 0), (1, 60 * US)])
    assert out.loc[1]["covered_us"] == 60 * US + MIN5


def test_coverage_disjoint_adds(ray_session):
    out = _cov([(1, 0), (1, 10 * MIN5)])
    assert out.loc[1]["covered_us"] == 2 * MIN5


def test_coverage_duplicate_ts_free(ray_session):
    # identical timestamps contribute zero extra coverage
    out = _cov([(1, 0), (1, 0), (1, 0)])
    assert out.loc[1]["covered_us"] == MIN5
    assert out.loc[1]["n_events"] == 3


def test_coverage_users_independent(ray_session):
    out = _cov([(1, 0), (2, 0)])
    assert out.loc[1]["covered_us"] == MIN5
    assert out.loc[2]["covered_us"] == MIN5


def _streak(rows):
    return (
        longest_daily_streak(_ev(rows), key_col="user_id", ts_col="ts")
        .to_pandas().set_index("user_id")
    )


def test_streak_consecutive_days(ray_session):
    out = _streak([(1, 0), (1, DAY), (1, 2 * DAY)])
    assert out.loc[1]["longest_streak"] == 3
    assert out.loc[1]["n_days"] == 3


def test_streak_gap_breaks_run(ray_session):
    out = _streak([(1, 0), (1, DAY), (1, 3 * DAY)])
    assert out.loc[1]["longest_streak"] == 2
    assert out.loc[1]["n_days"] == 3


def test_streak_within_day_dedup(ray_session):
    # three events on one day are ONE active day
    out = _streak([(1, 0), (1, 1000), (1, 2000)])
    assert out.loc[1]["longest_streak"] == 1
    assert out.loc[1]["n_days"] == 1


def test_streak_takes_max_run(ray_session):
    # runs of 2 and 4 -> longest 4
    days = [0, 1, 5, 6, 7, 8]
    out = _streak([(1, d * DAY) for d in days])
    assert out.loc[1]["longest_streak"] == 4
    assert out.loc[1]["n_days"] == 6


def test_streak_users_independent(ray_session):
    # user 2's day does not extend user 1's run
    out = _streak([(1, 0), (2, DAY), (1, 2 * DAY)])
    assert out.loc[1]["longest_streak"] == 1
    assert out.loc[2]["longest_streak"] == 1
