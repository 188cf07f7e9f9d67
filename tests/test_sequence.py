"""Ordered-per-key sequence analytics (stages/sequence.py):
hand-computed fixtures for running totals / inter-arrival gaps /
last-touch attribution / CUSUM drift, key-boundary reset invariants,
tie-break order, empty/degenerate inputs, and partition-count
invariance (the one-shuffle design must not depend on num_parts)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.sequence import (
    cusum_drift,
    interarrival_stats,
    last_touch_attribution,
    running_totals,
)

US = 1_000_000


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


def test_running_totals_hand_computed(ray_session):
    ds = _events(
        [
            (1, 1, 10 * US, "a", 1.5),
            (2, 1, 20 * US, "a", 2.0),
            (3, 1, 30 * US, "a", -0.5),
            (4, 2, 5 * US, "a", 7.0),
        ]
    )
    out = (
        running_totals(ds, num_parts=4)
        .to_pandas()
        .sort_values(["user_id", "run_n"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [1, 1, 1, 2],
            "run_n": [1, 2, 3, 1],
            "run_sum": [1.5, 3.5, 3.0, 7.0],
        }
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_running_totals_tie_order_and_reset(ray_session):
    # same ts: event_id breaks the tie; key 2 must NOT inherit key 1's sum
    ds = _events(
        [
            (5, 1, 10 * US, "a", 100.0),
            (4, 1, 10 * US, "a", 1.0),
            (6, 2, 10 * US, "a", 3.0),
        ]
    )
    out = running_totals(ds, num_parts=1).to_pandas().set_index("event_id")
    assert out.loc[4, "run_sum"] == 1.0  # id 4 first at the tied ts
    assert out.loc[5, "run_sum"] == 101.0
    assert out.loc[6, "run_sum"] == 3.0 and out.loc[6, "run_n"] == 1


def test_interarrival_hand_computed(ray_session):
    ds = _events(
        [
            (1, 1, 0 * US, "a", 0.0),
            (2, 1, 3 * US, "a", 0.0),
            (3, 1, 9 * US, "a", 0.0),
            (4, 2, 50 * US, "a", 0.0),  # single event: dropped
        ]
    )
    out = (
        interarrival_stats(ds, num_parts=4)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "user_id": [1],
            "n_gaps": [2],
            "mean_gap_s": [4.5],
            "min_gap_s": [3.0],
            "max_gap_s": [6.0],
        }
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_attribution_hand_computed(ray_session):
    ds = _events(
        [
            (1, 1, 10 * US, "view", 0.0),
            (2, 1, 20 * US, "click", 0.0),
            (3, 1, 30 * US, "purchase", 0.0),   # → click (2)
            (4, 1, 40 * US, "purchase", 0.0),   # → still click (2)
            (5, 2, 10 * US, "purchase", 0.0),   # no preceding touch → null
            (6, 2, 20 * US, "view", 0.0),
            (7, 2, 30 * US, "purchase", 0.0),   # → view (6)
        ]
    )
    out = (
        last_touch_attribution(ds, conversion="purchase", num_parts=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(out["event_id"]) == [3, 4, 5, 7]
    assert list(out["touch_id"].fillna(-1)) == [2, 2, -1, 6]
    assert list(out["touch_type"].fillna("")) == ["click", "click", "", "view"]
    assert out["touch_id"].isna().sum() == 1


def test_attribution_all_conversions_key(ray_session):
    # a key with ONLY conversions: every row attributes to null
    ds = _events([(1, 1, 10 * US, "purchase", 0.0), (2, 1, 20 * US, "purchase", 0.0)])
    out = last_touch_attribution(ds, num_parts=2).to_pandas()
    assert len(out) == 2 and out["touch_id"].isna().all()


def test_cusum_constant_series_zero_range(ray_session):
    ds = _events([(i, 1, i * US, "a", 5.0) for i in range(1, 6)])
    out = cusum_drift(ds, key_col="user_id", num_parts=2).to_pandas()
    assert len(out) == 1
    assert out.loc[0, "cusum_range"] == 0.0
    assert np.isnan(out.loc[0, "cusum_stat"])  # sd == 0 → NULL stat


def test_cusum_level_shift_vs_alternating(ray_session):
    # same values, different ORDER: the level shift must score higher
    shift = [(i, 1, i * US, "a", 0.0 if i <= 4 else 10.0) for i in range(1, 9)]
    alt = [(i, 2, i * US, "a", 0.0 if i % 2 else 10.0) for i in range(1, 9)]
    out = (
        cusum_drift(_events(shift + alt), key_col="user_id", num_parts=2)
        .to_pandas()
        .set_index("user_id")
    )
    assert out.loc[1, "mean"] == out.loc[2, "mean"] == 5.0
    assert out.loc[1, "cusum_stat"] > out.loc[2, "cusum_stat"]
    # hand value: deviations ±5, S_t walks to ±20 at the midpoint
    assert out.loc[1, "cusum_range"] == 20.0


@pytest.mark.parametrize("num_parts", [1, 7])
def test_partition_invariance(ray_session, num_parts):
    rng = np.random.default_rng(7)
    n = 400
    rows = [
        (
            i,
            int(rng.integers(0, 12)),
            int(rng.integers(0, 10_000)) * US,
            ["view", "click", "purchase"][int(rng.integers(0, 3))],
            float(rng.normal()),
        )
        for i in range(n)
    ]
    ds = _events(rows)
    base = (
        running_totals(_events(rows), num_parts=32)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    got = (
        running_totals(ds, num_parts=num_parts)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, base, check_dtype=False)


def test_empty_input(ray_session):
    ds = _events([(1, 1, 0, "a", 1.0)]).filter(lambda r: False)
    assert running_totals(ds, num_parts=2).count() == 0
    assert interarrival_stats(ds, num_parts=2).count() == 0
    assert last_touch_attribution(ds, num_parts=2).count() == 0
    assert cusum_drift(ds, key_col="user_id", num_parts=2).count() == 0


# --- position-based (40/20/40) attribution ---------------------------------

from ai_service_ocr_grading_handler_ray.stages.sequence import (  # noqa: E402
    position_attribution,
)


def test_position_attribution_hand_computed(ray_session):
    # user 1: one 4-touch session (a,b,c,d) -> 0.4, 0.1, 0.1, 0.4
    # user 2: a 2-touch session (a,b) -> 0.5, 0.5; then after the gap a
    #         1-touch session (c) -> 1.0
    ds = _events(
        [
            (1, 1, 0 * US, "a", 0.0),
            (2, 1, 10 * US, "b", 0.0),
            (3, 1, 20 * US, "c", 0.0),
            (4, 1, 30 * US, "d", 0.0),
            (5, 2, 0 * US, "a", 0.0),
            (6, 2, 10 * US, "b", 0.0),
            (7, 2, 5000 * US, "c", 0.0),
        ]
    )
    out = position_attribution(ds, gap_s=1800).set_index("event_type")
    assert out.loc["a", "credit"] == pytest.approx(0.9)   # 0.4 + 0.5
    assert out.loc["b", "credit"] == pytest.approx(0.6)   # 0.2/2 + 0.5
    assert out.loc["c", "credit"] == pytest.approx(1.1)   # 0.2/2 + 1.0
    assert out.loc["d", "credit"] == pytest.approx(0.4)
    assert out["n_touches"].to_list() == [2, 2, 2, 1]
    # every session's credit sums to 1 -> total == number of sessions (3)
    assert out["credit"].sum() == pytest.approx(3.0)


def test_position_attribution_null_type_holds_position(ray_session):
    # 3-touch session where the MIDDLE type is null: positions still
    # count it (first/last keep 0.4 each) but its credit is dropped.
    ds = _events([(1, 1, 0, "a", 0.0), (3, 1, 20 * US, "b", 0.0)]).union(
        rd.from_pandas(
            pd.DataFrame(
                {
                    "event_id": [2],
                    "user_id": [1],
                    "ts": pd.to_datetime([10 * US], unit="us"),
                    "event_type": [None],
                    "value": [0.0],
                }
            )
        )
    )
    out = position_attribution(ds, gap_s=1800).set_index("event_type")
    assert set(out.index) == {"a", "b"}
    assert out.loc["a", "credit"] == pytest.approx(0.4)
    assert out.loc["b", "credit"] == pytest.approx(0.4)


@pytest.mark.parametrize("num_parts", [1, 3, 32])
def test_position_attribution_partition_invariance(ray_session, num_parts):
    rng = np.random.default_rng(5)
    rows = [
        (
            i,
            int(rng.integers(0, 9)),
            int(rng.integers(0, 10_000)) * US,
            ["view", "click", "buy"][int(rng.integers(0, 3))],
            0.0,
        )
        for i in range(400)
    ]
    base = position_attribution(_events(rows), num_parts=32)
    got = position_attribution(_events(rows), num_parts=num_parts)
    pd.testing.assert_frame_equal(got, base, check_dtype=False)
