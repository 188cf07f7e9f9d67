"""Funnel analysis: plain-Python reference equivalence, strict-after +
window semantics, layout independence, step validation."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.funnel import (
    funnel_counts,
    funnel_sql,
)

US = 1_000_000


def _ref_funnel(df, steps, window_us):
    reached = [0] * len(steps)
    for u, g in df.groupby("user_id"):
        g = g.sort_values("ts")
        ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        et = g["event_type"].to_numpy()
        t1 = tprev = None
        for i, s in enumerate(steps):
            c = ts[et == s]
            if tprev is not None:
                c = c[c > tprev]
            if t1 is not None and window_us is not None:
                c = c[c - t1 <= window_us]
            if len(c) == 0:
                break
            t = int(c.min())
            if t1 is None:
                t1 = t
            tprev = t
            reached[i] += 1
    return reached


def _events(rows):
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    return df


def test_funnel_matches_reference(ray_session):
    rng = np.random.default_rng(12)
    rows = [
        {
            "user_id": int(rng.integers(0, 20)),
            "ts": int(rng.integers(0, 100)) * 3600 * US,
            "event_type": ["view", "click", "purchase", "noise"][
                int(rng.integers(0, 4))
            ],
        }
        for _ in range(600)
    ]
    df = _events(rows)
    steps = ["view", "click", "purchase"]
    w = 24 * 3600 * US
    out = funnel_counts(
        rd.from_pandas(df).repartition(5), steps, window_us=w
    )
    assert out["n_users"].tolist() == _ref_funnel(df, steps, w)
    assert out["step"].tolist() == steps
    # monotone non-increasing by construction
    assert all(
        a >= b for a, b in zip(out["n_users"], out["n_users"][1:])
    )
    # layout independence
    out2 = funnel_counts(
        rd.from_pandas(df.sample(frac=1.0, random_state=3)).repartition(11),
        steps,
        window_us=w,
    )
    pd.testing.assert_frame_equal(out, out2)


def test_funnel_strict_after_and_window(ray_session):
    # click AT the view ts must NOT count (strictly after); purchase
    # outside the window must not count
    rows = [
        {"user_id": 1, "ts": 10 * US, "event_type": "view"},
        {"user_id": 1, "ts": 10 * US, "event_type": "click"},   # tie → no
        {"user_id": 2, "ts": 10 * US, "event_type": "view"},
        {"user_id": 2, "ts": 11 * US, "event_type": "click"},
        {"user_id": 2, "ts": 100 * US, "event_type": "purchase"},  # late
    ]
    out = funnel_counts(
        rd.from_pandas(_events(rows)),
        ["view", "click", "purchase"],
        window_us=50 * US,
    )
    assert out["n_users"].tolist() == [2, 1, 0]


def test_funnel_validates_steps(ray_session):
    df = _events([{"user_id": 1, "ts": US, "event_type": "view"}])
    with pytest.raises(ValueError):
        funnel_counts(rd.from_pandas(df), [])
    with pytest.raises(ValueError):
        funnel_counts(rd.from_pandas(df), ["a", "a"])


def test_funnel_sql_shape():
    s = funnel_sql(["a", "b"], window_us=5)
    assert "WITH s1" in s and "UNION ALL" in s and "<= 5" in s


def test_funnel_empty_stream(ray_session):
    """Zero matching events → one zero row per step (the oracle shape),
    not a KeyError."""
    df = _events([{"user_id": 1, "ts": US, "event_type": "noise"}])
    out = funnel_counts(rd.from_pandas(df), ["view", "click"], window_us=US)
    assert out["n_users"].tolist() == [0, 0]
    assert out["step"].tolist() == ["view", "click"]
