"""ROW-frame rolling aggregates (stages/rolling.py): hand-computed
fixture, pandas-rolling equivalence, frame isolation at key
boundaries, degenerate window=1."""

import numpy as np
import pandas as pd
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.rolling import rolling_window

US = 1_000_000


def _events(rows):
    """rows: (event_id, user_id, ts_us, value)."""
    return rd.from_pandas(
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "user_id": [r[1] for r in rows],
                "ts": pd.to_datetime([r[2] for r in rows], unit="us"),
                "value": [float(r[3]) for r in rows],
            }
        )
    )


def test_rolling_hand_computed(ray_session):
    ds = _events(
        [
            (1, 1, 10, 1.0),
            (2, 1, 20, 2.0),
            (3, 1, 30, 4.0),
            (4, 1, 40, 8.0),
            (5, 1, 50, 16.0),  # frame = [2,4,8,16]
            (6, 2, 10, 100.0),
        ]
    )
    out = (
        rolling_window(ds, window=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(out["rn"]) == [1, 2, 3, 4, 5, 1]
    assert list(out["delta"]) == [0.0, 1.0, 2.0, 4.0, 8.0, 0.0]
    assert list(out["roll_sum"]) == [1.0, 3.0, 7.0, 15.0, 30.0, 100.0]
    assert list(out["roll_max"]) == [1.0, 2.0, 4.0, 8.0, 16.0, 100.0]
    assert np.allclose(out["roll_avg"], [1.0, 1.5, 7 / 3, 3.75, 7.5, 100.0], atol=1e-6)


def test_rolling_matches_pandas(ray_session):
    rng = np.random.RandomState(3)
    rows = [
        (i, int(rng.randint(0, 6)), int(rng.randint(0, 10**9)),
         round(float(rng.rand() * 50), 2))
        for i in range(400)
    ]
    out = (
        rolling_window(_events(rows), window=5)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    df = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    g = df.groupby("user_id")["value"]
    df["roll_sum"] = g.rolling(5, min_periods=1).sum().reset_index(0, drop=True)
    df["roll_max"] = g.rolling(5, min_periods=1).max().reset_index(0, drop=True)
    df["rn"] = df.groupby("user_id").cumcount() + 1
    ref = df.sort_values("event_id").reset_index(drop=True)
    assert list(out["rn"]) == list(ref["rn"])
    assert np.allclose(out["roll_sum"], ref["roll_sum"], atol=1e-6)
    assert np.allclose(out["roll_max"], ref["roll_max"], atol=1e-12)


def test_rolling_window_one(ray_session):
    """window=1: every frame is the row itself."""
    rows = [(i, i % 3, i * 7, float(i)) for i in range(30)]
    out = rolling_window(_events(rows), window=1).to_pandas()
    assert np.allclose(out["roll_sum"], out["roll_max"])
    assert np.allclose(out["roll_avg"], out["roll_sum"])


def test_rolling_frames_do_not_cross_keys(ray_session):
    """Two interleaved users: neither's frame sees the other's values."""
    rows = [(i, i % 2, i, 1000.0 if i % 2 else 1.0) for i in range(20)]
    out = rolling_window(_events(rows), window=3).to_pandas()
    u0 = out[out["user_id"] == 0]
    u1 = out[out["user_id"] == 1]
    assert (u0["roll_max"] == 1.0).all()
    assert (u1["roll_max"] == 1000.0).all()
    assert (u0["delta"] == 0.0).all()
    assert (u1["delta"] == 0.0).all()
