"""Per-key resample + forward fill (stages/resample.py): hand-computed
fixture semantics, last-write-wins tie-breaks, dense-grid invariants,
null guard, SQL-generator parity on an inline relation."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.resample import (
    resample_last_ffill,
    resample_sql,
)

US = 1_000_000
HOUR = 3_600 * US


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


def test_resample_ffill_hand_computed(ray_session):
    # user 1: events in hours 0, 0, 3 (gap at 1, 2); user 2: hour 5 only
    ds = _events(
        [
            (1, 1, 0 * HOUR + 5, 10.0),
            (2, 1, 0 * HOUR + 9, 20.0),   # later ts wins bucket 0
            (3, 1, 3 * HOUR + 1, 30.0),
            (4, 2, 5 * HOUR + 2, 99.0),
        ]
    )
    out = (
        resample_last_ffill(ds, every_us=HOUR)
        .to_pandas()
        .sort_values(["user_id", "bucket_us"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2],
            "bucket_us": [0, HOUR, 2 * HOUR, 3 * HOUR, 5 * HOUR],
            "value": [20.0, 20.0, 20.0, 30.0, 99.0],
            "filled": [False, True, True, False, False],
        }
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_resample_tie_break_on_id(ray_session):
    """Equal timestamps: the greater event_id wins the bucket."""
    ds = _events([(7, 1, 100, 1.0), (9, 1, 100, 2.0), (8, 1, 100, 3.0)])
    out = resample_last_ffill(ds, every_us=HOUR).to_pandas()
    assert len(out) == 1
    assert out["value"].iloc[0] == 2.0  # id 9 wins


def test_resample_grid_is_dense_per_key(ray_session):
    rng = np.random.RandomState(5)
    rows = [
        (i, int(rng.randint(0, 7)), int(rng.randint(0, 50) * HOUR + rng.randint(HOUR)),
         float(rng.rand()))
        for i in range(300)
    ]
    out = (
        resample_last_ffill(_events(rows), every_us=HOUR)
        .to_pandas()
        .sort_values(["user_id", "bucket_us"])
    )
    for _, g in out.groupby("user_id"):
        b = g["bucket_us"].to_numpy()
        assert (np.diff(b) == HOUR).all()  # contiguous grid
        assert not g["filled"].iloc[0]     # first bucket is always real
    # real rows == distinct (user, bucket) of the input
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    df["bucket"] = (df["ts"] // HOUR) * HOUR
    n_real = df.groupby(["user_id", "bucket"]).ngroups
    assert (~out["filled"]).sum() == n_real


def test_resample_null_value_raises(ray_session):
    df = pd.DataFrame(
        {
            "event_id": [1, 2],
            "user_id": [1, 1],
            "ts": pd.to_datetime([0, HOUR], unit="us"),
            "value": [1.0, None],
        }
    )
    with pytest.raises(Exception, match="null ts/value"):
        resample_last_ffill(rd.from_pandas(df), every_us=HOUR).materialize()


def test_resample_sql_generator_parity(ray_session):
    """Engine over a random stream == the generated DuckDB replay."""
    rng = np.random.RandomState(11)
    rows = [
        (i, int(rng.randint(0, 5)),
         int(rng.randint(0, 30) * HOUR + rng.randint(HOUR)),
         round(float(rng.rand() * 100), 2))
        for i in range(200)
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_us", "value"])
    df["ts"] = pd.to_datetime(df["ts_us"], unit="us")
    eng = (
        resample_last_ffill(_events(rows), every_us=HOUR)
        .to_pandas()
        .sort_values(["user_id", "bucket_us"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", df[["event_id", "user_id", "ts", "value"]])
    ora = (
        con.sql(resample_sql(every_us=HOUR))
        .df()
        .sort_values(["user_id", "bucket_us"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)


# --------------------------------------------------------------------------
# OHLC bars
# --------------------------------------------------------------------------

from ai_service_ocr_grading_handler_ray.stages.resample import ohlc_bars

HOUR_US = 3_600_000_000


def _ohlc_events(rows):
    df = pd.DataFrame(rows, columns=["user_id", "ts", "value", "event_id"])
    df["ts"] = pd.to_datetime(df["ts"])
    return rd.from_pandas(df)


def test_ohlc_basic_bars(ray_session):
    rows = [
        ("u1", "2024-01-01 10:05", 3.0, 1),
        ("u1", "2024-01-01 10:20", 9.0, 2),
        ("u1", "2024-01-01 10:50", 5.0, 3),
        ("u1", "2024-01-01 11:10", 7.0, 4),
        ("u2", "2024-01-01 10:30", 2.0, 5),
    ]
    out = ohlc_bars(_ohlc_events(rows), every_us=HOUR_US).to_pandas()
    out = out.sort_values(["user_id", "bucket_us"]).reset_index(drop=True)
    assert len(out) == 3
    b0 = out.iloc[0]
    assert (b0["open"], b0["high"], b0["low"], b0["close"], b0["n"]) == (
        3.0, 9.0, 3.0, 5.0, 3)
    assert out.iloc[1]["open"] == out.iloc[1]["close"] == 7.0
    assert out.iloc[2]["user_id"] == "u2" and out.iloc[2]["n"] == 1


def test_ohlc_tie_on_ts_breaks_by_id(ray_session):
    rows = [
        ("u", "2024-01-01 10:00", 1.0, 2),
        ("u", "2024-01-01 10:00", 8.0, 1),   # same ts: id 1 is open
        ("u", "2024-01-01 10:00", 4.0, 3),   # id 3 is close
    ]
    out = ohlc_bars(_ohlc_events(rows), every_us=HOUR_US).to_pandas()
    assert out.iloc[0]["open"] == 8.0 and out.iloc[0]["close"] == 4.0
    assert out.iloc[0]["high"] == 8.0 and out.iloc[0]["low"] == 1.0


def test_ohlc_null_value_raises(ray_session):
    rows = [("u", "2024-01-01 10:00", np.nan, 1)]
    with pytest.raises(Exception, match="null"):
        ohlc_bars(_ohlc_events(rows), every_us=HOUR_US).to_pandas()


def test_ohlc_matches_pandas_brute(ray_session):
    rng = np.random.RandomState(23)
    rows = []
    for i in range(800):
        rows.append((
            f"u{rng.randint(6)}",
            pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=int(rng.randint(0, 3000))),
            float(rng.randint(100)),
            i,
        ))
    out = ohlc_bars(_ohlc_events(rows), every_us=HOUR_US).to_pandas()
    df = pd.DataFrame(rows, columns=["user_id", "ts", "value", "event_id"])
    df["bucket_us"] = (
        df["ts"].astype("datetime64[us]").astype(np.int64) // HOUR_US * HOUR_US
    )
    df = df.sort_values(["user_id", "bucket_us", "ts", "event_id"])
    ref = df.groupby(["user_id", "bucket_us"]).agg(
        open=("value", "first"), high=("value", "max"),
        low=("value", "min"), close=("value", "last"), n=("value", "size"),
    ).reset_index()
    got = out.sort_values(["user_id", "bucket_us"]).reset_index(drop=True)
    ref = ref.sort_values(["user_id", "bucket_us"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
