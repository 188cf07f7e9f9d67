"""Grouped OLS trend (stages/trend.py): numpy-polyfit equivalence,
degenerate-key semantics, moment-fold stability across block layouts."""

import pytest
import numpy as np
import pandas as pd
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.trend import (
    DEFAULT_ORIGIN_US,
    US_PER_DAY,
    grouped_linear_trend,
)


def _events(rows):
    """rows: (user_id, ts_us_from_origin, value)."""
    return rd.from_pandas(
        pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "ts": pd.to_datetime(
                    [DEFAULT_ORIGIN_US + r[1] for r in rows], unit="us"
                ),
                "value": [float(r[2]) for r in rows],
            }
        )
    )


def test_trend_matches_polyfit(ray_session):
    rng = np.random.RandomState(5)
    rows = []
    for u in range(8):
        for _ in range(60):
            t = int(rng.randint(0, 30 * 86_400_000_000))
            x = t / US_PER_DAY
            rows.append((u, t, 2.0 + 0.5 * u * x + rng.randn() * 3))
    out = (
        grouped_linear_trend(_events(rows))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    df = pd.DataFrame(rows, columns=["u", "t", "y"])
    df["x"] = df["t"] / US_PER_DAY
    for _, r in out.iterrows():
        g = df[df["u"] == r["user_id"]]
        slope, intercept = np.polyfit(g["x"], g["y"], 1)
        cc = np.corrcoef(g["x"], g["y"])[0, 1]
        assert abs(r["slope"] - slope) < 1e-5
        assert abs(r["intercept"] - intercept) < 1e-5
        assert abs(r["r2"] - cc * cc) < 1e-5
        assert r["n"] == len(g)


def test_trend_exact_line_r2_one(ray_session):
    rows = [(1, i * 86_400_000_000, 10.0 + 3.0 * i) for i in range(10)]
    out = grouped_linear_trend(_events(rows)).to_pandas()
    assert abs(out["slope"].iloc[0] - 3.0) < 1e-6
    assert abs(out["intercept"].iloc[0] - 10.0) < 1e-6
    assert abs(out["r2"].iloc[0] - 1.0) < 1e-6


def test_trend_degenerate_keys(ray_session):
    rows = [
        (1, 1000, 5.0),                       # single point
        (2, 2000, 7.0), (2, 2000, 9.0),       # zero x-variance
        (3, 0, 4.0), (3, 86_400_000_000, 4.0),  # zero y-variance
    ]
    out = (
        grouped_linear_trend(_events(rows))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    # n<2 and var_x==0: slope 0, intercept = mean(y), r2 0
    assert list(out["slope"][:2]) == [0.0, 0.0]
    assert abs(out["intercept"].iloc[0] - 5.0) < 1e-9
    assert abs(out["intercept"].iloc[1] - 8.0) < 1e-9
    assert list(out["r2"][:2]) == [0.0, 0.0]
    # flat line: slope 0 (exact), r2 0 (vy below threshold)
    assert abs(out["slope"].iloc[2]) < 1e-9
    assert out["r2"].iloc[2] == 0.0


def test_trend_block_layout_invariance(ray_session):
    """Same rows, different block layout → identical rounded output
    (the moment fold is order-stable to well below the rounding)."""
    rng = np.random.RandomState(9)
    rows = [
        (int(u), int(rng.randint(0, 30 * 86_400_000_000)),
         round(float(rng.rand() * 100), 2))
        for u in rng.randint(0, 5, 500)
    ]
    a = (
        grouped_linear_trend(_events(rows))
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    b = (
        grouped_linear_trend(_events(rows).repartition(13))
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


# --- period_over_period ------------------------------------------------------


def test_period_over_period_reference(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.trend import period_over_period

    rows = [
        ("a", "2024-01-05", 1.0), ("a", "2024-01-20", 2.0),
        ("a", "2024-02-10", 6.0), ("a", "2024-04-01", 3.0),
        ("b", "2024-01-01", 10.0),  # single month: drops (no lag)
    ]
    t = pa.table(
        {
            "event_type": [r[0] for r in rows],
            "ts": pa.array(
                np.array([r[1] for r in rows], dtype="datetime64[us]"),
                type=pa.timestamp("us"),
            ),
            "value": pa.array([r[2] for r in rows], type=pa.float64()),
        }
    )
    out = period_over_period(rd.from_arrow(t).repartition(3), period="month")
    got = {
        (r.event_type, str(np.datetime64(r.period, "M"))): (
            r.total, r.prev_total, r.pct_change,
        )
        for r in out.itertuples()
    }
    assert set(got) == {("a", "2024-02"), ("a", "2024-04")}
    np.testing.assert_allclose(got[("a", "2024-02")], (6.0, 3.0, 1.0))
    np.testing.assert_allclose(got[("a", "2024-04")], (3.0, 6.0, -0.5))
    # gap months are NOT filled — April lags February (calendar-sparse
    # semantics, same as SQL lag over existing months)

    # day granularity: Jan 5 → Jan 20 lag within month 1
    day = period_over_period(rd.from_arrow(t), period="day")
    d = {
        (r.event_type, str(np.datetime64(r.period, "D"))): r.pct_change
        for r in day.itertuples()
    }
    np.testing.assert_allclose(d[("a", "2024-01-20")], 1.0)
    import pytest

    with pytest.raises(ValueError, match="period must be"):
        period_over_period(rd.from_arrow(t), period="week")


# --- recency_weighted_mean ---------------------------------------------------


def test_recency_weighted_matches_brute(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.trend import (
        recency_weighted_mean,
    )

    rng = np.random.default_rng(4)
    n = 300
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(
        rng.integers(0, 40 * 86400, n), unit="s"
    )
    df = pd.DataFrame(
        {
            "k": rng.choice(list("ab"), n),
            "ts": ts,
            "v": rng.random(n) * 10,
        }
    )
    out = recency_weighted_mean(
        rd.from_pandas(df).repartition(5),
        key_col="k", value_col="v", half_life_days=7.0,
    ).set_index("k")
    ref = df.ts.max()
    age = (ref - df.ts).dt.total_seconds() / 86400.0
    w = np.exp2(-age / 7.0)
    for k, sub in df.groupby("k"):
        wk = w[sub.index]
        assert out.loc[k, "rw_mean"] == pytest.approx(
            (wk * sub.v).sum() / wk.sum(), abs=1e-5
        )
        assert out.loc[k, "n"] == len(sub)


def test_recency_half_life_semantics(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.trend import (
        recency_weighted_mean,
    )

    # two observations, 7 days apart, half_life 7: newer has weight 1,
    # older 1/2 -> mean = (1*new + 0.5*old) / 1.5
    df = pd.DataFrame(
        {
            "k": ["x", "x"],
            "ts": [pd.Timestamp("2024-01-01"), pd.Timestamp("2024-01-08")],
            "v": [3.0, 9.0],
        }
    )
    out = recency_weighted_mean(
        rd.from_pandas(df), key_col="k", value_col="v", half_life_days=7.0
    )
    assert out.rw_mean.iloc[0] == pytest.approx((9.0 + 0.5 * 3.0) / 1.5, abs=1e-9)


# --- daily_burst -----------------------------------------------------------


def test_daily_burst_matches_brute(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.trend import daily_burst

    rng = np.random.default_rng(23)
    n = 600
    df = pd.DataFrame(
        {
            "event_type": rng.choice(["x", "y"], n),
            "ts": pd.Timestamp("2024-02-01")
            + pd.to_timedelta(rng.integers(0, 20 * 86400, n), unit="s"),
            "value": rng.random(n) * 50,
        }
    )
    out = daily_burst(
        rd.from_pandas(df).repartition(5), window=7, min_hist=3
    )
    daily = (
        df.groupby(["event_type", df.ts.dt.floor("D")])["value"].sum()
        .rename("t").reset_index()
        .sort_values(["event_type", "ts"])
    )
    exp_rows = 0
    for k, sub in daily.groupby("event_type"):
        t = sub.t.to_numpy()
        for i in range(len(t)):
            hist = t[max(0, i - 7):i]
            if len(hist) < 3:
                continue
            exp_rows += 1
            mu = hist.sum() / len(hist)
            sd = np.sqrt((np.sum(hist * hist) - len(hist) * mu * mu) / (len(hist) - 1))
            row = out[(out.event_type == k) & (out.day == sub.ts.iloc[i])]
            assert len(row) == 1
            assert row.zscore.iloc[0] == pytest.approx((t[i] - mu) / sd, abs=1e-4)
    assert len(out) == exp_rows


def test_daily_burst_flags_planted_spike(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.trend import daily_burst

    days = pd.date_range("2024-03-01", periods=10, freq="D")
    vals = [10.0] * 10
    vals[8] = 500.0  # the burst
    df = pd.DataFrame(
        {"event_type": "e", "ts": days, "value": vals}
    )
    # constant history -> sd 0 until the spike enters the window; jitter
    df["value"] = df["value"] + np.linspace(0, 1, 10)
    out = daily_burst(rd.from_pandas(df), window=7, min_hist=3)
    spike = out[out.day == days[8]]
    assert spike.zscore.iloc[0] > 10


def test_daily_burst_constant_history_excluded(ray_session):
    # review finding: sd == 0 rows must be absent on BOTH sides (the SQL
    # filter is sd > 0; the engine skips), not NaN-vs-inf divergent
    import duckdb
    from ai_service_ocr_grading_handler_ray.stages.trend import (
        daily_burst,
        daily_burst_sql,
    )

    days = pd.date_range("2024-03-01", periods=8, freq="D")
    df = pd.DataFrame({"event_type": "e", "ts": days, "value": [5.0] * 8})
    out = daily_burst(rd.from_pandas(df), window=7, min_hist=3)
    assert len(out) == 0
    con = duckdb.connect()
    con.register("events", df.rename(columns={}))
    ref = con.sql(
        daily_burst_sql(table="events", key_col="event_type",
                        ts_col="ts", value_col="value")
    ).df()
    assert len(ref) == 0


# --------------------------------------------------------------------------
# grouped Spearman
# --------------------------------------------------------------------------

from ai_service_ocr_grading_handler_ray.stages.trend import (
    grouped_spearman,
    welch_drift,
)


def _spearman_ds(rows):
    import pandas as pd

    return rd.from_pandas(pd.DataFrame(rows, columns=["g", "x", "y"]))


def _brute_spearman(rows):
    """Textbook Pearson-on-average-ranks, per group."""
    import math
    from collections import defaultdict

    import pandas as pd

    by_g = defaultdict(list)
    for g, x, y in rows:
        by_g[g].append((x, y))
    out = {}
    for g, pts in by_g.items():
        n = len(pts)
        if n < 2:
            continue
        df = pd.DataFrame(pts, columns=["x", "y"])
        rx = df["x"].rank(method="average").to_numpy()
        ry = df["y"].rank(method="average").to_numpy()
        dx, dy = rx - (n + 1) / 2.0, ry - (n + 1) / 2.0
        sxx, syy = float((dx * dx).sum()), float((dy * dy).sum())
        if sxx <= 0 or syy <= 0:
            continue
        out[g] = float((dx * dy).sum()) / math.sqrt(sxx * syy)
    return out


def test_spearman_perfect_monotone(ray_session):
    rows = [("a", float(i), float(i * i)) for i in range(20)]
    rows += [("b", float(i), float(-i) ** 3 if i % 2 else -float(i) ** 3)
             for i in range(1)]  # degenerate single-row group: excluded
    rows += [("c", float(i), 100.0 - i) for i in range(15)]
    out = grouped_spearman(_spearman_ds(rows), group_col="g",
                           x_col="x", y_col="y")
    got = dict(zip(out["g"], out["spearman"]))
    assert got == {"a": 1.0, "c": -1.0}
    assert dict(zip(out["g"], out["n"])) == {"a": 20, "c": 15}


def test_spearman_matches_brute_with_ties(ray_session):
    rng = np.random.RandomState(11)
    rows = []
    for g in ("e1", "e2", "e3"):
        for _ in range(200):
            # heavy ties: quantized values
            rows.append((g, float(rng.randint(10)), float(rng.randint(8))))
    out = grouped_spearman(_spearman_ds(rows), group_col="g",
                           x_col="x", y_col="y")
    got = dict(zip(out["g"], out["spearman"]))
    ref = _brute_spearman(rows)
    assert set(got) == set(ref)
    for g in ref:
        assert abs(got[g] - ref[g]) < 5.1e-7  # engine output is round-6


def test_spearman_all_tied_axis_excluded(ray_session):
    rows = [("flat", float(i), 7.0) for i in range(10)]
    rows += [("ok", float(i), float(i)) for i in range(10)]
    out = grouped_spearman(_spearman_ds(rows), group_col="g",
                           x_col="x", y_col="y")
    assert list(out["g"]) == ["ok"]


# --------------------------------------------------------------------------
# Welch drift
# --------------------------------------------------------------------------

def _welch_events(rows):
    import pandas as pd

    df = pd.DataFrame(rows, columns=["ts", "event_type", "value"])
    df["ts"] = pd.to_datetime(df["ts"])
    return rd.from_pandas(df)


SPLIT_US = 1_705_363_200_000_000  # 2024-01-16


def test_welch_matches_textbook(ray_session):
    rng = np.random.RandomState(5)
    rows = []
    early, late = [], []
    for i in range(60):
        v = float(rng.normal(10, 2))
        rows.append((f"2024-01-{(i % 14) + 1:02d}", "k", v))
        early.append(v)
    for i in range(40):
        v = float(rng.normal(12, 3))
        rows.append((f"2024-01-{(i % 14) + 17:02d}", "k", v))
        late.append(v)
    out = welch_drift(_welch_events(rows), split_us=SPLIT_US)
    assert len(out) == 1
    import math

    n1, n2 = len(early), len(late)
    m1, m2 = sum(early) / n1, sum(late) / n2
    v1 = (sum(v * v for v in early) - n1 * m1 * m1) / (n1 - 1)
    v2 = (sum(v * v for v in late) - n2 * m2 * m2) / (n2 - 1)
    se2 = v1 / n1 + v2 / n2
    t_ref = (m1 - m2) / math.sqrt(se2)
    assert int(out.loc[0, "n_early"]) == n1
    assert int(out.loc[0, "n_late"]) == n2
    assert abs(out.loc[0, "welch_t"] - t_ref) < 1e-5
    assert out.loc[0, "welch_df"] > min(n1, n2) - 1  # Satterthwaite bound


def test_welch_excludes_missing_side_and_tiny_sides(ray_session):
    rows = [("2024-01-05", "early_only", 1.0), ("2024-01-06", "early_only", 2.0),
            ("2024-01-20", "late_only", 3.0), ("2024-01-21", "late_only", 4.0),
            ("2024-01-05", "tiny", 1.0), ("2024-01-20", "tiny", 2.0)]
    rows += [(f"2024-01-{d:02d}", "ok", float(d)) for d in range(1, 30)]
    out = welch_drift(_welch_events(rows), split_us=SPLIT_US)
    assert list(out["event_type"]) == ["ok"]


def test_welch_constant_both_sides_excluded(ray_session):
    rows = [(f"2024-01-{d:02d}", "const", 5.0) for d in range(1, 30)]
    out = welch_drift(_welch_events(rows), split_us=SPLIT_US)
    assert len(out) == 0
