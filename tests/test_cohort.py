"""Cohort retention: plain-Python reference equivalence, month
boundaries, layout independence, empty stream."""

import numpy as np
import pandas as pd
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.cohort import (
    cohort_retention,
    cohort_retention_sql,
)


def _ref(df):
    out = {}
    m = df["ts"].dt.to_period("M")
    first = m.groupby(df["user_id"]).transform("min")
    k = (m - first).apply(lambda x: x.n)
    cohort = first.dt.strftime("%Y-%m")
    for key, g in pd.DataFrame(
        {"u": df["user_id"], "c": cohort, "k": k}
    ).drop_duplicates(["u", "k"]).groupby(["c", "k"]):
        out[key] = len(g)
    return out


def test_cohort_retention_matches_reference(ray_session):
    rng = np.random.default_rng(7)
    rows = {
        "user_id": rng.integers(0, 25, size=800),
        "ts": pd.Timestamp("2023-01-15")
        + pd.to_timedelta(rng.integers(0, 3600 * 24 * 900, size=800), unit="s"),
    }
    df = pd.DataFrame(rows)
    out = cohort_retention(rd.from_pandas(df).repartition(6))
    got = {(r.cohort, r.k): r.n_users for r in out.itertuples()}
    assert got == _ref(df)
    # every cohort has k=0 with a positive count
    k0 = out[out["k"] == 0]
    assert (k0["n_users"] > 0).all()
    assert set(k0["cohort"]) == set(out["cohort"])
    # layout independence
    out2 = cohort_retention(
        rd.from_pandas(df.sample(frac=1.0, random_state=2)).repartition(11)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_cohort_month_boundary(ray_session):
    # last-of-month first event, next event on the 1st of the next month
    df = pd.DataFrame(
        {
            "user_id": [1, 1],
            "ts": pd.to_datetime(["2024-01-31 23:59:59", "2024-02-01 00:00:00"]),
        }
    )
    out = cohort_retention(rd.from_pandas(df))
    got = {(r.cohort, r.k): r.n_users for r in out.itertuples()}
    assert got == {("2024-01", 0): 1, ("2024-01", 1): 1}


def test_cohort_empty(ray_session):
    df = pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                       "ts": pd.Series([], dtype="datetime64[us]")})
    out = cohort_retention(rd.from_pandas(df))
    assert len(out) == 0
    assert list(out.columns) == ["cohort", "k", "n_users"]


def test_cohort_sql_shape():
    s = cohort_retention_sql("ev")
    assert "datediff('month'" in s and "strftime" in s and "DISTINCT" in s
