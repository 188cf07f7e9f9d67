"""Table profiler: engine vs plain-pandas reference incl. nulls,
timestamps, all-null columns; SQL generator shape."""

import numpy as np
import pandas as pd
import pytest
import pyarrow as pa
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.profile import (
    profile_sql,
    profile_table,
)


def test_profile_table_reference(ray_session):
    df = pd.DataFrame(
        {
            "i": [1, 2, 2, None, 5],
            "s": ["a", "a", None, "b", "c"],
            "f": [0.5, -1.25, 0.5, 0.5, None],
            "allnull": [None] * 5,
            "t": pd.to_datetime(
                [1_000_000, 2_000_000, 2_000_000, None, 9_000_000], unit="us"
            ),
        }
    )
    t = pa.table(
        {
            "i": pa.array(df["i"], type=pa.int64()),
            "s": pa.array(df["s"], type=pa.string()),
            "f": pa.array(df["f"], type=pa.float64()),
            "allnull": pa.array(df["allnull"], type=pa.string()),
            "t": pa.array(df["t"], type=pa.timestamp("us")),
        }
    )
    out = profile_table(
        rd.from_arrow(t).repartition(3), ["i", "s", "f", "allnull", "t"]
    ).set_index("column")
    assert out.loc["i", "n"] == 5 and out.loc["i", "n_null"] == 1
    assert out.loc["i", "n_distinct"] == 3
    assert out.loc["i", "min_num"] == 1.0 and out.loc["i", "max_num"] == 5.0
    assert out.loc["s", "n_distinct"] == 3 and np.isnan(out.loc["s", "min_num"])
    assert out.loc["f", "n_distinct"] == 2
    assert out.loc["f", "min_num"] == -1.25 and out.loc["f", "max_num"] == 0.5
    assert out.loc["allnull", "n_null"] == 5
    assert out.loc["allnull", "n_distinct"] == 0
    assert np.isnan(out.loc["allnull", "min_num"])
    # timestamp bounds are epoch microseconds
    assert out.loc["t", "min_num"] == 1_000_000.0
    assert out.loc["t", "max_num"] == 9_000_000.0
    assert out.loc["t", "n_distinct"] == 3


def test_profile_layout_independent(ray_session):
    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {"a": rng.integers(0, 50, size=500), "b": rng.normal(size=500)}
    )
    x = profile_table(rd.from_pandas(df).repartition(1), ["a", "b"])
    y = profile_table(
        rd.from_pandas(df.sample(frac=1.0, random_state=1)).repartition(9),
        ["a", "b"],
    )
    pd.testing.assert_frame_equal(x, y)


def test_profile_sql_generator():
    sql = profile_sql("events", {"event_id": "num", "ts": "ts", "props": "other"})
    assert sql.count("UNION ALL") == 2
    assert "epoch_us(min(ts))" in sql
    assert 'AS "column"' in sql
    assert "CAST(NULL AS DOUBLE)" in sql


def test_profile_float_zero_and_nan_canonicalization(ray_session):
    """-0.0 == 0.0 and all NaN payloads are ONE distinct value (SQL
    COUNT(DISTINCT) semantics), and NaN is NOT conflated with 0."""
    t = pa.table(
        {
            "f": pa.array(
                [0.0, -0.0, 1.0, float("nan"), float("nan")],
                type=pa.float64(),
            )
        }
    )
    out = profile_table(rd.from_arrow(t).repartition(2), ["f"])
    assert out.loc[0, "n_distinct"] == 3  # {0.0, 1.0, nan}


def test_profile_timestamp_ns_bounds_are_epoch_us(ray_session):
    """A timestamp[ns] column must profile epoch-MICROsecond bounds
    (the oracle's epoch_us), not native nanoseconds."""
    t = pa.table(
        {"t": pa.array([1_000_000_000, 5_000_000_000], type=pa.timestamp("ns"))}
    )
    out = profile_table(rd.from_arrow(t), ["t"])
    assert out.loc[0, "min_num"] == 1_000_000.0
    assert out.loc[0, "max_num"] == 5_000_000.0


# --- grouped_category_entropy ------------------------------------------------


def test_category_entropy_matches_brute(ray_session):
    import numpy as np
    from ai_service_ocr_grading_handler_ray.stages.profile import (
        grouped_category_entropy,
    )

    rng = np.random.default_rng(6)
    df = pd.DataFrame(
        {
            "g": rng.choice(["s1", "s2", "s3"], 400),
            "c": rng.choice(list("abcd"), 400),
        }
    )
    out = grouped_category_entropy(
        rd.from_pandas(df).repartition(4), group_col="g", cat_col="c"
    ).set_index("g")
    for g, sub in df.groupby("g"):
        p = sub.c.value_counts(normalize=True).to_numpy()
        exp = float(-(p * np.log2(p)).sum())
        assert out.loc[g, "cat_entropy"] == pytest.approx(exp, abs=1e-6)
        assert out.loc[g, "n_cats"] == sub.c.nunique()
        assert out.loc[g, "n_rows"] == len(sub)


def test_category_entropy_pure_group_is_positive_zero(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.profile import (
        grouped_category_entropy,
    )

    df = pd.DataFrame({"g": ["only"] * 5, "c": ["en"] * 5})
    out = grouped_category_entropy(rd.from_pandas(df), group_col="g", cat_col="c")
    v = out.cat_entropy.iloc[0]
    assert v == 0.0 and not np.signbit(v)


# --- daily_activity ----------------------------------------------------------


def test_daily_activity_matches_brute(ray_session):
    import numpy as np
    from ai_service_ocr_grading_handler_ray.stages.profile import daily_activity

    rng = np.random.default_rng(12)
    n = 500
    ts = pd.Timestamp("2024-05-01") + pd.to_timedelta(
        rng.integers(0, 5 * 86400, n), unit="s"
    )
    df = pd.DataFrame({"ts": ts, "user_id": rng.integers(0, 40, n)})
    out = daily_activity(rd.from_pandas(df).repartition(6)).set_index("day")
    brute = df.groupby(df.ts.dt.floor("D")).agg(
        n_events=("user_id", "size"), n_users=("user_id", "nunique")
    )
    assert len(out) == len(brute)
    for day, row in brute.iterrows():
        got = out.loc[day]
        assert (got.n_events, got.n_users) == (row.n_events, row.n_users)
        assert got.repeat_rate == pytest.approx(
            1 - row.n_users / row.n_events, abs=1e-6
        )


# --- numeric_drift -------------------------------------------------------


def test_numeric_drift_matches_brute(ray_session):
    import numpy as np
    from ai_service_ocr_grading_handler_ray.stages.profile import numeric_drift

    rng = np.random.default_rng(17)
    a = pd.DataFrame({"v": rng.random(200) * 10, "u": rng.integers(0, 9, 200)})
    b = pd.DataFrame({"v": rng.random(300) * 12, "u": rng.integers(0, 9, 300)})
    a.loc[::10, "v"] = None  # nulls on one side
    out = numeric_drift(
        rd.from_pandas(a).repartition(3),
        rd.from_pandas(b).repartition(4),
        ["u", "v"],
    ).set_index("col")
    assert out.loc["v", "n_a"] == 200 and out.loc["v", "n_b"] == 300
    assert out.loc["v", "null_frac_a"] == pytest.approx(
        a.v.isna().mean(), abs=1e-6
    )
    assert out.loc["v", "mean_a"] == pytest.approx(a.v.mean(), abs=1e-5)
    assert out.loc["v", "mean_shift"] == pytest.approx(
        b.v.mean() - a.v.mean(), abs=1e-5
    )
    assert out.loc["u", "min_a"] == a.u.min() and out.loc["u", "max_b"] == b.u.max()


# --- rolling_distinct_users ---------------------------------------------


def test_rolling_distinct_matches_brute(ray_session):
    import numpy as np
    from ai_service_ocr_grading_handler_ray.stages.profile import (
        rolling_distinct_users,
    )

    rng = np.random.default_rng(29)
    n = 800
    df = pd.DataFrame(
        {
            "ts": pd.Timestamp("2024-06-01")
            + pd.to_timedelta(rng.integers(0, 25 * 86400, n), unit="s"),
            "user_id": rng.integers(0, 60, n),
        }
    )
    out = rolling_distinct_users(
        rd.from_pandas(df).repartition(5), window_days=7
    ).set_index("day")
    pairs = df.assign(day=df.ts.dt.floor("D"))[["day", "user_id"]].drop_duplicates()
    for d in pairs.day.unique():
        w = pairs[(pairs.day <= d) & (pairs.day > d - pd.Timedelta(days=7))]
        assert out.loc[d, "wau"] == w.user_id.nunique()


def test_daily_activity_counts_null_users(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.profile import daily_activity

    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01"] * 3),
            "user_id": pd.array([1, None, None], dtype="Int64"),
        }
    )
    out = daily_activity(rd.from_pandas(df))
    # null user is still an event and one distinct user
    assert int(out.n_events.iloc[0]) == 3 and int(out.n_users.iloc[0]) == 2


def test_rolling_distinct_excludes_null_users(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.profile import (
        rolling_distinct_users,
    )

    df = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01"] * 3),
            "user_id": pd.array([7, None, None], dtype="Int64"),
        }
    )
    out = rolling_distinct_users(rd.from_pandas(df))
    assert int(out.wau.iloc[0]) == 1  # SQL count(DISTINCT) semantics


def test_numeric_drift_empty_side_reports_null(ray_session):
    import numpy as np
    from ai_service_ocr_grading_handler_ray.stages.profile import numeric_drift

    a = pd.DataFrame({"v": [1.0, 2.0]})
    b = pd.DataFrame({"v": pd.array([None, None], dtype="Float64")})
    out = numeric_drift(rd.from_pandas(a), rd.from_pandas(b), ["v"])
    r = out.iloc[0]
    assert r.n_b == 2 and r.null_frac_b == 1.0
    assert np.isnan(r.mean_b) and np.isnan(r.min_b) and np.isnan(r.max_b)
    assert np.isnan(r.mean_shift)


# --------------------------------------------------------------------------
# grouped mode
# --------------------------------------------------------------------------

from ai_service_ocr_grading_handler_ray.stages.profile import grouped_mode


def _mode_ds(pairs):
    import pandas as pd

    return rd.from_pandas(pd.DataFrame(pairs, columns=["g", "v"]))


def test_grouped_mode_basic_and_ties(ray_session):
    pairs = (
        [("u1", "click")] * 3 + [("u1", "view")] * 2
        # tie: 2-2 → smallest value wins
        + [("u2", "view")] * 2 + [("u2", "click")] * 2
        + [("u3", "purchase")]
    )
    out = grouped_mode(_mode_ds(pairs), group_col="g", value_col="v").to_pandas()
    got = {g: (v, int(n)) for g, v, n in zip(out["g"], out["v"], out["n"])}
    assert got == {"u1": ("click", 3), "u2": ("click", 2), "u3": ("purchase", 1)}


def test_grouped_mode_matches_pandas_brute(ray_session):
    import pandas as pd

    rng = np.random.RandomState(13)
    pairs = [
        (f"u{rng.randint(50)}", f"t{rng.randint(6)}") for _ in range(3000)
    ]
    out = grouped_mode(_mode_ds(pairs), group_col="g", value_col="v").to_pandas()
    df = pd.DataFrame(pairs, columns=["g", "v"])
    c = df.groupby(["g", "v"]).size().reset_index(name="n")
    c = c.sort_values(["g", "n", "v"], ascending=[True, False, True])
    ref = c.drop_duplicates("g").set_index("g")
    assert len(out) == len(ref)
    for g, v, n in zip(out["g"], out["v"], out["n"]):
        assert ref.loc[g, "v"] == v and int(ref.loc[g, "n"]) == int(n)


def test_grouped_mode_partial_fold_across_blocks(ray_session):
    # the same (group, value) split across many blocks must sum before
    # the argmax: 4 blocks of 1×(u,a) must beat one block of 3×(u,b)
    import pandas as pd

    frames = [pd.DataFrame({"g": ["u"], "v": ["a"]}) for _ in range(4)]
    frames.append(pd.DataFrame({"g": ["u"] * 3, "v": ["b"] * 3}))
    ds = rd.from_pandas(frames)
    out = grouped_mode(ds, group_col="g", value_col="v").to_pandas()
    assert list(out["v"]) == ["a"] and int(out["n"].iloc[0]) == 4
