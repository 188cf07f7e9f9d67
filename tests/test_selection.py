"""Exact distributed order statistics (stages/selection.py): histogram
refinement must return the EXACT ceil(frac*n)-th smallest value per group —
verified against a local numpy sort across forced code paths (collect,
multi-round refine, degenerate buckets, ties, 1-ulp intervals), plus the
CCNet perplexity-tier composition against a pandas replay."""

import math
from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.selection import (
    exact_group_quantiles,
    perplexity_tiers,
    round_half_away,
)

FRACS = (Fraction(1, 4), Fraction(1, 3), Fraction(1, 2), Fraction(9, 10), 1)


def _expected(df: pd.DataFrame, fracs=FRACS) -> dict:
    out = {}
    for g, sub in df.groupby("g"):
        v = np.sort(sub["v"].to_numpy(dtype=np.float64))
        n = len(v)
        out[g] = [float(v[min(n, max(1, math.ceil(f * n))) - 1]) for f in fracs]
    return out


def _ds(df: pd.DataFrame, blocks: int = 7) -> rd.Dataset:
    return rd.from_arrow(pa.Table.from_pandas(df)).repartition(blocks)


def _check(df, **kw):
    got = exact_group_quantiles(_ds(df), "v", "g", FRACS, **kw)
    want = _expected(df)
    assert set(got) == set(want)
    for g in want:
        assert got[g] == pytest.approx(want[g], abs=0), (g, got[g], want[g])


def test_collect_path_matches_numpy():
    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {"g": rng.choice(["en", "fr", "de"], 500), "v": rng.normal(size=500)}
    )
    _check(df)  # n << collect_cap: pure collect


def test_refinement_path_matches_numpy():
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {"g": rng.choice(["a", "b"], 4000), "v": rng.lognormal(size=4000)}
    )
    # collect_cap far below group sizes and few bins => several refine rounds
    _check(df, bins=8, collect_cap=16)


def test_heavy_ties_and_degenerate_buckets():
    rng = np.random.default_rng(13)
    # values from a 5-point set: every bucket boundary lands on a tie run
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y"], 3000),
            "v": rng.choice([-1.0, 0.0, 0.25, 0.25, 7.5], 3000),
        }
    )
    _check(df, bins=4, collect_cap=8)


def test_one_ulp_interval_two_values():
    a = 1.0
    b = float(np.nextafter(a, np.inf))
    rng = np.random.default_rng(17)
    df = pd.DataFrame({"g": "z", "v": rng.choice([a, b], 2000)})
    _check(df, bins=4, collect_cap=8)


def test_integer_column_and_single_value_group():
    rng = np.random.default_rng(19)
    df = pd.DataFrame(
        {"g": rng.choice(["i", "j"], 1000), "v": rng.integers(-50, 50, 1000)}
    )
    df = pd.concat(
        [df, pd.DataFrame({"g": ["solo"], "v": [42]})], ignore_index=True
    )
    got = exact_group_quantiles(_ds(df), "v", "g", FRACS, bins=8, collect_cap=16)
    want = _expected(df)
    assert got == {g: pytest.approx(w, abs=0) for g, w in want.items()}
    assert got["solo"] == [42.0] * len(FRACS)


def test_float_frac_and_default_median():
    df = pd.DataFrame({"g": "m", "v": np.arange(101, dtype=np.float64)})
    got = exact_group_quantiles(_ds(df), "v", "g")  # default median
    assert got == {"m": [50.0]}  # ceil(0.5*101) = 51st smallest = 50.0
    got = exact_group_quantiles(_ds(df), "v", "g", (0.1, 0.9), collect_cap=10, bins=4)
    assert got == {"m": [10.0, 90.0]}


def test_nulls_and_nans_ignored():
    df = pd.DataFrame(
        {
            "g": ["a", "a", "a", "a", None, "a"],
            "v": [3.0, np.nan, 1.0, 2.0, 9.0, None],
        }
    )
    got = exact_group_quantiles(_ds(df, blocks=2), "v", "g", (Fraction(1, 2),))
    assert got == {"a": [2.0]}


def test_non_finite_values_rejected():
    df = pd.DataFrame({"g": ["a", "a"], "v": [1.0, np.inf]})
    with pytest.raises(ValueError, match="non-finite"):
        exact_group_quantiles(_ds(df, blocks=1), "v", "g")


def _tier_replay(docs: pd.DataFrame) -> pd.DataFrame:
    """Local pandas replay of CCNet tiering over the self-trained unigram LM."""
    toks = docs["text"].str.split(" ")
    all_toks = [t for ts in toks for t in ts]
    counts = pd.Series(all_toks).value_counts()
    total = float(counts.sum())
    lp = np.log(counts / total)
    rows = []
    for _, r in docs.iterrows():
        ts = r["text"].split(" ")
        rows.append(
            {
                "doc_id": r["doc_id"],
                "lang": r["lang"],
                "n_tokens": len(ts),
                "avg_logprob": float(
                    round_half_away(
                        np.array([np.mean([lp[t] for t in ts])]), 4
                    )[0]
                ),
            }
        )
    scored = pd.DataFrame(rows)
    out = []
    for lang, sub in scored.groupby("lang"):
        v = np.sort(sub["avg_logprob"].to_numpy())
        n = len(v)
        v1 = v[max(1, math.ceil(Fraction(1, 3) * n)) - 1]
        v2 = v[max(1, math.ceil(Fraction(2, 3) * n)) - 1]
        sub = sub.copy()
        sub["tier"] = np.where(
            sub["avg_logprob"] > v2,
            "head",
            np.where(sub["avg_logprob"] > v1, "middle", "tail"),
        )
        out.append(sub)
    return pd.concat(out).sort_values("doc_id").reset_index(drop=True)


def test_perplexity_tiers_matches_pandas_replay():
    rng = np.random.default_rng(23)
    vocab = np.array([f"w{i}" for i in range(60)])
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(90, dtype=np.int64),
            "lang": rng.choice(["en", "fr"], 90),
            "text": [
                " ".join(rng.choice(vocab, rng.integers(3, 30)))
                for _ in range(90)
            ],
        }
    )
    got = (
        perplexity_tiers(_ds(docs), collect_cap=8, bins=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[["doc_id", "lang", "n_tokens", "avg_logprob", "tier"]]
    )
    want = _tier_replay(docs)[["doc_id", "lang", "n_tokens", "avg_logprob", "tier"]]
    pd.testing.assert_frame_equal(
        got.astype({"n_tokens": np.int64}), want.astype({"n_tokens": np.int64})
    )


def test_tier_fractions_are_terciles():
    """Each language's tiers split ~n/3 exactly by the rank rule
    (ties can only grow the lower tier, never shrink it)."""
    rng = np.random.default_rng(29)
    vocab = np.array([f"t{i}" for i in range(500)])
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(600, dtype=np.int64),
            "lang": rng.choice(["en", "de", "fr"], 600),
            "text": [
                " ".join(rng.choice(vocab, rng.integers(5, 40)))
                for _ in range(600)
            ],
        }
    )
    out = perplexity_tiers(_ds(docs)).to_pandas()
    for lang, sub in out.groupby("lang"):
        n = len(sub)
        tc = sub["tier"].value_counts()
        # rank rule: |tail| >= ceil(n/3) - (ties), head <= n - ceil(2n/3)
        assert tc.get("tail", 0) >= math.ceil(n / 3) - 1 or n < 3
        assert tc.get("head", 0) <= n - math.ceil(2 * n / 3) + 1
        assert tc.sum() == n


# --- mad_outliers ----------------------------------------------------------


def _mad_fixture():
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(3)
    v = np.concatenate([rng.normal(10, 1, 200), [50.0, -40.0, 10.1]])
    g = ["a"] * len(v)
    v2 = np.concatenate([rng.normal(0, 5, 100), [1000.0]])
    g += ["b"] * len(v2)
    vals = np.concatenate([v, v2])
    return pa.table(
        {
            "event_id": pa.array(range(len(vals)), type=pa.int64()),
            "event_type": pa.array(g, type=pa.string()),
            "value": pa.array(vals, type=pa.float64()),
        }
    )


def _mad_reference(t, k=3.0, c=1.4826):
    import numpy as np
    import pandas as pd

    df = t.to_pandas()
    out = []
    for g, part in df.groupby("event_type"):
        v = np.sort(part.value.to_numpy())
        med = v[int(np.ceil(len(v) / 2)) - 1]
        ad = np.sort(np.abs(part.value.to_numpy() - med))
        mad = ad[int(np.ceil(len(ad) / 2)) - 1]
        m = np.abs(part.value.to_numpy() - med) > (k * c) * mad
        out.extend(part.event_id.to_numpy()[m].tolist())
    return sorted(out)


def test_mad_outliers_matches_reference(ray_session):
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.selection import mad_outliers

    t = _mad_fixture()
    got = (
        mad_outliers(
            rd.from_arrow(t).repartition(4),
            value_col="value",
            group_col="event_type",
            keep_cols=("event_id",),
        )
        .to_pandas()
    )
    assert sorted(got.event_id.tolist()) == _mad_reference(t)
    # the planted extremes are all caught
    planted = {200, 201, len(t) - 1}
    assert planted <= set(got.event_id.tolist())


def test_mad_outliers_constant_group_flags_nothing(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.selection import mad_outliers

    t = pa.table(
        {
            "event_id": pa.array(range(6), type=pa.int64()),
            "event_type": ["a"] * 6,
            "value": pa.array([5.0] * 6, type=pa.float64()),
        }
    )
    got = mad_outliers(
        rd.from_arrow(t), value_col="value", group_col="event_type",
        keep_cols=("event_id",),
    ).to_pandas()
    assert len(got) == 0


# --- grouped_gini ------------------------------------------------------------


def _brute_gini(vals):
    x = np.sort(np.asarray(vals, dtype=np.float64))
    n = len(x)
    i = np.arange(1, n + 1)
    return float(((2 * i - n - 1) * x).sum() / (n * x.sum()))


def test_grouped_gini_matches_brute(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.selection import grouped_gini

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "g": rng.choice(list("abc"), 500),
            "v": rng.integers(0, 50, 500),
        }
    )
    out = grouped_gini(
        rd.from_pandas(df).repartition(6), value_col="v", group_col="g"
    )
    for g, sub in df.groupby("g"):
        row = out[out.g == g]
        assert row.gini.iloc[0] == pytest.approx(_brute_gini(sub.v), abs=1e-6)
        assert int(row.n.iloc[0]) == len(sub)
        assert int(row.total.iloc[0]) == int(sub.v.sum())


def test_grouped_gini_extremes(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.selection import grouped_gini

    df = pd.DataFrame(
        {
            "g": ["eq"] * 10 + ["conc"] * 10,
            "v": [7] * 10 + [0] * 9 + [100],
        }
    )
    out = grouped_gini(rd.from_pandas(df), value_col="v", group_col="g")
    assert out[out.g == "eq"].gini.iloc[0] == 0.0  # perfect equality
    assert out[out.g == "conc"].gini.iloc[0] == 0.9  # 1 - 1/n


def test_grouped_gini_negative_raises(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.selection import grouped_gini

    df = pd.DataFrame({"g": ["a", "a"], "v": [1, -2]})
    with pytest.raises(Exception, match="non-negative"):
        grouped_gini(rd.from_pandas(df), value_col="v", group_col="g")


def test_grouped_gini_zero_total_matches_oracle(ray_session):
    # review finding: all-zero group — engine 0.0, SQL used to emit NULL
    import duckdb
    from ai_service_ocr_grading_handler_ray.stages.selection import (
        grouped_gini,
        grouped_gini_sql,
    )

    df = pd.DataFrame({"g": ["z", "z", "a"], "v": [0, 0, 5]})
    out = grouped_gini(rd.from_pandas(df), value_col="v", group_col="g")
    assert out[out.g == "z"].gini.iloc[0] == 0.0
    con = duckdb.connect()
    con.register("src", df)
    sql = grouped_gini_sql(
        "v AS (SELECT g, CAST(v AS BIGINT) AS val FROM src)", group_col="g"
    )
    ref = con.sql(sql).df().set_index("g")
    assert ref.loc["z", "gini"] == 0.0


# --- cume_dist_by_group --------------------------------------------------


def test_cume_dist_matches_pandas(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.selection import (
        cume_dist_by_group,
    )

    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {
            "id": np.arange(300),
            "g": rng.choice(list("ab"), 300),
            "v": rng.integers(0, 25, 300).astype(np.float64),  # ties
        }
    )
    out = (
        cume_dist_by_group(
            rd.from_pandas(df).repartition(5),
            value_col="v", group_col="g", keep_cols=["id"],
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    exp = df.copy()
    # pandas rank(method='max', pct=True) == SQL cume_dist
    exp["cume"] = exp.groupby("g")["v"].rank(method="max", pct=True)
    exp = exp.sort_values("id").reset_index(drop=True)
    assert np.allclose(out["cume"], exp["cume"], atol=1e-6)
    # top value in each group has cume exactly 1.0
    for g, sub in out.groupby("g"):
        assert sub.loc[sub.v.idxmax(), "cume"] == 1.0


def test_decile_bins_equi_depth(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.selection import decile_bins

    rng = np.random.default_rng(31)
    vals = rng.integers(0, 10_000, 1000)
    df = pd.DataFrame({"v": vals})
    out = decile_bins(rd.from_pandas(df).repartition(4), value_col="v")
    assert out.n.sum() == 1000
    # near-equal depth (ties can shift boundaries slightly)
    assert out.n.max() - out.n.min() <= 10
    # buckets ordered and non-overlapping
    assert (out.min_v.to_numpy()[1:] > out.max_v.to_numpy()[:-1]).all()
    # brute-force bucket for a few values
    th = np.sort(vals)[[int(np.ceil(j / 10 * len(vals))) - 1 for j in range(1, 10)]]
    for v in vals[:20]:
        b = int((th < v).sum())
        row = out[out.bucket == b]
        assert row.min_v.iloc[0] <= v <= row.max_v.iloc[0]
