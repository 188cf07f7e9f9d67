"""A/B two-proportion z-test (stages/abtest.py), daily autocorrelation
(stages/trend.grouped_autocorr), calibration/ECE
(stages/evaluation.calibration_bins), URL path-prefix rollup
(stages/pathtree.py): hand-computed fixtures, degenerate branches,
split_part parse edge cases."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.abtest import ab_conversion_test
from ai_service_ocr_grading_handler_ray.stages.evaluation import calibration_bins
from ai_service_ocr_grading_handler_ray.stages.pathtree import path_prefix_rollup
from ai_service_ocr_grading_handler_ray.stages.trend import grouped_autocorr


def _ab_ds(rows):
    """rows: (key, variant, conv)."""
    return rd.from_pandas(
        pd.DataFrame(
            {
                "k": [r[0] for r in rows],
                "variant": [r[1] for r in rows],
                "conv": [r[2] for r in rows],
            }
        )
    )


def test_ab_test_hand_computed(ray_session):
    # A: users 1,2,3 (1 converts — two events, counted once); B: 4,5 (both)
    ds = _ab_ds(
        [
            (1, "A", 1), (1, "A", 1), (2, "A", 0), (3, "A", 0),
            (4, "B", 1), (5, "B", 1),
        ]
    )
    out = ab_conversion_test(ds, key_col="k", variant_col="variant", conv_col="conv")
    assert out["n_a"].iloc[0] == 3 and out["n_b"].iloc[0] == 2
    assert out["conv_a"].iloc[0] == 1 and out["conv_b"].iloc[0] == 2
    ra, rb = 1 / 3, 1.0
    p = 3 / 5
    se = math.sqrt(p * (1 - p) * (1 / 3 + 1 / 2))
    assert out["rate_a"].iloc[0] == pytest.approx(ra, abs=1e-6)
    assert out["lift"].iloc[0] == pytest.approx(ra / rb - 1, abs=1e-6)
    assert out["z"].iloc[0] == pytest.approx((ra - rb) / se, abs=1e-6)


def test_ab_test_requires_two_variants(ray_session):
    with pytest.raises(ValueError, match="exactly 2 variants"):
        ab_conversion_test(
            _ab_ds([(1, "A", 1)]), key_col="k", variant_col="variant",
            conv_col="conv",
        )


def test_ab_test_zero_rate_b_null_lift(ray_session):
    out = ab_conversion_test(
        _ab_ds([(1, "A", 1), (2, "B", 0)]),
        key_col="k", variant_col="variant", conv_col="conv",
    )
    assert np.isnan(out["lift"].iloc[0])


def _days_ds(rows):
    """rows: (key, day_offset, n_events) — n_events rows on that day."""
    recs = []
    for k, d, n in rows:
        for i in range(n):
            recs.append((k, pd.Timestamp("2024-01-01") + pd.Timedelta(days=d, seconds=i)))
    return rd.from_pandas(
        pd.DataFrame({"k": [r[0] for r in recs], "ts": [r[1] for r in recs]})
    )


def test_autocorr_hand_computed(ray_session):
    # key 'x': days 0..3 with counts 1,3,1,3 -> xbar=2, den=4,
    # pairs (1,3),(3,1),(1,3): num = (-1)(1)+(1)(-1)+(-1)(1) = -3
    ds = _days_ds([("x", 0, 1), ("x", 1, 3), ("x", 2, 1), ("x", 3, 3)])
    out = grouped_autocorr(ds, key_col="k", ts_col="ts")
    assert out["n_days"].iloc[0] == 4 and out["n_pairs"].iloc[0] == 3
    assert out["r1"].iloc[0] == pytest.approx(-0.75, abs=1e-9)


def test_autocorr_gap_excludes_pair(ray_session):
    # days 0,1,3: only (0,1) pairs; day 3 contributes to mean/den only
    ds = _days_ds([("x", 0, 1), ("x", 1, 2), ("x", 3, 3)])
    out = grouped_autocorr(ds, key_col="k", ts_col="ts")
    assert out["n_pairs"].iloc[0] == 1
    xbar = 2.0
    den = (1 - xbar) ** 2 + (2 - xbar) ** 2 + (3 - xbar) ** 2
    num = (1 - xbar) * (2 - xbar)
    assert out["r1"].iloc[0] == pytest.approx(num / den, abs=1e-9)


def test_autocorr_constant_series_null(ray_session):
    # den == 0 -> NULL r1
    ds = _days_ds([("x", 0, 2), ("x", 1, 2)])
    out = grouped_autocorr(ds, key_col="k", ts_col="ts")
    assert np.isnan(out["r1"].iloc[0])


def test_calibration_hand_computed(ray_session):
    # bin 0: scores .05,.05 labels 1,0 -> conf .05, acc .5, gap .45
    # bin 9: score 1.0 (edge -> clamped to bin 9) label 1 -> gap 0
    ds = rd.from_pandas(
        pd.DataFrame({"score": [0.05, 0.05, 1.0], "label": [1, 0, 1]})
    )
    out = calibration_bins(ds, score_col="score", label_col="label")
    assert list(out["bin"]) == [0, 9]
    b0 = out[out["bin"] == 0].iloc[0]
    assert b0["conf"] == pytest.approx(0.05) and b0["acc"] == pytest.approx(0.5)
    # ece = (2/3)*0.45 + (1/3)*0 = 0.3
    assert out["ece"].iloc[0] == pytest.approx(0.3, abs=1e-6)
    assert out["ece"].nunique() == 1


def test_path_rollup_parse_semantics(ray_session):
    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "url": [
                    "https://h/a/b/p1",       # depth1 /a, depth2 /a/b
                    "https://h/a/p2",         # depth1 /a, depth2 /a/p2
                    "https://h/a",            # depth1 /a only
                    "https://h//x",           # empty seg1 -> nothing
                    "https://h",              # no path -> nothing
                ],
                "b": [10, 20, 30, 40, 50],
            }
        )
    )
    out = (
        path_prefix_rollup(ds, url_col="url", bytes_col="b", max_depth=2)
        .to_pandas()
        .sort_values(["depth", "prefix"])
        .reset_index(drop=True)
    )
    d1 = out[out["depth"] == 1]
    assert list(d1["prefix"]) == ["/a"]
    assert d1["n_pages"].iloc[0] == 3 and d1["n_bytes"].iloc[0] == 60
    d2 = out[out["depth"] == 2].set_index("prefix")
    assert d2.loc["/a/b", "n_pages"] == 1
    assert d2.loc["/a/p2", "n_bytes"] == 20


def test_path_rollup_no_scheme_and_counts_only(ray_session):
    # scheme-less url: whole string is the authority+path per the
    # split_part convention; bytes_col omitted -> no n_bytes column
    ds = rd.from_pandas(pd.DataFrame({"url": ["h.example.org/x/y/z"]}))
    out = path_prefix_rollup(ds, url_col="url", max_depth=2).to_pandas()
    assert "n_bytes" not in out.columns
    assert set(out["prefix"]) == {"/x", "/x/y"}
    assert (out["host"] == "h.example.org").all()


# --- Mann-Whitney U ----------------------------------------------------------


def test_mwu_hand_computed(ray_session):
    import pandas as pd
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.abtest import mann_whitney_u

    # A = {1, 2}, B = {3, 4}: ranks 1,2 vs 3,4 -> R_A = 3, U_A = 0
    ds = rd.from_pandas(
        pd.DataFrame(
            {"g": ["A", "A", "B", "B"], "v": [1.0, 2.0, 3.0, 4.0]}
        )
    )
    out = mann_whitney_u(ds, variant_col="g", value_col="v")
    assert out["n_a"].iloc[0] == 2 and out["n_b"].iloc[0] == 2
    assert out["u_a"].iloc[0] == 0.0


def test_mwu_ties_average_ranks(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.abtest import mann_whitney_u

    # all values equal: every rank is (n+1)/2, U_A = n_a*n_b/2, z = NaN
    # (variance collapses to 0 under full ties)
    ds = rd.from_pandas(
        pd.DataFrame({"g": ["A", "B", "A", "B"], "v": [5.0] * 4})
    )
    out = mann_whitney_u(ds, variant_col="g", value_col="v")
    assert out["u_a"].iloc[0] == 2.0     # R_A = 2*2.5 = 5; 5 - 3 = 2
    assert np.isnan(out["z"].iloc[0])


def test_mwu_matches_scipy_formula_brute(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.abtest import mann_whitney_u

    rng = np.random.default_rng(3)
    v = np.round(rng.normal(size=500), 1)      # heavy ties
    g = np.where(rng.integers(0, 2, size=500) == 0, "A", "B")
    ds = rd.from_pandas(pd.DataFrame({"g": g, "v": v}))
    out = mann_whitney_u(ds, variant_col="g", value_col="v")
    # brute force with tie-averaged ranks
    order = pd.Series(v).rank(method="average").to_numpy()
    n_a = int((g == "A").sum()); n_b = len(v) - n_a
    r_a = order[g == "A"].sum()
    u_a = r_a - n_a * (n_a + 1) / 2
    _, cnt = np.unique(v, return_counts=True)
    ties = float((cnt.astype(float) ** 3 - cnt).sum())
    n = len(v)
    var = n_a * n_b / 12 * ((n + 1) - ties / (n * (n - 1)))
    z = (u_a - n_a * n_b / 2) / np.sqrt(var)
    assert out["u_a"].iloc[0] == round(u_a, 6)
    assert out["z"].iloc[0] == pytest.approx(round(z, 6), abs=1e-6)


def test_mwu_requires_two_variants(ray_session):
    import pandas as pd
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.abtest import mann_whitney_u

    ds = rd.from_pandas(pd.DataFrame({"g": ["A", "A"], "v": [1.0, 2.0]}))
    with pytest.raises(ValueError, match="exactly 2"):
        mann_whitney_u(ds, variant_col="g", value_col="v")


class TestSprt:
    def _events(self, outcomes):
        """outcomes: list of bool, one event per microsecond."""
        import pyarrow as pa
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "event_id": pa.array(range(len(outcomes)), type=pa.int64()),
                    "ts": pa.array(list(range(len(outcomes))),
                                   type=pa.timestamp("us")),
                    "event_type": pa.array(
                        ["purchase" if o else "view" for o in outcomes],
                        type=pa.string(),
                    ),
                }
            )
        )

    def test_accepts_h1_on_high_rate(self, ray_session):
        from ai_service_ocr_grading_handler_ray.stages.abtest import sprt_bernoulli

        # 40% success stream: must accept H1 (p1=0.22) quickly
        out = sprt_bernoulli(
            self._events([i % 5 < 2 for i in range(2000)]),
            p0=0.18, p1=0.22,
        ).iloc[0]
        assert out["decision"] == "accept_h1"
        assert out["n_seen"] < 2000  # stopped early

    def test_accepts_h0_on_low_rate(self, ray_session):
        from ai_service_ocr_grading_handler_ray.stages.abtest import sprt_bernoulli

        out = sprt_bernoulli(
            self._events([i % 20 == 0 for i in range(3000)]),  # 5%
            p0=0.18, p1=0.22,
        ).iloc[0]
        assert out["decision"] == "accept_h0"
        assert out["n_seen"] < 3000

    def test_continue_when_no_crossing(self, ray_session):
        from ai_service_ocr_grading_handler_ray.stages.abtest import sprt_bernoulli

        # exactly between the hypotheses, tiny sample: no decision
        out = sprt_bernoulli(
            self._events([i % 5 == 0 for i in range(20)]),  # 20%
            p0=0.18, p1=0.22,
        ).iloc[0]
        assert out["decision"] == "continue"
        assert out["n_seen"] == 20

    def test_multi_day_crossing_matches_single_scan(self, ray_session):
        """The day-bracket + pruned-scan path must find the same event a
        brute-force walk finds when the stream spans many days."""
        import math

        import numpy as np

        from ai_service_ocr_grading_handler_ray.stages.abtest import sprt_bernoulli

        day = 86_400_000_000
        rng = np.random.default_rng(3)
        outcomes = (rng.random(600) < 0.4).tolist()
        import pyarrow as pa
        import ray.data as rd

        ds = rd.from_arrow(
            pa.table(
                {
                    "event_id": pa.array(range(600), type=pa.int64()),
                    "ts": pa.array([i // 10 * day + (i % 10) for i in range(600)],
                                   type=pa.timestamp("us")),
                    "event_type": pa.array(
                        ["purchase" if o else "view" for o in outcomes],
                        type=pa.string(),
                    ),
                }
            )
        )
        out = sprt_bernoulli(ds, p0=0.18, p1=0.22).iloc[0]
        # brute force
        c1 = math.log(0.22 / 0.18)
        c2 = math.log(0.78 / 0.82)
        upper = math.log(0.95 / 0.05)
        s = k = 0
        for o in outcomes:
            k += 1
            s += int(o)
            if s * c1 + (k - s) * c2 >= upper:
                break
        assert out["decision"] == "accept_h1"
        assert out["n_seen"] == k and out["k_success"] == s
