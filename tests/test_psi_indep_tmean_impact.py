"""PSI drift (trend.psi_drift), categorical independence
(profile.categorical_independence), trimmed mean
(selection.trimmed_mean_by_group) and the dedup impact report
(mirrors.dedup_impact): hand-computed fixtures, degenerate inputs,
validation, multi-block folds."""

from fractions import Fraction

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.mirrors import dedup_impact
from ai_service_ocr_grading_handler_ray.stages.profile import (
    categorical_independence,
)
from ai_service_ocr_grading_handler_ray.stages.selection import (
    trimmed_mean_by_group,
)
from ai_service_ocr_grading_handler_ray.stages.trend import psi_drift

US = 1_000_000


def _events(rows):
    """rows: (key, ts_us, value)."""
    return rd.from_pandas(
        pd.DataFrame(
            {
                "event_type": [r[0] for r in rows],
                "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
                "value": [float(r[2]) for r in rows],
            }
        )
    )


def test_psi_identical_halves_near_zero(ray_session):
    vals = list(range(100))
    rows = [("k", i * US, v) for i, v in enumerate(vals)]
    rows += [("k", (10_000 + i) * US, v) for i, v in enumerate(vals)]
    out = psi_drift(_events(rows), split_us=5_000 * US).to_dict("records")
    assert len(out) == 1
    assert out[0]["psi"] < 0.01  # smoothing keeps it tiny, not exactly 0


def test_psi_shifted_halves_large(ray_session):
    rows = [("k", i * US, float(i % 10)) for i in range(100)]
    rows += [("k", (10_000 + i) * US, 90.0 + i % 10) for i in range(100)]
    out = psi_drift(_events(rows), split_us=5_000 * US).to_dict("records")
    assert out[0]["psi"] > 1.0  # disjoint bins → massive PSI


def test_psi_single_sided_key_drops(ray_session):
    rows = [("early_only", i * US, float(i)) for i in range(10)]
    rows += [("both", i * US, float(i)) for i in range(5)]
    rows += [("both", (10_000 + i) * US, float(i)) for i in range(5)]
    out = psi_drift(_events(rows), split_us=5_000 * US)
    assert list(out["event_type"]) == ["both"]


def test_psi_constant_value_key(ray_session):
    # mx == mn → everything in bin 0, PSI defined via smoothing
    rows = [("k", i * US, 7.0) for i in range(10)]
    rows += [("k", (10_000 + i) * US, 7.0) for i in range(10)]
    out = psi_drift(_events(rows), split_us=5_000 * US).to_dict("records")
    assert abs(out[0]["psi"]) < 1e-9


def test_independence_perfectly_dependent(ray_session):
    # y = f(x): MI = H(x) = ln 2 for a uniform binary x
    df = pd.DataFrame({"lang": ["a", "b"] * 50})
    df["source"] = df["lang"].map({"a": "s1", "b": "s2"})
    out = categorical_independence(
        rd.from_pandas(df), x_col="lang", y_col="source"
    ).iloc[0]
    assert abs(out["mi"] - np.log(2)) < 1e-6
    assert abs(out["cramers_v"] - 1.0) < 1e-6
    assert out["df"] == 1


def test_independence_independent(ray_session):
    # balanced product distribution: MI = 0, chi2 = 0
    rows = [(x, y) for x in "ab" for y in "cd" for _ in range(25)]
    df = pd.DataFrame(rows, columns=["lang", "source"])
    out = categorical_independence(
        rd.from_pandas(df), x_col="lang", y_col="source"
    ).iloc[0]
    assert abs(out["mi"]) < 1e-9 and abs(out["chi2"]) < 1e-9


def test_independence_zero_cell_chi2(ray_session):
    # a structurally-missing cell still contributes E to chi2
    df = pd.DataFrame(
        {"lang": ["a"] * 10 + ["b"] * 10, "source": ["s1"] * 10 + ["s2"] * 10}
    )
    df = pd.concat([df, pd.DataFrame({"lang": ["a"], "source": ["s2"]})])
    out = categorical_independence(
        rd.from_pandas(df), x_col="lang", y_col="source"
    ).iloc[0]
    assert out["n"] == 21 and out["chi2"] > 10


def test_trimmed_mean_hand_computed(ray_session):
    # 10 values 1..9 + outlier 1000: Q(.1)=v at rank 1 =1, Q(.9)=rank 9 =9
    # → keep 1..9, mean = 5
    ds = rd.from_pandas(
        pd.DataFrame({"g": ["g"] * 10, "v": list(range(1, 10)) + [1000]})
    )
    out = trimmed_mean_by_group(
        ds, value_col="v", group_col="g", trim=Fraction(1, 10)
    )
    assert out.loc[0, "trimmed_mean"] == 5.0
    assert out.loc[0, "n_kept"] == 9
    assert out.loc[0, "lo"] == 1.0 and out.loc[0, "hi"] == 9.0


def test_trimmed_mean_validates(ray_session):
    fl = rd.from_pandas(pd.DataFrame({"g": ["g"], "v": [1.5]}))
    with pytest.raises(ValueError, match="integer"):
        trimmed_mean_by_group(fl, value_col="v", group_col="g")
    ds = rd.from_pandas(pd.DataFrame({"g": ["g"], "v": [1]}))
    with pytest.raises(ValueError, match="trim"):
        trimmed_mean_by_group(
            ds, value_col="v", group_col="g", trim=Fraction(3, 5)
        )


def test_dedup_impact_hand_computed(ray_session):
    # h1: 3 copies of 100 bytes → wasted 200; h2: singleton → wasted 0;
    # h3: 2 copies sizes (50, 70) → keep-best keeps 70, wasted 50
    df = pd.DataFrame(
        {
            "content_hash": ["h1", "h1", "h1", "h2", "h3", "h3"],
            "n_bytes": [100, 100, 100, 40, 50, 70],
        }
    )
    out = dedup_impact(rd.from_pandas(df))
    want = pd.DataFrame(
        {
            "cluster_size": [1, 2, 3],
            "n_clusters": [1, 1, 1],
            "n_pages": [1, 2, 3],
            "wasted_bytes": [0, 50, 200],
        }
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_dedup_impact_multiblock(ray_session):
    # the same hash split across two blocks must still count as ONE
    # cluster (the hash-partition shuffle co-locates the copies)
    a = pd.DataFrame({"content_hash": ["x"] * 3, "n_bytes": [10] * 3})
    b = pd.DataFrame({"content_hash": ["x"] * 2, "n_bytes": [10] * 2})
    out = dedup_impact(rd.from_pandas(a).union(rd.from_pandas(b)))
    assert list(out["cluster_size"]) == [5]
    assert out.loc[0, "wasted_bytes"] == 40


def test_dedup_impact_null_hash_cluster(ray_session):
    # SQL GROUP BY keeps a NULL-hash cluster; the engine must too
    df = pd.DataFrame(
        {"content_hash": [None, None, "h"], "n_bytes": [10, 20, 5]}
    )
    out = dedup_impact(rd.from_pandas(df))
    two = out[out["cluster_size"] == 2].iloc[0]
    assert two["n_clusters"] == 1 and two["wasted_bytes"] == 10


def test_independence_cap_before_pivot(ray_session):
    # cap must fire from the sparse counts, not after a dense pivot
    n = 1200
    df = pd.DataFrame({"lang": [f"x{i}" for i in range(n)],
                       "source": [f"y{i}" for i in range(n)]})
    with pytest.raises(ValueError, match="cap"):
        categorical_independence(
            rd.from_pandas(df), x_col="lang", y_col="source"
        )
