"""Kaplan-Meier conversion curve (stages/survival.py) and Cohen's
kappa (stages/agreement.py): hand-computed fixtures, censoring
semantics, degenerate inputs, inline DuckDB parity."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.agreement import cohens_kappa
from ai_service_ocr_grading_handler_ray.stages.survival import km_conversion

US = 1_000_000
DAY = 86_400 * US


def _events(rows):
    """rows: (user_id, ts_us, event_type)."""
    return rd.from_pandas(
        pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
                "event_type": [r[2] for r in rows],
            }
        )
    )


def test_km_hand_computed(ray_session):
    # 4 users: u1 converts day 1, u2 converts day 3,
    # u3 censored day 2, u4 censored day 5
    rows = [
        (1, 0, "view"), (1, 1 * DAY, "purchase"),
        (2, 0, "view"), (2, 3 * DAY, "purchase"),
        (3, 0, "view"), (3, 2 * DAY, "click"),
        (4, 0, "view"), (4, 5 * DAY, "click"),
    ]
    out = km_conversion(_events(rows))
    # day 1: n_risk 4, d 1 → S = 3/4
    # day 3: n_risk 2 (u3 left at day 2), d 1 → S = 3/4 * 1/2 = 3/8
    assert list(out["day"]) == [1, 3]
    assert list(out["n_risk"]) == [4, 2]
    assert list(out["n_conv"]) == [1, 1]
    assert abs(out.loc[0, "surv"] - 0.75) < 1e-9
    assert abs(out.loc[1, "surv"] - 0.375) < 1e-9


def test_km_conversion_before_other_events(ray_session):
    # first event IS the conversion → duration day 0
    rows = [(1, 0, "purchase"), (1, 2 * DAY, "view")]
    out = km_conversion(_events(rows))
    assert list(out["day"]) == [0]
    assert out.loc[0, "surv"] == 0.0  # the only user converted


def test_km_no_conversions(ray_session):
    rows = [(1, 0, "view"), (2, 0, "click")]
    out = km_conversion(_events(rows))
    assert len(out) == 0  # steps only at conversion days


def test_km_duckdb_parity_inline(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.survival import km_sql

    rng = np.random.default_rng(5)
    rows = []
    for u in range(200):
        t0 = int(rng.integers(0, 3)) * DAY
        rows.append((u, t0, "view"))
        if rng.random() < 0.6:
            rows.append(
                (u, t0 + int(rng.integers(0, 10)) * DAY + 5 * US, "purchase")
            )
        if rng.random() < 0.5:
            rows.append((u, t0 + int(rng.integers(0, 12)) * DAY, "click"))
    df = pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
            "event_type": [r[2] for r in rows],
        }
    )
    mine = km_conversion(rd.from_pandas(df)).reset_index(drop=True)
    con = duckdb.connect()
    con.register("events", df)
    ref = con.sql(km_sql()).df().reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, ref, check_dtype=False, atol=1e-9, rtol=0)


def test_kappa_perfect_agreement(ray_session):
    df = pd.DataFrame({"a": ["x", "y"] * 20, "b": ["x", "y"] * 20})
    out = cohens_kappa(rd.from_pandas(df), rater1_col="a", rater2_col="b")
    assert out.loc[0, "po"] == 1.0
    assert out.loc[0, "kappa"] == 1.0


def test_kappa_chance_only(ray_session):
    # independent raters with 50/50 marginals: po == pe == 0.5, kappa 0
    rows = [(a, b) for a in "xy" for b in "xy" for _ in range(25)]
    df = pd.DataFrame(rows, columns=["a", "b"])
    out = cohens_kappa(rd.from_pandas(df), rater1_col="a", rater2_col="b")
    assert abs(out.loc[0, "po"] - 0.5) < 1e-9
    assert abs(out.loc[0, "pe"] - 0.5) < 1e-9
    assert abs(out.loc[0, "kappa"]) < 1e-9


def test_kappa_hand_computed(ray_session):
    # 2x2 table [[20, 5], [10, 15]]: po = 35/50 = .7,
    # pe = .5*.6 + .5*.4 = .5, kappa = .4
    df = pd.DataFrame(
        {
            "a": ["x"] * 25 + ["y"] * 25,
            "b": ["x"] * 20 + ["y"] * 5 + ["x"] * 10 + ["y"] * 15,
        }
    )
    out = cohens_kappa(rd.from_pandas(df), rater1_col="a", rater2_col="b")
    assert abs(out.loc[0, "po"] - 0.7) < 1e-9
    assert abs(out.loc[0, "pe"] - 0.5) < 1e-9
    assert abs(out.loc[0, "kappa"] - 0.4) < 1e-9


def test_kappa_degenerate_pe_one(ray_session):
    # both raters constant and equal: pe == 1 → kappa NULL
    df = pd.DataFrame({"a": ["x"] * 10, "b": ["x"] * 10})
    out = cohens_kappa(rd.from_pandas(df), rater1_col="a", rater2_col="b")
    assert np.isnan(out.loc[0, "kappa"])
    assert out.loc[0, "po"] == 1.0
