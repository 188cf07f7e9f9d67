"""Weighted median (selection.weighted_median_by_group), KS two-sample
drift (trend.ks_drift) and G² keyness (text_analysis.keyness_by_group):
hand-computed fixtures, forced refinement paths, input validation, and
DuckDB parity on inline relations (the sf-table parity runs in
test_oracle_parity.py)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.selection import (
    weighted_median_by_group,
)
from ai_service_ocr_grading_handler_ray.stages.text_analysis import (
    keyness_by_group,
)
from ai_service_ocr_grading_handler_ray.stages.trend import ks_drift

US = 1_000_000


def test_weighted_median_hand_computed(ray_session):
    # g: values 1,2,3 weights 1,1,10 → W=12, T=6 → wmedian=3
    # h: values 5,6 weights 3,1 → W=4, T=2 → wmedian=5
    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "g": ["g", "g", "g", "h", "h"],
                "v": [1, 2, 3, 5, 6],
                "w": [1, 1, 10, 3, 1],
            }
        )
    )
    out = weighted_median_by_group(
        ds, value_col="v", weight_col="w", group_col="g"
    ).to_pandas()
    byg = out.set_index("g")
    assert byg.loc["g", "wmedian"] == 3.0 and byg.loc["g", "w_total"] == 12
    assert byg.loc["h", "wmedian"] == 5.0 and byg.loc["h", "n"] == 2


def test_weighted_median_even_split_takes_lower(ray_session):
    # W=4, T=2: cumw(1)=2 >= 2 → lower median 1 (not 2)
    ds = rd.from_pandas(
        pd.DataFrame({"g": ["g", "g"], "v": [1, 2], "w": [2, 2]})
    )
    out = weighted_median_by_group(
        ds, value_col="v", weight_col="w", group_col="g"
    ).to_pandas()
    assert out.loc[0, "wmedian"] == 1.0


def test_weighted_median_forced_refinement(ray_session):
    # collect_cap=10 forces the histogram loop on a 5000-row group;
    # verify against the direct cumsum definition
    rng = np.random.default_rng(3)
    v = rng.integers(0, 1000, size=5000)
    w = rng.integers(0, 7, size=5000)
    ds = rd.from_pandas(pd.DataFrame({"g": "g", "v": v, "w": w}))
    out = weighted_median_by_group(
        ds, value_col="v", weight_col="w", group_col="g",
        collect_cap=10, bins=16,
    ).to_pandas()
    order = np.argsort(v, kind="mergesort")
    cum = np.cumsum(w[order])
    want = float(v[order][np.searchsorted(cum, (w.sum() + 1) // 2)])
    assert out.loc[0, "wmedian"] == want


def test_weighted_median_same_column(ray_session):
    # value_col == weight_col (the size-biased median) must not collide
    ds = rd.from_pandas(pd.DataFrame({"g": ["g"] * 4, "v": [1, 2, 3, 10]}))
    out = weighted_median_by_group(
        ds, value_col="v", weight_col="v", group_col="g"
    ).to_pandas()
    # W=16, T=8: cum 1,3,6,16 → first >= 8 is 10
    assert out.loc[0, "wmedian"] == 10.0


def test_weighted_median_validation(ray_session):
    fl = rd.from_pandas(pd.DataFrame({"g": ["g"], "v": [1], "w": [1.5]}))
    with pytest.raises(ValueError, match="integer"):
        weighted_median_by_group(fl, value_col="v", weight_col="w", group_col="g")
    neg = rd.from_pandas(pd.DataFrame({"g": ["g"], "v": [1], "w": [-1]}))
    with pytest.raises(ValueError, match="negative"):
        weighted_median_by_group(neg, value_col="v", weight_col="w", group_col="g")


def test_weighted_median_zero_weight_group_drops(ray_session):
    ds = rd.from_pandas(
        pd.DataFrame({"g": ["z", "k"], "v": [1, 2], "w": [0, 5]})
    )
    out = weighted_median_by_group(
        ds, value_col="v", weight_col="w", group_col="g"
    ).to_pandas()
    assert list(out["g"]) == ["k"]


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


def test_ks_disjoint_supports_d_is_one(ray_session):
    rows = [("k", i * US, float(i)) for i in range(10)]          # early 0-9
    rows += [("k", (100 + i) * US, float(100 + i)) for i in range(10)]
    out = ks_drift(_events(rows), split_us=50 * US).to_pandas()
    assert len(out) == 1
    assert out.loc[0, "ks_d"] == 1.0
    assert out.loc[0, "n_early"] == 10 and out.loc[0, "n_late"] == 10


def test_ks_identical_distributions_d_zero(ray_session):
    vals = [1.0, 2.0, 3.0, 4.0]
    rows = [("k", i * US, v) for i, v in enumerate(vals)]
    rows += [("k", (100 + i) * US, v) for i, v in enumerate(vals)]
    out = ks_drift(_events(rows), split_us=50 * US).to_pandas()
    assert out.loc[0, "ks_d"] == 0.0


def test_ks_single_sided_key_drops(ray_session):
    rows = [("only_early", i * US, float(i)) for i in range(5)]
    rows += [("both", i * US, float(i)) for i in range(3)]
    rows += [("both", (100 + i) * US, float(i)) for i in range(3)]
    out = ks_drift(_events(rows), split_us=50 * US).to_pandas()
    assert list(out["event_type"]) == ["both"]


def test_ks_hand_computed(ray_session):
    # early {1, 2}, late {2, 3}: ECDF gaps at v=1: |.5-0|=.5,
    # v=2: |1-.5|=.5, v=3: |1-1|=0 → D=0.5
    rows = [("k", 0, 1.0), ("k", US, 2.0),
            ("k", 100 * US, 2.0), ("k", 101 * US, 3.0)]
    out = ks_drift(_events(rows), split_us=50 * US).to_pandas()
    assert out.loc[0, "ks_d"] == 0.5
    want_stat = 0.5 * np.sqrt(2 * 2 / 4)
    assert abs(out.loc[0, "ks_stat"] - want_stat) < 1e-9


def test_keyness_planted_term(ray_session):
    # 'zebra' appears only in source A and often; filler is uniform
    docs = []
    for i in range(40):
        src = "A" if i % 2 == 0 else "B"
        words = ["common"] * 5
        if src == "A":
            words += ["zebra", "zebra"]
        else:
            words += ["yak", "yak"]
        docs.append({"source": src, "text": " ".join(words)})
    ds = rd.from_pandas(pd.DataFrame(docs))
    out = keyness_by_group(ds, group_col="source", top_k=3, min_count=5)
    top_a = out[out["source"] == "A"].iloc[0]
    assert top_a["term"] == "zebra" and top_a["n_out"] == 0
    top_b = out[out["source"] == "B"].iloc[0]
    assert top_b["term"] == "yak"
    # 'common' is at corpus rate in both → never overrepresented
    assert "common" not in set(out["term"])


def test_keyness_duckdb_parity_inline(ray_session):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(60):
        src = f"s{i % 3}"
        words = list(rng.choice(vocab, size=25))
        words += [f"special{i % 3}"] * int(rng.integers(3, 8))
        docs.append({"source": src, "text": " ".join(words)})
    df = pd.DataFrame(docs)
    from ai_service_ocr_grading_handler_ray.stages.text_analysis import (
        keyness_sql,
    )

    mine = keyness_by_group(
        rd.from_pandas(df), group_col="source", top_k=5, min_count=3
    ).sort_values(["source", "term"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", df)
    ref = (
        con.sql(keyness_sql(group_col="source", top_k=5, min_count=3))
        .df()
        .sort_values(["source", "term"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(mine, ref, check_dtype=False, atol=1e-9, rtol=0)


def test_ks_partials_merge_across_blocks(ray_session):
    # the SAME (key, value) arriving from two separate blocks must merge
    # before the ECDF cumsum: value 5.0 occurs 100x early (block 1) and
    # 100x late (block 2) → identical distributions, true D = 0
    early = pd.DataFrame(
        {
            "event_type": ["k"] * 100,
            "ts": pd.to_datetime([i * US for i in range(100)], unit="us"),
            "value": [5.0] * 100,
        }
    )
    late = pd.DataFrame(
        {
            "event_type": ["k"] * 100,
            "ts": pd.to_datetime(
                [(10_000 + i) * US for i in range(100)], unit="us"
            ),
            "value": [5.0] * 100,
        }
    )
    ds = rd.from_pandas(early).union(rd.from_pandas(late))
    out = ks_drift(ds, split_us=5_000 * US).to_pandas()
    assert len(out) == 1
    assert out.loc[0, "ks_d"] == 0.0


def test_kwic_null_text(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.kwic import kwic_snippets

    ds = rd.from_pandas(
        pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": ["a needle b", None, "plain"]}
        )
    )
    out = kwic_snippets(ds, term="needle", context=2).to_pandas()
    assert list(out["id"]) == [1]  # null text = no match, like SQL strpos


def test_attribution_string_ids(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.sequence import (
        last_touch_attribution,
    )

    df = pd.DataFrame(
        {
            "event_id": ["e1", "e2", "e3"],
            "user_id": [1, 1, 2],
            "ts": pd.to_datetime([1 * US, 2 * US, 3 * US], unit="us"),
            "event_type": ["view", "purchase", "purchase"],
        }
    )
    out = (
        last_touch_attribution(rd.from_pandas(df), num_parts=4)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(out["event_id"]) == ["e2", "e3"]
    assert out.loc[0, "touch_id"] == "e1"
    assert out["touch_id"].isna().sum() == 1  # e3 has no touch
