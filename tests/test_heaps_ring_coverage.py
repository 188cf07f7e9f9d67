"""Heaps'-law fit (text_analysis.heaps_fit), consistent-hash ring
balance (stages/ring.py) and vocabulary coverage
(text_analysis.vocab_coverage): hand-computed fixtures, first-doc
semantics, wrap/tie conventions, exact ceil walks."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.ring import (
    ring_balance,
    ring_points,
)
from ai_service_ocr_grading_handler_ray.stages.text_analysis import (
    heaps_fit,
    vocab_coverage,
)


def _docs(rows):
    """rows: (doc_id, text)."""
    return rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
             "text": pa.array([r[1] for r in rows], type=pa.string())}
        )
    )


def test_heaps_linear_growth_beta_one(ray_session):
    # every doc introduces exactly one fresh token and repeats none:
    # V(n) == N(n) -> beta == 1, logk == 0
    rows = [(i, f"tok{i}") for i in range(64)]
    out = heaps_fit(_docs(rows))
    assert out.iloc[0]["beta"] == pytest.approx(1.0, abs=1e-6)
    assert out.iloc[0]["logk"] == pytest.approx(0.0, abs=1e-6)
    # checkpoints: 8, 16, 32, 64 -> 4 points
    assert out.iloc[0]["n_points"] == 4


def test_heaps_constant_vocab_beta_zero(ray_session):
    # every doc repeats the same token: V(n) == 1 -> beta == 0
    rows = [(i, "same") for i in range(64)]
    out = heaps_fit(_docs(rows))
    assert out.iloc[0]["beta"] == pytest.approx(0.0, abs=1e-6)


def test_heaps_too_few_points_is_nan(ray_session):
    out = heaps_fit(_docs([(0, "a"), (1, "b")]))
    # max id 1 -> no power-of-two threshold >= 8 except m+1=2 -> 1 point
    assert np.isnan(out.iloc[0]["beta"])


def test_ring_points_sorted_and_deterministic():
    h1, s1 = ring_points(8, 16)
    h2, s2 = ring_points(8, 16)
    assert (h1 == h2).all() and (s1 == s2).all()
    assert (np.diff(h1.astype(np.float64)) >= 0).all()
    assert len(h1) == 128


def test_ring_balance_counts_and_shares(ray_session):
    ds = rd.from_arrow(
        pa.table({"k": pa.array([1, 1, 1, 2], type=pa.int64())})
    )
    out = ring_balance(ds, key_col="k", n_shards=4, vnodes=8)
    assert len(out) == 4  # empty shards still report
    assert out["n_keys"].sum() == 2
    assert out["n_rows"].sum() == 4
    assert out["load_share"].sum() == pytest.approx(1.0, abs=1e-5)


def test_ring_balance_null_keys_drop(ray_session):
    ds = rd.from_arrow(
        pa.table({"k": pa.array([1, None], type=pa.int64())})
    )
    out = ring_balance(ds, key_col="k", n_shards=2, vnodes=4)
    assert out["n_rows"].sum() == 1


def test_ring_balance_empty_input(ray_session):
    ds = rd.from_arrow(pa.table({"k": pa.array([], type=pa.int64())}))
    out = ring_balance(ds, key_col="k", n_shards=3, vnodes=4)
    assert out["n_rows"].sum() == 0
    assert (out["load_share"] == 0.0).all()


def test_ring_balance_many_keys_spread(ray_session):
    # 10k uniform keys over 8x16 vnodes: no shard should be empty and
    # no shard should hold more than half the load
    ds = rd.from_arrow(
        pa.table({"k": pa.array(list(range(10_000)), type=pa.int64())})
    )
    out = ring_balance(ds, key_col="k", n_shards=8, vnodes=16)
    assert (out["n_rows"] > 0).all()
    assert out["load_share"].max() < 0.5


def test_vocab_coverage_hand_computed(ray_session):
    # counts: a=4, b=2, c=1, d=1 -> total 8, target ceil(8*.95)=8
    # head walk: a(4) -> 4; b(2) -> 6; need 2 more from {c,d} -> both
    out = vocab_coverage(_docs([(0, "a a a a b b c d")]))
    r = out.iloc[0]
    assert r["total_tokens"] == 8 and r["vocab_size"] == 4
    assert r["k_cover"] == 4 and r["covered_tokens"] == 8
    assert r["boundary_freq"] == 1


def test_vocab_coverage_partial_boundary_class(ray_session):
    # counts: a=6, b=1, c=1, d=1, e=1 -> total 10, target 10*.95 -> 10
    # a covers 6; need 4 of the four 1-count tokens -> k=5... use 50%:
    # target ceil(10*.5)=5 -> a(6) alone covers -> k_cover=1
    out = vocab_coverage(
        _docs([(0, "a a a a a a b c d e")]), share_pct=50
    )
    r = out.iloc[0]
    assert r["k_cover"] == 1 and r["boundary_freq"] == 6
    assert r["covered_tokens"] == 6


def test_vocab_coverage_empty(ray_session):
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([], type=pa.int64()),
                  "text": pa.array([], type=pa.string())})
    )
    out = vocab_coverage(ds)
    assert out.iloc[0]["total_tokens"] == 0
    assert out.iloc[0]["k_cover"] == 0


def test_heaps_null_doc_ids_dropped_everywhere(ray_session):
    # ADVICE r4: null ids must be filtered in max_partial and
    # count_below, matching fd_partial and the SQL replay (which
    # drops NULL ids) — previously int(np.max) raised on NaN.
    rows = [(i, f"tok{i}") for i in range(64)]
    ids = [r[0] for r in rows] + [None, None]
    txt = [r[1] for r in rows] + ["spurious", "alsonull"]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                  "text": pa.array(txt, type=pa.string())})
    )
    out = heaps_fit(ds)
    base = heaps_fit(_docs(rows))
    assert out.iloc[0]["beta"] == base.iloc[0]["beta"]
    assert out.iloc[0]["n_points"] == base.iloc[0]["n_points"]


def test_ring_balance_integer_exact_weights(ray_session):
    # ADVICE r4: row counts fold through an integer accumulator, not
    # float64 bincount weights — per-shard totals must equal the exact
    # integer sum of per-key row counts.
    import pyarrow as pa

    keys = pa.array(list(range(100)) * 3, type=pa.int64())
    ds = rd.from_arrow(pa.table({"k": keys}))
    out = ring_balance(ds, key_col="k", n_shards=4, vnodes=8)
    assert out["n_rows"].dtype == np.int64
    assert int(out["n_rows"].sum()) == 300
    assert int(out["n_keys"].sum()) == 100
