"""General interval join (stages/intervals.py): brute-force
equivalence, boundary semantics, bucket-edge cases, span guard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.intervals import interval_join_points


def _run(points_df, intervals_df, **kw):
    out = interval_join_points(
        rd.from_pandas(points_df), rd.from_pandas(intervals_df),
        value_col="v", start_col="s", end_col="e", **kw,
    ).to_pandas()
    return out.sort_values(["pid", "iid"]).reset_index(drop=True)


def _brute(points_df, intervals_df):
    rows = []
    for p in points_df.itertuples():
        for i in intervals_df.itertuples():
            if i.s <= p.v <= i.e:
                rows.append((p.pid, p.v, i.iid, i.s, i.e))
    return (
        pd.DataFrame(rows, columns=["pid", "v", "iid", "s", "e"])
        .sort_values(["pid", "iid"])
        .reset_index(drop=True)
    )


def test_matches_brute_force_random_overlapping():
    rng = np.random.RandomState(11)
    pts = pd.DataFrame({"pid": np.arange(300), "v": rng.uniform(-50, 150, 300)})
    lo = rng.uniform(-60, 140, 80)
    iv = pd.DataFrame({"iid": np.arange(80), "s": lo, "e": lo + rng.uniform(0, 40, 80)})
    got = _run(pts, iv, bucket_width=16.0)
    ref = _brute(pts, iv)
    assert len(got) == len(ref) > 500
    got2 = got.astype({"pid": "int64", "iid": "int64"})
    pd.testing.assert_frame_equal(got2[["pid", "v", "iid", "s", "e"]], ref)


def test_boundaries_inclusive_and_bucket_edges():
    # points exactly on interval ends and on bucket boundaries
    pts = pd.DataFrame({"pid": [0, 1, 2, 3], "v": [8.0, 16.0, 10.0, 24.0]})
    iv = pd.DataFrame({"iid": [0], "s": [8.0], "e": [24.0]})
    got = _run(pts, iv, bucket_width=8.0)
    assert sorted(got.pid) == [0, 1, 2, 3]


def test_inverted_and_disjoint_intervals_yield_nothing():
    pts = pd.DataFrame({"pid": [0], "v": [5.0]})
    iv = pd.DataFrame({"iid": [0, 1], "s": [9.0, 100.0], "e": [3.0, 200.0]})
    out = interval_join_points(
        rd.from_pandas(pts), rd.from_pandas(iv),
        value_col="v", start_col="s", end_col="e", bucket_width=4.0,
    ).to_pandas()
    assert len(out) == 0


def test_span_guard_raises():
    pts = pd.DataFrame({"pid": [0], "v": [5.0]})
    iv = pd.DataFrame({"iid": [0], "s": [0.0], "e": [1e9]})
    # the guard raises inside a Ray task; Ray re-raises a wrapped error
    # whose message carries the original ValueError text
    with pytest.raises(Exception, match="max_span_buckets"):
        _run(pts, iv, bucket_width=1.0, max_span_buckets=100)


def test_overlapping_column_names_rejected():
    pts = pd.DataFrame({"pid": [0], "v": [5.0], "x": [1]})
    iv = pd.DataFrame({"iid": [0], "s": [0.0], "e": [9.0], "x": [2]})
    with pytest.raises(ValueError, match="rename overlapping"):
        _run(pts, iv, bucket_width=4.0)
