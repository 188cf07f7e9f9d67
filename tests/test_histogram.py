"""Equi-width grouped histogram (stages/histogram.py): numpy reference
equivalence, clamp semantics, partition invariance, arg validation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.histogram import grouped_histogram


def _fixture():
    rng = np.random.default_rng(11)
    v = np.concatenate([rng.uniform(-5, 15, 300), [-100.0, 100.0, 10.0]])
    g = np.where(np.arange(len(v)) % 2 == 0, "a", "b")
    return pa.table({"g": g, "v": v})


def _reference(t, lo, hi, bins):
    df = t.to_pandas()
    w = (hi - lo) / bins
    b = np.clip(np.floor((df.v - lo) / w), 0, bins - 1).astype(np.int64)
    r = (
        pd.DataFrame({"g": df.g, "bin": b})
        .groupby(["g", "bin"])
        .size()
        .reset_index(name="n")
    )
    return {(row.g, row.bin): row.n for row in r.itertuples()}


def _run(ds, **kw):
    df = grouped_histogram(ds, value_col="v", group_col="g", **kw).to_pandas()
    return {(r.g, r.bin): r.n for r in df.itertuples()}


def test_matches_reference(ray_session):
    t = _fixture()
    got = _run(rd.from_arrow(t).repartition(4), lo=0.0, hi=10.0, bins=5)
    assert got == _reference(t, 0.0, 10.0, 5)


def test_clamp_edges(ray_session):
    t = pa.table({"g": ["x"] * 4, "v": [-1.0, 0.0, 9.999, 10.0]})
    got = _run(rd.from_arrow(t), lo=0.0, hi=10.0, bins=10)
    # below-range clamps to bin 0; at/above hi clamps to the last bin
    assert got == {("x", 0): 2, ("x", 9): 2}


def test_partition_invariant(ray_session):
    t = _fixture()
    a = _run(rd.from_arrow(t), lo=-5.0, hi=15.0, bins=8)
    b = _run(rd.from_arrow(t).repartition(7), lo=-5.0, hi=15.0, bins=8)
    assert a == b
    assert sum(a.values()) == len(t)


def test_bad_args_raise(ray_session):
    with pytest.raises(ValueError):
        grouped_histogram(
            rd.from_arrow(_fixture()), value_col="v", group_col="g",
            lo=1.0, hi=1.0, bins=4,
        )
