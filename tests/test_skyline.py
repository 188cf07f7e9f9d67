"""Pareto skyline (stages/skyline.py): brute-force equivalence
(hypothesis), duplicate/tie semantics, partition invariance, null guard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from ai_service_ocr_grading_handler_ray.stages.skyline import (
    pareto_skyline,
    skyline_mask,
)


def _brute(x, y):
    n = len(x)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if (
                x[j] >= x[i]
                and y[j] >= y[i]
                and (x[j] > x[i] or y[j] > y[i])
            ):
                keep[i] = False
                break
    return keep


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)), min_size=0, max_size=40
    )
)
def test_mask_matches_brute_force(pts):
    x = np.array([p[0] for p in pts], dtype=np.float64)
    y = np.array([p[1] for p in pts], dtype=np.float64)
    np.testing.assert_array_equal(skyline_mask(x, y), _brute(x, y))


def test_duplicates_of_skyline_point_all_survive():
    x = np.array([5.0, 5.0, 1.0])
    y = np.array([5.0, 5.0, 1.0])
    assert skyline_mask(x, y).tolist() == [True, True, False]


def test_distributed_matches_local(ray_session):
    rng = np.random.default_rng(7)
    x = rng.integers(0, 50, 500).astype(np.float64)
    y = rng.integers(0, 50, 500).astype(np.float64)
    t = pa.table({"x": x, "y": y, "rid": np.arange(500)})
    expected = set(np.flatnonzero(_brute(x, y)).tolist())
    for blocks in (1, 7):
        ds = rd.from_arrow(t)
        out = pareto_skyline(
            ds.repartition(blocks) if blocks > 1 else ds,
            "x",
            "y",
            keep_cols=("rid",),
        )
        assert set(out.rid.tolist()) == expected


def test_null_dimension_raises(ray_session):
    t = pa.table({"x": [1.0, None], "y": [1.0, 2.0]})
    with pytest.raises(Exception, match="NULL in skyline dimension"):
        pareto_skyline(rd.from_arrow(t), "x", "y")


def test_empty_input(ray_session):
    t = pa.table({"x": pa.array([], type=pa.float64()),
                  "y": pa.array([], type=pa.float64())})
    out = pareto_skyline(rd.from_arrow(t), "x", "y")
    assert len(out) == 0
