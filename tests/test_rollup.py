"""ROLLUP aggregates (stages/rollup.py): level consistency, sentinel
semantics, null-key guard, partition invariance, float sums."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.rollup import rollup_aggregate


def _t():
    return pa.table(
        {
            "a": ["x", "x", "y", "y", "y"],
            "b": ["p", "q", "p", "p", "q"],
            "v": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        }
    )


def test_levels_consistent(ray_session):
    out = rollup_aggregate(rd.from_arrow(_t()), ["a", "b"], ["v"])
    fine = out[(out.a != "ALL") & (out.b != "ALL")]
    mid = out[(out.a != "ALL") & (out.b == "ALL")]
    top = out[(out.a == "ALL") & (out.b == "ALL")]
    assert len(fine) == 4 and len(mid) == 2 and len(top) == 1
    assert fine.v_sum.sum() == mid.v_sum.sum() == int(top.v_sum.iloc[0]) == 15
    assert fine.n_rows.sum() == int(top.n_rows.iloc[0]) == 5
    got = {(r.a, r.b): (r.v_sum, r.n_rows) for r in fine.itertuples()}
    assert got == {("x", "p"): (1, 1), ("x", "q"): (2, 1),
                   ("y", "p"): (7, 2), ("y", "q"): (5, 1)}
    assert {(r.a, r.b): r.v_sum for r in mid.itertuples()} == {
        ("x", "ALL"): 3, ("y", "ALL"): 12}


def test_partition_invariant(ray_session):
    a = rollup_aggregate(rd.from_arrow(_t()), ["a", "b"], ["v"])
    b = rollup_aggregate(rd.from_arrow(_t()).repartition(4), ["a", "b"], ["v"])
    key = ["a", "b"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def test_null_key_raises(ray_session):
    t = pa.table({"a": ["x", None], "b": ["p", "q"], "v": [1, 2]})
    with pytest.raises(Exception, match="NULL in grouping key"):
        rollup_aggregate(rd.from_arrow(t), ["a", "b"], ["v"])


def test_float_sums_stay_float(ray_session):
    t = pa.table({"a": ["x", "y"], "b": ["p", "p"], "v": [1.5, 2.5]})
    out = rollup_aggregate(rd.from_arrow(t), ["a", "b"], ["v"])
    assert out.v_sum.dtype.kind == "f"
    top = out[(out.a == "ALL") & (out.b == "ALL")]
    np.testing.assert_allclose(top.v_sum.iloc[0], 4.0)


# --- cube_aggregate ----------------------------------------------------------


def test_cube_grouping_sets(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.rollup import cube_aggregate

    out = cube_aggregate(rd.from_arrow(_t()), ["a", "b"], ["v"])
    fine = out[(out.a != "ALL") & (out.b != "ALL")]
    by_a = out[(out.a != "ALL") & (out.b == "ALL")]
    by_b = out[(out.a == "ALL") & (out.b != "ALL")]
    top = out[(out.a == "ALL") & (out.b == "ALL")]
    # the (b)-only slice is what ROLLUP lacks
    assert len(fine) == 4 and len(by_a) == 2 and len(by_b) == 2 and len(top) == 1
    assert {(r.b): r.v_sum for r in by_b.itertuples()} == {"p": 8, "q": 7}
    assert int(top.v_sum.iloc[0]) == 15 and int(top.n_rows.iloc[0]) == 5
    assert fine.v_sum.sum() == by_a.v_sum.sum() == by_b.v_sum.sum() == 15


def test_cube_matches_pandas_cube(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.rollup import cube_aggregate

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "a": rng.choice(list("abc"), 200),
            "b": rng.choice(list("xy"), 200),
            "v": rng.integers(0, 100, 200),
        }
    )
    out = cube_aggregate(rd.from_pandas(df).repartition(5), ["a", "b"], ["v"])
    # brute-force each grouping set
    for mask_a, mask_b in [(1, 1), (1, 0), (0, 1), (0, 0)]:
        keys = [k for k, m in zip(["a", "b"], [mask_a, mask_b]) if m]
        sel = out[
            ((out.a != "ALL") if mask_a else (out.a == "ALL"))
            & ((out.b != "ALL") if mask_b else (out.b == "ALL"))
        ]
        if keys:
            exp = df.groupby(keys)["v"].agg(["sum", "size"])
            assert len(sel) == len(exp)
            for idx, row in exp.iterrows():
                key = idx if isinstance(idx, tuple) else (idx,)
                m = sel
                for k, kv in zip(keys, key):
                    m = m[m[k] == kv]
                assert int(m.v_sum.iloc[0]) == int(row["sum"])
                assert int(m.n_rows.iloc[0]) == int(row["size"])
        else:
            assert int(sel.v_sum.iloc[0]) == int(df.v.sum())


def test_cube_null_key_raises(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.rollup import cube_aggregate

    t = pa.table({"a": ["x", None], "b": ["p", "q"], "v": [1, 2]})
    with pytest.raises(Exception):
        cube_aggregate(rd.from_arrow(t), ["a", "b"], ["v"])


def test_empty_input_raises(ray_session):
    # review finding: SQL CUBE/ROLLUP emit a NULL-sum () row on empty
    # input that the int-typed fold can't mirror — fail loudly instead
    from ai_service_ocr_grading_handler_ray.stages.rollup import cube_aggregate

    t = pa.table({"a": pa.array([], type=pa.string()),
                  "b": pa.array([], type=pa.string()),
                  "v": pa.array([], type=pa.int64())})
    with pytest.raises(Exception, match="empty"):
        cube_aggregate(rd.from_arrow(t), ["a", "b"], ["v"])
