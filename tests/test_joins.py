"""Explicit bucketed hash join vs the built-in Dataset.join."""

import pyarrow as pa
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.joins import bucketed_inner_join


def test_matches_dataset_join(sf_dir):
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    mine = (
        bucketed_inner_join(
            orders, cust, left_key="o_custkey", right_key="c_custkey", n_buckets=8
        )
        .to_pandas()
        .sort_values(["o_orderkey"])
        .reset_index(drop=True)
    )
    builtin = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
        .join(
            rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]),
            join_type="inner",
            num_partitions=4,
            on=("o_custkey",),
            right_on=("c_custkey",),
        )
        .to_pandas()
        .sort_values(["o_orderkey"])
        .reset_index(drop=True)
    )
    assert len(mine) == len(builtin) == 1500
    assert mine["o_orderkey"].tolist() == builtin["o_orderkey"].tolist()
    assert mine["c_mktsegment"].tolist() == builtin["c_mktsegment"].tolist()


def test_no_match_keys_dropped():
    l = rd.from_arrow(pa.table({"k": [1, 2, 3], "a": ["x", "y", "z"]}))
    r = rd.from_arrow(pa.table({"j": [2, 3, 4], "b": ["p", "q", "r"]}))
    out = bucketed_inner_join(l, r, left_key="k", right_key="j").to_pandas()
    assert sorted(out["k"]) == [2, 3]


def test_overlapping_columns_rejected():
    l = rd.from_arrow(pa.table({"k": [1], "v": [1]}))
    r = rd.from_arrow(pa.table({"k2": [1], "v": [2]}))
    with pytest.raises(ValueError, match="overlap"):
        bucketed_inner_join(l, r, left_key="k", right_key="k2")


def test_asof_join_string_key():
    """String join keys must bucket deterministically across worker
    processes (blake2b, not PYTHONHASHSEED-randomized hash())."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.asof import asof_join_backward

    left = pa.table(
        {
            "k": ["a", "a", "b", "c"],
            "lts": pa.array([10, 30, 20, 5], type=pa.timestamp("us")),
            "lv": [1, 2, 3, 4],
        }
    )
    right = pa.table(
        {
            "k": ["a", "a", "b"],
            "rts": pa.array([5, 25, 15], type=pa.timestamp("us")),
            "rv": [100, 200, 300],
        }
    )
    out = (
        asof_join_backward(
            rd.from_arrow(left), rd.from_arrow(right),
            key="k", left_ts="lts", right_ts="rts",
        )
        .to_pandas()
        .sort_values(["k", "lts"])
        .reset_index(drop=True)
    )
    assert out["rv"].tolist() == [100, 200, 300, pd.NA] or (
        out["rv"].tolist()[:3] == [100, 200, 300] and pd.isna(out["rv"].iloc[3])
    )


def test_skewed_join_equals_bucketed_join():
    """Hot-key broadcast plan ∪ cold bucketed plan must equal the plain
    bucketed join, including a forced giant hot key."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.joins import (
        bucketed_inner_join,
        skewed_inner_join,
    )

    n = 2000
    # key 7 owns ~40% of the left side (the giant-host shape)
    keys = [7 if i % 5 < 2 else (i % 50) for i in range(n)]
    left = pa.table(
        {"k": pa.array(keys, type=pa.int64()),
         "v": pa.array(list(range(n)), type=pa.int64())}
    )
    right = pa.table(
        {"rk": pa.array(list(range(50)), type=pa.int64()),
         "tag": [f"t{i}" for i in range(50)]}
    )

    plain = (
        bucketed_inner_join(
            rd.from_arrow(left), rd.from_arrow(right), left_key="k", right_key="rk"
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    skewed = (
        skewed_inner_join(
            rd.from_arrow(left), rd.from_arrow(right),
            left_key="k", right_key="rk", hot_k=4,
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(plain, skewed, check_like=True)
    # dtype fidelity: int columns stay ints through both plans
    assert plain["k"].dtype.kind == "i" and skewed["k"].dtype.kind == "i"
