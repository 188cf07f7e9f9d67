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
