"""Bloom semi-join and Misra-Gries heavy hitters."""

import duckdb
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.sketches import (
    BloomFilter,
    bloom_semi_join,
    build_bloom,
    heavy_hitters,
    merge_mg,
    misra_gries_sketch,
)


def test_bloom_no_false_negatives_and_low_fp():
    bf = BloomFilter(1000, fp_rate=0.01)
    for i in range(1000):
        bf.add(f"in-{i}")
    assert all(f"in-{i}" in bf for i in range(1000))  # no false negatives
    fps = sum(1 for i in range(10000) if f"out-{i}" in bf)
    assert fps / 10000 < 0.03


def test_bloom_merge_equals_single():
    a, b = BloomFilter(100), BloomFilter(100)
    for i in range(50):
        a.add(i)
    for i in range(50, 100):
        b.add(i)
    a.merge(b)
    assert all(i in a for i in range(100))


def test_bloom_semi_join_exact_matches_sql(sf_dir):
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    out = bloom_semi_join(
        cust, orders, left_key="c_custkey", right_key="o_custkey",
        n_expected=2000, exact=True,
    ).to_pandas()
    ref = duckdb.sql(
        f"""SELECT c_custkey FROM read_parquet('{sf_dir}/customer.parquet')
        WHERE c_custkey IN (SELECT o_custkey FROM read_parquet('{sf_dir}/orders.parquet'))
        ORDER BY c_custkey"""
    ).df()
    assert sorted(out["c_custkey"]) == ref["c_custkey"].tolist()


def test_misra_gries_finds_hot_keys():
    stream = ["hot"] * 500 + [f"cold-{i}" for i in range(400)] + ["warm"] * 120
    mg = misra_gries_sketch(stream, k=8)
    assert "hot" in mg
    assert mg["hot"] >= 500 - len(stream) // 8  # error bound n/k


def test_mg_merge_preserves_heavy():
    a = misra_gries_sketch(["x"] * 300 + [f"a{i}" for i in range(100)], k=8)
    b = misra_gries_sketch(["x"] * 200 + [f"b{i}" for i in range(100)], k=8)
    merged = merge_mg([a, b], k=8)
    assert "x" in merged and merged["x"] > 200


def test_heavy_hitters_on_pages_host(sf_dir):
    """The giant-host fixture (big.example.com ~20% of rows) must surface."""
    from ai_service_ocr_grading_handler_ray.pipelines.extract import build_pages_dataset
    from ai_service_ocr_grading_handler_ray.stages.skew import add_host_and_salt

    pages = build_pages_dataset(sf_dir).map_batches(
        lambda t: add_host_and_salt(t).select(["host"]), batch_format="pyarrow"
    )
    hh = heavy_hitters(pages, "host", k=16)
    assert "big.example.com" in hh
    assert hh["big.example.com"] >= 50  # ~100 of 500 rows, lower bound


def test_bloom_anti_join_complements_semi(sf_dir):
    from ai_service_ocr_grading_handler_ray.stages.sketches import bloom_anti_join

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    anti_df = bloom_anti_join(
        cust, orders, left_key="c_custkey", right_key="o_custkey", n_expected=2000
    ).to_pandas()
    anti = set(anti_df["c_custkey"]) if "c_custkey" in anti_df.columns else set()
    semi = set(
        bloom_semi_join(
            cust, orders, left_key="c_custkey", right_key="o_custkey",
            n_expected=2000, exact=True,
        ).to_pandas()["c_custkey"]
    )
    all_cust = set(cust.to_pandas()["c_custkey"])
    assert anti | semi == all_cust
    assert not (anti & semi)


def test_tree_merge_equals_direct_merge(sf_dir):
    """Forcing the distributed tree level must produce the identical
    Bloom filter / heavy-hitter summary as the direct driver merge."""
    import numpy as np
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages import sketches as S

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    direct = S.build_bloom(orders, "o_custkey", n_expected=2000)

    import unittest.mock as mock

    force_tree = {"blob_col": "bits", "direct_limit": 0, "num_parts": 4}
    with mock.patch.object(S.reduce_sketch_blobs, "__kwdefaults__", force_tree):
        treed = S.build_bloom(orders, "o_custkey", n_expected=2000)
    assert np.array_equal(direct.bits, treed.bits)

    # genuinely skewed data: two giant keys own half the rows.  (On
    # near-uniform data MG's surviving key set is arbitrary — only keys
    # above n/k are guaranteed, so the fixture must have some.)
    import pyarrow as pa

    vals = [1] * 3000 + [2] * 2000 + list(range(100, 1100)) * 5
    skewed = rd.from_arrow(pa.table({"user_id": pa.array(vals, type=pa.int64())}))
    hh_direct = S.heavy_hitters(skewed, "user_id", k=16)
    with mock.patch.object(S.reduce_sketch_blobs, "__kwdefaults__", force_tree):
        hh_treed = S.heavy_hitters(skewed, "user_id", k=16)
    top_direct = sorted(hh_direct, key=lambda x: -hh_direct[x])[:2]
    top_treed = sorted(hh_treed, key=lambda x: -hh_treed[x])[:2]
    assert set(top_direct) == set(top_treed) == {"1", "2"}


def test_heavy_hitters_counts_null_keys():
    """A null-heavy key column must surface null as a hot key — the
    vectorized per-batch sketch dropped NaN via value_counts() default
    (ADVICE r3); the per-row MG loop counted None as "None"."""
    import pandas as pd
    import ray.data as rd

    rows = pd.DataFrame({"k": [None] * 50 + ["a"] * 30 + ["b"] * 5})
    hh = heavy_hitters(rd.from_pandas(rows), "k", k=4)
    assert hh.get("None", 0) >= 40  # MG counts are lower bounds within n/k
    assert "a" in hh


def test_bloom_joins_broadcast_and_bloom_paths_agree(sf_dir):
    """The exact-key-set broadcast fast path (n_expected <= cap) and the
    Bloom + shuffled-verify slow path (cap=0 forces it) must produce
    identical row sets for both semi and anti joins."""
    from ai_service_ocr_grading_handler_ray.stages.sketches import bloom_anti_join

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])

    def rows(ds):
        df = ds.to_pandas()
        return sorted(df["c_custkey"]) if "c_custkey" in df.columns else []

    fast_anti = rows(bloom_anti_join(
        cust, orders, left_key="c_custkey", right_key="o_custkey", n_expected=2000))
    slow_anti = rows(bloom_anti_join(
        cust, orders, left_key="c_custkey", right_key="o_custkey", n_expected=2000,
        broadcast_cap=0))
    assert fast_anti == slow_anti

    fast_semi = rows(bloom_semi_join(
        cust, orders, left_key="c_custkey", right_key="o_custkey",
        n_expected=2000, exact=True))
    slow_semi = rows(bloom_semi_join(
        cust, orders, left_key="c_custkey", right_key="o_custkey",
        n_expected=2000, exact=True, broadcast_cap=0))
    assert fast_semi == slow_semi


def test_bloom_anti_join_empty_right_keeps_all(sf_dir):
    from ai_service_ocr_grading_handler_ray.stages.sketches import bloom_anti_join

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    empty = cust.filter(lambda r: False)
    out = bloom_anti_join(
        cust, empty, left_key="c_custkey", right_key="c_custkey", n_expected=1
    ).to_pandas()
    assert len(out) == cust.count()
