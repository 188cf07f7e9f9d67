"""Deterministic splits/samples and the HLL sketch."""

import duckdb
import numpy as np
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.sampling import (
    approx_count_distinct,
    hll_estimate,
    hll_merge,
    hll_sketch,
    stratified_sample,
    train_eval_split,
)


def test_split_partitions_exactly(sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    train, ev = train_eval_split(ds, "doc_id", train_frac_16ths=12)
    t_ids = set(train.to_pandas()["doc_id"])
    e_ids = set(ev.to_pandas()["doc_id"])
    assert t_ids | e_ids == set(range(500))
    assert not (t_ids & e_ids)
    assert 0.65 < len(t_ids) / 500 < 0.85  # ~75%


def test_split_matches_duckdb_md5(sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    train, _ = train_eval_split(ds, "doc_id", train_frac_16ths=12)
    mine = sorted(train.to_pandas()["doc_id"])
    ref = duckdb.sql(
        f"""SELECT doc_id FROM read_parquet('{sf_dir}/documents.parquet')
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' ORDER BY doc_id"""
    ).df()["doc_id"].tolist()
    assert mine == ref


def test_stratified_sample_uniform_across_strata(sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    samp = stratified_sample(ds, "doc_id", frac_16ths=4).to_pandas()
    frac = len(samp) / 500
    assert 0.15 < frac < 0.35


def test_hll_accuracy():
    values = [f"item-{i}" for i in range(20000)] * 2  # 20k distinct, 40k rows
    regs = hll_merge([hll_sketch(values[:15000]), hll_sketch(values[15000:])])
    est = hll_estimate(regs)
    assert abs(est - 20000) / 20000 < 0.05


def test_hll_merge_associative():
    a, b = [f"a{i}" for i in range(500)], [f"b{i}" for i in range(500)]
    merged = hll_merge([hll_sketch(a), hll_sketch(b)])
    direct = hll_sketch(a + b)
    assert (merged == direct).all()


def test_approx_count_distinct_on_lineitem(sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_partkey"])
    est = approx_count_distinct(ds, "l_partkey")
    exact = duckdb.sql(
        f"SELECT count(DISTINCT l_partkey) FROM read_parquet('{sf_dir}/lineitem.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.05


def test_quantile_sketch_accuracy(sf_dir):
    """Histogram quantile sketch: <1% rank error vs exact quantiles."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.sampling import approx_quantiles

    vals = np.sort(
        pq.read_table(f"{sf_dir}/events.parquet", columns=["value"])["value"]
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    qs = [0.1, 0.5, 0.9, 0.99]
    approx = approx_quantiles(
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"]), "value", qs
    )
    n = len(vals)
    for q, a in zip(qs, approx):
        # rank of the approximate value vs the requested rank
        rank = np.searchsorted(vals, a) / n
        assert abs(rank - q) < 0.01, (q, a, rank)


def test_quantile_sketch_associative(sf_dir):
    """Merging per-batch histograms is order-insensitive: two different
    batch sizes give the identical merged sketch."""
    import numpy as np
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.sampling import quantile_sketch

    ds1 = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    ds2 = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"]).repartition(7)
    c1, lo1, hi1 = quantile_sketch(ds1, "value")
    c2, lo2, hi2 = quantile_sketch(ds2, "value")
    assert (lo1, hi1) == (lo2, hi2)
    assert np.array_equal(c1, c2)
