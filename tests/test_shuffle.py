"""Reproducible global shuffle (stages/shuffle): dense positions,
layout/seed determinism, SQL-replay parity of the splitmix64 helper."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.shuffle import (
    shuffle_hash,
    shuffle_positions,
    splitmix64_sql,
)


def _ds(ids, nparts=4, extra=None):
    df = pd.DataFrame({"doc_id": ids})
    if extra:
        for k, v in extra.items():
            df[k] = v
    return rd.from_pandas(df).repartition(nparts)


def test_positions_are_a_dense_permutation():
    out = shuffle_positions(
        _ds(np.arange(1000)), key_col="doc_id", seed=7, num_buckets=16
    ).to_pandas()
    assert sorted(out["pos"]) == list(range(1000))
    # and NOT the identity order (it's a shuffle)
    assert list(out.sort_values("doc_id")["pos"])[:10] != list(range(10))


def test_positions_layout_invariant_and_seeded():
    ids = np.arange(500)
    a = shuffle_positions(_ds(ids, 1), key_col="doc_id", seed=3, num_buckets=8)
    b = shuffle_positions(_ds(ids[::-1], 11), key_col="doc_id", seed=3, num_buckets=32)
    pa_ = a.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pb = b.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert pa_.equals(pb)  # block layout, row order, bucket count: no effect
    c = shuffle_positions(_ds(ids), key_col="doc_id", seed=4, num_buckets=8)
    assert not pa_["pos"].equals(
        c.to_pandas().sort_values("doc_id").reset_index(drop=True)["pos"]
    )


def test_positions_carry_all_input_columns():
    out = shuffle_positions(
        _ds(np.arange(20), extra={"text": [f"t{i}" for i in range(20)]}),
        key_col="doc_id", seed=1, num_buckets=4,
    ).to_pandas().sort_values("doc_id")
    assert list(out["text"]) == [f"t{i}" for i in range(20)]


def test_rejects_bad_bucket_counts():
    with pytest.raises(ValueError, match="power of two"):
        shuffle_positions(_ds([1, 2]), key_col="doc_id", num_buckets=3)
    with pytest.raises(ValueError, match="power of two"):
        shuffle_positions(_ds([1, 2]), key_col="doc_id", num_buckets=1)


def test_splitmix64_sql_matches_numpy():
    import duckdb
    import pyarrow as pa

    ids = np.array([0, 1, 42, -7, 2**62, -(2**62)], dtype=np.int64)
    for seed in (0, 42, 123456789):
        want = shuffle_hash(pa.array(ids), seed)
        expr = splitmix64_sql("x", seed)
        got = duckdb.sql(
            f"SELECT {expr} AS h FROM (SELECT unnest({ids.tolist()}) AS x)"
        ).fetchnumpy()["h"].astype(np.uint64)
        assert np.array_equal(want, got)


def test_write_training_shards(tmp_path):
    import pyarrow.dataset as pads

    from ai_service_ocr_grading_handler_ray.stages.shuffle import (
        write_training_shards,
    )

    out = str(tmp_path / "shards")
    write_training_shards(
        _ds(np.arange(100), extra={"text": [f"t{i}" for i in range(100)]}),
        out, key_col="doc_id", seed=5, shard_size=32, num_buckets=8,
    )
    t = pads.dataset(out, format="parquet", partitioning="hive").to_table()
    df = t.to_pandas()
    assert len(df) == 100 and sorted(df["pos"]) == list(range(100))
    # shard assignment is pos // 32 and every row kept its payload
    assert (df["shard_id"].astype(int) == df["pos"] // 32).all()
    assert set(df["shard_id"].astype(int)) == {0, 1, 2, 3}
    got = df.sort_values("doc_id")["text"].tolist()
    assert got == [f"t{i}" for i in range(100)]


def test_shuffle_positions_string_keys():
    import pyarrow as pa

    from ai_service_ocr_grading_handler_ray.stages.shuffle import shuffle_hash

    urls = [f"https://h{i % 7}.example/p/{i}" for i in range(200)]
    df = pd.DataFrame({"url": urls})
    a = shuffle_positions(
        rd.from_pandas(df).repartition(3), key_col="url", seed=9, num_buckets=8
    ).to_pandas().sort_values("url").reset_index(drop=True)
    b = shuffle_positions(
        rd.from_pandas(df.sample(frac=1.0, random_state=2)).repartition(5),
        key_col="url", seed=9, num_buckets=32,
    ).to_pandas().sort_values("url").reset_index(drop=True)
    assert a.equals(b)
    assert sorted(a["pos"]) == list(range(200))
    # seed changes the order; hash is deterministic per (key, seed)
    h1 = shuffle_hash(pa.array(urls), 9)
    h2 = shuffle_hash(pa.array(urls), 9)
    h3 = shuffle_hash(pa.array(urls), 10)
    assert (h1 == h2).all() and (h1 != h3).any()


def test_shuffle_hash_huge_seed_int_keys():
    import pyarrow as pa

    ids = np.arange(10, dtype=np.int64)
    a = shuffle_hash(pa.array(ids), 2**63)       # previously OverflowError
    b = shuffle_hash(pa.array(ids), 2**63 + 2**64)  # seed acts mod 2^64
    assert np.array_equal(a, b)


def test_shuffle_hash_null_int_keys_fixed_sentinel():
    """Null integer/timestamp keys hash to the fixed key-0 sentinel
    (hash_u64 semantics) instead of NaN→undefined int64 casts (ADVICE r3)."""
    import pyarrow as pa

    from ai_service_ocr_grading_handler_ray.stages.shuffle import shuffle_hash

    ids = pa.array([1, None, 0, None], type=pa.int64())
    h = shuffle_hash(ids, 7)
    assert np.array_equal(h, shuffle_hash(ids, 7))  # deterministic
    assert h[1] == h[2] == h[3]  # nulls co-locate with the key-0 sentinel
    ts = pa.array([0, None], type=pa.timestamp("us"))
    ht = shuffle_hash(ts, 7)
    assert ht[1] == ht[0] == h[2]


def test_curriculum_positions_order_and_invariance():
    """Positions are a dense permutation ordered by (tier, hash, key),
    invariant to layout/bucket count; tiers are contiguous position
    ranges (easy first)."""
    import pyarrow as pa

    from ai_service_ocr_grading_handler_ray.stages.shuffle import (
        curriculum_positions,
        shuffle_hash,
    )

    n = 300
    df = pd.DataFrame({"k": np.arange(n, dtype=np.int64),
                       "tier": (np.arange(n) % 3).astype(np.int64)})
    a = curriculum_positions(
        rd.from_pandas(df).repartition(3), key_col="k", tier_col="tier",
        n_tiers=3, seed=5, num_buckets=8,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    b = curriculum_positions(
        rd.from_pandas(df.sample(frac=1.0, random_state=9)).repartition(5),
        key_col="k", tier_col="tier", n_tiers=3, seed=5, num_buckets=64,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert a.equals(b)
    assert sorted(a["pos"]) == list(range(n))
    # tier blocks are contiguous and ordered: all tier-0 positions come
    # before all tier-1, etc.
    s = a.sort_values("pos")
    assert (np.diff(s["tier"].to_numpy()) >= 0).all()
    # within a tier the order is (hash, key)
    t0 = s[s["tier"] == 0]
    h = shuffle_hash(pa.array(t0["k"].to_numpy()), 5)
    assert (np.argsort(np.argsort(h, kind="stable")) ==
            np.argsort(np.argsort(t0["pos"].to_numpy()))).all()


def test_curriculum_positions_rejects_bad_tiers():
    import pytest

    from ai_service_ocr_grading_handler_ray.stages.shuffle import (
        curriculum_positions,
    )

    df = pd.DataFrame({"k": [1, 2], "tier": [0, 5]})
    with pytest.raises(Exception, match="lie in"):
        curriculum_positions(
            rd.from_pandas(df), key_col="k", tier_col="tier", n_tiers=3
        ).to_pandas()
