"""stages/hashing.py — the row-routing hash family every shuffle uses.

The property that matters is CROSS-PROCESS determinism: a key must land
in the same bucket no matter which worker computes the hash (Python's
builtin hash() is per-process randomized — the bug class these hashes
exist to prevent).
"""

import numpy as np
import pandas as pd
import pyarrow as pa

from ai_service_ocr_grading_handler_ray.stages.hashing import (
    bucket_ids,
    bucket_of,
    hash_u64,
    splitmix64,
)


def test_cross_process_determinism():
    """Hashes computed in a Ray worker (different PYTHONHASHSEED) must
    equal the driver's."""
    import ray

    strs = ["a", "big.example.com", "", "☃ unicode"]
    ints = [0, 1, -5, (1 << 60) + 7]
    local_s = hash_u64(np.array(strs, dtype=object)).tolist()
    local_i = hash_u64(pa.array(ints, type=pa.int64())).tolist()

    @ray.remote
    def worker():
        import numpy as _np
        import pyarrow as _pa

        from ai_service_ocr_grading_handler_ray.stages.hashing import hash_u64 as h

        return (
            h(_np.array(strs, dtype=object)).tolist(),
            h(_pa.array(ints, type=_pa.int64())).tolist(),
        )

    rs, ri = ray.get(worker.remote())
    assert rs == local_s
    assert ri == local_i


def test_int_width_consistency():
    """int32 and int64 columns with the same values co-locate (both join
    sides may carry different arrow widths)."""
    v = [1, 2, 3, -9]
    a32 = bucket_ids(pa.array(v, type=pa.int32()), 16)
    a64 = bucket_ids(pa.array(v, type=pa.int64()), 16)
    assert (a32 == a64).all()


def test_null_keys_colocate():
    arr = pa.array([None, None, 5], type=pa.int64())
    b = bucket_ids(arr, 8)
    assert b[0] == b[1]
    s = pa.array([None, None, "x"], type=pa.string())
    bs = bucket_ids(s, 8)
    assert bs[0] == bs[1]


def test_scalar_matches_column():
    for v, t in [(7, pa.int64()), ("host.example.com", pa.string())]:
        assert bucket_of(v, 32) == bucket_ids(pa.array([v], type=t), 32)[0]


def test_chunked_array_and_series_paths_agree():
    vals = ["x", "y", "z"]
    chunked = pa.chunked_array([pa.array(vals[:2]), pa.array(vals[2:])])
    assert (
        hash_u64(chunked).tolist()
        == hash_u64(pd.Series(vals)).tolist()
        == hash_u64(np.array(vals, dtype=object)).tolist()
    )


def test_splitmix64_is_bijective_sample():
    x = np.arange(10_000, dtype=np.uint64)
    assert len(np.unique(splitmix64(x))) == len(x)


def test_timestamp_keys_hash():
    ts = pa.array([1, 2, 3], type=pa.timestamp("us"))
    assert len(set(bucket_ids(ts, 4).tolist())) >= 1  # no crash, int path


def test_bucket_distribution_roughly_uniform():
    ids = pa.array(list(range(100_000)), type=pa.int64())
    counts = np.bincount(bucket_ids(ids, 32), minlength=32)
    assert counts.min() > 100_000 / 32 * 0.8
    assert counts.max() < 100_000 / 32 * 1.2


def test_popcount64_matches_python_bitcount():
    import numpy as np

    from ai_service_ocr_grading_handler_ray.stages.hashing import popcount64

    rng = np.random.default_rng(42)
    v = rng.integers(0, 1 << 63, size=4096, dtype=np.int64).astype(np.uint64)
    v[:3] = [0, 1, np.uint64(0xFFFFFFFFFFFFFFFF)]
    ref = np.array([bin(int(x)).count("1") for x in v], dtype=np.uint64)
    assert (popcount64(v) == ref).all()
    # 2-D (the XOR-matrix shape used by the simhash bucket verify)
    m = v[:64]
    x = m[:, None] ^ m[None, :]
    assert popcount64(x).shape == (64, 64)
    assert (np.diagonal(popcount64(x)) == 0).all()


def test_polyhash64_matches_scalar_reference():
    """polyhash64 vs the textbook rolling loop, incl. unicode, empties,
    nulls and a string past the pow-table reuse boundary."""
    import numpy as np
    import pyarrow as pa

    from ai_service_ocr_grading_handler_ray.stages.hashing import polyhash64

    def ref(s: str) -> int:
        h = 0
        for ch in s:
            h = (h * 31 + ord(ch)) % (1 << 64)
        return h

    vals = ["", "a", "abc", "h001.example.org", "a\U0001f600b", "x" * 300,
            "big.example.com", "é́ mixed"]
    got = polyhash64(pa.array(vals + [None], type=pa.string()))
    assert got.dtype == np.uint64
    assert list(got) == [ref(s) for s in vals] + [0]
    # list / Series inputs take the same path
    import pandas as pd

    assert list(polyhash64(vals)) == [ref(s) for s in vals]
    assert list(polyhash64(pd.Series(vals))) == [ref(s) for s in vals]


def test_polyhash64_sql_replay_exact():
    """DuckDB HUGEINT CTE replay == numpy kernel bit-for-bit, and the
    max_len guard raises instead of silently truncating."""
    import duckdb
    import pyarrow as pa

    from ai_service_ocr_grading_handler_ray.stages.hashing import polyhash64
    from ai_service_ocr_grading_handler_ray.stages.shuffle import polyhash64_sql

    vals = ["", "a", "abc", "h001.example.org", "a\U0001f600b",
            "big.example.com"]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"('{v}')" for v in vals)
        + ") v(s)"
    )
    df = con.sql(
        "WITH RECURSIVE " + polyhash64_sql("t", "s")
        + " SELECT s, CAST(ph AS UBIGINT) AS ph FROM __ph ORDER BY s"
    ).df()
    eng = dict(zip(vals, (int(x) for x in polyhash64(pa.array(vals)))))
    assert {r.s: int(r.ph) for r in df.itertuples()} == eng

    import pytest

    with pytest.raises(duckdb.Error):
        con.sql(
            "WITH RECURSIVE "
            + polyhash64_sql("(SELECT repeat('x', 300) AS s)", "s", max_len=256)
            + " SELECT * FROM __ph"
        ).df()
