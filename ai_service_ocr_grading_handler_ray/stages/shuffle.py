"""Reproducible global shuffle for training-data ordering.

Training pipelines need the corpus in a SHUFFLED, REPRODUCIBLE order:
the same (input, seed) must yield the same global permutation on any
cluster size or block layout, and a resumed/re-run job must be able to
regenerate shard N alone.  ``ray.data.Dataset.random_shuffle`` is
neither seeded-stably across layouts nor cheap (full materialized
permutation); the standard scale answer is a KEYED shuffle: order by a
deterministic 64-bit hash of (key, seed).

``shuffle_positions`` additionally assigns each row its DENSE global
position (0..n-1) under that order — the piece Ray Data lacks — with a
distributed rank: one tiny count pass over 2^B hash-range buckets
(bucket offsets fold on the driver: num_buckets ints, never rows), ONE
bucket shuffle, then per-bucket vectorized sort + arange.  Positions
make the output directly writable as range-partitioned training shards
(`pos // shard_size` is the shard id) and joinable back to any table.

Determinism: the permutation is a pure function of (key values, seed) —
independent of row order, block layout, parallelism, and cluster size.
Hash ties (distinct keys colliding in 64 bits) break by key, so the
order is total even then.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .hashing import splitmix64
from .collect import collect_tables


def shuffle_hash(col, seed: int) -> np.ndarray:
    """The shuffle order key.  Integer keys (stable document ids):
    splitmix64 over (int64 key + seed) — mod-2^64 wraparound, replayable
    in SQL via HUGEINT arithmetic (``splitmix64_sql``).  String/other
    keys (urls): the engine's deterministic siphash (``hash_u64``)
    reseeded through splitmix64 — same determinism and layout
    independence, not SQL-replayable (DuckDB has no siphash)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array) and not (
        pa.types.is_integer(col.type)
        or pa.types.is_timestamp(col.type)
        or pa.types.is_date(col.type)
    ):
        from .hashing import hash_u64

        with np.errstate(over="ignore"):
            return splitmix64(hash_u64(col) + np.uint64(seed % (1 << 64)))
    # null keys → the fixed key-0 sentinel, matching hash_u64's null
    # handling (unfilled nulls became NaN → undefined int64 casts)
    if isinstance(col, (pa.Array, pa.ChunkedArray)) and col.null_count:
        col = pc.fill_null(pc.cast(col, pa.int64()), 0)
    v = col.to_numpy(zero_copy_only=False).astype(np.int64)
    with np.errstate(over="ignore"):
        # mod-2^64 seed normalization: two's-complement uint64 addition
        # equals (key + seed) mod 2^64 for ANY Python int seed (np.int64
        # would overflow at 2^63)
        return splitmix64(v.view(np.uint64) + np.uint64(seed % (1 << 64)))


def shuffle_positions(
    ds: rd.Dataset,
    *,
    key_col: str,
    seed: int = 0,
    num_buckets: int = 256,
    out_col: str = "pos",
) -> rd.Dataset:
    """All input columns + ``out_col``: the row's dense global position
    (0-based) under the seeded shuffle order (hash asc, key asc on
    ties).  Two scans of the input (count pass + regroup pass —
    materialize a slim projection upstream if it is expensive) and ONE
    bucket shuffle; the driver holds only ``num_buckets`` counts."""
    if num_buckets < 2 or num_buckets & (num_buckets - 1):
        raise ValueError("num_buckets must be a power of two >= 2")
    shift = np.uint64(64 - int(num_buckets).bit_length() + 1)

    def count_partial(t: pa.Table) -> pa.Table:
        b = (shuffle_hash(t[key_col], seed) >> shift).astype(np.int64)
        c = np.bincount(b, minlength=num_buckets)
        nz = np.flatnonzero(c)
        return pa.table({"b": pa.array(nz), "c": pa.array(c[nz])})

    counts = np.zeros(num_buckets, dtype=np.int64)
    for t in collect_tables(
        ds.map_batches(count_partial, batch_format="pyarrow"), drop_empty=False):
        if t.num_rows:
            counts[t["b"].to_numpy(zero_copy_only=False)] += t[
                "c"
            ].to_numpy(zero_copy_only=False)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])

    def add_bucket(t: pa.Table) -> pa.Table:
        h = shuffle_hash(t[key_col], seed)
        t = t.append_column("_h", pa.array(h, type=pa.uint64()))
        return t.append_column(
            "_bucket", pa.array((h >> shift).astype(np.int64))
        )

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_h", key_col], kind="mergesort")
        base = int(offsets[int(g["_bucket"].iloc[0])])
        g[out_col] = base + np.arange(len(g), dtype=np.int64)
        return g.drop(columns=["_h", "_bucket"])

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(rank, batch_format="pandas")
    )


def splitmix64_sql(expr: str, seed: int = 0) -> str:
    """The exact SQL replay of ``shuffle_hash`` for DuckDB oracles:
    splitmix64 over ((expr + seed) mod 2^64) via HUGEINT arithmetic
    (64×64-bit multiplies split at 32 bits so INT128 never overflows).
    Returns a scalar SQL expression producing a UBIGINT."""
    M = 18446744073709551616  # 2^64

    def mulmod(a: str, b: int) -> str:
        lo, hi = b % 4294967296, b // 4294967296
        return (
            f"((({a}) * {lo}) % {M} + ((({a}) * {hi}) % 4294967296) * 4294967296) % {M}"
        )

    def xsh(a: str, s: int) -> str:
        return f"CAST(xor(CAST(({a}) AS UBIGINT), CAST(({a}) AS UBIGINT) >> {s}) AS HUGEINT)"

    z = f"(((CAST({expr} AS HUGEINT) + {seed}) % {M} + {M}) % {M})"
    z = f"(({z} + 11400714819323198485) % {M})"
    z = mulmod(xsh(z, 30), 13787848793156543929)
    z = mulmod(xsh(z, 27), 10723151780598845931)
    return f"xor(CAST(({z}) AS UBIGINT), CAST(({z}) AS UBIGINT) >> 31)"


def polyhash64_sql(
    values_rel: str,
    col: str,
    *,
    out_rel: str = "__ph",
    out_col: str = "ph",
    max_len: int = 256,
) -> str:
    """CTE-chain SQL replay of ``hashing.polyhash64`` for DuckDB oracles:
    the Java-convention rolling hash ``sum(c_i * 31^(L-1-i)) mod 2^64``
    over unicode codepoints, exact via HUGEINT arithmetic.  Returns CTE
    text defining ``{out_rel}({col}, {out_col})`` over the DISTINCT
    values of ``{values_rel}.{col}``; the caller must splice it into a
    query that opens with ``WITH RECURSIVE`` (the 31^e power table is a
    recursive CTE).  Strings longer than ``max_len`` raise via SQL
    ``error()`` rather than silently dropping chars (the engine side has
    no length limit).  Feed ``{out_col}`` through ``splitmix64_sql``
    before bucketing, exactly like the numpy side."""
    M = 18446744073709551616  # 2^64
    return (
        f"__pows AS (SELECT 0 AS e, CAST(1 AS HUGEINT) AS p"
        f" UNION ALL SELECT e + 1, (p * 31) % {M} FROM __pows"
        f" WHERE e < {max_len}),\n"
        f"__phv AS (SELECT DISTINCT CASE WHEN length({col}) > {max_len}"
        f" THEN error('polyhash64_sql: value exceeds max_len={max_len}')"
        f" ELSE {col} END AS s FROM {values_rel}),\n"
        f"__phc AS (SELECT s, length(s) AS L, u.i AS pos,"
        f" unicode(substr(s, u.i, 1)) AS c"
        f" FROM __phv, LATERAL (SELECT unnest(generate_series(1, length(s)))"
        f" AS i) u),\n"
        f"__phh AS (SELECT s, SUM(CAST(c AS HUGEINT) * pw.p) % {M} AS h"
        f" FROM __phc JOIN __pows pw ON pw.e = __phc.L - __phc.pos"
        f" GROUP BY s),\n"
        f"{out_rel} AS (SELECT v.s AS {col}, COALESCE(h.h, 0) AS {out_col}"
        f" FROM __phv v LEFT JOIN __phh h ON v.s = h.s)"
    )


def write_training_shards(
    ds: rd.Dataset,
    out_dir: str,
    *,
    key_col: str,
    seed: int = 0,
    shard_size: int = 1_000_000,
    num_buckets: int = 256,
) -> None:
    """Materialize the seeded training order as shard-partitioned
    parquet: ``shard_id = pos // shard_size`` under the
    ``shuffle_positions`` order, written with
    ``write_parquet(partition_cols=["shard_id"])`` so a trainer streams
    shard directories in order (sorting by ``pos`` within a shard
    restores the exact global order) and a failed run can resume by
    skipping shard directories that already exist.  Because positions
    are a pure function of (key, seed), re-running after input growth
    re-shuffles deterministically — shard N is always regenerable
    alone."""

    def add_shard(t: pa.Table) -> pa.Table:
        pos = t["pos"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "shard_id", pa.array((pos // shard_size).astype(np.int64))
        )

    with_pos = shuffle_positions(
        ds, key_col=key_col, seed=seed, num_buckets=num_buckets
    )
    with_pos.map_batches(add_shard, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["shard_id"]
    )


def curriculum_positions(
    ds: rd.Dataset,
    *,
    key_col: str,
    tier_col: str,
    n_tiers: int,
    seed: int = 0,
    num_buckets: int = 256,
    out_col: str = "pos",
) -> rd.Dataset:
    """Curriculum ordering: dense global positions (0-based) under
    ``ORDER BY (tier ASC, shuffle_hash ASC, key ASC)`` — easy tiers
    first, reproducibly shuffled WITHIN each tier (curriculum-learning
    batch order; Bengio et al. 2009).  Same two-scan shape as
    ``shuffle_positions`` with a (tier × bucket) count grid: the driver
    holds ``n_tiers × num_buckets`` ints, one compound-bucket shuffle,
    rank inside each (tier, bucket) group.  ``tier_col`` must hold ints
    in [0, n_tiers); positions are layout-independent and SQL-replayable
    (``splitmix64_sql``)."""
    if num_buckets < 2 or num_buckets & (num_buckets - 1):
        raise ValueError("num_buckets must be a power of two >= 2")
    shift = np.uint64(64 - int(num_buckets).bit_length() + 1)
    grid = n_tiers * num_buckets

    def tb_of(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        h = shuffle_hash(t[key_col], seed)
        tier = t[tier_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(tier) and (tier.min() < 0 or tier.max() >= n_tiers):
            raise ValueError(f"{tier_col} values must lie in [0, {n_tiers})")
        return h, tier * num_buckets + (h >> shift).astype(np.int64)

    def count_partial(t: pa.Table) -> pa.Table:
        _, tb = tb_of(t)
        c = np.bincount(tb, minlength=grid)
        nz = np.flatnonzero(c)
        return pa.table({"b": pa.array(nz), "c": pa.array(c[nz])})

    counts = np.zeros(grid, dtype=np.int64)
    for t in collect_tables(
        ds.map_batches(count_partial, batch_format="pyarrow"), drop_empty=False):
        if t.num_rows:
            counts[t["b"].to_numpy(zero_copy_only=False)] += t["c"].to_numpy(
                zero_copy_only=False
            )
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])

    def add_tb(t: pa.Table) -> pa.Table:
        h, tb = tb_of(t)
        t = t.append_column("_h", pa.array(h, type=pa.uint64()))
        return t.append_column("_tb", pa.array(tb))

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_h", key_col], kind="mergesort")
        base = int(offsets[int(g["_tb"].iloc[0])])
        g[out_col] = base + np.arange(len(g), dtype=np.int64)
        return g.drop(columns=["_h", "_tb"])

    return (
        ds.map_batches(add_tb, batch_format="pyarrow")
        .groupby("_tb")
        .map_groups(rank, batch_format="pandas")
    )
