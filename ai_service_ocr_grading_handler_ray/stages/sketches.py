"""Additional mergeable sketches: Bloom filter (semi/anti join at scale)
and Misra-Gries heavy hitters (hot-key detection for the salting
pre-pass).

- Bloom: at 10^12 rows the semi-join key set no longer fits a broadcast
  Python set; a Bloom filter keeps the broadcast constant-size at a
  bounded false-positive rate (ray_guide 'Semi / anti join').  False
  positives make a semi join slightly over-include (and an anti join
  under-exclude) — callers that need exactness re-verify survivors
  against the exact set.
- Misra-Gries: one pass, k counters, mergeable; over-approximates counts
  by at most n/k — exactly the cheap pre-pass SURVEY.md §4 wants for
  deciding which hosts to salt.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from .collect import collect_tables


class BloomFilter:
    """Fixed-size Bloom filter with deterministic double hashing —
    vectorized add/contains (one hash pass per batch instead of per-row
    blake2b; VERDICT r2 #3 class of fix)."""

    def __init__(self, n_expected: int, fp_rate: float = 0.01) -> None:
        m = max(64, int(-n_expected * math.log(fp_rate) / (math.log(2) ** 2)))
        self.m = m
        self.k = max(1, round(m / max(1, n_expected) * math.log(2)))
        self.bits = np.zeros((m + 7) // 8, dtype=np.uint8)

    def _hash_pair(self, values) -> tuple[np.ndarray, np.ndarray]:
        from .hashing import hash_u64, splitmix64

        h1 = hash_u64(values)
        h2 = splitmix64(h1 ^ np.uint64(0xA076_1D64_78BD_642F)) | np.uint64(1)
        return h1, h2

    def add_many(self, values) -> None:
        h1, h2 = self._hash_pair(values)
        m = np.uint64(self.m)
        for i in range(self.k):
            with np.errstate(over="ignore"):
                idx = ((h1 + np.uint64(i) * h2) % m).astype(np.int64)
            np.bitwise_or.at(
                self.bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8)
            )

    def contains_many(self, values) -> np.ndarray:
        h1, h2 = self._hash_pair(values)
        m = np.uint64(self.m)
        out = np.ones(len(h1), dtype=bool)
        for i in range(self.k):
            with np.errstate(over="ignore"):
                idx = ((h1 + np.uint64(i) * h2) % m).astype(np.int64)
            out &= (self.bits[idx >> 3] & (1 << (idx & 7)).astype(np.uint8)) != 0
        return out

    def add(self, v) -> None:
        self.add_many(np.array([v]))

    def __contains__(self, v) -> bool:
        return bool(self.contains_many(np.array([v]))[0])

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k
        self.bits |= other.bits
        return self


def build_bloom(ds: rd.Dataset, col: str, n_expected: int, fp_rate: float = 0.01) -> BloomFilter:
    """Distributed build: one filter per batch (map_batches), OR-merged —
    the broadcast stays ``m/8`` bytes regardless of cluster size.  The
    merge itself is the adaptive tree reduction (reduce_sketch_blobs), so
    the driver never loops over millions of per-batch filters."""

    def sketch(batch: pa.Table) -> pa.Table:
        bf = BloomFilter(n_expected, fp_rate)
        bf.add_many(batch[col])
        return pa.table({"bits": pa.array([bf.bits.tobytes()], type=pa.binary())})

    def or_merge(blobs: list[bytes]) -> bytes:
        acc = np.frombuffer(blobs[0], dtype=np.uint8).copy()
        for b in blobs[1:]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return acc.tobytes()

    bits = reduce_sketch_blobs(
        ds.map_batches(sketch, batch_format="pyarrow"), or_merge
    )
    out = BloomFilter(n_expected, fp_rate)
    if bits is not None:
        out.bits = np.frombuffer(bits, dtype=np.uint8).copy()
    return out


def _bloom_mask_fn(bf_ref, left_key: str, keep_members: bool):
    """Batch filter keeping Bloom members (or definite non-members)."""

    def filt(batch: pa.Table) -> pa.Table:
        bits_b, m, k = ray.get(bf_ref)
        bf2 = BloomFilter.__new__(BloomFilter)
        bf2.bits = np.frombuffer(bits_b, dtype=np.uint8)
        bf2.m, bf2.k = m, k
        mask = bf2.contains_many(batch[left_key])
        if not keep_members:
            mask = ~mask
        return batch.filter(pa.array(mask))

    return filt


# Exact-key-set broadcast budget for the membership-join fast path:
# 4M distinct keys ≈ 32 MB of uint64 — comparable to the Bloom blob the
# slow path broadcasts anyway (1% fp at 4M keys ≈ 4.8 MB), and far below
# a worker heap.  Above it, the constant-size Bloom + shuffled verify
# keeps per-task memory bounded at any subtrahend size.
BROADCAST_KEY_CAP = 4_000_000


def _keyset_mask_fn(keys_ref, left_key: str, keep_members: bool):
    """Batch filter by exact broadcast key-set membership.  Null keys
    are non-members (kept by anti, dropped by semi) — the same net
    behavior as the Bloom + Arrow-join path."""
    import pyarrow.compute as pc

    def filt(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        mask = pc.fill_null(pc.is_in(batch[left_key], value_set=keys), False)
        if not keep_members:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return filt


def _collect_right_keys(right: rd.Dataset, right_key: str):
    """Distinct right keys as one driver-local Arrow array (per-batch
    pre-distinct bounds the pull to distinct-per-block)."""
    import pyarrow.compute as pc

    from .collect import collect_table

    tbl = collect_table(
        right.map_batches(
            lambda t: pa.table({right_key: pc.unique(t[right_key])}),
            batch_format="pyarrow",
        )
    )
    if tbl.num_rows == 0:
        return None
    return pc.unique(tbl[right_key].combine_chunks())


def bloom_semi_join(
    left: rd.Dataset, right: rd.Dataset, *, left_key: str, right_key: str,
    n_expected: int, fp_rate: float = 0.01, exact: bool = True,
    num_partitions: int = 8, broadcast_cap: int = BROADCAST_KEY_CAP,
) -> rd.Dataset:
    """Keep left rows whose key (probably) appears in right.

    Fast path (``n_expected`` ≤ ``broadcast_cap``): broadcast right's
    EXACT distinct key set once and semi-filter in ONE scan — no Bloom,
    no shuffle, exact by construction.  At larger subtrahends the Bloom
    broadcast stays constant-size regardless of right's row count and
    ``exact=True`` re-verifies the (already small) survivor set with a
    *shuffled* ``left_semi`` join against right's key column — no
    exact-key-set broadcast, so memory per task stays bounded at any
    scale."""
    if exact and n_expected <= broadcast_cap:
        keys = _collect_right_keys(right, right_key)
        if keys is None:
            return left.filter(lambda _row: False)
        keys_ref = ray.put(keys)
        return left.map_batches(
            _keyset_mask_fn(keys_ref, left_key, True), batch_format="pyarrow"
        )
    bf = build_bloom(right, right_key, n_expected, fp_rate)
    bf_ref = ray.put((bf.bits.tobytes(), bf.m, bf.k))
    survivors = left.map_batches(
        _bloom_mask_fn(bf_ref, left_key, True), batch_format="pyarrow"
    )
    if not exact:
        return survivors
    keys = right.select_columns([right_key])
    return survivors.join(
        keys, "left_semi", num_partitions=num_partitions,
        on=(left_key,), right_on=(right_key,),
    )


def bloom_anti_join(
    left: rd.Dataset, right: rd.Dataset, *, left_key: str, right_key: str,
    n_expected: int, fp_rate: float = 0.01, num_partitions: int = 8,
    broadcast_cap: int = BROADCAST_KEY_CAP,
) -> rd.Dataset:
    """Keep left rows whose key does NOT appear in right.

    Fast path (``n_expected`` ≤ ``broadcast_cap``): broadcast right's
    EXACT distinct key set once and anti-filter in ONE scan of left —
    no Bloom build, no shuffle, no double scan; exact by construction.
    (A 4 KB eval-set key list should never cost a shuffled join — the
    Bloom exists for subtrahends too big to broadcast, not too small.)

    Slow path: the Bloom filter fast-paths definite non-members (no
    shuffle for them); only Bloom *hits* (maybe-members, a small
    false-positive-bounded fraction) go through a shuffled ``left_anti``
    join against right's key column.  Costs one extra scan of left (the
    two mask passes) in exchange for never broadcasting the exact key
    set."""
    if n_expected <= broadcast_cap:
        keys = _collect_right_keys(right, right_key)
        if keys is None:
            return left
        keys_ref = ray.put(keys)
        return left.map_batches(
            _keyset_mask_fn(keys_ref, left_key, False), batch_format="pyarrow"
        )
    bf = build_bloom(right, right_key, n_expected, fp_rate)
    bf_ref = ray.put((bf.bits.tobytes(), bf.m, bf.k))
    definite = left.map_batches(
        _bloom_mask_fn(bf_ref, left_key, False), batch_format="pyarrow"
    )
    maybe = left.map_batches(
        _bloom_mask_fn(bf_ref, left_key, True), batch_format="pyarrow"
    )
    keys = right.select_columns([right_key])
    anti_maybe = maybe.join(
        keys, "left_anti", num_partitions=num_partitions,
        on=(left_key,), right_on=(right_key,),
    )
    return definite.union(anti_maybe)


# --- Misra-Gries heavy hitters ----------------------------------------------


def misra_gries_sketch(values: list, k: int = 64) -> dict:
    """One-pass k-counter heavy-hitters summary of a batch."""
    counters: dict = {}
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < k:
            counters[v] = 1
        else:
            for key in list(counters):
                counters[key] -= 1
                if counters[key] == 0:
                    del counters[key]
    return counters


def merge_mg(sketches: list[dict], k: int = 64) -> dict:
    """Merge by summing then re-compressing to k counters (decrement by
    the (k+1)-th largest weight — standard mergeable MG)."""
    total: dict = {}
    for s in sketches:
        for key, c in s.items():
            total[key] = total.get(key, 0) + c
    if len(total) <= k:
        return total
    cut = sorted(total.values(), reverse=True)[k]
    out = {key: c - cut for key, c in total.items() if c - cut > 0}
    return out


def heavy_hitters(ds: rd.Dataset, col: str, k: int = 64) -> dict:
    """Distributed heavy hitters: per-batch MG sketches (≤ k entries
    each) reduced by the adaptive tree merge — MG merge is associative,
    so partition-level merges preserve the n/k error bound.  Counts are
    lower bounds within n/k of exact — enough to pick salting candidates
    (stages/skew.py)."""
    import json

    def sketch(batch: pa.Table) -> pa.Table:
        # vectorized per-batch sketch: exact value_counts compressed to k
        # counters (decrement by the (k+1)-th largest) — equivalent to
        # merge_mg([exact]) and carries the same n/k error bound, without
        # the per-row Python MG loop
        # dropna=False: a null-heavy key column must still surface null
        # as a hot key (the per-row MG loop counted None as "None")
        s = batch[col].to_pandas().value_counts(dropna=False)
        if len(s) > k:
            cut = int(s.iloc[k])
            s = (s.iloc[:k] - cut)
            s = s[s > 0]
        mg = {("None" if pd.isna(a) else str(a)): int(b) for a, b in s.items()}
        return pa.table(
            {"mg": pa.array([json.dumps(mg).encode()], type=pa.binary())}
        )

    def mg_merge(blobs: list[bytes]) -> bytes:
        merged = merge_mg([json.loads(b) for b in blobs], k)
        return json.dumps(merged).encode()

    blob = reduce_sketch_blobs(
        ds.map_batches(sketch, batch_format="pyarrow"), mg_merge, blob_col="mg"
    )
    return json.loads(blob) if blob else {}


# --- distributed sketch reduction -------------------------------------------


def reduce_sketch_blobs(
    sketch_ds: rd.Dataset,
    merge_fn,
    *,
    blob_col: str = "bits",
    direct_limit: int = 256,
    num_parts: int = 16,
) -> bytes:
    """Reduce a Dataset of mergeable sketch blobs to ONE blob.

    Few blobs (≤ direct_limit — the common small-job case): collect and
    merge on the driver.  Many blobs (10^12-row jobs produce millions of
    per-batch sketches): a distributed tree level first merges each of
    ``num_parts`` partitions inside a task, so the driver always merges
    at most max(direct_limit, num_parts) blobs."""
    mat = sketch_ds.materialize()
    if mat.count() <= direct_limit:
        blobs: list[bytes] = []
        for blk in collect_tables(mat, drop_empty=False):
            if blk.num_rows and blob_col in blk.column_names:
                blobs.extend(blk[blob_col].to_pylist())
    else:
        blobs = tree_merge_blobs(
            mat, merge_fn, blob_col=blob_col, num_parts=num_parts
        )
    return merge_fn(blobs) if blobs else None


def tree_merge_blobs(
    sketch_ds: rd.Dataset,
    merge_fn,
    *,
    blob_col: str = "bits",
    num_parts: int = 16,
) -> list[bytes]:
    """Two-level reduction of per-batch sketch blobs: route blobs to
    ``num_parts`` partitions (one groupby on a tiny int column), merge
    each partition's blobs inside a distributed task with ``merge_fn``
    (associative: bytes list → bytes), and return only ``num_parts``
    blobs to the driver.  At 10^12 rows the per-batch blob count is in
    the millions — a flat driver-side merge loop would be the bottleneck
    and this keeps the driver's work constant."""
    import pandas as pd

    def add_part(t: pa.Table) -> pa.Table:
        # partition by a hash of the FULL blob bytes: task-local counters
        # restart at 0 in every task (which would pile single-blob blocks
        # onto partition 0), and prefix-only hashing collapses sparse
        # sketches that share a zero prefix into one partition (ADVICE r2)
        from .hashing import bucket_ids

        return t.append_column("_part", pa.array(bucket_ids(t[blob_col], num_parts)))

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        blob = merge_fn(list(g[blob_col]))
        return pd.DataFrame({blob_col: [blob]})

    merged = (
        sketch_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(merge_group, batch_format="pandas")
    )
    out: list[bytes] = []
    for blk in collect_tables(merged, drop_empty=False):
        if blk.num_rows and blob_col in blk.column_names:
            out.extend(blk[blob_col].to_pylist())
    return out


def _bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Vectorized bit_length over uint64 (0 → 0), exact — no float
    log2 (values above 2^53 would round at power-of-two boundaries)."""
    v = w.astype(np.uint64, copy=True)
    bl = np.zeros(len(v), dtype=np.uint64)
    for s in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(s))
        bl[big] += np.uint64(s)
        v[big] >>= np.uint64(s)
    return (bl + v).astype(np.int64)  # v is 0/1 after the cascade


def approx_distinct_by_group(
    ds: rd.Dataset,
    *,
    group_col: str,
    value_col: str,
    p: int = 9,
    round_to: int = 4,
) -> pd.DataFrame:
    """HyperLogLog approximate COUNT(DISTINCT value) PER GROUP — the
    per-slice cardinality screen (distinct users per event type,
    distinct urls per host) that replaces an exact-distinct shuffle of
    corpus-sized (group, value) pairs with ``groups × 2^p`` register
    rows (p=9 → 512 registers, ~4.6% relative error).  Flajolet et
    al.'s estimator with the standard small-range (linear counting)
    correction; 64-bit hashes need no large-range correction.

    The whole register pipeline is EXACTLY SQL-replayable (unusual for
    a sketch, and the reason this can be hash-checked rather than
    tolerance-checked): values hash with the bit-exact splitmix64 the
    reproducible shuffle (q106) already replays, the register index is
    the hash's top p bits, rho is integer bit-length arithmetic (the
    oracle reads it off ``bin()``), and Σ2^−M sums exact powers of
    two.  Null group/value rows drop on both engines.

    Scale shape: per-batch (group, register) max-rho partials (each
    batch emits ≤ groups × 2^p rows, never values), ONE register-sized
    groupby, a groups × 2^p driver fold.  Output: (group,
    n_set:int64, approx_distinct) sorted by group.  SQL replay
    GENERATED by :func:`approx_distinct_sql` (single-generator)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max

    from .hashing import splitmix64
    from .selection import round_half_away

    m = 1 << p
    wbits = 64 - p

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t[group_col]), pc.is_valid(t[value_col]))
        t = t.filter(keep)
        v = (
            t[value_col].to_numpy(zero_copy_only=False)
            .astype(np.int64).view(np.uint64)
        )
        h = splitmix64(v)
        bucket = (h >> np.uint64(wbits)).astype(np.int64)
        w = h & np.uint64((1 << wbits) - 1)
        rho = wbits - _bit_length_u64(w) + 1
        return (
            pa.table({"g": t[group_col], "bucket": pa.array(bucket),
                      "rho": pa.array(rho)})
            .group_by(["g", "bucket"])
            .aggregate([("rho", "max")])
        )

    regs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["g", "bucket"])
        .aggregate(Max("rho_max", alias_name="rho"))
        .to_pandas()
    )
    if regs.empty:
        return pd.DataFrame(
            {group_col: pd.Series([], dtype=object),
             "n_set": pd.Series([], dtype=np.int64),
             "approx_distinct": pd.Series([], dtype=np.float64)}
        )
    rho = regs["rho"].to_numpy(dtype=np.int64)
    regs = regs.assign(_pow=np.ldexp(1.0, -rho))
    agg = regs.groupby("g", as_index=False).agg(
        n_set=("bucket", "size"), s=("_pow", "sum")
    )
    n_set = agg["n_set"].to_numpy(dtype=np.int64)
    s = agg["s"].to_numpy(dtype=np.float64)
    denom = s + (m - n_set).astype(np.float64)
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * (m * m) / denom
    zeros = m - n_set
    with np.errstate(divide="ignore"):
        lin = m * np.log(m / np.maximum(zeros, 1).astype(np.float64))
    est = np.where((raw <= 2.5 * m) & (zeros > 0), lin, raw)
    return pd.DataFrame(
        {
            group_col: agg["g"],
            "n_set": n_set,
            "approx_distinct": round_half_away(est, round_to),
        }
    ).sort_values(group_col, kind="mergesort").reset_index(drop=True)


def approx_distinct_sql(
    *,
    table: str,
    group_col: str,
    value_col: str,
    p: int = 9,
    round_to: int = 4,
) -> str:
    """DuckDB replay of :func:`approx_distinct_by_group`
    (single-generator): bit-exact splitmix64 registers (rho via
    ``bin()`` string length — exact integer bit arithmetic, no float
    log), identical estimator constants and correction branch."""
    from .shuffle import splitmix64_sql

    m = 1 << p
    wbits = 64 - p
    h = splitmix64_sql(value_col)
    return f"""
        WITH hashed AS (
            SELECT {group_col} AS g, {h} AS h
            FROM {table}
            WHERE {group_col} IS NOT NULL AND {value_col} IS NOT NULL
        ), r AS (
            SELECT g,
                   CAST(h >> {wbits} AS BIGINT) AS bucket,
                   {wbits} - length(ltrim(
                       bin(CAST(h & {(1 << wbits) - 1} AS BIGINT)), '0'
                   )) + 1 AS rho
            FROM hashed
        ), regs AS (
            SELECT g, bucket, max(rho) AS rho FROM r GROUP BY g, bucket
        ), agg AS (
            SELECT g, count(*) AS n_set,
                   sum(power(2.0, -rho)) AS s
            FROM regs GROUP BY g
        )
        SELECT g AS {group_col},
               CAST(n_set AS BIGINT) AS n_set,
               round(CASE WHEN (0.7213 / (1 + 1.079 / {m}))
                               * ({m} * {m})
                               / (s + ({m} - n_set)) <= 2.5 * {m}
                          AND {m} - n_set > 0
                          THEN {m} * ln({m}
                                        / CAST({m} - n_set AS DOUBLE))
                          ELSE (0.7213 / (1 + 1.079 / {m}))
                               * ({m} * {m}) / (s + ({m} - n_set))
                     END, {round_to}) AS approx_distinct
        FROM agg
    """
