"""Content-defined chunking (gear-hash CDC) + corpus dedup-ratio audit.

The storage-dedup primitive (LBFS/FastCDC family): cut each payload at
positions where a rolling GEAR hash of the last 64 bytes has its low
``mask_bits`` bits zero, clamped to [min_size, max_size].  Because cut
points depend only on CONTENT, an insertion early in a payload shifts
every byte but re-synchronizes the remaining cut points — so shared
suffixes/infixes between near-identical payloads still dedupe, which
fixed-size blocking cannot do.  At 100 TB this is the "how much of the
crawl is byte-identical boilerplate chunks" audit.

The gear hash has a finite 64-byte window (each shift discards the
oldest byte off the top bit), so the per-position hash is
h_i = Σ_{k=0..63} gear[b_{i−k}] · 2^k (mod 2^64) — computable as 64
VECTORIZED shifted adds over the whole byte array, no per-byte Python
loop.  The min/max-size clamp is a short driver-side walk over the
(sparse) candidate cut list.  Chunk identity is the splitmix64 of the
chunk bytes' polynomial hash (64-bit; cross-chunk collisions ~n²/2^64).

Rolling hashes are not SQL-expressible → rows-only driver check;
determinism, shift-resync, and clamp invariants are pytest-verified
(tests/test_cdc_refint_split.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ray.data.aggregate import Min

# deterministic 256-entry gear table (splitmix64 of the byte value)
def _gear_table() -> np.ndarray:
    from .hashing import splitmix64

    return splitmix64(np.arange(256, dtype=np.uint64))


_GEAR = _gear_table()


def _gear_hash_mask(arr: np.ndarray, mask_bits: int) -> np.ndarray:
    n = len(arr)
    g = _GEAR[arr]
    h = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in range(min(64, n)):
            # gear[b_{i-k}] << k, aligned to position i
            h[k:] += g[: n - k] << np.uint64(k)
    mask = np.uint64((1 << mask_bits) - 1)
    return (h & mask) == 0


def _gear_candidates(
    arr: np.ndarray, mask_bits: int, slab: int = 1 << 23
) -> np.ndarray:
    """Boolean candidate mask over a byte array: position i is a cut
    candidate when the gear hash of its trailing 64-byte window has the
    low ``mask_bits`` bits zero.  Shared by the per-doc and batched-tape
    paths (single source of the hash invariant).

    Large arrays sweep in ``slab``-sized pieces with a 63-byte overlap
    (the hash window), so the 16-bytes-per-position transient (gear
    lookups + hash accumulator) is bounded by the slab, not the whole
    batch tape."""
    n = len(arr)
    if n <= slab:
        return _gear_hash_mask(arr, mask_bits)
    cond = np.empty(n, dtype=bool)
    for s in range(0, n, slab):
        e = min(n, s + slab)
        lo = max(0, s - 63)
        sub = _gear_hash_mask(arr[lo:e], mask_bits)
        cond[s:e] = sub[s - lo :]
    return cond


def _clamp_walk(
    cand: np.ndarray, n: int, min_size: int, max_size: int
) -> np.ndarray:
    """Greedy min/max-size clamp over the sparse candidate cut list —
    the single source of the cut-selection invariant.  Always ends with
    ``n`` (and returns [0] for an empty payload)."""
    if n == 0:
        return np.array([0], dtype=np.int64)
    cuts = []
    last = 0
    while last < n:
        hard = last + max_size
        # first candidate >= last + min_size
        ci = int(np.searchsorted(cand, last + min_size, side="left"))
        if ci < len(cand) and cand[ci] <= hard and cand[ci] < n:
            cut = int(cand[ci])
        else:
            cut = min(hard, n)
        cuts.append(cut)
        last = cut
    return np.array(cuts, dtype=np.int64)


def gear_cut_points(
    data: bytes,
    *,
    mask_bits: int = 11,
    min_size: int = 256,
    max_size: int = 8192,
) -> np.ndarray:
    """Cut positions (exclusive ends) for one payload — vectorized gear
    hash, then the sequential min/max clamp over the sparse candidate
    list.  Always ends with len(data)."""
    n = len(data)
    if n == 0:
        return np.array([0], dtype=np.int64)
    cond = _gear_candidates(np.frombuffer(data, dtype=np.uint8), mask_bits)
    cand = np.flatnonzero(cond) + 1  # cut AFTER position i
    return _clamp_walk(cand, n, min_size, max_size)


def _chunk_hashes(data: bytes, cuts: np.ndarray) -> np.ndarray:
    """64-bit identity per chunk: blake2b-8 over the chunk bytes
    (C-speed, cryptographic mixing — cross-chunk collisions ~n²/2^64)."""
    import hashlib

    out = np.empty(len(cuts), dtype=np.uint64)
    last = 0
    for i, c in enumerate(cuts):
        d = hashlib.blake2b(data[last:c], digest_size=8).digest()
        out[i] = np.uint64(int.from_bytes(d, "little"))
        last = c
    return out


def cdc_chunk_stats(
    ds: rd.Dataset,
    *,
    payload_col: str,
    mask_bits: int = 11,
    min_size: int = 256,
    max_size: int = 8192,
    round_to: int = 6,
) -> pd.DataFrame:
    """Corpus-level CDC dedup audit: chunk every payload, count chunks
    and bytes, then distinct chunks and distinct bytes (first writer
    wins) — dedup_ratio = 1 − distinct_bytes/total_bytes is the storage
    saving a content-addressed chunk store would realize on this
    corpus.

    Scale shape: the payload scan emits only slim (chunk_hash, size)
    rows (payload bytes never outlive their task); ONE chunk-hash
    groupby folds distinct chunks; per-block partials fold the five
    totals on the driver.  Output: ONE row (n_payloads, n_chunks,
    total_bytes, n_distinct_chunks, distinct_bytes: int64;
    dedup_ratio: f64 rounded, NaN on empty)."""
    from .collect import collect_tables
    from .selection import round_half_away

    def chunk_scan(t: pa.Table) -> pa.Table:
        hashes: list = []
        sizes: list = []
        n_payloads = 0
        payloads = t[payload_col].to_pylist()
        datas = []
        for p in payloads:
            if p is None:
                continue
            n_payloads += 1
            datas.append(
                p if isinstance(p, bytes) else str(p).encode("utf-8")
            )
        # Batched gear hash: one 64-pass sweep over the batch's
        # CONCATENATED byte tape instead of 64 numpy ops per (tiny)
        # payload — a ~10× kernel cut on short docs.  Valid whenever
        # min_size >= 64: a doc's first 63 positions carry window
        # contributions from the previous doc on the tape, but every
        # candidate they could produce sits below the min-size clamp
        # and is skipped identically in both forms (equivalence-tested
        # against the per-doc reference).
        batched = min_size >= 64 and datas
        if batched:
            tape = b"".join(datas)
            cond = _gear_candidates(
                np.frombuffer(tape, dtype=np.uint8), mask_bits
            )
            del tape  # keep only the 1-byte/position candidate mask
            offs = np.concatenate(
                [[0], np.cumsum([len(d) for d in datas])]
            ).astype(np.int64)
        for di, data in enumerate(datas):
            if batched:
                n_d = len(data)
                cand = (
                    np.flatnonzero(cond[offs[di] : offs[di] + n_d]) + 1
                )
                cuts = _clamp_walk(cand, n_d, min_size, max_size)
            else:
                cuts = gear_cut_points(
                    data, mask_bits=mask_bits, min_size=min_size,
                    max_size=max_size,
                )
            hs = _chunk_hashes(data, cuts)
            sz = np.diff(np.concatenate([[0], cuts]))
            hashes.extend(hs.view(np.int64).tolist())
            sizes.extend(sz.astype(np.int64).tolist())
        t_out = pa.table(
            {
                "h": pa.array(hashes, type=pa.int64()),
                "sz": pa.array(sizes, type=pa.int64()),
            }
        )
        meta = pa.table(
            {
                "h": pa.nulls(1, type=pa.int64()),
                "sz": pa.array([n_payloads], type=pa.int64()),
            }
        )
        return pa.concat_tables([meta, t_out])

    scanned = ds.map_batches(chunk_scan, batch_format="pyarrow").materialize()

    n_payloads = n_chunks = total_bytes = 0

    def totals_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_meta = pc.is_null(t["h"])
        meta = t.filter(is_meta)
        chunks = t.filter(pc.invert(is_meta))
        return pa.table(
            {
                "p": pa.array(
                    [int(pc.sum(meta["sz"]).as_py() or 0)], type=pa.int64()
                ),
                "c": pa.array([chunks.num_rows], type=pa.int64()),
                "b": pa.array(
                    [int(pc.sum(chunks["sz"]).as_py() or 0)], type=pa.int64()
                ),
            }
        )

    for t in collect_tables(
        scanned.map_batches(totals_partial, batch_format="pyarrow"),
        drop_empty=True,
    ):
        n_payloads += sum(t["p"].to_pylist())
        n_chunks += sum(t["c"].to_pylist())
        total_bytes += sum(t["b"].to_pylist())

    def drop_meta(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_valid(t["h"]))

    distinct = (
        scanned.map_batches(drop_meta, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("sz", alias_name="sz"))
    )
    n_distinct = 0
    distinct_bytes = 0

    def d_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "n": pa.array([t.num_rows], type=pa.int64()),
                "b": pa.array(
                    [int(pc.sum(t["sz"]).as_py() or 0)], type=pa.int64()
                ),
            }
        )

    for t in collect_tables(
        distinct.map_batches(d_partial, batch_format="pyarrow"),
        drop_empty=True,
    ):
        n_distinct += sum(t["n"].to_pylist())
        distinct_bytes += sum(t["b"].to_pylist())

    ratio = (
        round_half_away(
            np.array([1.0 - distinct_bytes / total_bytes]), round_to
        )[0]
        if total_bytes
        else np.nan
    )
    return pd.DataFrame(
        {
            "n_payloads": pd.Series([n_payloads], dtype=np.int64),
            "n_chunks": pd.Series([n_chunks], dtype=np.int64),
            "total_bytes": pd.Series([total_bytes], dtype=np.int64),
            "n_distinct_chunks": pd.Series([n_distinct], dtype=np.int64),
            "distinct_bytes": pd.Series([distinct_bytes], dtype=np.int64),
            "dedup_ratio": pd.Series([ratio], dtype=np.float64),
        }
    )
