"""Distributed global rank — total-order row numbering WITHOUT a
global sort (the package bans ``Dataset.sort``; VERDICT r3 #5 replaced
the last two).  The classic sample-based range-partitioner (the shape
behind Spark's RangePartitioner / TeraSort): sample the key column,
cut it into ``num_buckets`` ranges, route rows to their range bucket,
sort ONLY within each bucket, and offset each bucket's local ranks by
the counts of the buckets below it.

Exactness does not depend on the sample: the cut points only decide
WHERE a row is ranked, never WHAT its rank is — skewed cuts make
skewed buckets, not wrong ranks.  Ties break by ``id_col`` (assumed
unique), so the total order (key, id) is deterministic and replayed
exactly by :func:`global_rank_sql` (row_number() OVER (ORDER BY key,
id)).

Scale shape:
- one slim (key, id) scan, materialized once (it is consumed by the
  sample pass, the count pass and the rank pass);
- sample: per-block evenly-spaced order statistics (``sample_per_block``
  rows/block) → a blocks×sample-sized driver fold → num_buckets−1 cuts;
- counts: per-batch ``np.bincount`` partials → a num_buckets-sized
  driver fold → exclusive-prefix offsets (broadcast in the closure);
- rank: ONE bucket shuffle (coarse groupby — each range is one Ray
  group), in-bucket vectorized lexsort + arange + offset; output
  streams from map_groups.
Driver state: blocks×sample keys + num_buckets ints — never row-sized.

Null keys raise (SQL engines disagree on null ordering; rank of null
is ambiguous by construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _key_array(col: pa.ChunkedArray) -> np.ndarray:
    """Key column as a sortable numpy array; raises on nulls."""
    if col.null_count:
        raise ValueError(
            "global_rank: null keys — filter or fill them upstream "
            "(rank of null is ambiguous across engines)"
        )
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return np.asarray(col.to_pylist(), dtype=object)
    return col.to_numpy(zero_copy_only=False)


def global_rank(
    ds: rd.Dataset,
    *,
    key_col: str,
    id_col: str,
    num_buckets: int = 64,
    sample_per_block: int = 64,
    out_col: str = "rank",
) -> rd.Dataset:
    """Lazy ``(id, key, rank:int64)`` Dataset; rank is the 1-based
    position in the total order (key ASC, id ASC)."""
    slim = ds.map_batches(
        lambda t: t.select([key_col, id_col]), batch_format="pyarrow"
    ).materialize()

    # --- sample pass: evenly spaced order statistics per block ----------
    def sample(t: pa.Table) -> pa.Table:
        keys = _key_array(t[key_col])
        if not len(keys):
            return pa.table({key_col: t[key_col]})
        srt = np.sort(keys, kind="mergesort")
        take = np.linspace(0, len(srt) - 1, min(sample_per_block, len(srt)))
        picked = srt[take.astype(np.int64)]
        return pa.table({key_col: pa.array(list(picked), type=t[key_col].type)})

    from .collect import collect_tables

    samples = [
        t for t in collect_tables(
            slim.map_batches(sample, batch_format="pyarrow"), drop_empty=True
        )
    ]
    if samples:
        pool = np.sort(_key_array(pa.concat_tables(samples)[key_col]),
                       kind="mergesort")
        take = np.linspace(0, len(pool) - 1, num_buckets + 1)[1:-1]
        cuts = pool[take.astype(np.int64)]
    else:
        cuts = np.empty(0, dtype=object)

    def bucketize(t: pa.Table) -> pa.Table:
        keys = _key_array(t[key_col])
        b = (
            np.searchsorted(cuts, keys, side="right").astype(np.int64)
            if len(keys)
            else np.empty(0, dtype=np.int64)
        )
        return t.append_column("_rb", pa.array(b))

    bucketed = slim.map_batches(bucketize, batch_format="pyarrow").materialize()

    # --- count pass: exclusive prefix offsets per bucket -----------------
    def counts(t: pa.Table) -> pa.Table:
        b = t["_rb"].to_numpy(zero_copy_only=False)
        c = np.bincount(b, minlength=num_buckets).astype(np.int64)
        return pa.table(
            {
                "b": pa.array(np.arange(num_buckets, dtype=np.int64)),
                "n": pa.array(c),
            }
        )

    total = np.zeros(num_buckets, dtype=np.int64)
    for t in collect_tables(
        bucketed.map_batches(counts, batch_format="pyarrow"), drop_empty=True
    ):
        total[t["b"].to_numpy(zero_copy_only=False)] += t["n"].to_numpy(
            zero_copy_only=False
        )
    offsets = np.concatenate([[0], np.cumsum(total)[:-1]])

    # --- rank pass: in-bucket sort + arange + offset ----------------------
    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["_rb"].iloc[0])
        out = (
            g.sort_values([key_col, id_col], kind="mergesort")
            [[id_col, key_col]]
            .reset_index(drop=True)
        )
        out[out_col] = offsets[b] + 1 + np.arange(len(out), dtype=np.int64)
        return out

    return bucketed.groupby("_rb").map_groups(
        rank_bucket, batch_format="pandas"
    )


def global_rank_sql(
    *,
    table: str,
    key_col: str,
    id_col: str,
    out_col: str = "rank",
) -> str:
    """DuckDB replay of :func:`global_rank` (single-generator policy):
    the identical (key ASC, id ASC) total order as one window."""
    return f"""
        SELECT {id_col}, {key_col},
               CAST(row_number() OVER (ORDER BY {key_col}, {id_col})
                    AS BIGINT) AS {out_col}
        FROM {table}
        WHERE {key_col} IS NOT NULL
    """
