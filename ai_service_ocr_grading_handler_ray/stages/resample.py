"""Per-key time-series resampling with forward fill — the gap-free
downsample (metrics rollups, crawl-rate series, training-telemetry
bars) event pipelines run before charting or joining series: bucket
each key's events into fixed intervals, keep the LAST value per
bucket, and forward-fill the buckets with no events so every key's
series is dense from its first to its last bucket.

Semantics (replayed exactly by the generated oracle,
:func:`resample_sql` — single-generator policy):

    bucket(e)       = epoch_us(ts) // every_us           (floor)
    last(k, b)      = value of the (k, b) event with the greatest
                      (ts, id)  — the deterministic "last write wins"
    grid(k)         = [min bucket of k .. max bucket of k], step 1
    value(k, b)     = last(k, b) if k has events in b,
                      else value(k, previous grid bucket)   (ffill)
    filled(k, b)    = k has no event in bucket b

Scale shape: ONE key-hash shuffle (``add_key_partition`` →
``groupby(_part).map_groups`` — a key's events co-locate, vectorized
pandas inside), then a fully VECTORIZED per-partition pass: sort,
per-(key, bucket) last via ``drop_duplicates(keep="last")``, the dense
grid via one repeat/arange expansion, and the forward fill via ONE
``searchsorted`` of grid keys into real keys on a combined
(key-code << 32 | bucket) monotone key — no per-key Python loop.  The
output is grid-sized and STREAMS out as the map_groups output; the
driver never holds it.

Partitioning assumption: one key's full series fits a worker (the
sessionize/funnel assumption); key count is unbounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

# bucket indices must fit 32 bits for the combined (key, bucket) probe
# key — epoch_us // every_us stays < 2^31 for any every_us >= 1 s until
# the year 2038+ and for sub-second buckets until proportionally later
_BUCKET_BITS = 32


def resample_last_ffill(
    ds: rd.Dataset,
    *,
    every_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    num_parts: int = 32,
) -> rd.Dataset:
    """Dense per-key series: (key, bucket_us:int64, value:float64,
    filled:bool), one row per key per ``every_us`` interval between the
    key's first and last event.  See module docstring for semantics."""
    from .dedup import add_key_partition

    if every_us <= 0:
        raise ValueError("every_us must be positive")

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        if g[ts_col].isna().any() or g[value_col].isna().any():
            raise ValueError(
                "resample_last_ffill: null ts/value rows — drop or fill "
                "them upstream (the SQL oracle would silently treat null "
                "values as missing buckets)"
            )
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        bucket = ts // every_us
        if bucket.size and (bucket.min() < 0 or bucket.max() >= (1 << (_BUCKET_BITS - 1))):
            raise ValueError("resample_last_ffill: bucket index out of range")
        ids = g[id_col].to_numpy()
        keys = g[key_col].to_numpy()
        vals = g[value_col].to_numpy().astype(np.float64)

        # deterministic last-write-wins: sort by (key, bucket, ts, id),
        # keep the final row of each (key, bucket) run
        order = np.lexsort((ids, ts, bucket, keys))
        keys, bucket, vals = keys[order], bucket[order], vals[order]
        is_last = np.empty(len(keys), dtype=bool)
        if len(keys):
            same_next = (keys[1:] == keys[:-1]) & (bucket[1:] == bucket[:-1])
            is_last[:-1] = ~same_next
            is_last[-1] = True
        rk, rb, rv = keys[is_last], bucket[is_last], vals[is_last]

        if not len(rk):
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype=g[key_col].dtype),
                    "bucket_us": pd.Series([], dtype=np.int64),
                    "value": pd.Series([], dtype=np.float64),
                    "filled": pd.Series([], dtype=bool),
                }
            )

        # per-key segments over the (key, bucket)-sorted real rows
        new_key = np.empty(len(rk), dtype=bool)
        new_key[0] = True
        new_key[1:] = rk[1:] != rk[:-1]
        seg_start = np.flatnonzero(new_key)
        seg_end = np.append(seg_start[1:], len(rk)) - 1
        lo, hi = rb[seg_start], rb[seg_end]
        counts = hi - lo + 1

        # dense grid: one multi-arange expansion (no per-key loop)
        total = int(counts.sum())
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        grid_b = (
            np.arange(total, dtype=np.int64)
            - np.repeat(starts, counts)
            + np.repeat(lo, counts)
        )
        grid_key = np.repeat(rk[seg_start], counts)

        # forward fill: last real row <= each grid bucket, one
        # searchsorted over the combined monotone (key-code, bucket) key
        kcode = np.cumsum(new_key) - 1  # dense code per real row
        comb_real = (kcode << _BUCKET_BITS) | (rb - rb.min())
        grid_code = np.repeat(kcode[seg_start], counts)
        comb_grid = (grid_code << _BUCKET_BITS) | (grid_b - rb.min())
        idx = np.searchsorted(comb_real, comb_grid, side="right") - 1
        value = rv[idx]
        filled = comb_real[idx] != comb_grid

        return pd.DataFrame(
            {
                key_col: grid_key,
                "bucket_us": grid_b * every_us,
                "value": value,
                "filled": filled,
            }
        )

    return (
        ds.map_batches(
            lambda t: add_key_partition(t, key_col, num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(per_partition, batch_format="pandas")
    )


def resample_sql(
    *,
    every_us: int,
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> str:
    """DuckDB replay of :func:`resample_last_ffill`, generated from the
    SAME parameters (single-generator policy): last-write-wins via a
    (ts, id)-descending row_number, the dense grid via generate_series
    over each key's [min, max] bucket span, and the forward fill via
    the count-over/max-over gap-fill window idiom."""
    return f"""
        WITH b AS (
          SELECT {key_col} AS k, epoch_us({ts_col}) // {every_us} AS b,
                 {value_col} AS v, {ts_col} AS ts, {id_col} AS id
          FROM {table}
        ),
        lastv AS (
          SELECT k, b, v FROM (
            SELECT k, b, v,
                   row_number() OVER (PARTITION BY k, b
                                      ORDER BY ts DESC, id DESC) AS rn
            FROM b
          ) WHERE rn = 1
        ),
        span AS (SELECT k, min(b) AS lo, max(b) AS hi FROM lastv GROUP BY k),
        grid AS (SELECT k, unnest(generate_series(lo, hi)) AS b FROM span),
        j AS (
          SELECT grid.k, grid.b, lastv.v
          FROM grid LEFT JOIN lastv ON grid.k = lastv.k AND grid.b = lastv.b
        ),
        g AS (
          SELECT k, b, v,
                 count(v) OVER (PARTITION BY k ORDER BY b) AS grp
          FROM j
        )
        SELECT k AS {key_col},
               CAST(b * {every_us} AS BIGINT) AS bucket_us,
               max(v) OVER (PARTITION BY k, grp) AS value,
               (v IS NULL) AS filled
        FROM g
    """


def ohlc_bars(
    ds: rd.Dataset,
    *,
    every_us: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    num_parts: int = 32,
) -> rd.Dataset:
    """Per-(key, bucket) open/high/low/close bars — the downsample that
    keeps the within-bucket dynamics :func:`resample_last_ffill`'s
    last-write-wins discards (metric dashboards, crawl-rate series,
    price-style telemetry).  open/close are the values at the FIRST and
    LAST (ts, id) of the bucket (deterministic under ts ties); high/low
    are the bucket max/min; n the event count.  No gap fill — only
    buckets with events emit (join against the ffill grid when a dense
    series is needed).

    Scale shape: ONE key-hash coarse shuffle (``add_key_partition`` —
    a key's events co-locate), then a fully vectorized per-partition
    pass: one lexsort by (key, bucket, ts, id), run boundaries from a
    shifted-key mask, open/close by boundary indexing, high/low/n via
    ``np.maximum.reduceat`` / ``minimum.reduceat`` / boundary diffs.
    Output is bar-count-sized and streams from map_groups.

    Replayed exactly by :func:`ohlc_sql` (single-generator policy).
    """
    from .dedup import add_key_partition

    if every_us <= 0:
        raise ValueError("every_us must be positive")

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        if g[ts_col].isna().any() or g[value_col].isna().any():
            raise ValueError(
                "ohlc_bars: null ts/value rows — drop or fill them "
                "upstream (the SQL oracle would silently skip them)"
            )
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        bucket = ts // every_us
        keys = g[key_col].to_numpy()
        ids = g[id_col].to_numpy()
        vals = g[value_col].to_numpy().astype(np.float64)
        if not len(keys):
            return pd.DataFrame(
                {
                    key_col: pd.Series([], dtype=g[key_col].dtype),
                    "bucket_us": pd.Series([], dtype=np.int64),
                    "open": pd.Series([], dtype=np.float64),
                    "high": pd.Series([], dtype=np.float64),
                    "low": pd.Series([], dtype=np.float64),
                    "close": pd.Series([], dtype=np.float64),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        order = np.lexsort((ids, ts, bucket, keys))
        keys, bucket, vals = keys[order], bucket[order], vals[order]
        new = np.empty(len(keys), dtype=bool)
        new[0] = True
        new[1:] = (keys[1:] != keys[:-1]) | (bucket[1:] != bucket[:-1])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(keys)) - 1
        return pd.DataFrame(
            {
                key_col: keys[starts],
                "bucket_us": bucket[starts] * every_us,
                "open": vals[starts],
                "high": np.maximum.reduceat(vals, starts),
                "low": np.minimum.reduceat(vals, starts),
                "close": vals[ends],
                "n": (ends - starts + 1).astype(np.int64),
            }
        )

    return (
        ds.map_batches(
            lambda t: add_key_partition(t, key_col, num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(per_partition, batch_format="pandas")
    )


def ohlc_sql(
    *,
    every_us: int,
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> str:
    """DuckDB replay of :func:`ohlc_bars`, generated from the SAME
    parameters (single-generator policy): open/close via (ts, id)
    row_numbers in both directions, high/low/n as plain aggregates."""
    return f"""
        WITH b AS (
          SELECT {key_col} AS k, epoch_us({ts_col}) // {every_us} AS b,
                 {value_col} AS v, {ts_col} AS ts, {id_col} AS id
          FROM {table}
          WHERE {value_col} IS NOT NULL
        ),
        r AS (
          SELECT k, b, v,
                 row_number() OVER (PARTITION BY k, b
                                    ORDER BY ts, id) AS rn_a,
                 row_number() OVER (PARTITION BY k, b
                                    ORDER BY ts DESC, id DESC) AS rn_d
          FROM b
        )
        SELECT k AS {key_col},
               CAST(b * {every_us} AS BIGINT) AS bucket_us,
               max(CASE WHEN rn_a = 1 THEN v END) AS open,
               max(v) AS high, min(v) AS low,
               max(CASE WHEN rn_d = 1 THEN v END) AS close,
               CAST(count(*) AS BIGINT) AS n
        FROM r GROUP BY k, b
    """
