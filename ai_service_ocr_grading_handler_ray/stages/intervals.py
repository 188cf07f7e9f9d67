"""General interval join: points × OVERLAPPING intervals, both sides
large — the range-join primitive Ray Data lacks (SURVEY.md §2.7 lists
range/as-of among the engine-side joins; q55 covers only the broadcast
non-overlapping-band special case).

Semantics: one output row per (point, interval) pair with
``start <= value <= end`` — exactly SQL ``JOIN ON v BETWEEN s AND e``.

Scale shape (the documented partitioning assumption: the VALUE DOMAIN
is the partitioning key):

- pick a ``bucket_width`` W over the value domain; each point lands in
  ONE bucket ``floor(v / W)``; each interval EXPLODES to every bucket it
  overlaps (``floor(s/W) .. floor(e/W)`` — bounded by
  ``max_span_buckets``, loud error above it: an interval spanning the
  whole domain belongs in a broadcast plan, not this one);
- both sides take ONE groupby shuffle on the bucket id; pairs emit
  inside ``map_groups`` — a point meets an interval in exactly the
  point's own bucket, so no pair deduplication pass is needed;
- in-bucket matching is a chunked dense compare (point-chunk ×
  interval matrix, chunk size bounds task memory) — vectorized, no
  per-row Python;
- value-domain skew (many points in one bucket) is visible and tunable
  via W, the same dial as ``stages/asof.py``'s time buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_POINT_CHUNK = 4096


def interval_join_points(
    points: rd.Dataset,
    intervals: rd.Dataset,
    *,
    value_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    max_span_buckets: int = 4096,
    _schemas: tuple[pa.Schema, pa.Schema] | None = None,
) -> rd.Dataset:
    """Inner range join (v BETWEEN s AND e).  Output columns: all point
    columns followed by all interval columns (names must not overlap —
    rename first, as with ``bucketed_inner_join``)."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    def fields(ds: rd.Dataset, given: pa.Schema | None) -> list[pa.Field]:
        if given is not None:
            return list(given)
        sch = ds.schema()  # .names/.types are Arrow for both arrow- and
        return [pa.field(n, t) for n, t in zip(sch.names, sch.types)]  # pandas-backed blocks

    p_fields = fields(points, _schemas[0] if _schemas else None)
    i_fields = fields(intervals, _schemas[1] if _schemas else None)
    p_cols = [f.name for f in p_fields]
    i_cols = [f.name for f in i_fields]
    overlap = set(p_cols) & set(i_cols)
    if overlap:
        raise ValueError(f"rename overlapping columns first: {overlap}")
    types = {f.name: f.type for f in p_fields}
    types.update({f.name: f.type for f in i_fields})
    int_cols = [c for c in types if pa.types.is_integer(types[c])]
    all_cols = p_cols + i_cols
    W = float(bucket_width)

    def widen(t: pa.Table, extra: dict) -> pa.Table:
        # union-widening with TYPED nulls (the asof/joins dtype discipline)
        n = len(t)
        out = {
            c: (t[c] if c in t.column_names else pa.nulls(n, type=types[c]))
            for c in all_cols
        }
        out.update(extra)
        return pa.table(out)

    def prep_points(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor(v / W).astype(np.int64)
        return widen(t, {"_b": pa.array(b), "_side": pa.array(np.zeros(len(b), dtype=np.int8))})

    def prep_intervals(t: pa.Table) -> pa.Table:
        s = t[start_col].to_numpy(zero_copy_only=False).astype(np.float64)
        e = t[end_col].to_numpy(zero_copy_only=False).astype(np.float64)
        b0 = np.floor(s / W).astype(np.int64)
        b1 = np.floor(e / W).astype(np.int64)
        span = np.maximum(b1 - b0 + 1, 0)  # inverted intervals span 0 buckets
        if span.size and span.max() > max_span_buckets:
            raise ValueError(
                f"interval spans {span.max()} buckets > max_span_buckets="
                f"{max_span_buckets}: widen bucket_width or broadcast the "
                f"wide intervals separately"
            )
        idx = np.repeat(np.arange(len(s)), span)
        # bucket id per exploded row: b0[i], b0[i]+1, ... (flat arange trick)
        off = np.arange(int(span.sum())) - np.repeat(
            np.concatenate([[0], np.cumsum(span)[:-1]]), span
        )
        b = b0[idx] + off
        t2 = t.take(pa.array(idx))
        return widen(
            t2, {"_b": pa.array(b), "_side": pa.array(np.ones(len(b), dtype=np.int8))}
        )

    out_cols = all_cols

    def empty_out() -> pd.DataFrame:
        # dtype-stable empty frame so empty buckets agree with the
        # non-empty blocks' schema (Int64 where ints were union-widened)
        return pd.DataFrame(
            {
                c: pd.Series(
                    dtype="Int64" if c in int_cols else types[c].to_pandas_dtype()
                )
                for c in out_cols
            }
        )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        pg = g[g["_side"] == 0]
        ig = g[g["_side"] == 1]
        if pg.empty or ig.empty:
            return empty_out()
        v = pg[value_col].to_numpy(dtype=np.float64)
        s = ig[start_col].to_numpy(dtype=np.float64)
        e = ig[end_col].to_numpy(dtype=np.float64)
        p_idx_parts, i_idx_parts = [], []
        for c0 in range(0, len(v), _POINT_CHUNK):
            vc = v[c0 : c0 + _POINT_CHUNK]
            hit = (vc[:, None] >= s[None, :]) & (vc[:, None] <= e[None, :])
            pi, ii = np.nonzero(hit)
            p_idx_parts.append(pi + c0)
            i_idx_parts.append(ii)
        pi = np.concatenate(p_idx_parts)
        ii = np.concatenate(i_idx_parts)
        if not len(pi):
            return empty_out()
        # assemble via numpy fancy-indexing per column — pandas .iloc row
        # gathers measured ~10× slower at multi-million-pair buckets
        data = {c: pg[c].to_numpy()[pi] for c in p_cols}
        data.update({c: ig[c].to_numpy()[ii] for c in i_cols})
        out = pd.DataFrame(data)
        # restore ints the union's cross-side nulls promoted to float64
        for c in out_cols:
            if c in int_cols:
                out = out.astype({c: "Int64"})
        return out

    pt = points.map_batches(prep_points, batch_format="pyarrow")
    it = intervals.map_batches(prep_intervals, batch_format="pyarrow")
    return pt.union(it).groupby("_b").map_groups(join_bucket, batch_format="pandas")


def union_coverage(
    points: "rd.Dataset",
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_us: int = 300_000_000,
    num_parts: int = 32,
) -> "rd.Dataset":
    """Per-key UNION length of fixed-width activity windows: every
    event opens a [ts, ts + window) interval; overlapping intervals
    merge; the output is the total covered time per key — the honest
    "active seconds" metric (summing per-event windows double-counts
    bursts; the union doesn't), the classic interval-merge sweep
    collapsed to its sorted-stream closed form:

        covered = Σ_events min(next_ts − ts, window)   (last → window)

    Exact integer µs arithmetic end-to-end (no float drift); null
    key/ts rows drop on both engines.  Scale shape: ONE key-hash
    coarse shuffle, per-partition vectorized sort + shift (no Python
    loop), lazy |keys|-sized Dataset out.  Output: (key, n_events:
    int64, covered_us:int64).  SQL replay GENERATED by
    :func:`union_coverage_sql` (identical lead/least form)."""
    import pandas as pd

    from .dedup import add_key_partition

    def per_partition(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.dropna(subset=[key_col, ts_col]).sort_values(
            [key_col, ts_col], kind="mergesort"
        )
        if not len(g):
            return pd.DataFrame(
                {key_col: pd.Series([], dtype=object),
                 "n_events": pd.Series([], dtype=np.int64),
                 "covered_us": pd.Series([], dtype=np.int64)}
            )
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        key = g[key_col].to_numpy()
        nxt = np.empty_like(ts)
        nxt[:-1] = ts[1:]
        nxt[-1] = np.iinfo(np.int64).max
        same_key = np.empty(len(g), dtype=bool)
        same_key[:-1] = key[:-1] == key[1:]
        same_key[-1] = False
        gap = np.where(same_key, nxt - ts, np.int64(window_us))
        contrib = np.minimum(gap, np.int64(window_us))
        out = pd.DataFrame({"k": key, "c": contrib})
        agg = out.groupby("k", sort=False).agg(
            n_events=("c", "size"), covered_us=("c", "sum")
        ).reset_index()
        return pd.DataFrame(
            {key_col: agg["k"],
             "n_events": agg["n_events"].astype(np.int64),
             "covered_us": agg["covered_us"].astype(np.int64)}
        )

    return (
        points.map_batches(
            lambda t: add_key_partition(t, key_col, num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(per_partition, batch_format="pandas")
    )


def union_coverage_sql(
    *,
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    window_us: int = 300_000_000,
) -> str:
    """DuckDB replay of :func:`union_coverage` (single-generator):
    identical lead/least integer-µs form."""
    return f"""
        WITH o AS (
            SELECT {key_col} AS k, epoch_us({ts_col}) AS t,
                   lead(epoch_us({ts_col})) OVER (
                       PARTITION BY {key_col} ORDER BY {ts_col}
                   ) AS nxt
            FROM {table}
            WHERE {key_col} IS NOT NULL AND {ts_col} IS NOT NULL
        )
        SELECT k AS {key_col},
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(least(coalesce(nxt - t, {window_us}),
                              {window_us})) AS BIGINT) AS covered_us
        FROM o GROUP BY k
    """
