"""Exact per-group equi-width histograms.

The dashboard/distribution primitive next to the exact-quantile family
(stages/selection.py): fixed [lo, hi) range split into ``bins`` equal
buckets, one count per (group, bin).  Values below lo clamp into bin 0,
values at/above hi into the last bin (loud range truncation is the
wrong default for a monitoring histogram; callers wanting strictness
pre-filter).

Scale shape: the canonical map-side combiner — per-batch vectorized
(group, bin) partial counts (bounded by groups × bins per batch, never
rows), ONE tiny groupby-sum shuffle over (group, bin) pairs.  The bin
formula ``floor((v - lo) / width)`` with width = (hi - lo)/bins uses
the same double arithmetic as its SQL replay, so edge values land in
identical bins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["grouped_histogram"]


def grouped_histogram(
    ds: rd.Dataset,
    *,
    value_col: str,
    group_col: str,
    lo: float,
    hi: float,
    bins: int,
) -> rd.Dataset:
    """Dataset of (group_col, bin, n): exact counts per equi-width bin.
    Only non-empty (group, bin) pairs are emitted (SQL GROUP BY
    semantics); ``bin`` is int64 in [0, bins)."""
    if not (hi > lo and bins > 0):
        raise ValueError("need hi > lo and bins > 0")
    width = (hi - lo) / bins

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.floor((v - lo) / width)
        b = np.minimum(np.maximum(b, 0.0), float(bins - 1)).astype(np.int64)
        df = pd.DataFrame({group_col: t[group_col].to_pandas(), "bin": b})
        r = df.groupby([group_col, "bin"], sort=False).size().reset_index(name="n")
        r["n"] = r["n"].astype("int64")
        return pa.Table.from_pandas(r, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby([group_col, "bin"])
        .aggregate(Sum("n", alias_name="n"))
    )


def binned_quantiles(
    ds: rd.Dataset,
    *,
    value_col: str,
    qs: tuple = (0.5, 0.9, 0.99),
    n_bins: int = 1024,
    round_to: int = 6,
) -> pd.DataFrame:
    """Mergeable fixed-bin quantile SKETCH — the one-pass-mergeable
    scale path next to the exact refinement quantiles
    (selection.exact_group_quantiles): two shuffle-free scans (min/max
    partials, then equi-width bin-count partials folded into an
    n_bins int64 array on the driver) give every quantile with value
    error ≤ one bin width = (max−min)/n_bins.  Bin counts merge by
    addition, so per-shard sketches combine exactly — the property
    t-digest/KLL trade exactness for; fixed binning keeps the estimate
    DETERMINISTIC and SQL-replayable, which a randomized sketch is not.

    Estimate convention: target rank = q·n; the estimate interpolates
    linearly inside the first bin whose inclusive cumulative count
    reaches the target (q = 0 → min).  Identical double arithmetic on
    both engines (bucket = least(floor((v−min)/w), n_bins−1)).

    Output: one row per q — (q:f64, estimate:f64, bin_width:f64,
    n:int64), rounded; empty input → empty frame.  SQL replay GENERATED
    by :func:`binned_quantiles_sql`."""
    import pyarrow.compute as pc

    from .collect import collect_tables
    from .selection import round_half_away

    def minmax_partial(t: pa.Table) -> pa.Table:
        v = t[value_col].drop_null()
        if not len(v):
            return pa.table({"lo": pa.array([], type=pa.float64()),
                             "hi": pa.array([], type=pa.float64())})
        vv = v.to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"lo": pa.array([float(np.min(vv))]),
                         "hi": pa.array([float(np.max(vv))])})

    lo = hi = None
    for t in collect_tables(
        ds.map_batches(minmax_partial, batch_format="pyarrow"), drop_empty=True
    ):
        for l_, h_ in zip(t["lo"].to_pylist(), t["hi"].to_pylist()):
            lo = l_ if lo is None else min(lo, l_)
            hi = h_ if hi is None else max(hi, h_)
    empty = pd.DataFrame(
        {"q": pd.Series([], dtype=np.float64),
         "estimate": pd.Series([], dtype=np.float64),
         "bin_width": pd.Series([], dtype=np.float64),
         "n": pd.Series([], dtype=np.int64)}
    )
    if lo is None:
        return empty
    w = (hi - lo) / n_bins

    def bin_partial(t: pa.Table, _lo=lo, _w=w) -> pa.Table:
        v = (
            t[value_col].drop_null()
            .to_numpy(zero_copy_only=False).astype(np.float64)
        )
        if not len(v):
            return pa.table({"b": pa.array([], type=pa.int64()),
                             "c": pa.array([], type=pa.int64())})
        if _w > 0:
            b = np.minimum(
                np.floor((v - _lo) / _w), n_bins - 1
            ).astype(np.int64)
        else:
            b = np.zeros(len(v), dtype=np.int64)
        cnt = np.bincount(b, minlength=n_bins)
        present = np.flatnonzero(cnt)
        return pa.table({"b": pa.array(present.astype(np.int64)),
                         "c": pa.array(cnt[present].astype(np.int64))})

    counts = np.zeros(n_bins, dtype=np.int64)
    for t in collect_tables(
        ds.map_batches(bin_partial, batch_format="pyarrow"), drop_empty=True
    ):
        # np.add.at, not buffered fancy '+=': a block carrying the same
        # bin twice (block coalescing) would silently drop additions
        np.add.at(
            counts,
            np.asarray(t["b"].to_pylist(), dtype=np.int64),
            np.asarray(t["c"].to_pylist(), dtype=np.int64),
        )
    n = int(counts.sum())
    cum_incl = np.cumsum(counts)
    cum_excl = cum_incl - counts
    rows = []
    for q in qs:
        if w == 0 or q <= 0:
            est = lo
        else:
            target = q * n
            j = int(np.searchsorted(cum_incl, target, side="left"))
            j = min(j, n_bins - 1)
            frac = (target - cum_excl[j]) / counts[j] if counts[j] else 0.0
            est = lo + w * (j + frac)
        rows.append((float(q), est, w, n))
    out = pd.DataFrame(rows, columns=["q", "estimate", "bin_width", "n"])
    out["q"] = round_half_away(out["q"].to_numpy(np.float64), round_to)
    out["estimate"] = round_half_away(
        out["estimate"].to_numpy(np.float64), round_to
    )
    out["bin_width"] = round_half_away(
        out["bin_width"].to_numpy(np.float64), round_to
    )
    out["n"] = out["n"].astype(np.int64)
    return out


def binned_quantiles_sql(
    *,
    table: str = "events",
    value_col: str = "value",
    qs: tuple = (0.5, 0.9, 0.99),
    n_bins: int = 1024,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`binned_quantiles` (single-generator):
    identical bucket formula, rank convention, interpolation order."""
    q_values = ", ".join(f"({float(q)})" for q in qs)
    return f"""
        WITH v AS (
            SELECT CAST({value_col} AS DOUBLE) AS x FROM {table}
            WHERE {value_col} IS NOT NULL
        ),
        mm AS (SELECT min(x) AS lo, max(x) AS hi,
                      count(*) AS n FROM v),
        b AS (
            SELECT CASE WHEN mm.hi = mm.lo THEN 0
                        ELSE CAST(least(floor((v.x - mm.lo)
                                  / ((mm.hi - mm.lo) / {n_bins})),
                                  {n_bins} - 1) AS BIGINT) END AS bin
            FROM v CROSS JOIN mm
        ),
        c AS (SELECT bin, count(*) AS cnt FROM b GROUP BY bin),
        cc AS (
            SELECT bin, cnt,
                   sum(cnt) OVER (ORDER BY bin) AS cum_incl,
                   sum(cnt) OVER (ORDER BY bin) - cnt AS cum_excl
            FROM c
        ),
        quel (q) AS (VALUES {q_values})
        SELECT round(q, {round_to}) AS q,
               round(CASE WHEN mm.hi = mm.lo OR q <= 0 THEN mm.lo
                     ELSE mm.lo + ((mm.hi - mm.lo) / {n_bins})
                          * (pick.bin + (q * mm.n - pick.cum_excl)
                             / pick.cnt) END, {round_to}) AS estimate,
               round(CASE WHEN mm.hi = mm.lo THEN 0.0
                     ELSE (mm.hi - mm.lo) / {n_bins} END,
                     {round_to}) AS bin_width,
               CAST(mm.n AS BIGINT) AS n
        FROM quel CROSS JOIN mm
        LEFT JOIN LATERAL (
            SELECT bin, cnt, cum_excl FROM cc
            WHERE cum_incl >= quel.q * mm.n
            ORDER BY bin LIMIT 1
        ) pick ON true
        WHERE mm.n > 0
        ORDER BY q
    """
