"""Hierarchical ROLLUP aggregates (GROUPING SETS along a key prefix).

OLAP-cube rollups (corpus composition dashboards: per (lang, source),
per lang, grand total) computed with ONE shuffle: the distributed
engine aggregates only the FINEST level (map-side Arrow partials →
one small groupby), and every coarser level is derived by
re-aggregating the fine table — exact for sums/counts, and the fine
table is |key-combination|-sized, so the driver fold is bounded by
group cardinality, never row count.

Reference anchor: the reference's checkpoint rollup counts records per
(status) and overall (service_handler.py:103-139 processed/error
tally); this is the general n-level form.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

__all__ = ["rollup_aggregate", "cube_aggregate"]


def _fine_table(
    ds: rd.Dataset,
    keys: list[str],
    sum_cols: list[str],
    count_col: str,
    sentinel: str,
) -> pd.DataFrame:
    """Finest-level exact aggregate: map-side Arrow partials → ONE small
    groupby.  |key-combination|-sized; the only shuffle either rollup or
    cube performs."""

    def partial(t: pa.Table) -> pa.Table:
        for k in keys:
            if t[k].null_count:
                raise ValueError(f"NULL in grouping key {k!r} collides with sentinel")
        g = t.group_by(keys).aggregate(
            [(c, "sum") for c in sum_cols] + [(keys[0], "count")]
        )
        return g.rename_columns(keys + [f"{c}_sum" for c in sum_cols] + ["_n"])

    fine = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(keys)
        .aggregate(
            *(
                [Sum(f"{c}_sum", alias_name=f"{c}_sum") for c in sum_cols]
                + [Sum("_n", alias_name=count_col)]
            )
        )
        .to_pandas()
    )
    if fine.empty:
        # SQL ROLLUP/CUBE on an empty table still emits the () grouping
        # set with NULL sums — a shape the int-typed pandas fold can't
        # mirror; fail loudly instead of silently diverging from the
        # oracle on an empty/fully-filtered corpus.
        raise ValueError("rollup/cube over an empty dataset")
    return fine


def cube_aggregate(
    ds: rd.Dataset,
    keys: list[str],
    sum_cols: list[str],
    *,
    sentinel: str = "ALL",
    count_col: str = "n_rows",
) -> pd.DataFrame:
    """CUBE(keys): one row per group for EVERY subset of ``keys`` (all
    2^k grouping sets), rolled-up key columns carrying ``sentinel`` —
    matching SQL ``GROUP BY CUBE`` with ``coalesce(key, sentinel)``.

    Scale shape: identical to :func:`rollup_aggregate` — the cluster
    aggregates only the finest level (ONE shuffle, group-cardinality
    rows); every one of the 2^k − 1 coarser grouping sets re-aggregates
    the fine table on the driver (exact for int sums/counts, bounded by
    group cardinality × 2^k, never row count).  ``keys`` is small by
    construction (OLAP dimensions), so 2^k is a constant."""
    if len(keys) > 8:
        raise ValueError("cube_aggregate supports at most 8 keys (2^k grouping sets)")
    fine = _fine_table(ds, keys, sum_cols, count_col, sentinel)
    vals = [f"{c}_sum" for c in sum_cols] + [count_col]
    levels: list[pd.DataFrame] = []
    for mask in range(1 << len(keys)):
        kept = [k for i, k in enumerate(keys) if mask & (1 << i)]
        if kept == keys:
            levels.append(fine.copy())
            continue
        lvl = (
            fine.groupby(kept, as_index=False)[vals].sum()
            if kept
            else fine[vals].sum().to_frame().T
        )
        for k in keys:
            if k not in kept:
                lvl[k] = sentinel
        levels.append(lvl[keys + vals])
    out = pd.concat(levels, ignore_index=True)
    out[count_col] = out[count_col].astype("int64")
    for c in sum_cols:
        col = f"{c}_sum"
        if pd.api.types.is_integer_dtype(fine[col]):
            out[col] = out[col].astype("int64")
    return out.reset_index(drop=True)


def rollup_aggregate(
    ds: rd.Dataset,
    keys: list[str],
    sum_cols: list[str],
    *,
    sentinel: str = "ALL",
    count_col: str = "n_rows",
) -> pd.DataFrame:
    """ROLLUP(keys): one row per group at every prefix level of ``keys``
    (full detail → grand total), with ``count_col`` = row count and a
    sum per ``sum_cols`` entry.  Rolled-up key columns carry
    ``sentinel`` — matching SQL ``GROUP BY ROLLUP`` with
    ``coalesce(key, sentinel)`` (requires no real NULL keys; raises if
    any).  Sums must be integers or rounding-stable floats: coarser
    levels re-aggregate the fine table, which for int sums is exact."""

    fine = _fine_table(ds, keys, sum_cols, count_col, sentinel)
    levels = [fine.copy()]
    cur = fine
    for depth in range(len(keys) - 1, -1, -1):
        cur = (
            cur.groupby(keys[:depth], as_index=False)[
                [f"{c}_sum" for c in sum_cols] + [count_col]
            ].sum()
            if depth
            else cur[[f"{c}_sum" for c in sum_cols] + [count_col]]
            .sum()
            .to_frame()
            .T
        )
        lvl = cur.copy()
        for k in keys[depth:]:
            lvl[k] = sentinel
        levels.append(lvl[keys + [f"{c}_sum" for c in sum_cols] + [count_col]])
    out = pd.concat(levels, ignore_index=True)
    out[count_col] = out[count_col].astype("int64")
    for c in sum_cols:
        col = f"{c}_sum"
        if pd.api.types.is_integer_dtype(fine[col]):
            out[col] = out[col].astype("int64")
    return out.reset_index(drop=True)
