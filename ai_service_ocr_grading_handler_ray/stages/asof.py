"""As-of (backward temporal) join — composition of union-tag + groupby +
per-group ``pd.merge_asof`` (ray_guide 'As-of / range join' pattern).

The reference has no temporal joins (SURVEY.md §2.4); the engine ships
one because event-to-dimension-as-of lookups are a standard step in
training-data pipelines (e.g. latest snapshot ≤ crawl time).

Partitioning assumption (documented per the guide): both sides hash-group
on the join key — one shuffle each; within a group pandas sorts by
timestamp.  Right-side timestamp ties must be resolved by the caller
(pre-aggregate to one row per (key, ts)) for deterministic output.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd


def asof_join_backward(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
) -> rd.Dataset:
    """For every left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` for the same ``key`` (left join: no match →
    nulls).  Columns of both sides are preserved (right's ts column
    included)."""
    l_cols = [f.name for f in left.schema().base_schema]
    r_cols = [f.name for f in right.schema().base_schema]
    overlap = (set(l_cols) & set(r_cols)) - {key}
    if overlap:
        raise ValueError(f"rename overlapping columns first: {overlap}")

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column("_side", pa.array([side] * len(t), type=pa.int8()))

        return fn

    # union with schema superset (missing columns → null)
    def widen(cols_all: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            arrays, names = [], []
            for c in cols_all:
                names.append(c)
                if c in t.column_names:
                    arrays.append(t[c])
                else:
                    arrays.append(pa.nulls(len(t)))
            return pa.table(dict(zip(names, arrays)))

        return fn

    all_cols = l_cols + [c for c in r_cols if c != key] + ["_side"]
    lt = left.map_batches(tag(0), batch_format="pyarrow").map_batches(
        widen(all_cols), batch_format="pyarrow"
    )
    rt = right.map_batches(tag(1), batch_format="pyarrow").map_batches(
        widen(all_cols), batch_format="pyarrow"
    )

    r_payload = [c for c in r_cols if c != key]

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0].copy()
        rg = g[g["_side"] == 1].copy()
        if lg.empty:
            return lg.drop(columns=["_side"] + r_payload, errors="ignore").iloc[0:0]
        lg[left_ts] = lg[left_ts].astype("datetime64[us]")
        lg = lg.sort_values(left_ts, kind="mergesort").drop(columns=["_side"] + r_payload)
        if rg.empty:
            for c in r_payload:
                lg[c] = None
            return lg
        rg = rg[[key] + r_payload].copy()
        rg[right_ts] = pd.to_datetime(rg[right_ts]).astype("datetime64[us]")
        rg = rg.sort_values(right_ts, kind="mergesort")
        merged = pd.merge_asof(
            lg,
            rg.drop(columns=[key]),
            left_on=left_ts,
            right_on=right_ts,
            direction="backward",
        )
        return merged

    return lt.union(rt).groupby(key).map_groups(per_key, batch_format="pandas")
