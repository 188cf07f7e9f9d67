"""As-of (backward temporal) join — union-tag + hash-bucket groupby +
per-bucket vectorized ``pd.merge_asof(by=key)`` (ray_guide 'As-of / range
join' pattern).

The reference has no temporal joins (SURVEY.md §2.4); the engine ships
one because event-to-dimension-as-of lookups are a standard step in
training-data pipelines (e.g. latest snapshot ≤ crawl time).

Partitioning assumption (documented per the guide): both sides hash-group
on ``hash(key) % num_buckets`` — one shuffle each; within a bucket pandas
sorts by timestamp once and ``merge_asof(by=key)`` handles every key in
the bucket in a single vectorized call (orders of magnitude fewer group
invocations than per-key grouping when keys are small).  Right-side
timestamp ties must be resolved by the caller (pre-aggregate to one row
per (key, ts)) for deterministic output.

Dtype discipline: the union-widen step inserts *typed* nulls taken from
each side's schema, and integer columns are cast back after the pandas
group conversion (pandas promotes int columns with nulls to float64 —
the q47 driver-hash bug in round 1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .hashing import bucket_ids


def asof_join_backward(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    key: str,
    left_ts: str,
    right_ts: str,
    num_buckets: int = 32,
    direction: str = "backward",
    right_tiebreak: list[str] | None = None,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> rd.Dataset:
    """For every left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` for the same ``key`` (left join: no match →
    nulls).  Columns of both sides are preserved (right's ts column
    included).  ``direction`` widens the operator to the full merge_asof
    family: "backward" (default), "forward" (smallest right_ts ≥
    left_ts) and "nearest" — the partitioning plan is identical, only
    the per-bucket vectorized merge changes.

    ``right_tiebreak``: columns resolving duplicate (key, right_ts) rows
    deterministically — the row with the LARGEST tiebreak tuple wins
    (per-bucket sort by [right_ts, *tiebreak]; merge_asof takes the last
    eligible row).  This replaces a whole pre-aggregate shuffle of the
    right side (groupby(key, ts).max(...)) with an in-bucket sort the
    merge needs anyway — at 10^12-row scale that is one fewer all-to-all
    exchange.  Without it, duplicate (key, ts) right rows are resolved
    arbitrarily (block order is nondeterministic under parallel
    execution); callers needing byte-stable output must pass a tiebreak
    that (with key and ts) uniquely determines the payload row."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction {direction!r}")
    tiebreak = list(right_tiebreak or [])
    # schema() on a lazy Dataset is a limit-1 Ray execution of the whole
    # upstream chain — callers that already know their schemas (they
    # built the projection) pass them and skip two executions
    l_schema = left_schema or left.schema().base_schema
    r_schema = right_schema or right.schema().base_schema
    l_cols = [f.name for f in l_schema]
    r_cols = [f.name for f in r_schema]
    overlap = (set(l_cols) & set(r_cols)) - {key}
    if overlap:
        raise ValueError(f"rename overlapping columns first: {overlap}")
    missing = [c for c in tiebreak if c not in r_cols]
    if missing:
        raise ValueError(f"right_tiebreak columns not on right side: {missing}")

    # column -> Arrow type for typed null-widening (left wins on the key)
    types: dict[str, pa.DataType] = {f.name: f.type for f in r_schema}
    types.update({f.name: f.type for f in l_schema})

    r_payload = [c for c in r_cols if c != key]
    all_cols = l_cols + r_payload + ["_side"]
    types["_side"] = pa.int8()

    def prep(side: int):
        def fn(t: pa.Table) -> pa.Table:
            cols: dict[str, pa.Array | pa.ChunkedArray] = {}
            for c in all_cols:
                if c == "_side":
                    cols[c] = pa.array(np.full(len(t), side, dtype=np.int8))
                elif c in t.column_names:
                    cols[c] = t[c]
                else:
                    cols[c] = pa.nulls(len(t), type=types[c])
            out = pa.table(cols)
            if out[key].null_count:
                # merge_asof(by=key) semantics on null keys are undefined
                # (a null would otherwise hash to the sentinel bucket and
                # "match" other nulls) — reject explicitly
                raise ValueError(
                    f"asof_join_backward: null values in key column {key!r}; "
                    "filter or fill null keys upstream"
                )
            # vectorized + deterministic across worker processes (builtin
            # hash() is PYTHONHASHSEED-randomized per process, which would
            # scatter one key across buckets and silently drop matches)
            kb = bucket_ids(out[key], num_buckets)
            return out.append_column("_kb", pa.array(kb))

        return fn

    lt = left.map_batches(prep(0), batch_format="pyarrow")
    rt = right.map_batches(prep(1), batch_format="pyarrow")

    # post-merge integer restoration: left cols are never null after the
    # side split (plain int64); right payload may miss → nullable Int64
    l_int = [c for c in l_cols if pa.types.is_integer(types[c])]
    r_int = [c for c in r_payload if pa.types.is_integer(types[c])]
    out_cols = l_cols + r_payload

    def _typed_empty() -> pd.DataFrame:
        cols: dict[str, pd.Series] = {}
        for c in out_cols:
            t = types[c]
            if pa.types.is_integer(t):
                cols[c] = pd.Series(dtype="int64")
            elif pa.types.is_floating(t):
                cols[c] = pd.Series(dtype="float64")
            elif pa.types.is_timestamp(t) or pa.types.is_date(t):
                cols[c] = pd.Series(dtype="datetime64[us]")
            else:
                cols[c] = pd.Series(dtype="object")
        return pd.DataFrame(cols)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0].drop(columns=["_side", "_kb"] + r_payload)
        if lg.empty:
            return _typed_empty()
        for c in l_int:
            lg[c] = lg[c].astype("int64")
        lg[left_ts] = lg[left_ts].astype("datetime64[us]")
        lg = lg.sort_values(left_ts, kind="mergesort")
        rg = g[g["_side"] == 1]
        if rg.empty:
            # all-null right payload, dtyped identically to the merge branch
            for c in r_payload:
                t = types[c]
                if pa.types.is_integer(t):
                    lg[c] = pd.array([pd.NA] * len(lg), dtype="Int64")
                elif pa.types.is_floating(t):
                    lg[c] = np.nan
                elif pa.types.is_timestamp(t) or pa.types.is_date(t):
                    lg[c] = pd.Series(
                        pd.NaT, index=lg.index, dtype="datetime64[us]"
                    )
                else:
                    lg[c] = None
            return lg
        rg = rg[[key] + r_payload].copy()
        for c in r_int:
            rg[c] = rg[c].astype("int64")
        rg[key] = rg[key].astype(lg[key].dtype)
        rg[right_ts] = pd.to_datetime(rg[right_ts]).astype("datetime64[us]")
        if tiebreak:
            # largest tiebreak wins: backward/nearest take the LAST
            # eligible row (tiebreak ascending); forward takes the FIRST
            # row with ts >= left_ts (tiebreak descending) — right_ts
            # stays monotonic either way, which merge_asof requires
            asc = [True] + [direction != "forward"] * len(tiebreak)
            rg = rg.sort_values([right_ts] + tiebreak, ascending=asc, kind="mergesort")
        else:
            rg = rg.sort_values(right_ts, kind="mergesort")
        merged = pd.merge_asof(
            lg,
            rg,
            left_on=left_ts,
            right_on=right_ts,
            by=key,
            direction=direction,
        )
        for c in r_int:
            merged[c] = merged[c].astype("Int64")
        return merged

    return lt.union(rt).groupby("_kb").map_groups(per_bucket, batch_format="pandas")
