"""Explicit bucketed hash join — the portable large-large join pattern
(ray_guide 'Joins and lookups'): add ``bucket = hash(key) % B`` to both
sides, co-group by bucket, join pairwise inside ``map_groups``.

``Dataset.join`` (used in q03) is the built-in path; this operator exists
because the bucketed formulation (a) works on any Ray version, (b) makes
the partitioning explicit and tunable (B, salt for hot keys), and (c) is
the shape the engine's other co-grouped operators (asof, compose) share.
Equivalence with Dataset.join is tested.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import ray.data as rd


def _bucket_of(v, n_buckets: int) -> int:
    return (
        int.from_bytes(hashlib.blake2b(str(v).encode(), digest_size=4).digest(), "big")
        % n_buckets
    )


def bucketed_inner_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_key: str,
    right_key: str,
    n_buckets: int = 16,
) -> rd.Dataset:
    """Inner equi-join via explicit key-hash buckets.

    One shuffle per side (the bucket groupby); join work is per-bucket
    pandas merges.  Hot keys: raise ``n_buckets`` or salt upstream
    (stages/skew.py) — the bucket column makes the skew visible and
    tunable instead of hidden inside a join operator."""
    l_cols = [f.name for f in left.schema().base_schema]
    r_cols = [f.name for f in right.schema().base_schema]
    overlap = set(l_cols) & set(r_cols)
    if overlap:
        raise ValueError(f"rename overlapping columns first: {overlap}")

    def prep(side: int, key: str, all_cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            buckets = [ _bucket_of(v, n_buckets) for v in t[key].to_pylist() ]
            out = {c: (t[c] if c in t.column_names else pa.nulls(len(t))) for c in all_cols}
            out["_bucket"] = pa.array(buckets, type=pa.int32())
            out["_side"] = pa.array([side] * len(t), type=pa.int8())
            return pa.table(out)

        return fn

    all_cols = l_cols + r_cols
    lt = left.map_batches(prep(0, left_key, all_cols), batch_format="pyarrow")
    rt = right.map_batches(prep(1, right_key, all_cols), batch_format="pyarrow")

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0][l_cols]
        rg = g[g["_side"] == 1][r_cols]
        if lg.empty or rg.empty:
            return pd.DataFrame(columns=l_cols + [c for c in r_cols if c != right_key])
        merged = lg.merge(rg, left_on=left_key, right_on=right_key, how="inner")
        return merged.drop(columns=[right_key])

    return lt.union(rt).groupby("_bucket").map_groups(join_bucket, batch_format="pandas")
