"""Explicit bucketed hash join — the portable large-large join pattern
(ray_guide 'Joins and lookups'): add ``bucket = hash(key) % B`` to both
sides, co-group by bucket, join pairwise inside ``map_groups``.

``Dataset.join`` is the built-in path; this operator exists because the
bucketed formulation (a) works on any Ray version, (b) makes the
partitioning explicit and tunable (B, salt for hot keys), and (c) is the
shape the engine's other co-grouped operators (asof, compose) share.
Equivalence with Dataset.join is tested.

``skewed_inner_join`` adds the skew-aware plan (SURVEY.md §4): hot keys
(detected with the Misra-Gries sketch, or caller-supplied) join map-side
against a broadcast fragment of the right side, so no single reducer
receives a hot key's entire row set; cold keys take the bucketed path.

Dtype discipline mirrors stages/asof.py: union-widening inserts TYPED
nulls and integer columns are cast back after the pandas group
conversion (untyped nulls were the round-1 q47 hash-mismatch bug).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from .hashing import bucket_ids
from .collect import collect_tables


def bucketed_inner_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_key: str,
    right_key: str,
    n_buckets: int = 16,
    _schemas: tuple[pa.Schema, pa.Schema] | None = None,
) -> rd.Dataset:
    """Inner equi-join via explicit key-hash buckets.

    One shuffle per side (the bucket groupby); join work is per-bucket
    pandas merges.  Hot keys: use ``skewed_inner_join`` — the bucket
    column makes the skew visible and tunable instead of hidden inside a
    join operator.  ``_schemas`` lets callers that already know both
    sides' schemas skip the limit-1 schema probes (each one is a small
    Ray execution on a lazy dataset)."""
    if _schemas is not None:
        l_schema, r_schema = _schemas
    else:
        l_schema = left.schema().base_schema
        r_schema = right.schema().base_schema
    l_cols = [f.name for f in l_schema]
    r_cols = [f.name for f in r_schema]
    overlap = set(l_cols) & set(r_cols)
    if overlap:
        raise ValueError(f"rename overlapping columns first: {overlap}")
    types = {f.name: f.type for f in l_schema}
    types.update({f.name: f.type for f in r_schema})
    int_cols = [c for c in types if pa.types.is_integer(types[c])]

    def prep(side: int, key: str, all_cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            out = {
                c: (
                    t[c]
                    if c in t.column_names
                    else pa.nulls(len(t), type=types[c])
                )
                for c in all_cols
            }
            out["_bucket"] = pa.array(bucket_ids(t[key], n_buckets))
            out["_side"] = pa.array([side] * len(t), type=pa.int8())
            return pa.table(out)

        return fn

    all_cols = l_cols + r_cols
    lt = left.map_batches(prep(0, left_key, all_cols), batch_format="pyarrow")
    rt = right.map_batches(prep(1, right_key, all_cols), batch_format="pyarrow")

    out_cols = l_cols + [c for c in r_cols if c != right_key]

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0][l_cols]
        rg = g[g["_side"] == 1][r_cols]
        if lg.empty or rg.empty:
            return pd.DataFrame(columns=out_cols)
        # restore ints the union's cross-side nulls promoted to float64;
        # nullable Int64 tolerates sources whose own int columns carry
        # genuine nulls (a plain int64 astype would raise on NaN)
        for c in l_cols:
            if c in int_cols:
                lg = lg.astype({c: "Int64"})
        for c in r_cols:
            if c in int_cols:
                rg = rg.astype({c: "Int64"})
        merged = lg.merge(rg, left_on=left_key, right_on=right_key, how="inner")
        return merged.drop(columns=[right_key])

    return lt.union(rt).groupby("_bucket").map_groups(join_bucket, batch_format="pandas")


def skewed_inner_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_key: str,
    right_key: str,
    n_buckets: int = 16,
    hot_keys: set | None = None,
    hot_k: int = 16,
    broadcast_right_limit: int = 200_000,
) -> rd.Dataset:
    """Skew-aware inner equi-join.

    Plan selection, cheapest first:

    1. **Dimension-sized right** (≤ ``broadcast_right_limit`` rows): the
       whole right table broadcasts via ``ray.put`` and the join runs
       entirely map-side over ONE scan of the fact side.  Skew handling
       is moot here — there are no reducers to overload; a hot key only
       makes some map tasks emit more rows — so hot-key detection (a
       full scan of the fact side) is skipped entirely.
    2. **Large right**: hot left-side keys (Misra-Gries detected unless
       supplied) would land their entire row set on one bucket reducer;
       instead the right-side rows for those keys — ≤ hot_k keys —
       broadcast and hot left rows join map-side, while cold keys take
       the bucketed large-large hash join.

    The union of the plans equals a plain inner join (equivalence-tested,
    including the forced-bucketed branch via broadcast_right_limit=0)."""
    import pyarrow.compute as pc
    import ray

    from .sketches import heavy_hitters

    # right (the dimension side) is consumed more than once (count/collect
    # or hot-fragment + cold path) — materialize it.  left is the FACT
    # side: materializing it would pin/spill the full table in the object
    # store at scale, so each of its consumers re-executes the upstream —
    # recompute is the right trade at 10^12 rows (ADVICE r2)
    right = right.materialize()
    # probe both schemas exactly once (a lazy Dataset's schema() is a
    # limit-1 Ray execution) and reuse them for every downstream plan
    l_schema = left.schema().base_schema
    r_schema = right.schema().base_schema
    key_type = next(f.type for f in l_schema if f.name == left_key)

    out_fields = [pa.field(f.name, f.type) for f in l_schema] + [
        pa.field(f.name, f.type) for f in r_schema if f.name != right_key
    ]
    out_schema = pa.schema(out_fields)

    def map_side_join(frame_ref, want_hot, hot_set):
        """Map-side merge of one left scan against a broadcast right
        frame.  ``want_hot`` selects which half of the key space joins
        (None = no split: the whole batch joins)."""

        def fn(t: pa.Table) -> pa.Table:
            rf = ray.get(frame_ref)
            if want_hot is None:
                lg = t.to_pandas()
            else:
                hot = pc.fill_null(pc.is_in(t[left_key], value_set=hot_set), False)
                lg = t.filter(hot if want_hot else pc.invert(hot)).to_pandas()
            if rf is None or lg.empty:
                return out_schema.empty_table()
            # int columns with genuine nulls arrive as float64 — move them
            # to nullable Int64 so the cast back to int64 can't hit NaN
            for f in out_fields:
                if pa.types.is_integer(f.type):
                    for df in (lg, rf):
                        if f.name in df.columns and df[f.name].dtype.kind == "f":
                            df[f.name] = df[f.name].astype("Int64")
            merged = lg.merge(rf, left_on=left_key, right_on=right_key, how="inner")
            return pa.Table.from_pandas(
                merged.drop(columns=[right_key]), preserve_index=False
            ).cast(out_schema)

        return fn

    if right.count() <= broadcast_right_limit:
        # plan 1: broadcast the whole dimension, one fact scan, no
        # detection, no shuffle
        rblocks = [b for b in collect_tables(right, drop_empty=False) if b.num_rows]
        rtbl = (
            pa.concat_tables([b.cast(rblocks[0].schema) for b in rblocks])
            if rblocks
            else None
        )
        full_ref = ray.put(rtbl.to_pandas() if rtbl is not None else None)
        return left.map_batches(
            map_side_join(full_ref, None, None), batch_format="pyarrow"
        )

    if hot_keys is None:
        if not (
            pa.types.is_integer(key_type)
            or pa.types.is_string(key_type)
            or pa.types.is_large_string(key_type)
        ):
            # MG stringifies keys; for other types a silent coercion miss
            # would quietly disable the hot path — make the caller choose
            raise TypeError(
                f"hot-key auto-detection supports integer/string keys, got "
                f"{key_type}; pass hot_keys= explicitly"
            )
        # MG sketch stringifies keys (json-serialized counters) — coerce
        # back to the key column's type or membership tests never match
        detected = heavy_hitters(left.select_columns([left_key]), left_key, k=hot_k)
        hot_keys = {
            int(x) if pa.types.is_integer(key_type) else x for x in detected
        }
    hot_keys = set(hot_keys)
    if not hot_keys:
        return bucketed_inner_join(
            left, right, left_key=left_key, right_key=right_key,
            n_buckets=n_buckets, _schemas=(l_schema, r_schema),
        )
    # vectorized membership: one Arrow is_in kernel per batch instead of a
    # per-row Python `v in set` comprehension (VERDICT r2 #4)
    hot_set = pa.array(sorted(hot_keys), type=key_type)

    # broadcast fragment: right rows whose key is hot (collected —
    # bounded by hot_k dimension keys, independent of left's size)
    frag_blocks = collect_tables(
        right.map_batches(
            lambda t: t.filter(pc.is_in(t[right_key], value_set=hot_set)),
            batch_format="pyarrow",
        ), drop_empty=False)
    frag = pa.concat_tables([b for b in frag_blocks if b.num_rows]) if any(
        b.num_rows for b in frag_blocks
    ) else None
    frag_ref = ray.put(frag.to_pandas() if frag is not None else None)

    def keep_cold(key: str):
        def fn(t: pa.Table) -> pa.Table:
            hot = pc.fill_null(pc.is_in(t[key], value_set=hot_set), False)
            return t.filter(pc.invert(hot))

        return fn

    hot_part = left.map_batches(
        map_side_join(frag_ref, True, hot_set), batch_format="pyarrow"
    )
    cold = bucketed_inner_join(
        left.map_batches(keep_cold(left_key), batch_format="pyarrow"),
        right.map_batches(keep_cold(right_key), batch_format="pyarrow"),
        left_key=left_key,
        right_key=right_key,
        n_buckets=n_buckets,
        _schemas=(l_schema, r_schema),  # filters don't change the schemas
    )
    # the bucketed path emits pandas blocks (map_groups); normalize to
    # Arrow so the union is block-type homogeneous for downstream ops
    cold_arrow = cold.map_batches(lambda t: t, batch_format="pyarrow")
    return hot_part.union(cold_arrow)


def bucketed_outer_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_key: str,
    right_key: str,
    how: str = "left",
    n_buckets: int = 16,
    _schemas: tuple[pa.Schema, pa.Schema] | None = None,
) -> rd.Dataset:
    """LEFT / RIGHT / FULL outer equi-join via the same explicit
    key-hash bucket plan as ``bucketed_inner_join`` (one shuffle per
    side, per-bucket pandas merges) — dangling rows survive with TYPED
    nulls on the other side's columns.

    The output carries ONE key column (``left_key``), coalesced across
    sides for ``full`` joins (SQL's ``coalesce(l.key, r.key)``
    convention); ``right_key`` is dropped.  Integer columns come back
    as nullable Int64 (dangling rows are genuine nulls) — coalesce to
    sentinels downstream if a non-null schema is required."""
    if how not in ("left", "right", "full"):
        raise ValueError(f"how must be left/right/full, got {how!r}")
    if _schemas is not None:
        l_schema, r_schema = _schemas
    else:
        l_schema = left.schema().base_schema
        r_schema = right.schema().base_schema
    l_cols = [f.name for f in l_schema]
    r_cols = [f.name for f in r_schema]
    overlap = set(l_cols) & set(r_cols)
    if overlap:
        raise ValueError(f"rename overlapping columns first: {overlap}")
    types = {f.name: f.type for f in l_schema}
    types.update({f.name: f.type for f in r_schema})
    int_cols = [c for c in types if pa.types.is_integer(types[c])]

    def prep(side: int, key: str, all_cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            out = {
                c: (
                    t[c]
                    if c in t.column_names
                    else pa.nulls(len(t), type=types[c])
                )
                for c in all_cols
            }
            out["_bucket"] = pa.array(bucket_ids(t[key], n_buckets))
            out["_side"] = pa.array([side] * len(t), type=pa.int8())
            return pa.table(out)

        return fn

    all_cols = l_cols + r_cols
    lt = left.map_batches(prep(0, left_key, all_cols), batch_format="pyarrow")
    rt = right.map_batches(prep(1, right_key, all_cols), batch_format="pyarrow")
    out_cols = l_cols + [c for c in r_cols if c != right_key]
    pandas_how = {"left": "left", "right": "right", "full": "outer"}[how]

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["_side"] == 0][l_cols]
        rg = g[g["_side"] == 1][r_cols]
        if lg.empty and rg.empty:
            return pd.DataFrame(columns=out_cols)
        for c in l_cols:
            if c in int_cols:
                lg = lg.astype({c: "Int64"})
        for c in r_cols:
            if c in int_cols:
                rg = rg.astype({c: "Int64"})
        merged = lg.merge(rg, left_on=left_key, right_on=right_key, how=pandas_how)
        if how in ("right", "full"):
            # unify the key: right-only rows carry it in right_key
            merged[left_key] = merged[left_key].where(
                merged[left_key].notna(), merged[right_key]
            )
        return merged.drop(columns=[right_key])[out_cols]

    return lt.union(rt).groupby("_bucket").map_groups(join_bucket, batch_format="pandas")
