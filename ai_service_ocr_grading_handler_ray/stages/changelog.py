"""Changelog compaction — apply a CDC-style upsert/delete log to a base
snapshot (the Delta/Hudi "merge" step an incremental crawl store runs
between full recrawls: the base table is the last compacted snapshot,
the changelog is this cycle's fetches plus removal notices, and the
output is the new snapshot).

Semantics (replayed exactly by :func:`apply_changelog_sql` —
single-generator policy):

    base rows carry the sentinel seq = -1, op = 'base'
    winner(k) = the row of key k with the GREATEST seq
    output    = winner rows whose op != 'delete'
    last_seq  = the winner's seq (-1 ⇔ the base row survived untouched)

An upsert for a key absent from the base INSERTS it; a delete for an
absent key is a no-op.  Duplicate (key, seq) pairs within the log are a
contract violation (two writers raced) and raise loudly; ops outside
{'upsert', 'delete'} raise.  Log seq values must be >= 0 so the base
sentinel can never win against a real log entry.

Scale shape: tag + lazy ``union`` (no materialization), ONE key-hash
coarse cogroup (``add_key_partition`` → ``groupby(_part).map_groups``
— each key's base row and log entries co-locate, vectorized keep-max
inside), output streams from map_groups.  Nothing is driver-sized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .dedup import add_key_partition

BASE_SEQ = -1
OPS = ("upsert", "delete")


def apply_changelog(
    base_ds: rd.Dataset,
    log_ds: rd.Dataset,
    *,
    key_col: str = "url",
    seq_col: str = "seq",
    op_col: str = "op",
    value_cols: tuple = ("content_hash",),
    num_parts: int = 64,
) -> rd.Dataset:
    """Lazy compacted snapshot: ``(key, *value_cols, last_seq:int64)``.

    ``base_ds`` needs (key, *value_cols); ``log_ds`` needs
    (key, seq, op, *value_cols) — delete rows may carry arbitrary
    values in ``value_cols`` (they never surface).
    """
    vcols = list(value_cols)

    def tag_base(t: pa.Table) -> pa.Table:
        out = t.select([key_col] + vcols)
        out = out.append_column(
            seq_col, pa.array(np.full(t.num_rows, BASE_SEQ, dtype=np.int64))
        )
        return out.append_column(
            op_col, pa.array(["base"] * t.num_rows, type=pa.string())
        )

    def tag_log(t: pa.Table) -> pa.Table:
        seq = t[seq_col].cast(pa.int64())
        seq_np = seq.to_numpy(zero_copy_only=False)
        if len(seq_np) and (seq_np < 0).any():
            raise ValueError(
                "apply_changelog: log seq values must be >= 0 "
                f"(the base sentinel is {BASE_SEQ})"
            )
        ops = t[op_col].to_pylist()
        bad = next((o for o in ops if o not in OPS), None)
        if bad is not None:
            raise ValueError(
                f"apply_changelog: unknown op {bad!r} (expected one of {OPS})"
            )
        out = t.select([key_col] + vcols)
        out = out.append_column(seq_col, seq)
        return out.append_column(op_col, t[op_col].cast(pa.string()))

    both = base_ds.map_batches(tag_base, batch_format="pyarrow").union(
        log_ds.map_batches(tag_log, batch_format="pyarrow")
    )
    keyed = both.map_batches(
        lambda t: add_key_partition(t, key_col, num_parts=num_parts),
        batch_format="pyarrow",
    )

    def compact(g: pd.DataFrame) -> pd.DataFrame:
        log_rows = g[g[seq_col] >= 0]
        if log_rows.duplicated([key_col, seq_col]).any():
            dup = log_rows[log_rows.duplicated([key_col, seq_col])].iloc[0]
            raise ValueError(
                "apply_changelog: duplicate (key, seq) in the changelog "
                f"(e.g. {dup[key_col]!r} seq {int(dup[seq_col])}); two "
                "writers raced — dedup the log first"
            )
        win = (
            g.sort_values([key_col, seq_col], kind="mergesort")
            .drop_duplicates(key_col, keep="last")
        )
        win = win[win[op_col] != "delete"]
        out = win[[key_col] + vcols].copy()
        out["last_seq"] = win[seq_col].to_numpy(np.int64)
        return out.reset_index(drop=True)

    return keyed.groupby("_part").map_groups(compact, batch_format="pandas")


def apply_changelog_sql(
    *,
    base_table: str,
    log_table: str,
    key_col: str = "url",
    seq_col: str = "seq",
    op_col: str = "op",
    value_cols: tuple = ("content_hash",),
) -> str:
    """DuckDB replay of :func:`apply_changelog`, generated from the SAME
    parameters (single-generator policy): base rows enter at the seq
    sentinel, the winner per key is row_number() over seq DESC, delete
    winners drop."""
    vsel = ", ".join(value_cols)
    return f"""
        WITH all_rows AS (
          SELECT {key_col}, {vsel},
                 CAST({BASE_SEQ} AS BIGINT) AS seq, 'base' AS op
          FROM {base_table}
          UNION ALL
          SELECT {key_col}, {vsel}, CAST({seq_col} AS BIGINT) AS seq,
                 {op_col} AS op
          FROM {log_table}
        ),
        r AS (
          SELECT *, row_number() OVER (
                   PARTITION BY {key_col} ORDER BY seq DESC) AS rn
          FROM all_rows
        )
        SELECT {key_col}, {vsel}, seq AS last_seq
        FROM r WHERE rn = 1 AND op <> 'delete'
    """
