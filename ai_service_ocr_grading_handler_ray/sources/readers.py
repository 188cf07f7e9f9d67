"""Readers/sinks for the engine's tables (SURVEY.md §2.1).

Scale discipline: every reader takes ``columns`` (pruned at the read) and
an optional pyarrow filter expression (row-group pushdown); outputs go to
partitioned Parquet directories (never one giant file — resumable layout,
see state/manifest.py).
"""

from __future__ import annotations

import pyarrow.dataset as pads
import ray.data as rd


def read_pages(
    paths: str | list[str],
    *,
    columns: list[str] | None = None,
    filter_expr: "pads.Expression | None" = None,
    override_num_blocks: int | None = None,
) -> rd.Dataset:
    """Pages table reader with column pruning + predicate pushdown."""
    return rd.read_parquet(
        paths,
        columns=columns,
        filter=filter_expr,
        override_num_blocks=override_num_blocks,
    )


def read_events_json(paths: str | list[str]) -> rd.Dataset:
    """JSON-lines event reader (the reference's SQS-event analogue)."""
    return rd.read_json(paths)


def read_documents(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def write_partitioned(ds: rd.Dataset, out_dir: str, *, min_rows_per_file: int = 50_000) -> None:
    """Partitioned parquet sink: many part files, never one giant file."""
    ds.write_parquet(out_dir, min_rows_per_file=min_rows_per_file)


def write_hive_partitioned(
    ds: rd.Dataset, out_dir: str, partition_cols: list[str]
) -> None:
    """Hive-style partitioned sink (e.g. lang=en/...) — the layout that
    lets a 100 TB consumer prune whole directories at the read."""
    ds.write_parquet(out_dir, partition_cols=partition_cols)


def validate_schema(ds: rd.Dataset, expected, *, strict: bool = True) -> rd.Dataset:
    """Declared-schema gate (the engine's replacement for the reference's
    duck-typing): raises with a field-level diff instead of failing deep
    inside a kernel."""
    actual = ds.schema().base_schema
    exp_fields = {f.name: f.type for f in expected}
    act_fields = {f.name: f.type for f in actual}
    missing = sorted(set(exp_fields) - set(act_fields))
    extra = sorted(set(act_fields) - set(exp_fields))
    wrong = sorted(
        n for n in set(exp_fields) & set(act_fields) if exp_fields[n] != act_fields[n]
    )
    if missing or wrong or (strict and extra):
        raise ValueError(
            f"schema mismatch: missing={missing} wrong_type={wrong} extra={extra}"
        )
    return ds
