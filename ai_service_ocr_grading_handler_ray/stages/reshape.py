"""Wide↔long reshape: :func:`unpivot` (SQL UNPIVOT / pandas melt) —
the inverse of the q58 pivot.  Turns k measure columns into k rows of
(id columns…, metric:string, value:float64) per input row.

Scale shape: shuffle-free — each batch emits its own k-times-stacked
Arrow table (``pa.concat_tables`` of k column-renamed slices; the id
columns are repeated by zero-copy ``take``-free reuse, the metric name
is a dictionary-cheap constant column per slice).  Output is exactly
k× input rows and streams block by block; no driver state.

Reference parity: the reference flattens per-question rubric dicts
into per-criterion rows before scoring (utils.convert_rubric_to_string
iterates rubric items); ``unpivot`` is that widening-to-rows step for
numeric measure columns at Dataset scale.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def unpivot(
    ds: rd.Dataset,
    *,
    id_cols: list[str],
    value_cols: list[str],
    metric_col: str = "metric",
    value_col: str = "value",
) -> rd.Dataset:
    """Melt ``value_cols`` into (``metric_col``, ``value_col``) long
    rows, carrying ``id_cols`` through unchanged.  Every measure is
    cast to float64 (the SQL UNION ALL's common supertype); output row
    order within a batch is measure-major (all of metric 1, then
    metric 2, …) but the operator is order-free by contract."""
    if not value_cols:
        raise ValueError("unpivot: value_cols must be non-empty")
    overlap = {metric_col, value_col} & set(id_cols + value_cols)
    if overlap:
        raise ValueError(f"unpivot: output names collide with inputs: {overlap}")

    def melt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        slices = []
        for m in value_cols:
            cols = {c: t[c] for c in id_cols}
            # constant column without a num_rows-long Python list
            cols[metric_col] = pc.fill_null(
                pa.nulls(t.num_rows, pa.string()), m
            )
            cols[value_col] = t[m].cast(pa.float64())
            slices.append(pa.table(cols))
        return pa.concat_tables(slices)

    return ds.map_batches(melt, batch_format="pyarrow")


def unpivot_sql(
    *,
    table: str,
    id_cols: list[str],
    value_cols: list[str],
    metric_col: str = "metric",
    value_col: str = "value",
) -> str:
    """DuckDB replay of :func:`unpivot` (single-generator): a UNION ALL
    of one SELECT per measure column."""
    ids = ", ".join(id_cols)
    parts = [
        f"SELECT {ids}, '{m}' AS {metric_col}, "
        f"CAST({m} AS DOUBLE) AS {value_col} FROM {table}"
        for m in value_cols
    ]
    return " UNION ALL ".join(parts)
