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
