"""2-D Pareto skyline (maximal non-dominated points), distributed.

The multi-criteria selection analytic (best quality-vs-length docs,
price-vs-discount offers): keep rows no other row dominates, where b
dominates a iff b >= a on both dimensions and b > a on at least one.
Equal points never dominate each other — duplicates of an undominated
point all survive (SQL NOT-EXISTS semantics).

Scale shape: the skyline operator is a *bounded-intermediate* reduce —
each block computes its LOCAL skyline with a vectorized two-window scan
(sort + shifted cummax, no Python loop), the union of local skylines is
a superset of the global one (dominance within a block already removes
everything a local point dominates), and one final identical scan over
that union finishes on the driver.  Candidate volume is
sum-of-local-skylines: tiny for correlated/duplicate-heavy dimensions
(the discount-style case), worst-case anti-correlated data approaches
the true skyline size — which IS the output, so the driver never holds
more than O(answer × blocks).

The per-scan kernel mirrors the SQL window replay exactly (see the
q161 oracle): ordered by (x DESC, y DESC), a point is dominated iff
   max(y) over preceding rows  > y      (some b: x>=, y>)
or max(x) over preceding same-y rows > x (some b: y==, x>).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["pareto_skyline", "skyline_mask"]


def skyline_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the maximal points of (x, y) — vectorized
    (two sorts, two shifted cummaxes)."""
    n = len(x)
    if n == 0:
        return np.zeros(0, dtype=bool)
    # dominance case 1 — some b with x >= and y strictly greater: in
    # (x desc, y desc) order every preceding row has x >=, so b exists
    # iff the running max of y over preceding rows exceeds y_i
    order = np.lexsort((-y, -x))
    ys = y[order]
    run_y = np.maximum.accumulate(ys)
    dom1_sorted = np.empty(n, dtype=bool)
    dom1_sorted[0] = False
    dom1_sorted[1:] = run_y[:-1] > ys[1:]
    dom1 = np.zeros(n, dtype=bool)
    dom1[order] = dom1_sorted
    # dominance case 2 — some b with the SAME y and x strictly greater:
    # x below the max x of the equal-y class (equal-y rows are NOT
    # adjacent in the case-1 sort, so this needs its own y-grouping)
    mx = pd.Series(x).groupby(pd.Series(y)).transform("max").to_numpy()
    dom2 = x < mx
    return ~(dom1 | dom2)


def pareto_skyline(
    ds: rd.Dataset,
    x_col: str,
    y_col: str,
    *,
    keep_cols: tuple[str, ...] = (),
) -> pd.DataFrame:
    """Global skyline of ``ds`` maximizing (x_col, y_col).  Returns the
    full surviving rows (x, y + keep_cols).  Nulls in either dimension
    are rejected (dominance is undefined on null)."""

    cols = [x_col, y_col, *keep_cols]

    def local(t: pa.Table) -> pa.Table:
        for c in (x_col, y_col):
            if t[c].null_count:
                raise ValueError(f"NULL in skyline dimension {c!r}")
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.select(cols).filter(pa.array(skyline_mask(x, y)))

    cand = ds.map_batches(local, batch_format="pyarrow", batch_size=65536)
    parts = [
        b
        for b in cand.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        return pd.DataFrame(columns=cols)
    merged = pa.concat_tables(parts)
    x = merged[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
    y = merged[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
    out = merged.filter(pa.array(skyline_mask(x, y))).to_pandas()
    return out.reset_index(drop=True)
