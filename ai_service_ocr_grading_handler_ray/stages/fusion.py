"""Reciprocal-rank fusion of ranked retrieval lists.

The standard hybrid-retrieval combiner (Cormack et al. 2009): each
ranked list contributes 1/(rrf_k + rank) per document; documents
missing from a list contribute nothing from it.  Used to fuse lexical
(BM25) and dense/prior rankings without score calibration.

Scale shape: each input list is already a TOP-K result (k × blocks
partial top-k via ``selection.global_top_k`` — no global sort, no
shuffle); the fusion itself is a driver-side merge of k-sized frames.
The corpus is never ranked end-to-end — only the fused heads matter,
which is exactly the retrieval contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .selection import round_half_away

__all__ = ["rrf_fuse"]


def rrf_fuse(
    lists: "list[tuple[str, pd.DataFrame]]",
    *,
    id_col: str = "doc_id",
    rrf_k: int = 60,
) -> pd.DataFrame:
    """Fuse ranked lists [(name, df)] — each df ORDERED best-first with
    ``id_col`` present; rank = position + 1.  Output: one row per doc
    in any list, columns ``r_<name>`` (its 1-based rank, 0 when absent
    — the SQL-friendly sentinel) and ``rrf`` (sum over lists in the
    GIVEN order of 1/(rrf_k + rank), absent lists contributing 0.0 —
    fixed order so float addition matches the oracle), rounded to 6.
    """
    if not lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    names = [n for n, _ in lists]
    if len(set(names)) != len(names):
        raise ValueError("duplicate list names")
    merged: pd.DataFrame | None = None
    for name, df in lists:
        if df[id_col].duplicated().any():
            dup = df[id_col][df[id_col].duplicated()].iloc[0]
            raise ValueError(
                f"duplicate id {dup!r} in ranked list {name!r} — fused "
                "scores would silently double-count"
            )
        ranked = pd.DataFrame(
            {id_col: df[id_col].to_numpy(),
             f"r_{name}": np.arange(1, len(df) + 1, dtype=np.int64)}
        )
        merged = ranked if merged is None else merged.merge(
            ranked, on=id_col, how="outer"
        )
    rrf = np.zeros(len(merged), dtype=np.float64)
    for name, _ in lists:
        col = merged[f"r_{name}"].fillna(0).astype(np.int64)
        merged[f"r_{name}"] = col
        r = col.to_numpy(dtype=np.float64)
        rrf = rrf + np.where(r > 0, 1.0 / (rrf_k + r), 0.0)
    merged["rrf"] = round_half_away(rrf, 6)
    return merged.sort_values(id_col).reset_index(drop=True)
