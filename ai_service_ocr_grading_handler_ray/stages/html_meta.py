"""HTML head-metadata extraction: title / canonical link / description.

The crawl-side metadata pass that runs BEFORE body extraction: titles
feed retrieval and dedup signatures, rel=canonical feeds URL
canonicalization (a page declaring a canonical target is a duplicate
candidate of it — compose with ``dedup.exact`` on
``coalesce(canonical, url)``), and meta descriptions feed snippet /
quality signals.

Scale shape: ONE shuffle-free ``map_batches`` scan; all three fields
come from compiled-regex ``pandas.str.extract`` kernels over the
decoded head (only the first ``head_cap`` bytes are decoded — real
pages bury megabytes of body under a tiny head).  The html column
never outlives its task.

Reference anchor: the reference parses document payloads for
downstream model routing (engine/core/llm_number_prediction.py); this
is the metadata sibling of that parse re-expressed as a vectorized
batch stage.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = ["extract_head_meta", "add_head_meta"]

# RE2-compatible (no lookarounds): both attribute orders, both quote
# styles; (?is) = case-insensitive, dot-matches-newline.
_TITLE_RE = re.compile(r"(?is)<title[^>]*>(.*?)</title>")
_CANON_RE = re.compile(
    r"(?is)<link[^>]+rel=[\"']?canonical[\"']?[^>]*href=[\"']([^\"']*)[\"']"
    r"|<link[^>]+href=[\"']([^\"']*)[\"'][^>]*rel=[\"']?canonical[\"']?"
)
_DESC_RE = re.compile(
    r"(?is)<meta[^>]+name=[\"']?description[\"']?[^>]*content=[\"']([^\"']*)[\"']"
    r"|<meta[^>]+content=[\"']([^\"']*)[\"'][^>]*name=[\"']?description[\"']?"
)


def _first_group(ex: pd.DataFrame) -> pd.Series:
    """Collapse an alternation's group columns to the first non-null
    (``where`` rather than ``fillna(Series)`` — the latter emits the
    pandas silent-downcasting FutureWarning on object dtype)."""
    out = ex[0]
    for c in ex.columns[1:]:
        out = out.where(out.notna(), ex[c])
    return out.where(out.notna(), "")


def add_head_meta(
    batch: pa.Table,
    *,
    html_col: str = "html",
    head_cap: int = 65536,
) -> pa.Table:
    """Append (title, canonical, description) — '' when absent (the
    SQL-friendly sentinel).  ``html_col`` may be binary (utf-8, errors
    replaced) or string; only the first ``head_cap`` characters are
    scanned."""
    col = batch[html_col]
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        texts = [
            (b or b"")[:head_cap].decode("utf-8", errors="replace")
            for b in col.to_pylist()
        ]
    else:
        texts = [(t or "")[:head_cap] for t in col.to_pylist()]
    s = pd.Series(texts, dtype=object)
    title = s.str.extract(_TITLE_RE, expand=True)[0].fillna("").str.strip()
    canon = _first_group(s.str.extract(_CANON_RE, expand=True))
    desc = _first_group(s.str.extract(_DESC_RE, expand=True))
    return (
        batch.append_column("title", pa.array(title.to_numpy(object), pa.string()))
        .append_column("canonical", pa.array(canon.to_numpy(object), pa.string()))
        .append_column(
            "description", pa.array(desc.to_numpy(object), pa.string())
        )
    )


def extract_head_meta(
    ds,
    *,
    html_col: str = "html",
    keep_cols: "list[str] | None" = None,
    head_cap: int = 65536,
):
    """Dataset wrapper: shuffle-free scan producing ``keep_cols`` +
    (title, canonical, description, has_canonical) — the html column is
    DROPPED on output so the wide payload never crosses a stage
    boundary."""

    def scan(t: pa.Table) -> pa.Table:
        out = add_head_meta(t, html_col=html_col, head_cap=head_cap)
        cols = keep_cols if keep_cols is not None else [
            c for c in t.column_names if c != html_col
        ]
        out = out.select(cols + ["title", "canonical", "description"])
        has = pa.compute.not_equal(out["canonical"], "")
        return out.append_column("has_canonical", has)

    return ds.map_batches(scan, batch_format="pyarrow")
