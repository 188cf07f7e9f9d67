"""Registrable-domain extraction (public-suffix-list-lite).

Host-level grouping is the wrong granularity for many web-corpus
operations: ``shop.megacorp.co.uk`` and ``blog.megacorp.co.uk`` are one
site owner and should share a dedup scope, a politeness budget and a
train/test split side.  The registrable domain (eTLD+1) is the standard
key.  The real Public Suffix List is a ~10k-entry moving target; this
module implements the deterministic CORE RULE over a pinned two-level
suffix table (the same simplification CCNet-era pipelines shipped):

    registrable(host) = last 3 labels if host ends in a listed
                        two-level suffix, else last 2 labels,
                        else host itself (too few labels / empty)

The table is a module constant and the DuckDB oracle CASE is GENERATED
from it (:func:`registrable_domain_sql` — single-generator policy), so
engine and oracle cannot desync; swapping in the full PSL is a data
change, not a code change.  The kernel is one pandas vectorized
``str.endswith`` per suffix + two anchored regex extracts — no per-row
Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# Pinned two-level public suffixes (exercised by tests and the q147
# fixture; extend freely — the SQL generator follows automatically).
TWO_LEVEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)

_LAST2 = r"([^.]+\.[^.]+)$"
_LAST3 = r"([^.]+\.[^.]+\.[^.]+)$"


def registrable_domains(hosts) -> pa.Array:
    """Vectorized eTLD+1 per host (see module rule).  Accepts an Arrow
    string array / ChunkedArray / pandas Series / list; nulls → ""."""
    if isinstance(hosts, (pa.Array, pa.ChunkedArray)):
        s = hosts.to_pandas().astype(object)
    else:
        s = pd.Series(list(hosts), dtype=object)
    s = s.fillna("").astype(str)
    two = np.zeros(len(s), dtype=bool)
    for suf in TWO_LEVEL_SUFFIXES:
        two |= s.str.endswith("." + suf).to_numpy()
    last3 = s.str.extract(_LAST3, expand=False)
    last2 = s.str.extract(_LAST2, expand=False)
    out = np.where(two, last3.to_numpy(dtype=object),
                   last2.to_numpy(dtype=object))
    # too few labels (no dot / single label / bare suffix) → host itself
    out = np.where(pd.isna(out), s.to_numpy(dtype=object), out)
    return pa.array(out, type=pa.string())


def add_registrable_domain(
    batch: pa.Table, host_col: str = "host", out: str = "domain"
) -> pa.Table:
    """map_batches kernel: append the registrable-domain column."""
    return batch.append_column(out, registrable_domains(batch[host_col]))


def registrable_domain_sql(col: str) -> str:
    """SQL expression replaying :func:`registrable_domains` over ``col``,
    generated from TWO_LEVEL_SUFFIXES (single-generator policy)."""
    two = " OR ".join(
        f"{col} LIKE '%.{suf}'" for suf in TWO_LEVEL_SUFFIXES
    )
    # DuckDB regexp_extract returns '' (not NULL) on no match — both
    # branches need NULLIF so the host-itself fallback actually fires
    # (e.g. '.co.uk': empty first label fails the last-3 regex)
    return (
        f"CASE WHEN {two} THEN"
        f" COALESCE(NULLIF(regexp_extract({col}, '{_LAST3}', 1), ''),"
        f" {col})"
        f" ELSE COALESCE(NULLIF(regexp_extract({col}, '{_LAST2}', 1), ''),"
        f" {col}) END"
    )
