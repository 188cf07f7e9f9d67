"""KWIC (keyword-in-context) snippet extraction — the search-result /
concordance view over a document corpus: for every document containing
a term, the term's FIRST occurrence with ±``context`` codepoints of
surrounding text.

Semantics are codepoint-exact against SQL (DuckDB ``strpos`` /
``substr`` count characters, as does Python slicing): ``pos`` is the
1-based codepoint position of the first case-sensitive occurrence;
the snippet spans ``[max(1, pos - context), pos + len(term) - 1 +
context]`` clamped to the text.

Scale shape: one shuffle-free scan.  The SEARCH is vectorized
(``pandas.str.find`` — one C pass per batch); only MATCHED rows pay a
per-row Python slice, each O(snippet) — total extra work is
(match count × snippet length), selectivity-bounded, never
corpus-text-sized.  Output: (id, pos:int64, snippet:string), one row
per matching document, streaming.

Reference parity: the reference surfaces matched answer spans with
surrounding context for reviewer display (utils.find_data_in_string
returns the matched region); this is that span-with-context extraction
as a Dataset operator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def kwic_snippets(
    ds: rd.Dataset,
    *,
    term: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    context: int = 40,
) -> rd.Dataset:
    """First-occurrence keyword-in-context rows (see module docstring).
    ``term`` is matched case-sensitively and must be non-empty."""
    if not term:
        raise ValueError("kwic_snippets: term must be non-empty")
    if context < 0:
        raise ValueError("kwic_snippets: context must be >= 0")
    tlen = len(term)

    def scan(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pandas()
        # NULL texts: str.find yields NaN (and floats the whole array) —
        # treat as no-match, exactly like SQL strpos(NULL) > 0
        pos0 = (
            texts.str.find(term).fillna(-1).to_numpy().astype(np.int64)
        )
        hit = pos0 >= 0
        if not hit.any():
            return pa.table(
                {
                    "id": pa.array([], type=t[id_col].type),
                    "pos": pa.array([], type=pa.int64()),
                    "snippet": pa.array([], type=pa.string()),
                }
            )
        idx = np.flatnonzero(hit)
        starts = np.maximum(pos0[idx] - context, 0)
        stops = pos0[idx] + tlen + context
        snippets = [
            s[a:b] for s, a, b in zip(texts.iloc[idx], starts, stops)
        ]
        return pa.table(
            {
                "id": t[id_col].take(pa.array(idx, type=pa.int64())),
                "pos": pa.array((pos0[idx] + 1).astype(np.int64)),
                "snippet": pa.array(snippets, type=pa.string()),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow")


def kwic_sql(
    *,
    term: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    context: int = 40,
) -> str:
    """DuckDB replay of :func:`kwic_snippets` (single-generator).
    ``strpos``/``substr`` are codepoint-based, matching the engine's
    Python-string slicing; the quote-escaped term interpolates once."""
    esc = term.replace("'", "''")
    return f"""
        WITH hits AS (
            SELECT {id_col} AS id, {text_col} AS txt,
                   strpos({text_col}, '{esc}') AS pos
            FROM {table}
            WHERE strpos({text_col}, '{esc}') > 0
        )
        SELECT id, CAST(pos AS BIGINT) AS pos,
               substr(txt, greatest(1, pos - {context}),
                      pos + {len(term)} + {context}
                          - greatest(1, pos - {context})) AS snippet
        FROM hits
    """
