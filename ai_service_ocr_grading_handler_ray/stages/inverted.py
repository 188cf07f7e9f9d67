"""Inverted-index construction over a Ray Data corpus.

The core retrieval artifact (term → sorted posting list of doc ids) as
a distributed build — the indexing sibling of stages/bm25.py's scoring
pass (which ranks against a FIXED query set and never materializes
postings).  Tokenization is the q90 convention
(``string_split(text, ' ')`` == ``text_analysis.batch_words``), so the
whole build is SQL-replayable and the oracle is GENERATED from the same
parameters (:func:`inverted_index_sql`, single-generator policy).

Scale design (10^12 docs):

- **Map side emits the index's own content, nothing more**: each batch
  reduces to DISTINCT ``(term, doc)`` pairs via one ``pd.factorize`` +
  packed-key ``np.unique`` (a doc lives in exactly one batch, so
  within-batch dedup IS global dedup).  Text never outlives its task.
- **Stopword postings never materialize**: with ``max_df`` set, a
  vocab-sized df pre-count (per-batch partials → one groupby) finds the
  above-threshold terms — FEW by Zipf — and their pairs drop via a
  broadcast exact set BEFORE the posting groupby, so no single reduce
  task ever holds a corpus-sized posting list for "the".  The pairs
  Dataset is checkpointed (``materialize``) because the df pass and the
  posting pass both consume it; it is two slim columns — the same
  double-consumption tradeoff bm25's profile checkpoint documents.
- **Reduce side**: ONE term-hash groupby; postings emit as the
  canonical ascending comma-joined string (directly comparable to SQL
  ``string_agg(... ORDER BY ...)``, and a stable on-disk format).

Reference scope: the reference repo (LLM grading handler) has no
retrieval operator; the index build belongs to the engine's
LLM-curation battery (dedup forensics, term-level corpus audits,
retrieval-augmented filtering).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .text_analysis import batch_words


def distinct_term_doc_pairs(
    t: pa.Table, *, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Batch kernel: DISTINCT (term, id) pairs, empty tokens dropped.
    One factorize + one packed-key ``np.unique`` — no per-row Python."""
    texts = t[text_col].to_pylist()
    ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    words, lens = batch_words(texts)
    if not len(words):
        return pa.table(
            {"term": pa.array([], type=pa.string()),
             id_col: pa.array([], type=pa.int64())}
        )
    codes, uniq = pd.factorize(words)
    nw = len(uniq)
    doc = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    uk = np.unique(doc * nw + codes)
    d, c = uk // nw, uk % nw
    terms = np.asarray(uniq, dtype=object)[c]
    keep = terms != ""
    return pa.table(
        {
            "term": pa.array(terms[keep], type=pa.string()),
            id_col: pa.array(ids[d[keep]], type=pa.int64()),
        }
    )


def inverted_index(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df: int | None = None,
) -> rd.Dataset:
    """Build the inverted index: a Dataset of
    ``(term:string, df:int64, postings:string)`` with postings the
    ascending comma-joined doc ids.  ``min_df``/``max_df`` bound posting
    length the way real indexers do (hapaxes below, stopwords above);
    with ``max_df`` the above-threshold terms are pre-dropped BEFORE the
    posting groupby (see module docstring) — without it a stopword's
    group is corpus-sized, which is only safe at bounded corpus sizes."""
    pairs = ds.map_batches(
        lambda t: distinct_term_doc_pairs(t, text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
    )
    if max_df is not None:
        pairs = pairs.materialize()  # df pass + posting pass both consume

        def df_partial(t: pa.Table) -> pa.Table:
            u, c = np.unique(
                t["term"].to_numpy(zero_copy_only=False), return_counts=True
            )
            return pa.table(
                {"term": pa.array(u, type=pa.string()),
                 "n": pa.array(c.astype(np.int64))}
            )

        from .collect import collect_table

        cap = int(max_df)

        def keep_hot(t: pa.Table) -> pa.Table:
            n = t["sum(n)"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(n > cap)).select(["term"])

        hot_tbl = collect_table(
            pairs.map_batches(df_partial, batch_format="pyarrow")
            .groupby("term")
            .sum("n")
            .map_batches(keep_hot, batch_format="pyarrow")
        )
        hot = set(hot_tbl["term"].to_pylist()) if hot_tbl.num_rows else set()
        if hot:
            import pyarrow.compute as pc

            hot_ref = ray.put(pa.array(sorted(hot), type=pa.string()))

            def drop_hot(t: pa.Table) -> pa.Table:
                h = ray.get(hot_ref)
                return t.filter(
                    pc.invert(pc.is_in(t["term"], value_set=h))
                )

            pairs = pairs.map_batches(drop_hot, batch_format="pyarrow")

    def to_postings(g: pd.DataFrame) -> pd.DataFrame:
        term = g["term"].iloc[0]
        ids = np.sort(g[id_col].to_numpy())
        if len(ids) < min_df:
            return pd.DataFrame(
                {"term": pd.Series([], dtype=object),
                 "df": pd.Series([], dtype=np.int64),
                 "postings": pd.Series([], dtype=object)}
            )
        return pd.DataFrame(
            {
                "term": [term],
                "df": np.array([len(ids)], dtype=np.int64),
                "postings": [",".join(ids.astype(str))],
            }
        )

    return pairs.groupby("term").map_groups(to_postings, batch_format="pandas")


def inverted_index_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df: int | str | None = None,
) -> str:
    """DuckDB replay of :func:`inverted_index`, generated from the SAME
    parameters (single-generator policy): identical tokenizer
    (``string_split(text, ' ')``), identical empty-token drop, identical
    df bounds and ascending comma-joined postings.  ``max_df`` may be a
    SQL expression (e.g. ``floor(0.8 * (SELECT count(*) FROM t))``) so
    oracles can stay corpus-size-relative; the engine side passes the
    same fraction through the identical IEEE floor."""
    having = f"HAVING count(*) >= {int(min_df)}"
    if max_df is not None:
        cap = max_df if isinstance(max_df, str) else int(max_df)
        having += f" AND count(*) <= ({cap})"
    return f"""
        WITH pairs AS (
          SELECT DISTINCT {id_col},
                 unnest(string_split({text_col}, ' ')) AS term
          FROM {table}
        )
        SELECT term, count(*) AS df,
               string_agg(CAST({id_col} AS VARCHAR), ',' ORDER BY {id_col})
                 AS postings
        FROM pairs WHERE term <> '' GROUP BY term {having}
    """
