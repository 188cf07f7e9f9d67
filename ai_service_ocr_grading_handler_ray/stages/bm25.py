"""BM25 ranked retrieval over a Ray Data corpus.

The classic probabilistic-IR scoring function (Robertson-Sparck-Jones,
with the Lucene ``BM25Similarity`` idf variant
``ln(1 + (N - df + 0.5) / (df + 0.5))`` — always positive, no smoothing
special cases) against a FIXED small query-term set, expressed
scale-first:

- ONE tokenize pass extracts a slim per-document profile
  ``(id, dl, tf_0..tf_{|Q|-1})``: the text column never outlives its
  task, and everything downstream touches only |Q|+2 integers per row.
  The profile is checkpointed (``materialize``) because it is consumed
  twice (stats fold + scoring scan); it is |Q|+2 int64s/row — at
  10^12 docs with |Q|=4 that is ~48 TB → 48 GB/node on 1000 nodes,
  object-store-spillable, vs re-tokenizing the full text twice.
- Corpus statistics (N, Σdl, per-term df) fold from ONE-ROW per-batch
  partials: the driver holds blocks × 1 rows, never corpus-sized state.
- Scoring is one shuffle-free vectorized scan with the (|Q|,) idf
  vector and avgdl closed over (a handful of floats — too small to
  merit ``ray.put``).

Term lookup inside the tokenize pass is the same sorted-hash
searchsorted probe as ``text_analysis._lm_probe`` — zero Python-level
per-token work.

Reference scope: the reference repo (LLM grading handler) has no
retrieval operator; BM25 belongs to the LLM-curation battery
(query-focused subset selection against seed queries, the lexical
sibling of DSIR importance weighting — stages/text_analysis.py:409).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .collect import collect_tables
from .hashing import hash_u64
from .text_analysis import batch_words

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def bm25_scores(
    ds,
    query_terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
):
    """Score every document containing at least one query term.

    Returns a LAZY Dataset of ``(id_col, n_hits, bm25)`` — ``n_hits`` is
    the number of DISTINCT query terms present (docs with none are
    dropped, matching the inner-join semantics of the SQL replay).
    Tokenization is ``string_split(text, ' ')`` (the q90 convention).
    """
    terms = list(query_terms)
    if not terms:
        raise ValueError("bm25_scores needs at least one query term")
    if len(set(terms)) != len(terms):
        raise ValueError("duplicate query terms (weights would double-count)")
    nq = len(terms)

    qh = hash_u64(np.array(terms, dtype=object))
    order = np.argsort(qh, kind="stable")
    qh_sorted = qh[order]
    pos_to_idx = order.astype(np.int64)

    def profile(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        words, lens = batch_words(texts)
        n = len(texts)
        tf = np.zeros((n, nq), dtype=np.int64)
        if len(words):
            wh = hash_u64(words)
            pos = np.clip(np.searchsorted(qh_sorted, wh), 0, nq - 1)
            hit = qh_sorted[pos] == wh
            if hit.any():
                doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
                flat = doc_idx[hit] * nq + pos_to_idx[pos[hit]]
                tf = np.bincount(flat, minlength=n * nq).reshape(n, nq)
        cols: dict = {id_col: t[id_col], "dl": pa.array(lens, type=pa.int64())}
        for j in range(nq):
            cols[f"tf_{j}"] = pa.array(tf[:, j].astype(np.int64))
        return pa.table(cols)

    slim = ds.map_batches(profile, batch_format="pyarrow").materialize()

    def partial_stats(t: pa.Table) -> pa.Table:
        row: dict = {
            "n_docs": pa.array([t.num_rows], type=pa.int64()),
            "dl_sum": pa.array(
                [int(t["dl"].to_numpy(zero_copy_only=False).sum())],
                type=pa.int64(),
            ),
        }
        for j in range(nq):
            df_j = int(
                (t[f"tf_{j}"].to_numpy(zero_copy_only=False) > 0).sum()
            )
            row[f"df_{j}"] = pa.array([df_j], type=pa.int64())
        return pa.table(row)

    parts = [
        t
        for t in collect_tables(
            slim.map_batches(partial_stats, batch_format="pyarrow")
        )
        if t.num_rows
    ]
    n_docs = sum(int(t["n_docs"].to_numpy().sum()) for t in parts)
    if n_docs == 0:
        raise ValueError("bm25_scores over an empty corpus")
    dl_sum = sum(int(t["dl_sum"].to_numpy().sum()) for t in parts)
    dfs = np.array(
        [sum(int(t[f"df_{j}"].to_numpy().sum()) for t in parts) for j in range(nq)],
        dtype=np.float64,
    )
    avgdl = dl_sum / n_docs
    idf = np.log(1.0 + (n_docs - dfs + 0.5) / (dfs + 0.5))

    def score(t: pa.Table) -> pa.Table:
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        tf = np.stack(
            [
                t[f"tf_{j}"].to_numpy(zero_copy_only=False)
                for j in range(nq)
            ],
            axis=1,
        ).astype(np.float64)
        denom = tf + k1 * (1.0 - b + b * dl[:, None] / avgdl)
        s = (idf * tf * (k1 + 1.0) / denom).sum(axis=1)
        n_hits = (tf > 0).sum(axis=1).astype(np.int64)
        keep = n_hits > 0
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(ids[keep]),
                "n_hits": pa.array(n_hits[keep]),
                "bm25": pa.array(s[keep], type=pa.float64()),
            }
        )

    return slim.map_batches(score, batch_format="pyarrow")


def bm25_sql(
    query_terms: list[str],
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    round_to: int = 4,
) -> str:
    """DuckDB replay of ``bm25_scores`` — generated from the SAME
    parameters (the repo's single-generator oracle policy): identical
    tokenizer (``string_split(coalesce(text, ''), ' ')`` — NULL text is
    the one-empty-token doc batch_words produces, so avgdl matches),
    identical idf and tf saturation formulas, ``round(bm25,
    round_to)``."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    return f"""
        WITH q(term) AS (VALUES {vals}),
        w AS (
          SELECT {id_col}, string_split(coalesce({text_col}, ''), ' ') AS ws FROM {table}
        ), d AS (
          SELECT {id_col}, CAST(len(ws) AS BIGINT) AS dl FROM w
        ), tok AS (
          SELECT {id_col}, unnest(ws) AS term FROM w
        ), tf AS (
          SELECT tok.{id_col}, tok.term, count(*) AS tf
          FROM tok JOIN q USING (term) GROUP BY tok.{id_col}, tok.term
        ), stats AS (
          SELECT CAST(count(*) AS DOUBLE) AS n,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
          FROM d
        ), df AS (
          SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term
        )
        SELECT CAST(tf.{id_col} AS BIGINT) AS {id_col},
               CAST(count(*) AS BIGINT) AS n_hits,
               round(sum(
                 ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                 * tf.tf * ({k1!r} + 1.0)
                 / (tf.tf + {k1!r} * (1.0 - {b!r} + {b!r} * d.dl / stats.avgdl))
               ), {round_to}) AS bm25
        FROM tf
        JOIN df USING (term)
        JOIN d USING ({id_col})
        CROSS JOIN stats
        GROUP BY tf.{id_col}
    """
