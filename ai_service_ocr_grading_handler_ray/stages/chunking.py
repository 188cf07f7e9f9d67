"""Document chunking: split texts into overlapping word windows — the
context-window preparation step for embedding / retrieval / training
pipelines (every RAG indexer and long-document trainer runs exactly
this before tokenization).

Reference parity note: the reference repo stacks page images per
question (``compose`` A5); chunking is its text-side analogue and part
of the "operations a large-scale training-data pipeline would need"
mandate.

Semantics (deliberately SQL-replayable so q126's oracle can re-derive
every chunk with ``generate_series`` + ``list_slice``):

- words = ``text.split(' ')`` — SINGLE-SPACE split, matching SQL
  ``string_split(text, ' ')`` exactly (including ``'' → ['']``);
- chunk starts = ``0, stride, 2·stride, …`` while ``start < n_words``
  with ``stride = chunk_words − overlap``; the last chunk may be short;
  every document emits ≥ 1 chunk;
- chunk k covers ``words[start : start + chunk_words]``.

Scale shape: ONE shuffle-free ``map_batches`` scan; the split runs once
per document and chunk assembly is string joins over word-array slices
(output-proportional, no quadratic re-splitting).  Chunks inherit the
document's partition, so a downstream embed/tokenize stage streams
without a shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def chunk_batch(
    t: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 64,
    overlap: int = 16,
) -> pa.Table:
    if not 0 <= overlap < chunk_words:
        raise ValueError("need 0 <= overlap < chunk_words")
    stride = chunk_words - overlap
    ids = t[id_col].to_pylist()
    texts = t[text_col].to_pylist()
    out_id, out_chunk, out_start, out_n, out_text = [], [], [], [], []
    for i, txt in zip(ids, texts):
        ws = (txt or "").split(" ")
        n = len(ws)
        for k, start in enumerate(range(0, n, stride)):
            piece = ws[start : start + chunk_words]
            out_id.append(i)
            out_chunk.append(k)
            out_start.append(start)
            out_n.append(len(piece))
            out_text.append(" ".join(piece))
    id_type = t[id_col].type
    return pa.table(
        {
            id_col: pa.array(out_id, type=id_type),
            "chunk_id": pa.array(out_chunk, type=pa.int64()),
            "start_word": pa.array(out_start, type=pa.int64()),
            "n_chunk_words": pa.array(out_n, type=pa.int64()),
            "chunk_text": pa.array(out_text, type=pa.string()),
        }
    )


def chunk_documents(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 64,
    overlap: int = 16,
) -> rd.Dataset:
    """(doc_id, chunk_id, start_word, n_chunk_words, chunk_text) — one
    shuffle-free scan, chunks co-partitioned with their documents."""
    return ds.map_batches(
        lambda t: chunk_batch(
            t, id_col=id_col, text_col=text_col,
            chunk_words=chunk_words, overlap=overlap,
        ),
        batch_format="pyarrow",
    )


def chunking_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 64,
    overlap: int = 16,
) -> str:
    """The DuckDB replay of :func:`chunk_batch` — generated from one
    place so oracle and engine cannot desync (the splitmix64_sql /
    pagerank_sql single-generator policy)."""
    stride = chunk_words - overlap
    return f"""
        WITH w AS (
          SELECT {id_col}, string_split(coalesce({text_col}, ''), ' ') AS ws
          FROM {table}
        ), starts AS (
          SELECT {id_col}, ws,
                 unnest(generate_series(0, greatest(len(ws) - 1, 0), {stride})) AS start_word
          FROM w
        )
        SELECT {id_col},
               CAST(start_word / {stride} AS BIGINT) AS chunk_id,
               CAST(start_word AS BIGINT) AS start_word,
               CAST(len(list_slice(ws, start_word + 1, start_word + {chunk_words})) AS BIGINT)
                 AS n_chunk_words,
               array_to_string(list_slice(ws, start_word + 1, start_word + {chunk_words}), ' ')
                 AS chunk_text
        FROM starts
        ORDER BY {id_col}, chunk_id
    """
