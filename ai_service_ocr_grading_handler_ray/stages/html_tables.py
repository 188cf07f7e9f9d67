"""HTML table extraction: flat <table> markup → relational cell rows.

The structured-data sibling of the boilerplate stripper
(stages/html_extract.py): tables carry the highest-value factual
content on many pages (specs, standings, prices) and train-data
curation wants them as (doc, table, row, col, cell) tuples, not as
flattened prose.

Scope (documented): FLAT tables — no nested <table>, colspan/rowspan
ignored (cells keep their source column index).  Tags matched
case-insensitively, attributes allowed, <th> marks header cells.

Scale shape: ONE shuffle-free ``map_batches`` scan; per-batch work is
compiled-regex ``finditer`` over each payload (output is list-shaped
per doc, so a Python comprehension per batch is the kernel — the same
trade as the reference's per-document payload parse, but batched and
streaming; the html column never outlives its task).

Reference anchor: the reference parses OCR'd exam tables into
question/answer structures (engine/core/llm_number_prediction.py);
this is the html-native generalization.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

__all__ = ["extract_tables", "tables_in_html"]

_TABLE_RE = re.compile(r"(?is)<table[^>]*>(.*?)</table>")
_TR_RE = re.compile(r"(?is)<tr[^>]*>(.*?)</tr>")
_CELL_RE = re.compile(r"(?is)<(t[dh])[^>]*>(.*?)</t[dh]>")
_TAG_RE = re.compile(r"(?s)<[^>]*>")


def tables_in_html(html: str) -> "list[tuple[int, int, int, str, bool]]":
    """All cells of all flat tables in one payload:
    [(table_idx, row_idx, col_idx, cell_text, is_header)].  Cell text is
    tag-stripped and whitespace-trimmed."""
    out = []
    for ti, tm in enumerate(_TABLE_RE.finditer(html or "")):
        for ri, rm in enumerate(_TR_RE.finditer(tm.group(1))):
            for ci, cm in enumerate(_CELL_RE.finditer(rm.group(1))):
                text = _TAG_RE.sub("", cm.group(2)).strip()
                out.append((ti, ri, ci, text, cm.group(1).lower() == "th"))
    return out


def extract_tables(
    ds,
    *,
    html_col: str = "html",
    id_col: str = "doc_id",
    head_cap: int = 1 << 20,
):
    """Lazy Dataset of (id, table_idx, row_idx, col_idx, cell,
    is_header) — documents without tables contribute no rows."""

    def scan(t: pa.Table) -> pa.Table:
        col = t[html_col]
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            texts = [
                (b or b"")[:head_cap].decode("utf-8", errors="replace")
                for b in col.to_pylist()
            ]
        else:
            texts = [(x or "")[:head_cap] for x in col.to_pylist()]
        ids = t[id_col].to_numpy(zero_copy_only=False)
        rid, tis, ris, cis, cells, hdrs = [], [], [], [], [], []
        for i, html in enumerate(texts):
            for ti, ri, ci, text, is_h in tables_in_html(html):
                rid.append(ids[i])
                tis.append(ti)
                ris.append(ri)
                cis.append(ci)
                cells.append(text)
                hdrs.append(is_h)
        return pa.table(
            {
                id_col: pa.array(rid, type=t[id_col].type),
                "table_idx": pa.array(np.array(tis, dtype=np.int64)),
                "row_idx": pa.array(np.array(ris, dtype=np.int64)),
                "col_idx": pa.array(np.array(cis, dtype=np.int64)),
                "cell": pa.array(cells, type=pa.string()),
                "is_header": pa.array(np.array(hdrs, dtype=bool)),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow")


def linearize_tables(
    cells,
    *,
    id_col: str = "doc_id",
    sep: str = " | ",
    num_parts: int = 64,
):
    """Extracted table cells → training-text rows: each DATA row becomes
    '<header>: <value> | ...' ordered by column — the table-to-text
    bridge between :func:`extract_tables` and the text-curation surface
    (linearized tables are how tabular page content enters an LM
    corpus).  Data cells with no same-column header keep the value
    alone.  Output: (id, table_idx, row_idx, text).

    Scale shape: ONE doc-hash coarse-partition shuffle (a document's
    cells co-locate), per-partition vectorized pandas merge of header
    cells onto data cells + ordered string_agg."""
    import pandas as pd

    from .dedup import add_key_partition

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        hdr = df[df["is_header"]][[id_col, "table_idx", "col_idx", "cell"]]
        hdr = hdr.drop_duplicates([id_col, "table_idx", "col_idx"]).rename(
            columns={"cell": "hdr"}
        )
        dat = df[~df["is_header"]]
        if dat.empty:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype=df[id_col].dtype),
                 "table_idx": pd.Series([], dtype="int64"),
                 "row_idx": pd.Series([], dtype="int64"),
                 "text": pd.Series([], dtype=object)}
            )
        m = dat.merge(hdr, on=[id_col, "table_idx", "col_idx"], how="left")
        piece = m["cell"].astype(str)
        has = m["hdr"].notna()
        piece = piece.where(~has, m["hdr"].astype(str) + ": " + piece)
        m = m.assign(piece=piece).sort_values(
            [id_col, "table_idx", "row_idx", "col_idx"], kind="mergesort"
        )
        out = (
            m.groupby([id_col, "table_idx", "row_idx"], sort=False)["piece"]
            .agg(sep.join)
            .reset_index(name="text")
        )
        out["table_idx"] = out["table_idx"].astype("int64")
        out["row_idx"] = out["row_idx"].astype("int64")
        return out

    return (
        cells.map_batches(
            lambda t: add_key_partition(t, id_col, num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(per_part, batch_format="pandas")
    )
