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


# --- JSON-LD structured data -------------------------------------------------
# Both attribute orders and quote styles; body is non-greedy up to the
# first </script> (a JSON-LD payload cannot contain that literal —
# "</script" inside a JSON string would terminate the element in real
# browsers too, so the non-greedy stop matches producer behavior).
_JSONLD_RE = re.compile(
    r"(?is)<script[^>]+type=[\"']?application/ld\+json[\"']?[^>]*>(.*?)</script>"
)


def add_json_ld(
    batch: pa.Table,
    *,
    html_col: str = "html",
    type_key: str = "@type",
    name_key: str = "name",
) -> pa.Table:
    """Append (ld_type, ld_name, n_ld_blocks) from the page's JSON-LD
    script blocks: the FIRST block that parses to a JSON object wins
    (matching consumer behavior — search engines read the first valid
    block); malformed blocks are skipped, not fatal.  Scope: top-level
    objects only (no @graph unwrapping, no top-level arrays) —
    documented, and the planted-truth oracle exercises exactly this
    scope.  '' sentinels when absent (the SQL-friendly convention)."""
    import json

    col = batch[html_col]
    if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
        texts = [(b or b"").decode("utf-8", errors="replace") for b in col.to_pylist()]
    else:
        texts = [(t or "") for t in col.to_pylist()]
    types: list[str] = []
    names: list[str] = []
    counts: list[int] = []
    for txt in texts:
        blocks = _JSONLD_RE.findall(txt)
        n_ok = 0
        first_type = ""
        first_name = ""
        for raw in blocks:
            try:
                obj = json.loads(raw)
            except ValueError:
                continue
            if not isinstance(obj, dict):
                continue
            n_ok += 1
            if n_ok == 1:
                tv = obj.get(type_key, "")
                nv = obj.get(name_key, "")
                first_type = tv if isinstance(tv, str) else ""
                first_name = nv if isinstance(nv, str) else ""
        types.append(first_type)
        names.append(first_name)
        counts.append(n_ok)
    return (
        batch.append_column("ld_type", pa.array(types, type=pa.string()))
        .append_column("ld_name", pa.array(names, type=pa.string()))
        .append_column("n_ld_blocks", pa.array(counts, type=pa.int64()))
    )


def extract_json_ld(
    ds,
    *,
    html_col: str = "html",
    keep_cols: "list[str] | None" = None,
):
    """Dataset wrapper: ONE shuffle-free scan producing ``keep_cols`` +
    (ld_type, ld_name, n_ld_blocks); the html column never outlives
    its task."""

    def scan(t: pa.Table) -> pa.Table:
        out = add_json_ld(t, html_col=html_col)
        cols = keep_cols if keep_cols is not None else [
            c for c in t.column_names if c != html_col
        ]
        return out.select(cols + ["ld_type", "ld_name", "n_ld_blocks"])

    return ds.map_batches(scan, batch_format="pyarrow")


# --- heading outline ---------------------------------------------------------
# Well-formed <hN ...>...</hN> pairs only (N matched by backreference);
# non-greedy body.  Inline markup inside a heading is stripped; the five
# predefined XML entities are decoded (full entity tables belong to the
# body extractor).
_HEADING_RE = re.compile(r"(?is)<h([1-6])(?:\s[^>]*)?>(.*?)</h\1\s*>")
_INNER_TAG_RE = re.compile(r"(?s)<[^>]+>")
_WS_RE = re.compile(r"\s+")
_ENTITIES = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
    ("&amp;", "&"),  # last, so '&amp;lt;' decodes to '&lt;' not '<'
)


def _clean_heading(raw: str) -> str:
    txt = _INNER_TAG_RE.sub("", raw)
    for ent, ch in _ENTITIES:
        txt = txt.replace(ent, ch)
    return _WS_RE.sub(" ", txt).strip()


def extract_outline(
    ds,
    *,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> "pa.Table":
    """Exploded heading outline: one row per well-formed h1–h6 element,
    ``(id, pos:int64 1-based document order, level:int64, heading)`` —
    the section structure that feeds structure-aware chunking
    (``stages/chunking.py`` splits on raw word windows; splitting on
    outline boundaries keeps sections intact) and title-style dedup
    signatures.  Pages with no headings emit nothing.

    Scale shape: ONE shuffle-free scan; html never outlives its task;
    output is heading-count-sized and co-partitioned with the input.
    """

    def scan(t: pa.Table) -> pa.Table:
        col = t[html_col]
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            texts = [
                (b or b"").decode("utf-8", errors="replace")
                for b in col.to_pylist()
            ]
        else:
            texts = [(s or "") for s in col.to_pylist()]
        row_idx: list[int] = []
        poss: list[int] = []
        levels: list[int] = []
        heads: list[str] = []
        for i, txt in enumerate(texts):
            for pos, m in enumerate(_HEADING_RE.finditer(txt), start=1):
                row_idx.append(i)
                poss.append(pos)
                levels.append(int(m.group(1)))
                heads.append(_clean_heading(m.group(2)))
        return pa.table(
            {
                id_col: t[id_col].take(pa.array(row_idx, type=pa.int64())),
                "pos": pa.array(poss, type=pa.int64()),
                "level": pa.array(levels, type=pa.int64()),
                "heading": pa.array(heads, type=pa.string()),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow")


_HREFLANG_RE = re.compile(
    r"(?is)<link\b[^>]*rel=[\"']alternate[\"'][^>]*"
    r"hreflang=[\"']([^\"']+)[\"']"
)


def hreflang_rollup(
    ds,
    *,
    html_col: str = "html",
) -> pd.DataFrame:
    """Per-target-language rollup of ``<link rel="alternate"
    hreflang=...>`` head annotations: how many alternate LINKS point
    at each language and from how many distinct PAGES — the i18n
    surface a multilingual crawl reads to discover translation
    clusters before fetching them (the hreflang graph is the cheapest
    source of aligned-document candidates for parallel-corpus mining).

    Extraction is a compiled-regex scan per page (rel then hreflang
    attribute order, the emission convention of every major CMS);
    binary html decodes utf-8 (errors=replace).  Scale shape:
    shuffle-free per-batch (lang, links, pages) count partials, ONE
    |langs|-sized groupby; the driver holds |langs| rows.  Output:
    (hreflang, n_links:int64, n_pages:int64) sorted by hreflang."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        col = t[html_col]
        raw = col.to_pylist()
        docs = [
            d.decode("utf-8", errors="replace") if isinstance(d, bytes)
            else d
            for d in raw
        ]
        empty = pa.table(
            {"hreflang": pa.array([], type=pa.string()),
             "links": pa.array([], type=pa.int64()),
             "pages": pa.array([], type=pa.int64())}
        )
        langs: list[str] = []
        link_n: list[int] = []
        page_n: list[int] = []
        acc: dict[str, list[int]] = {}
        for doc in docs:
            if not doc:
                continue
            found = _HREFLANG_RE.findall(doc)
            if not found:
                continue
            per_doc: dict[str, int] = {}
            for lg in found:
                per_doc[lg] = per_doc.get(lg, 0) + 1
            for lg, c in per_doc.items():
                slot = acc.setdefault(lg, [0, 0])
                slot[0] += c
                slot[1] += 1
        if not acc:
            return empty
        for lg, (c, p) in acc.items():
            langs.append(lg)
            link_n.append(c)
            page_n.append(p)
        return pa.table(
            {"hreflang": pa.array(langs, type=pa.string()),
             "links": pa.array(link_n, type=pa.int64()),
             "pages": pa.array(page_n, type=pa.int64())}
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("hreflang")
        .aggregate(Sum("links", alias_name="n_links"),
                   Sum("pages", alias_name="n_pages"))
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {"hreflang": pd.Series([], dtype=object),
             "n_links": pd.Series([], dtype=np.int64),
             "n_pages": pd.Series([], dtype=np.int64)}
        )
    out["n_links"] = out["n_links"].astype(np.int64)
    out["n_pages"] = out["n_pages"].astype(np.int64)
    return out.sort_values("hreflang", kind="mergesort").reset_index(
        drop=True
    )
