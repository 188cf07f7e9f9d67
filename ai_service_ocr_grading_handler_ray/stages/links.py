"""Outlink extraction: HTML payloads → a host-level link graph.

The web-graph construction step between extraction and ranking: every
page contributes (src_host, dst_host) edges from its anchor hrefs, and
the resulting graph feeds ``stages/graph.pagerank`` (crawl
prioritization / domain-quality ranks à la Common-Crawl host ranks).

Reference parity note: the reference repo's HTML handling is
extraction-only; link-graph construction is part of the "operations a
large-scale training-data pipeline would need" mandate and composes the
engine's own pieces (html payloads → ``skew.hosts_of_urls`` →
``graph.pagerank``).

Scale shape: ONE shuffle-free extraction scan — href regex + stdlib
``urljoin`` resolution per page (bounded by links/page) with hosts
vectorized by ``skew.hosts_of_urls``; the html column never moves past
the scan (only slim host-pair rows continue).  The downstream reduce
(``graph.weighted_host_edges`` inside ``pagerank``, or
``count_host_edges``) is one groupby whose per-block partial
aggregation Ray Data performs map-side.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .skew import hosts_of_urls

# href value in single/double/no quotes; case-insensitive; DOTALL-free so
# a malformed unclosed tag cannot swallow the document
_HREF_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE,
)

_SKIP_SCHEMES = ("javascript:", "mailto:", "tel:", "data:")


def extract_hrefs(html: str) -> list[str]:
    """Raw href attribute values in document order."""
    out = []
    for m in _HREF_RE.finditer(html):
        v = m.group(1) or m.group(2) or m.group(3) or ""
        v = v.strip()
        if v and not v.startswith("#") and not v.lower().startswith(_SKIP_SCHEMES):
            out.append(v)
    return out


def _resolve_one(base_url: str, href: str) -> str | None:
    try:
        u = urljoin(base_url, href)
    except ValueError:
        return None
    return u if u.startswith(("http://", "https://")) else None


def resolve_links(base_url: str, hrefs: list[str]) -> list[str]:
    """Absolute urls via stdlib ``urljoin`` (relative paths, protocol-
    relative ``//host/...``, absolute urls all resolve); unresolvable
    values drop."""
    return [u for h in hrefs if (u := _resolve_one(base_url, h)) is not None]


def iter_page_links(urls, payloads, *, with_text: bool = False):
    """The ONE decode → extract → resolve walk every link consumer
    shares (``outlink_host_edges``, ``anchor_term_counts``): a single
    place for the empty-payload skip, the utf-8 'replace' decode, and
    the http(s)-only resolvable rule — so a url-handling fix cannot
    silently miss one of the paths.  Yields ``(src_url, resolved)`` or,
    with ``with_text``, ``(src_url, resolved, anchor_text)``."""
    for u, p in zip(urls, payloads):
        if not p:
            continue
        html = p.decode("utf-8", "replace") if isinstance(p, bytes) else p
        base = u or ""
        if with_text:
            for href, txt in extract_anchors(html):
                r = _resolve_one(base, href)
                if r is not None:
                    yield base, r, txt
        else:
            for href in extract_hrefs(html):
                r = _resolve_one(base, href)
                if r is not None:
                    yield base, r


def outlink_host_edges(
    ds: rd.Dataset,
    *,
    url_col: str = "url",
    html_col: str = "html",
    drop_self: bool = False,
) -> rd.Dataset:
    """(src, dst) host-pair Dataset, one row per extracted link — feed
    directly to ``graph.pagerank`` (whose ``weighted_host_edges`` reduce
    weights by pair multiplicity) or to ``count_host_edges``.  Non-HTML
    payloads (pdf/image/garbage bytes) simply contribute no anchors.
    ``drop_self=True`` removes same-host edges (nav/menu links dominate
    raw counts)."""

    def edges(t: pa.Table) -> pa.Table:
        urls = t[url_col].to_pylist()
        payloads = t[html_col].to_pylist()
        src_urls: list[str] = []
        dst_urls: list[str] = []
        for u, link in iter_page_links(urls, payloads):
            src_urls.append(u)
            dst_urls.append(link)
        if not src_urls:
            return pa.table(
                {"src": pa.array([], type=pa.string()),
                 "dst": pa.array([], type=pa.string())}
            )
        src = hosts_of_urls(pa.array(src_urls, type=pa.string())).to_pandas()
        dst = hosts_of_urls(pa.array(dst_urls, type=pa.string())).to_pandas()
        df = pd.DataFrame({"src": src, "dst": dst})
        df = df[(df.src != "") & (df.dst != "")]
        if drop_self:
            df = df[df.src != df.dst]
        return pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema([("src", pa.string()), ("dst", pa.string())])
        )

    return ds.map_batches(edges, batch_format="pyarrow")


def count_host_edges(edge_ds: rd.Dataset) -> rd.Dataset:
    """(src, dst, n_links) — the aggregated link-graph table (one
    groupby; per-batch multiplicity already reduced upstream)."""
    from ray.data.aggregate import Count

    return edge_ds.groupby(["src", "dst"]).aggregate(Count(alias_name="n_links"))


# full anchor element: href + visible inner text.  The body is a
# TEMPERED non-greedy match that refuses to cross the next "<a" open
# tag: real crawl HTML is full of unclosed <a> elements, and a plain
# (.*?)</a> would swallow everything up to the NEXT anchor's close —
# crediting the first destination with page-body text and eating the
# second anchor entirely.  An unclosed <a> now matches nothing and the
# following anchors survive.
_ANCHOR_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))[^>]*>"""
    r"""((?:(?!<a[\s>]).)*?)</a\s*>""",
    re.IGNORECASE | re.DOTALL,
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def extract_anchors(html: str) -> list[tuple[str, str]]:
    """(href, visible anchor text) pairs in document order: markup inside
    the anchor body is stripped to spaces, whitespace collapsed.  Same
    skip rules as ``extract_hrefs`` (fragments, javascript/mailto/...)."""
    out = []
    for m in _ANCHOR_RE.finditer(html):
        v = (m.group(1) or m.group(2) or m.group(3) or "").strip()
        if not v or v.startswith("#") or v.lower().startswith(_SKIP_SCHEMES):
            continue
        text = _WS_RE.sub(" ", _TAG_RE.sub(" ", m.group(4))).strip()
        out.append((v, text))
    return out


def anchor_term_counts(
    ds: rd.Dataset,
    *,
    url_col: str = "url",
    html_col: str = "html",
    drop_self: bool = True,
) -> rd.Dataset:
    """Per-batch-counted (dst, term, n) rows: lowercase whitespace tokens
    of the visible anchor text, attributed to the DESTINATION host —
    "what the rest of the web calls this site", the anchor-text corpus
    search/embedding training mines.  Self-links drop by default (a nav
    menu describes its own site, not a destination).

    Scale shape: ONE shuffle-free scan; the html column never outlives
    its task, and the per-batch pandas count is the map-side combiner —
    only (dst, term, n) partials leave, bounded by the batch's distinct
    pairs, not its link count."""

    def partial(t: pa.Table) -> pa.Table:
        urls = t[url_col].to_pylist()
        payloads = t[html_col].to_pylist()
        src_urls: list[str] = []
        dst_urls: list[str] = []
        texts: list[str] = []
        for u, link, txt in iter_page_links(urls, payloads, with_text=True):
            src_urls.append(u)
            dst_urls.append(link)
            texts.append(txt)
        if not dst_urls:
            return pa.table(
                {"dst": pa.array([], type=pa.string()),
                 "term": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64())}
            )
        src = hosts_of_urls(pa.array(src_urls, type=pa.string())).to_pandas()
        dst = hosts_of_urls(pa.array(dst_urls, type=pa.string())).to_pandas()
        rows_dst: list[str] = []
        rows_term: list[str] = []
        for s, d, txt in zip(src, dst, texts):
            if not d or (drop_self and s == d):
                continue
            for w in txt.lower().split():
                rows_dst.append(d)
                rows_term.append(w)
        df = (
            pd.DataFrame({"dst": rows_dst, "term": rows_term})
            .groupby(["dst", "term"], sort=False)
            .size()
            .reset_index(name="n")
        )
        df["n"] = df["n"].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False).cast(
            pa.schema([("dst", pa.string()), ("term", pa.string()),
                       ("n", pa.int64())])
        )

    return ds.map_batches(partial, batch_format="pyarrow")


def top_anchor_terms(
    counts: rd.Dataset, *, k: int = 3, num_parts: int = 32
) -> rd.Dataset:
    """(dst, term, n) → each destination host's k most common anchor
    terms (ties: higher n first, then lexicographic term).  ONE shuffle:
    partials co-locate by dst-hash partition, then a vectorized
    per-partition sum + per-host head(k)."""
    from .dedup import add_key_partition

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        r = (
            g.groupby(["dst", "term"], sort=False)["n"].sum().reset_index()
        )
        r["n"] = r["n"].astype("int64")
        r = r.sort_values(
            ["dst", "n", "term"], ascending=[True, False, True],
            kind="mergesort",
        )
        return r.groupby("dst", sort=False).head(k).reset_index(drop=True)

    return (
        counts.map_batches(
            lambda t: add_key_partition(t, "dst", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(finish, batch_format="pandas")
    )
