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


def resolve_links(base_url: str, hrefs: list[str]) -> list[str]:
    """Absolute urls via stdlib ``urljoin`` (relative paths, protocol-
    relative ``//host/...``, absolute urls all resolve); unresolvable
    values drop."""
    out = []
    for h in hrefs:
        try:
            u = urljoin(base_url, h)
        except ValueError:
            continue
        if u.startswith(("http://", "https://")):
            out.append(u)
    return out


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
        for u, p in zip(urls, payloads):
            if not p:
                continue
            if isinstance(p, bytes):
                html = p.decode("utf-8", "replace")
            else:
                html = p
            links = resolve_links(u or "", extract_hrefs(html))
            src_urls.extend([u or ""] * len(links))
            dst_urls.extend(links)
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
