"""Sitemap ingestion: sitemap.xml payloads → crawl-frontier url rows.

The discovery side of crawl planning (robots.txt is the permission
side, ``stages/robots.py``): sites publish ``<urlset>`` documents whose
``<url>`` entries carry a required ``<loc>`` and an optional
``<lastmod>``; the frontier wants them as a flat (host, loc, lastmod)
table to anti-join against already-crawled CDX keys and to prioritize
by freshness.

Scope: ``<urlset>`` documents (the leaf format).  ``<sitemapindex>``
recursion is a fetch-loop concern, not a batch-transform one — index
files simply yield no ``<url>`` blocks here.  Parsing is RE2-compatible
regex (block-scoped, non-greedy, DOTALL for multi-line entries), NOT an
XML library: real-crawl sitemaps are full of invalid XML that lxml
rejects and regex shrugs at; semantics are pinned by tests and by the
q136 oracle, which rebuilds byte-identical XML in SQL and re-parses it
with the same patterns via regexp_extract_all.

Scale shape: ONE shuffle-free extraction scan (the xml column never
outlives its task; only slim url rows continue) + one small host-keyed
rollup when the caller wants per-host freshness stats.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import ray.data as rd

from .skew import hosts_of_urls

_URL_BLOCK_RE = re.compile(r"<url>(.*?)</url>", re.DOTALL | re.IGNORECASE)
_LOC_RE = re.compile(r"<loc>\s*([^<]*?)\s*</loc>", re.DOTALL | re.IGNORECASE)
_LASTMOD_RE = re.compile(
    r"<lastmod>\s*([^<]*?)\s*</lastmod>", re.DOTALL | re.IGNORECASE
)


def parse_sitemap(xml: str) -> list[tuple[str, str]]:
    """(loc, lastmod) per ``<url>`` block, document order; blocks without
    a ``<loc>`` are skipped, a missing ``<lastmod>`` yields ''."""
    out = []
    for m in _URL_BLOCK_RE.finditer(xml or ""):
        blk = m.group(1)
        loc = _LOC_RE.search(blk)
        if not loc or not loc.group(1):
            continue
        lm = _LASTMOD_RE.search(blk)
        out.append((loc.group(1), lm.group(1) if lm else ""))
    return out


def sitemap_urls(
    ds: rd.Dataset, *, xml_col: str = "xml"
) -> rd.Dataset:
    """Lazy (host, loc, lastmod) rows from a Dataset of sitemap payloads
    — one shuffle-free scan, hosts vectorized by ``hosts_of_urls``."""

    def scan(t: pa.Table) -> pa.Table:
        locs: list[str] = []
        lms: list[str] = []
        for xml in t[xml_col].to_pylist():
            if isinstance(xml, bytes):
                xml = xml.decode("utf-8", "replace")
            for loc, lm in parse_sitemap(xml):
                locs.append(loc)
                lms.append(lm)
        hosts = (
            hosts_of_urls(pa.array(locs, type=pa.string()))
            if locs
            else pa.array([], type=pa.string())
        )
        return pa.table(
            {
                "host": hosts,
                "loc": pa.array(locs, type=pa.string()),
                "lastmod": pa.array(lms, type=pa.string()),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow")


def sitemap_host_freshness(
    urls: rd.Dataset, *, num_parts: int = 32
) -> rd.Dataset:
    """(host, n_urls, n_dated, last_mod): per-host frontier size and the
    newest declared lastmod ('' when no entry carries one) — the
    recrawl-prioritization rollup.  One host-hash shuffle; per-batch
    pandas partials are the map-side combiner."""
    from .dedup import add_key_partition

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby("host", sort=False).agg(
            n_urls=("loc", "size"),
            n_dated=("lastmod", lambda s: int((s != "").sum())),
            last_mod=("lastmod", "max"),
        )
        g = g.reset_index()
        g["n_urls"] = g["n_urls"].astype("int64")
        g["n_dated"] = g["n_dated"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("host", sort=False).agg(
            n_urls=("n_urls", "sum"),
            n_dated=("n_dated", "sum"),
            last_mod=("last_mod", "max"),
        )
        r = r.reset_index()
        r["n_urls"] = r["n_urls"].astype("int64")
        r["n_dated"] = r["n_dated"].astype("int64")
        return r

    return (
        urls.map_batches(partial, batch_format="pyarrow")
        .map_batches(
            lambda t: add_key_partition(t, "host", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(
            lambda g: final(g.drop(columns=["_part"])), batch_format="pandas"
        )
    )

def sitemap_coverage(
    expected: rd.Dataset,
    crawled: rd.Dataset,
    *,
    host_col: str = "host",
    url_col: str = "url",
    num_parts: int = 64,
) -> "pd.DataFrame":
    """Per-host sitemap-vs-crawl coverage gap: of the urls a host's
    sitemaps declare, what fraction did the crawl actually fetch —
    the crawl-ops completeness metric that closes the loop between
    sitemap ingestion (q136), the frontier (q146) and the fetch log.
    Output: (host, n_expected, n_covered, coverage).

    Scale shape: ONE url-hash coarse-partition shuffle over both sides
    (an expected url and its fetch co-locate, so membership is
    partition-local), per-partition vectorized isin, |hosts|-sized
    driver fold.  Expected urls are deduped; crawled side is a
    membership set only."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from .collect import collect_table
    from .dedup import add_key_partition
    from .selection import round_half_away

    def tag(side: int, with_host: bool):
        def f(t: pa.Table) -> pa.Table:
            cols = {
                url_col: t[url_col],
                "_h": t[host_col] if with_host else pa.nulls(
                    t.num_rows, pa.string()
                ),
                "_side": pa.array(
                    np.full(t.num_rows, side, dtype=np.int8)
                ),
            }
            return add_key_partition(pa.table(cols), url_col,
                                     num_parts=num_parts)

        return f

    both = expected.map_batches(
        tag(0, True), batch_format="pyarrow"
    ).union(crawled.map_batches(tag(1, False), batch_format="pyarrow"))

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        exp = df[df["_side"] == 0].drop_duplicates([url_col])
        got = set(df.loc[df["_side"] == 1, url_col].to_numpy())
        if exp.empty:
            return pd.DataFrame(
                {"host": pd.Series([], dtype=object),
                 "n_expected": pd.Series([], dtype="int64"),
                 "n_covered": pd.Series([], dtype="int64")}
            )
        cov = exp[url_col].map(lambda u: u in got).astype("int64")
        r = exp.assign(_c=cov).groupby("_h", sort=False).agg(
            n_expected=(url_col, "size"), n_covered=("_c", "sum")
        ).reset_index().rename(columns={"_h": "host"})
        r["n_expected"] = r["n_expected"].astype("int64")
        r["n_covered"] = r["n_covered"].astype("int64")
        return r

    out = (
        collect_table(
            both.groupby("_part").map_groups(per_part, batch_format="pandas")
        )
        .to_pandas()
        .groupby("host", as_index=False)[["n_expected", "n_covered"]]
        .sum()
        .sort_values("host")
        .reset_index(drop=True)
    )
    out["n_expected"] = out["n_expected"].astype(np.int64)
    out["n_covered"] = out["n_covered"].astype(np.int64)
    out["coverage"] = round_half_away(
        out["n_covered"].to_numpy(np.float64)
        / out["n_expected"].to_numpy(np.float64), 6
    )
    return out
