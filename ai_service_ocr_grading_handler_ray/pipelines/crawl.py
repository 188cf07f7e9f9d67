"""Crawl-frontier prioritization — the composed WEB-CRAWL capstone
(the crawl-side sibling of pipelines/curate.py's corpus-build): rank
the urls a crawler should fetch next from (a) link-graph authority and
(b) recency, under a per-host politeness cap.

    priority(url) = round( pagerank8(host(url))
                           * round(exp(-age_days / decay_days), 8), 8 )
    frontier      = top-k urls per host by (priority DESC, url ASC)

Composition (every piece individually oracle-checked elsewhere):
CDX-style keep-latest per url (q129's dedup shape, one url groupby)
→ host PageRank (stages/graph.py, q118's oracle-checked operator)
→ shuffle-free score scan (host→rank broadcast via ``ray.put`` with the
sorted-searchsorted probe) → per-host top-k with a per-batch partial
combiner, so a giant host's candidate list never materializes in one
task (final groups are ≤ k × blocks rows).

Both roundings happen BEFORE ranking, so the tie order is identical on
the engine and the DuckDB replay (the q146 oracle composes the url CASE
rebuild, the same edge CTE, ``graph.pagerank_sql`` and this module's
formula — single-generator policy for the graph half).

Scale shape: one url-hash groupby (keep-latest), one edge-reduce
shuffle + node-sized iterations (pagerank), one shuffle-free score
scan, one host groupby over partial-top-k survivors.  Hosts absent
from the link graph are DROPPED (inner-join semantics, matching the
SQL replay); pass ``keep_unlinked=True`` to score them with rank 0.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..stages.graph import pagerank
from ..stages.selection import round_half_away
from ..stages.skew import hosts_of_urls


def crawl_frontier(
    pages: rd.Dataset,
    edges: rd.Dataset,
    *,
    ref_us: int,
    decay_days: float = 30.0,
    k: int = 5,
    damping: float = 0.85,
    n_iter: int = 3,
    keep_unlinked: bool = False,
) -> rd.Dataset:
    """``pages``: (url:string, ts_us:int64) — one row per crawl event,
    duplicates allowed (keep-latest wins).  ``edges``: (src, dst) host
    link events.  Returns (url, host, priority:float64,
    host_rank:int64) — at most ``k`` rows per host."""
    kept = pages.groupby("url").max("ts_us")

    pr = pagerank(edges, damping=damping, n_iter=n_iter)
    blocks = [
        b
        for b in pr.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    ]
    if blocks:
        tbl = pa.concat_tables(blocks)
        nodes = tbl["node"].to_pandas().to_numpy(dtype=object)
        ranks = round_half_away(
            tbl["pagerank"].to_numpy(zero_copy_only=False).astype(np.float64), 8
        )
    else:
        nodes = np.empty(0, dtype=object)
        ranks = np.empty(0, dtype=np.float64)
    order = np.argsort(nodes, kind="stable")
    pr_ref = ray.put((nodes[order], ranks[order]))

    def score(t: pa.Table) -> pa.Table:
        vt, vr = ray.get(pr_ref)
        urls = t["url"].to_pandas().to_numpy(dtype=object)
        ts = t["max(ts_us)"].to_numpy(zero_copy_only=False).astype(np.int64)
        hosts = np.asarray(hosts_of_urls(t["url"]).to_pylist(), dtype=object)
        pos = np.searchsorted(vt, hosts)
        pos_c = np.clip(pos, 0, max(len(vt) - 1, 0))
        linked = (len(vt) > 0) & (vt[pos_c] == hosts) if len(vt) else np.zeros(
            len(hosts), dtype=bool
        )
        prv = np.where(linked, vr[pos_c] if len(vt) else 0.0, 0.0)
        age_days = (ref_us - ts) / 86400000000.0
        fr = round_half_away(np.exp(-(age_days / decay_days)), 8)
        prio = round_half_away(prv * fr, 8)
        out = pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "host": pa.array(hosts, type=pa.string()),
                "priority": pa.array(prio),
            }
        )
        if not keep_unlinked:
            out = out.filter(pa.array(linked))
        return out

    scored = kept.map_batches(score, batch_format="pyarrow")

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["priority", "url"], ascending=[False, True], kind="mergesort"
        )
        return df.groupby("host", sort=False).head(k)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["priority", "url"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.reset_index(drop=True)
        g["host_rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["url", "host", "priority", "host_rank"]]

    return (
        scored.map_batches(partial_topk, batch_format="pandas")
        .groupby("host")
        .map_groups(final_topk, batch_format="pandas")
    )


def frontier_priority_sql(
    *, ts_diff_us: str, pagerank_col: str,
    decay_days: float = 30.0, round_to: int = 8
) -> str:
    """The priority formula as a SQL expression, generated from the SAME
    decay/round parameters the engine uses (single-generator policy).
    ``ts_diff_us``: SQL expression for (ref_us - ts_us) as BIGINT."""
    return (
        f"round({pagerank_col} * round(exp(-((({ts_diff_us})"
        f" / 86400000000.0) / {decay_days})), {round_to}), {round_to})"
    )
