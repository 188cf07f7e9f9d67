"""Content-mirroring diagnostics: host duplication profile + mirror
host pairs.

Mirrors (the same content served by many hosts — CDNs, scraper farms,
parked-domain templates) are the dominant source of web-corpus
duplication; these stages profile WHERE duplication lives so crawl
budgets and dedup effort aim at the right hosts (the host-level view
of what q16/q32's document-level dedup removes).

Scale shape (both): one content-hash coarse-partition shuffle
(``add_key_partition`` on the hash co-locates every copy of a
content), per-partition vectorized folds, host-/pair-bounded outputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .dedup import add_key_partition
from .selection import round_half_away

__all__ = ["host_dup_profile", "mirror_host_pairs", "dedup_impact"]

MIRROR_HOSTS_PER_HASH_CAP = 1024


def _hashed(pages: rd.Dataset, host_col: str, hash_col: str, num_parts: int):
    return pages.map_batches(
        lambda t: add_key_partition(
            t.select([host_col, hash_col]), hash_col, num_parts=num_parts
        ),
        batch_format="pyarrow",
    )


def host_dup_profile(
    pages: rd.Dataset,
    *,
    host_col: str = "host",
    hash_col: str = "content_hash",
    num_parts: int = 64,
) -> pd.DataFrame:
    """Per-host duplication profile: n_pages, n_dup (pages whose content
    hash occurs >= 2 times ANYWHERE in the corpus) and dup_rate — the
    recrawl/dedup budget signal (a host serving 95% mirrored content is
    a copy, not a source).

    One hash-partition shuffle: every copy of a content co-locates, so
    the per-partition occurrence count IS the global count; partitions
    emit (host, n_pages, n_dup) partials and the driver folds |hosts|
    rows."""
    from .collect import collect_table

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        cnt = df.groupby(hash_col)[host_col].transform("size")
        df = df.assign(_dup=(cnt >= 2).astype("int64"))
        r = df.groupby(host_col, sort=False).agg(
            n_pages=(hash_col, "size"), n_dup=("_dup", "sum")
        ).reset_index()
        r["n_pages"] = r["n_pages"].astype("int64")
        r["n_dup"] = r["n_dup"].astype("int64")
        return r

    out = (
        collect_table(
            _hashed(pages, host_col, hash_col, num_parts)
            .groupby("_part")
            .map_groups(per_part, batch_format="pandas")
        )
        .to_pandas()
        .groupby(host_col, as_index=False)[["n_pages", "n_dup"]]
        .sum()
        .sort_values(host_col)
        .reset_index(drop=True)
    )
    out["n_pages"] = out["n_pages"].astype(np.int64)
    out["n_dup"] = out["n_dup"].astype(np.int64)
    out["dup_rate"] = round_half_away(
        out["n_dup"].to_numpy(np.float64) / out["n_pages"].to_numpy(np.float64),
        6,
    )
    return out


def mirror_host_pairs(
    pages: rd.Dataset,
    *,
    host_col: str = "host",
    hash_col: str = "content_hash",
    k: int = 20,
    num_parts: int = 64,
    hosts_per_hash_cap: int = MIRROR_HOSTS_PER_HASH_CAP,
) -> pd.DataFrame:
    """Top-k host pairs ranked by the number of DISTINCT contents both
    serve — mirror/scraper-farm detection (two hosts sharing 10 000
    contents are one site).  A content counts once per unordered host
    pair regardless of copies per side.

    Same one-shuffle shape as :func:`host_dup_profile`; per partition,
    each hash's DISTINCT host list expands to C(h,2) pairs —
    ``hosts_per_hash_cap`` bounds the quadratic loudly (a hash served
    by thousands of hosts is template boilerplate; raise the cap or
    pre-drop such hashes explicitly).  Pair counts fold through a
    pair-vocab groupby into a per-block top-k."""
    from ray.data.aggregate import Sum

    from .selection import global_top_k

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates([hash_col, host_col]).sort_values(
            [hash_col, host_col], kind="mergesort"
        )
        sizes = d.groupby(hash_col, sort=False)[host_col].transform("size")
        over = sizes.max() if len(sizes) else 0
        if over > hosts_per_hash_cap:
            raise ValueError(
                f"a content hash is served by {int(over)} hosts "
                f"(> hosts_per_hash_cap={hosts_per_hash_cap}): template "
                "boilerplate — pre-drop it or raise the cap explicitly"
            )
        hosts = d[host_col].to_numpy(dtype=object)
        counts = d.groupby(hash_col, sort=False).size().to_numpy()
        a_idx, b_idx = [], []
        off = 0
        for c in counts:
            if c >= 2:
                ii, jj = np.triu_indices(c, k=1)
                a_idx.append(off + ii)
                b_idx.append(off + jj)
            off += c
        if not a_idx:
            return pd.DataFrame(
                {"host_a": pd.Series([], dtype=object),
                 "host_b": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype="int64")}
            )
        a = hosts[np.concatenate(a_idx)]
        b = hosts[np.concatenate(b_idx)]
        r = (
            pd.DataFrame({"host_a": a, "host_b": b})
            .groupby(["host_a", "host_b"], sort=False)
            .size()
            .reset_index(name="n")
        )
        r["n"] = r["n"].astype("int64")
        return r

    counts = (
        _hashed(pages, host_col, hash_col, num_parts)
        .groupby("_part")
        .map_groups(per_part, batch_format="pandas")
        .groupby(["host_a", "host_b"])
        .aggregate(Sum("n", alias_name="n"))
    )
    out = global_top_k(
        counts, k=k, by=["n", "host_a", "host_b"],
        descending=[True, False, False],
    )
    if out.empty:
        return pd.DataFrame(
            {"host_a": pd.Series([], dtype=object),
             "host_b": pd.Series([], dtype=object),
             "n": pd.Series([], dtype="int64")}
        )
    out["n"] = out["n"].astype(np.int64)
    return out[["host_a", "host_b", "n"]]


def dedup_impact(
    pages: rd.Dataset,
    *,
    hash_col: str = "content_hash",
    bytes_col: str = "n_bytes",
    num_parts: int = 64,
) -> pd.DataFrame:
    """Dedup impact report — the "what would exact dedup buy us" sizing
    every corpus team runs BEFORE spending the dedup compute: a
    histogram over duplicate-cluster sizes with, per size s, the number
    of clusters, the pages involved, and the bytes the keep-best rule
    (keep the LARGEST member, drop the rest) would reclaim.

    Scale shape: the q197 discipline — ONE content-hash coarse shuffle
    (all copies of a content co-locate, so per-partition cluster stats
    are global), per-partition vectorized pandas folds emitting
    ≤ distinct-sizes rows each, and a driver fold over (sizes × parts)
    rows — never page-count-sized.  Sums are exact int64 / HUGEINT on
    the two engines.  Output: (cluster_size:int64, n_clusters:int64,
    n_pages:int64, wasted_bytes:int64) ascending by size.  SQL replay:
    single-generator :func:`dedup_impact_sql`."""
    from .collect import collect_table

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: SQL GROUP BY keeps a NULL-hash cluster; pandas
        # would silently drop those rows and undercount reclaimable bytes
        cl = df.groupby(hash_col, sort=False, dropna=False)[bytes_col].agg(
            ["size", "sum", "max"]
        )
        cl["wasted"] = cl["sum"] - cl["max"]
        r = cl.groupby("size", sort=False).agg(
            n_clusters=("sum", "size"), wasted_bytes=("wasted", "sum")
        ).reset_index()
        r["cluster_size"] = r["size"].astype("int64")
        r["n_clusters"] = r["n_clusters"].astype("int64")
        r["wasted_bytes"] = r["wasted_bytes"].astype("int64")
        return r[["cluster_size", "n_clusters", "wasted_bytes"]]

    folded = (
        collect_table(
            pages.map_batches(
                lambda t: add_key_partition(
                    t.select([hash_col, bytes_col]), hash_col,
                    num_parts=num_parts,
                ),
                batch_format="pyarrow",
            )
            .groupby("_part")
            .map_groups(per_part, batch_format="pandas")
        )
        .to_pandas()
        .groupby("cluster_size", as_index=False)[["n_clusters", "wasted_bytes"]]
        .sum()
        .sort_values("cluster_size")
        .reset_index(drop=True)
    )
    folded["cluster_size"] = folded["cluster_size"].astype(np.int64)
    folded["n_clusters"] = folded["n_clusters"].astype(np.int64)
    folded["n_pages"] = (
        folded["cluster_size"] * folded["n_clusters"]
    ).astype(np.int64)
    folded["wasted_bytes"] = folded["wasted_bytes"].astype(np.int64)
    return folded[["cluster_size", "n_clusters", "n_pages", "wasted_bytes"]]


def dedup_impact_sql(
    *,
    table: str,
    hash_col: str = "content_hash",
    bytes_col: str = "n_bytes",
) -> str:
    """DuckDB replay of :func:`dedup_impact` (single-generator)."""
    return f"""
        WITH cl AS (
            SELECT {hash_col} AS h, count(*) AS s,
                   sum({bytes_col}) AS b, max({bytes_col}) AS mb
            FROM {table} GROUP BY {hash_col}
        )
        SELECT CAST(s AS BIGINT) AS cluster_size,
               CAST(count(*) AS BIGINT) AS n_clusters,
               CAST(sum(s) AS BIGINT) AS n_pages,
               CAST(sum(b - mb) AS BIGINT) AS wasted_bytes
        FROM cl GROUP BY s ORDER BY s
    """
