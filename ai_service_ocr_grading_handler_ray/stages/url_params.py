"""URL query-parameter cardinality profiling (spider-trap detection).

A crawler that treats every distinct query string as a distinct page
re-fetches the same content forever when a parameter is a session id,
tracking token, or timestamp.  The standard counter-measure is a
per-(host, param) cardinality profile: parameters whose value-distinct
ratio is high across many occurrences are trap-like and should be
stripped during URL canonicalization (the SURT stage's ally).

Scale shape: one `map_batches` parse pass with an in-batch combiner
(per-batch (host, key, value) dedup — batch triples → distinct triples
leave each task), ONE coarse (host, key)-hash shuffle, and a
per-partition pandas fold; the output is |hosts × params|-sized, the
shuffled volume distinct-triple-sized, never row-count-sized.

Parse semantics (mirrored by the q163 oracle): the query string is
everything between the first '?' and the first '#' after it; pairs
split on '&'; a pair's key is the text before the first '=', its value
the text after (missing '=' → value '').  Hosts use the package-wide
urlsplit-netloc convention (stages/skew.hosts_of_urls).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .skew import hosts_of_urls

__all__ = ["parse_query_params", "param_cardinality_profile"]


def parse_query_params(t: pa.Table, url_col: str = "url") -> pd.DataFrame:
    """Batch kernel: (host, pkey, pval) rows for every query parameter
    occurrence in the batch's urls (urls without a query contribute
    nothing).  pandas C-backed str kernels; no per-row Python loop."""
    host = pd.Series(hosts_of_urls(t[url_col]).to_pandas(), dtype=object)
    s = pd.Series(t[url_col].to_pylist(), dtype=object).fillna("")
    qs = s.str.partition("?")[2].str.partition("#")[0]
    has = qs.str.len() > 0
    if not has.any():
        return pd.DataFrame({"host": [], "pkey": [], "pval": []})
    pairs = qs[has].str.split("&")
    host = host[has]
    n_pairs = pairs.str.len().to_numpy()
    flat = pd.Series(
        np.concatenate(pairs.to_numpy()), dtype=object
    )
    kv = flat.str.partition("=")
    return pd.DataFrame(
        {
            "host": np.repeat(host.to_numpy(), n_pairs),
            "pkey": kv[0].to_numpy(),
            "pval": kv[2].to_numpy(),
        }
    )


def param_cardinality_profile(
    ds: rd.Dataset,
    *,
    url_col: str = "url",
    trap_ratio: float = 0.5,
    trap_min_n: int = 10,
    num_parts: int = 32,
) -> rd.Dataset:
    """Per (host, pkey): occurrence count ``n``, exact distinct value
    count ``n_distinct``, ``distinct_ratio`` and the
    ``is_trap = ratio > trap_ratio AND n >= trap_min_n`` flag.  The
    ratio is an exact integer division (engine and SQL compare identical
    doubles)."""
    from .dedup import add_key_partition

    def partial(t: pa.Table) -> pa.Table:
        df = parse_query_params(t, url_col)
        if not len(df):
            return pa.table(
                {
                    "host": pa.array([], type=pa.string()),
                    "pkey": pa.array([], type=pa.string()),
                    "pval": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                    "_part": pa.array([], type=pa.int32()),
                }
            )
        r = (
            df.groupby(["host", "pkey", "pval"], sort=False)
            .size()
            .reset_index(name="n")
        )
        r["n"] = r["n"].astype("int64")
        # co-locate by (host, pkey) so a partition holds every value of
        # a parameter — the distinct count is then partition-local
        r["_hk"] = r["host"] + "\x1f" + r["pkey"]
        out = pa.Table.from_pandas(r, preserve_index=False)
        return add_key_partition(out, "_hk", num_parts=num_parts).drop_columns(
            ["_hk"]
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        trip = (
            g.groupby(["host", "pkey", "pval"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        prof = trip.groupby(["host", "pkey"], sort=False).agg(
            n=("n", "sum"), n_distinct=("pval", "size")
        ).reset_index()
        prof["n"] = prof["n"].astype("int64")
        prof["n_distinct"] = prof["n_distinct"].astype("int64")
        prof["distinct_ratio"] = prof["n_distinct"] / prof["n"].astype(
            np.float64
        )
        prof["is_trap"] = (prof["distinct_ratio"] > trap_ratio) & (
            prof["n"] >= trap_min_n
        )
        return prof

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .groupby("_part")
        .map_groups(fold, batch_format="pandas")
    )


URL_TEMPLATE_TOKEN = "{n}"


def url_templates(
    ds,
    *,
    url_col: str = "url",
    k: int = 20,
) -> "pd.DataFrame":
    """URL template mining: collapse every digit run in host+path to
    ``{n}`` and count pages per template, top-k — the structure
    discovery step behind crawl canonicalization and per-template
    sampling caps (a /product/{n}/review/{n} template with 10^9 pages
    is one TEMPLATE, not 10^9 distinct contents; cf. the q163
    spider-trap params profile for the query-string side).

    Scale shape: one shuffle-free vectorized regexp_replace scan with
    per-batch template count partials → ONE template-vocab groupby →
    per-block top-k (no global sort).  Oracle: the same RE2
    ``[0-9]+ → {n}`` replace + count + (n DESC, template) tie-break."""
    import pandas as pd

    from .selection import global_top_k
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        s = pd.Series(t[url_col].to_pylist(), dtype=object).fillna("")
        # strip query+fragment, then collapse digit runs
        base = s.str.replace(r"[?#].*$", "", regex=True)
        tpl = base.str.replace(r"[0-9]+", URL_TEMPLATE_TOKEN, regex=True)
        r = tpl.value_counts()
        return pa.table(
            {
                "template": pa.array(r.index.to_numpy(dtype=object), pa.string()),
                "n": pa.array(r.to_numpy(np.int64)),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("template")
        .aggregate(Sum("n", alias_name="n"))
    )
    out = global_top_k(counts, k=k, by=["n", "template"], descending=[True, False])
    if out.empty:  # zero-row input arrives as schema-less empty blocks
        return pd.DataFrame(
            {"template": pd.Series([], dtype=object),
             "n": pd.Series([], dtype="int64")}
        )
    out["n"] = out["n"].astype(np.int64)
    return out[["template", "n"]]
