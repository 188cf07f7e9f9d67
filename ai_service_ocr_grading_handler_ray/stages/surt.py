"""SURT URL canonicalization + CDX-style latest-snapshot dedup.

SURT (Sort-friendly URI Reordering Transform) is the canonical URL key
of web-archive indexes (Common Crawl CDX / OpenWayback): the host's
labels are reversed so URLs of one registrable domain sort together,
which makes the crawl index range-scannable by domain — the key a CDX
dedup ("keep the latest capture per canonical URL") groups on.

Reference parity note: the reference repo has no crawl-index surface —
this is part of the "operations a large-scale training-data pipeline
would need" mandate (a Common-Crawl-scale ingest dedups captures by
SURT key before extraction).

Canonical form implemented (scope documented, both kernels identical):

    scheme://Host/rest  ->  reversed,host,labels)/rest

- the scheme (everything through ``//``) is dropped;
- the authority ends at the first ``/``, ``?`` or ``#`` (urlsplit
  netloc semantics — the same rule as ``skew.hosts_of_urls``);
- the host is lowercased and ONE leading ``www.`` is stripped;
- host labels are reversed and joined with ``,``;
- the rest (path + query, starting at the authority terminator) is kept
  verbatim; an empty rest canonicalizes to ``/``.

Out of scope (documented): ports and userinfo stay attached to their
label, fragments are kept with the rest, and IP hosts reverse like any
other dotted name.  Within this scope the SQL expression produced by
:func:`surt_sql` is generated from the SAME spec as the batch kernel
(single-generator policy), so the oracle cannot desync from the engine.

Scale shape: canonicalization is one shuffle-free vectorized scan (the
label-reversal loop iterates over label COUNT, <= ``_MAX_LABELS``
fully-vectorized passes — never over rows); the CDX keep-latest is one
salted-partition groupby with a vectorized sort/keep-first inside each
partition (the `normalized_dedup_keep_best` pattern, dedup.py).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd

from .dedup import add_key_partition

# deepest host seen in practice is ~6 labels; the loop exits early when
# every row is exhausted, this is just a loud upper bound
_MAX_LABELS = 16


def surt_hosts(hosts: pd.Series) -> pd.Series:
    """Vectorized host -> reversed-label SURT authority.

    Lowercase, strip one leading ``www.``, reverse the dot-separated
    labels and join with ``,``.  The reversal loops over label
    POSITIONS (each pass a vectorized ``str.rpartition``), not rows.
    """
    h = hosts.fillna("").astype(str).str.lower()
    h = h.str.replace(r"^www\.", "", n=1, regex=True)
    key = None
    rem = h
    for _ in range(_MAX_LABELS):
        if not (rem != "").any():
            break
        trip = rem.str.rpartition(".")
        label, rem = trip[2], trip[0]
        if key is None:
            key = label
        else:
            key = key.where(label == "", key.str.cat(label, sep=","))
    else:
        raise ValueError(f"surt_hosts: a host exceeds {_MAX_LABELS} labels")
    return key if key is not None else h


def surt_keys_batch(
    t: pa.Table, *, url_col: str = "url", out: str = "surt_key"
) -> pa.Table:
    """``map_batches`` kernel: append the SURT key column (see module
    docstring for the canonical form)."""
    s = pd.Series(t[url_col].to_pandas()).fillna("").astype(str)
    full = s.str.replace(r"^[^/]*//", "", n=1, regex=True)
    auth = full.str.extract(r"^([^/?#]*)", expand=False)
    rest = full.str.replace(r"^[^/?#]*", "", n=1, regex=True)
    rest = rest.where(rest != "", "/")
    key = surt_hosts(auth).str.cat(rest, sep=")")
    return t.append_column(out, pa.array(key.to_numpy(), type=pa.string()))


def surt_sql(url_expr: str) -> str:
    """DuckDB expression computing the SAME SURT key as
    :func:`surt_keys_batch` for ``url_expr`` — generated here so the
    oracle and the engine share one spec (the ``pagerank_sql`` /
    ``chunking_sql`` single-generator policy).

    DuckDB's ``regexp_replace`` without the ``'g'`` flag replaces only
    the first match, mirroring the kernel's ``n=1``.
    """
    full = f"regexp_replace({url_expr}, '^[^/]*//', '')"
    host = (
        f"regexp_replace(lower(regexp_extract({url_expr},"
        f" '^[^/]*//([^/?#]*)', 1)), '^www\\.', '')"
    )
    rest = f"regexp_replace({full}, '^[^/?#]*', '')"
    return (
        f"array_to_string(list_reverse(string_split({host}, '.')), ',')"
        f" || ')' || (CASE WHEN {rest} = '' THEN '/' ELSE {rest} END)"
    )


def cdx_latest_per_surt(
    ds: rd.Dataset,
    *,
    url_col: str = "url",
    ts_col: str = "ts_us",
    num_parts: int = 32,
) -> rd.Dataset:
    """CDX dedup: ONE capture per SURT key — the LATEST (max ``ts_col``;
    ties keep the lexicographically smallest url, then it's a true dup).

    One shuffle-free canonicalization scan, then one salted-partition
    shuffle co-locating each key's captures; inside a partition one
    vectorized sort + groupby-first handles every key.  Output:
    (surt_key, url, <ts_col>, n_captures), one row per key.
    """
    keyed = ds.map_batches(
        lambda t: add_key_partition(
            surt_keys_batch(t, url_col=url_col), "surt_key", num_parts=num_parts
        ),
        batch_format="pyarrow",
    )

    def best(g: pd.DataFrame) -> pd.DataFrame:
        r = (
            g.sort_values(
                ["surt_key", ts_col, url_col],
                ascending=[True, False, True],
                kind="mergesort",
            )
            .groupby("surt_key", sort=False)
            .agg(
                url=(url_col, "first"),
                **{ts_col: (ts_col, "first")},
                n_captures=(url_col, "size"),
            )
            .reset_index()
        )
        r["n_captures"] = r["n_captures"].astype("int64")
        return r

    return keyed.groupby("_part").map_groups(best, batch_format="pandas")
