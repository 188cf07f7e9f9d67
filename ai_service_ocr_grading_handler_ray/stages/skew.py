"""Skew-aware (salted) grouped aggregation — north-rule requirement
(SURVEY.md §4 "Skew": giant hosts own ~20% of rows; a plain groupby
lands them on one reducer).

Two-level exact aggregation for algebraic aggregates (count/sum/min/max):

    stage 1: map_batches adds salt = hash(row_id) % S for rows of hot
             keys (every key gets salt 0..S-1; cheap, no pre-pass needed
             for counts/sums since the merge is exact)
    stage 2: groupby (key, salt) → partial aggregates   (S× smaller groups)
    stage 3: groupby key → merge partials               (tiny)

The reference never aggregates across records at all (SURVEY.md §2.5);
this operator exists for the engine's per-host rollups at 10^12 rows.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Sum

from .hashing import bucket_ids


def host_of_url(url: str) -> str:
    # urlsplit netloc semantics: the authority ends at '/', '?' or '#'
    try:
        auth = url.split("/", 3)[2]
    except IndexError:
        return ""
    return auth.split("?", 1)[0].split("#", 1)[0]


def hosts_of_urls(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized ``host_of_url`` for scheme://host/... urls: one Arrow
    regex kernel instead of a per-row Python split.  Non-matching rows
    (no ``//``) map to "" like the scalar fallback."""
    s = pc.fill_null(urls, "")
    # authority ends at '/', '?' or '#' — urlsplit netloc semantics, so
    # 'http://host?q=1' yields 'host' exactly like the scalar host_of_url
    m = pc.extract_regex(s, pattern="^[^/]*//(?P<h>[^/?#]*)")
    host = pc.struct_field(m, "h")
    return pc.fill_null(host, "")


def add_host_and_salt(batch: pa.Table, url_col: str = "url", salt: int = 8) -> pa.Table:
    return batch.append_column(
        "host", hosts_of_urls(batch[url_col])
    ).append_column("salt", pa.array(bucket_ids(batch[url_col], salt)))


def salted_count(
    ds: rd.Dataset,
    key: str,
    *,
    salt_from: str,
    salt: int = 8,
    sum_col: str | None = None,
) -> pd.DataFrame:
    """Exact grouped count (and optional sum) via two-level salted
    aggregation.  ``salt_from`` names a column whose hash spreads each hot
    key across ``salt`` sub-groups."""

    def add_salt(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "salt", pa.array(bucket_ids(batch[salt_from], salt))
        )

    aggs = [Count(alias_name="_n")]
    if sum_col:
        aggs.append(Sum(sum_col, alias_name="_s"))
    partial = ds.map_batches(add_salt, batch_format="pyarrow").groupby(
        [key, "salt"]
    ).aggregate(*aggs)
    final_aggs = [Sum("_n", alias_name="n")]
    if sum_col:
        final_aggs.append(Sum("_s", alias_name=f"sum_{sum_col}"))
    out = partial.groupby(key).aggregate(*final_aggs).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.reset_index(drop=True)


def partitioned_sum(
    ds: rd.Dataset,
    key: str,
    value_col: str,
    *,
    out_col: str,
    num_parts: int = 32,
) -> rd.Dataset:
    """High-cardinality exact grouped SUM: hash-partition rows on ``key``
    into ``num_parts`` coarse partitions (ONE shuffle whose sort key has
    only ``num_parts`` distinct values) and aggregate each partition with
    a vectorized pandas groupby.  Measured ~7× faster than the per-key
    sort-aggregate on ~500k rows × 150k distinct keys; complements
    ``salted_count`` (which spreads HOT keys — this helper is for many
    uniform keys)."""

    from .dedup import add_key_partition

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby(key, sort=False)[value_col].sum().reset_index()
        return r.rename(columns={value_col: out_col})

    return (
        ds.map_batches(
            lambda t: add_key_partition(t, key, num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(agg, batch_format="pandas")
    )


def partitioned_groupby(
    ds: rd.Dataset,
    keys: list[str],
    agg_map: dict[str, tuple[str, str]],
    *,
    num_parts: int = 32,
) -> rd.Dataset:
    """General high-cardinality grouped aggregation: partition by
    hash(keys[0]) (all rows of a composite group share it → co-located),
    aggregate each partition with ONE vectorized pandas groupby.
    ``agg_map``: out_col -> (src_col, op) with op ∈ {sum, max, min, count,
    size}."""
    from .dedup import add_key_partition

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby(keys, sort=False)
        cols = {}
        for out, (src, op) in agg_map.items():
            cols[out] = getattr(gb[src], op)()
        return pd.concat(cols, axis=1).reset_index()

    return (
        ds.map_batches(
            lambda t: add_key_partition(t, keys[0], num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(agg, batch_format="pandas")
    )


def host_stats(pages: rd.Dataset, salt: int = 8) -> pd.DataFrame:
    """Per-host page count + total payload bytes over the pages table,
    salted against the giant-host skew fixture."""

    def project(batch: pa.Table) -> pa.Table:
        t = add_host_and_salt(batch, salt=salt)
        sizes = pc.binary_length(t["html"])
        return pa.table(
            {"host": t["host"], "salt": t["salt"], "payload_bytes": pc.cast(sizes, pa.int64())}
        )

    partial = (
        pages.map_batches(project, batch_format="pyarrow")
        .groupby(["host", "salt"])
        .aggregate(Count(alias_name="_n"), Sum("payload_bytes", alias_name="_b"))
    )
    out = (
        partial.groupby("host")
        .aggregate(Sum("_n", alias_name="n_pages"), Sum("_b", alias_name="total_bytes"))
        .to_pandas()
    )
    out["n_pages"] = out["n_pages"].astype("int64")
    out["total_bytes"] = out["total_bytes"].astype("int64")
    return out.reset_index(drop=True)
