"""Crawl-snapshot diffing: what changed between two crawls.

An incremental web pipeline re-extracts only pages whose content
CHANGED since the previous snapshot, drops extractions for pages that
are GONE, and queues pages that are NEW — so the snapshot diff is the
gate in front of everything else (the CDX keep-latest step,
``stages/surt.py``, produces exactly the one-capture-per-key inputs
this stage expects).

Scale shape: tag each side with an int8 column, ``union`` the two
Datasets (no materialization — union is lazy block concatenation), ONE
salted key-hash shuffle, then a vectorized per-partition reindex
compare.  Every url meets its twin only inside its own partition; the
driver never sees a row.  The output is one row per distinct url across
both snapshots: ``(key, change ∈ {added, removed, changed, unchanged},
old_hash, new_hash)`` — slim enough to feed an anti-join that prunes
the re-extract queue.

Duplicate keys WITHIN a side are a contract violation (run keep-latest
first) and raise loudly rather than silently picking a winner.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .dedup import add_key_partition

CHANGES = ("added", "removed", "changed", "unchanged")


def snapshot_diff(
    old_ds: rd.Dataset,
    new_ds: rd.Dataset,
    *,
    key_col: str = "url",
    hash_col: str = "content_hash",
    num_parts: int = 64,
) -> rd.Dataset:
    """Lazy Dataset of per-key changes between two crawl snapshots."""

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            return t.select([key_col, hash_col]).append_column(
                "_side", pa.array(np.full(t.num_rows, side, dtype=np.int8))
            )

        return f

    both = old_ds.map_batches(tag(0), batch_format="pyarrow").union(
        new_ds.map_batches(tag(1), batch_format="pyarrow")
    )
    keyed = both.map_batches(
        lambda t: add_key_partition(t, key_col, num_parts=num_parts),
        batch_format="pyarrow",
    )

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        old = g[g["_side"] == 0].set_index(key_col)[hash_col]
        new = g[g["_side"] == 1].set_index(key_col)[hash_col]
        for side, s in (("old", old), ("new", new)):
            if s.index.has_duplicates:
                dup = s.index[s.index.duplicated()][0]
                raise ValueError(
                    f"duplicate key in {side} snapshot (e.g. {dup!r}); "
                    "run CDX keep-latest dedup first"
                )
        keys = old.index.union(new.index, sort=True)
        o = old.reindex(keys)
        n = new.reindex(keys)
        change = np.where(
            o.isna(),
            "added",
            np.where(
                n.isna(),
                "removed",
                np.where(o.to_numpy() == n.to_numpy(), "unchanged", "changed"),
            ),
        )
        # absent-side hashes surface as '' (not NaN/None): a concrete
        # sentinel keeps the column plain-string for Arrow and makes the
        # SQL replay a coalesce, with no engine-specific null spelling
        return pd.DataFrame(
            {
                key_col: keys.to_numpy(),
                "change": change,
                "old_hash": o.fillna("").to_numpy(),
                "new_hash": n.fillna("").to_numpy(),
            }
        )

    return keyed.groupby("_part").map_groups(diff, batch_format="pandas")


def host_churn(
    diff: rd.Dataset,
    *,
    url_col: str = "url",
    status_col: str = "change",
) -> "pd.DataFrame":
    """Per-host churn rollup over a :func:`snapshot_diff` result — the
    recrawl-budget signal (hosts that churn get crawled often, frozen
    hosts get demoted; cf. q146's freshness term).  Output per host:
    the four status counts plus churn_rate = (added + removed +
    changed) / total, rounded to 6.

    Scale shape: one shuffle-free scan (vectorized host extraction +
    per-batch (host, status) Arrow count partials) → ONE
    hosts×4-bounded groupby → |hosts|-sized driver pivot."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .collect import collect_table
    from .selection import round_half_away
    from .skew import hosts_of_urls

    def partial(t: pa.Table) -> pa.Table:
        host = hosts_of_urls(t[url_col])
        g = pa.table({"host": host, "status": t[status_col]}).group_by(
            ["host", "status"]
        ).aggregate([("status", "count")])
        return g.rename_columns(["host", "status", "n"])

    counts = collect_table(
        diff.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["host", "status"])
        .aggregate(Sum("n", alias_name="n"))
    ).to_pandas()
    wide = (
        counts.pivot_table(
            index="host", columns="status", values="n", fill_value=0
        )
        .reindex(columns=["added", "removed", "changed", "unchanged"],
                 fill_value=0)
        .reset_index()
    )
    wide.columns.name = None
    for c in ("added", "removed", "changed", "unchanged"):
        wide[f"n_{c}"] = wide[c].astype("int64")
        del wide[c]
    total = (
        wide["n_added"] + wide["n_removed"] + wide["n_changed"]
        + wide["n_unchanged"]
    ).to_numpy("float64")
    moved = (wide["n_added"] + wide["n_removed"] + wide["n_changed"]).to_numpy(
        "float64"
    )
    wide["churn_rate"] = round_half_away(moved / total, 6)
    return wide.sort_values("host").reset_index(drop=True)


def scd2_history(
    ds: rd.Dataset,
    *,
    key_col: str = "url",
    ts_col: str = "ts",
    hash_col: str = "content_hash",
    num_parts: int = 32,
) -> rd.Dataset:
    """Slowly-changing-dimension (type 2) intervalization of a
    multi-snapshot capture table: collapse each key's (ts-ordered)
    capture sequence into CONTENT RUNS — one row per distinct
    consecutive content version with ``valid_from`` (first capture of
    the run), ``valid_to`` (first capture of the NEXT run; NULL for
    the current version) and a per-key ``version`` counter.  This is
    the history table an incremental corpus keeps so any past crawl
    date can be reconstructed with a point-in-time predicate
    (``valid_from <= d < coalesce(valid_to, 'inf')``) — the temporal
    generalization of :func:`snapshot_diff`'s two-snapshot compare.

    Run-boundary semantics (shared with the SQL replay): a row starts
    a new run iff it is the key's first capture or its hash IS
    DISTINCT FROM the previous capture's (null-safe: NULL→'x',
    'x'→NULL are changes; NULL→NULL is not).  (key, ts) must be unique
    (run CDX keep-latest first — :mod:`.surt`); null key/ts rows drop
    on both engines.

    Scale shape: ONE salted key-hash shuffle, vectorized per-partition
    shift compare (no Python loop), lazy Dataset out — one output row
    per content RUN, never per capture.  SQL replay is GENERATED by
    :func:`scd2_sql` (single-generator policy)."""

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.dropna(subset=[key_col, ts_col]).sort_values(
            [key_col, ts_col], kind="mergesort"
        )
        pk = g[key_col].shift()
        ph = g[hash_col].shift()
        h = g[hash_col]
        same_hash = (h == ph) | (h.isna() & ph.isna())
        new_run = (g[key_col] != pk) | pk.isna() | ~same_hash
        r = g[new_run]
        nk = r[key_col].shift(-1)
        valid_to = r[ts_col].shift(-1).where(nk == r[key_col])
        version = r.groupby(key_col, sort=False).cumcount() + 1
        return pd.DataFrame(
            {
                key_col: r[key_col],
                hash_col: r[hash_col],
                "valid_from": r[ts_col],
                "valid_to": valid_to,
                "version": version.astype(np.int64),
            }
        )

    return (
        ds.map_batches(
            lambda t: add_key_partition(t, key_col, num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(per_partition, batch_format="pandas")
    )


def scd2_sql(
    *,
    table: str,
    key_col: str = "url",
    ts_col: str = "ts",
    hash_col: str = "content_hash",
) -> str:
    """DuckDB replay of :func:`scd2_history` (single-generator):
    identical null-safe run-boundary predicate and lead() interval
    close."""
    return f"""
        WITH base AS (
            SELECT {key_col} AS k, {ts_col} AS ts, {hash_col} AS h
            FROM {table}
            WHERE {key_col} IS NOT NULL AND {ts_col} IS NOT NULL
        ), o AS (
            SELECT k, ts, h, lag(ts) OVER w AS pts, lag(h) OVER w AS ph
            FROM base WINDOW w AS (PARTITION BY k ORDER BY ts)
        ), r AS (
            SELECT k, ts, h FROM o
            WHERE pts IS NULL OR (h IS DISTINCT FROM ph)
        )
        SELECT k AS {key_col}, h AS {hash_col},
               ts AS valid_from,
               lead(ts) OVER (PARTITION BY k ORDER BY ts) AS valid_to,
               CAST(row_number() OVER (PARTITION BY k ORDER BY ts)
                    AS BIGINT) AS version
        FROM r
    """


def change_rate(
    ds: rd.Dataset,
    *,
    key_col: str = "url",
    ts_col: str = "ts",
    hash_col: str = "content_hash",
    fast_threshold: float = 0.5,
    num_parts: int = 32,
    round_to: int = 6,
) -> rd.Dataset:
    """Per-key content change-rate estimate from a multi-snapshot
    capture table: across each key's ts-ordered captures, the fraction
    of revisits that found NEW content —

        change_rate = n_changes / (n_caps − 1)

    with the same null-safe IS-DISTINCT-FROM boundary as
    :func:`scd2_history` — plus a revisit-priority bucket: ``fast``
    (rate ≥ fast_threshold — re-crawl often), ``slow`` (changed at
    least once), ``static`` (never changed — longest revisit
    interval), ``unknown`` (single capture, no evidence).  This is the
    scheduler input an incremental crawl derives from its own history:
    Cho & Garcia-Molina-style frequency estimation collapsed to the
    bucketed policy a frontier (pipelines/crawl.py) actually consumes.

    Single-capture keys report change_rate = −1.0 (the engine/oracle
    hash-stable sentinel for "undefined", the q235 convention) and
    bucket ``unknown``.  Null key/ts rows drop on both engines.

    Scale shape: ONE salted key-hash shuffle, vectorized per-partition
    factorize + shift compare, lazy Dataset out — one row per key,
    never per capture; nothing returns to the driver.  SQL replay is
    GENERATED by :func:`change_rate_sql` (single-generator)."""
    from .selection import round_half_away

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        # hash_col as the (key, ts) tie-break: without it, tied
        # captures carrying different hashes make n_changes depend on
        # block-arrival order (and on the oracle's undefined lag order)
        g = g.dropna(subset=[key_col, ts_col]).sort_values(
            [key_col, ts_col, hash_col], kind="mergesort"
        )
        if not len(g):
            return pd.DataFrame(
                {key_col: pd.Series([], dtype=object),
                 "n_caps": pd.Series([], dtype=np.int64),
                 "n_changes": pd.Series([], dtype=np.int64),
                 "change_rate": pd.Series([], dtype=np.float64),
                 "revisit": pd.Series([], dtype=object)}
            )
        pk = g[key_col].shift()
        ph = g[hash_col].shift()
        h = g[hash_col]
        same_hash = (h == ph) | (h.isna() & ph.isna())
        changed = (g[key_col] == pk) & ~same_hash
        agg = pd.DataFrame({"k": g[key_col], "c": changed.astype(np.int64)})
        out = agg.groupby("k", sort=False).agg(
            n_caps=("c", "size"), n_changes=("c", "sum")
        ).reset_index()
        caps = out["n_caps"].to_numpy(dtype=np.int64)
        chg = out["n_changes"].to_numpy(dtype=np.int64)
        with np.errstate(divide="ignore", invalid="ignore"):
            rate = np.where(caps > 1, chg / np.maximum(caps - 1, 1), -1.0)
        bucket = np.where(
            caps == 1, "unknown",
            np.where(rate >= fast_threshold, "fast",
                     np.where(chg > 0, "slow", "static")),
        )
        return pd.DataFrame(
            {
                key_col: out["k"],
                "n_caps": caps,
                "n_changes": chg,
                "change_rate": round_half_away(rate, round_to),
                "revisit": bucket.astype(object),
            }
        )

    return (
        ds.map_batches(
            lambda t: add_key_partition(t, key_col, num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(per_partition, batch_format="pandas")
    )


def change_rate_sql(
    *,
    table: str,
    key_col: str = "url",
    ts_col: str = "ts",
    hash_col: str = "content_hash",
    fast_threshold: float = 0.5,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`change_rate` (single-generator):
    identical IS-DISTINCT-FROM boundary, −1.0 sentinel, buckets."""
    return f"""
        WITH base AS (
            SELECT {key_col} AS k, {ts_col} AS ts, {hash_col} AS h
            FROM {table}
            WHERE {key_col} IS NOT NULL AND {ts_col} IS NOT NULL
        ), o AS (
            SELECT k, h,
                   lag(h) OVER (PARTITION BY k ORDER BY ts, h) AS ph,
                   row_number() OVER (PARTITION BY k ORDER BY ts, h)
                       AS rn
            FROM base
        ), c AS (
            SELECT k,
                   count(*) AS n_caps,
                   sum(CASE WHEN rn > 1 AND h IS DISTINCT FROM ph
                            THEN 1 ELSE 0 END) AS n_changes
            FROM o GROUP BY k
        )
        SELECT k AS {key_col},
               CAST(n_caps AS BIGINT) AS n_caps,
               CAST(n_changes AS BIGINT) AS n_changes,
               CASE WHEN n_caps = 1 THEN -1.0
                    ELSE round(n_changes / CAST(n_caps - 1 AS DOUBLE),
                               {round_to}) END AS change_rate,
               CASE WHEN n_caps = 1 THEN 'unknown'
                    WHEN n_changes / CAST(n_caps - 1 AS DOUBLE)
                         >= {fast_threshold} THEN 'fast'
                    WHEN n_changes > 0 THEN 'slow'
                    ELSE 'static' END AS revisit
        FROM c
    """


def revisit_priorities(
    caps: rd.Dataset,
    *,
    key_col: str = "url",
    ts_col: str = "ts",
    hash_col: str = "content_hash",
    fast_threshold: float = 0.5,
    round_to: int = 6,
) -> pd.DataFrame:
    """Per-HOST revisit scheduling priorities composed from the per-url
    :func:`change_rate` estimates — the capstone that turns capture
    history into the number a crawl frontier actually consumes: hosts
    whose content churns get budget, static archives don't.

        share_fast = fast urls / urls
        mean_rate  = avg change_rate over multi-capture urls
                     (−1.0 sentinel when the host has none)
        priority   = 0.5·share_fast + 0.5·max(mean_rate, 0)

    Scale shape: :func:`change_rate`'s ONE url-hash shuffle, then a
    shuffle-free host-extraction partial scan (the stages/skew.py
    Arrow regex kernel) folding to ONE |hosts|-sized groupby; the
    driver holds hosts rows.  Output: (host, n_urls:int64,
    n_known:int64, n_fast:int64, mean_rate, priority) sorted by
    (priority DESC, host).  SQL replay GENERATED by
    :func:`revisit_priorities_sql` (full CTE replay of the change-rate
    pass + the same rollup)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .selection import round_half_away
    from .skew import hosts_of_urls

    cr = change_rate(
        caps, key_col=key_col, ts_col=ts_col, hash_col=hash_col,
        fast_threshold=fast_threshold, round_to=round_to,
    )

    def partial(t: pa.Table) -> pa.Table:
        host = hosts_of_urls(t[key_col])
        known = pc.greater(t["n_caps"], pa.scalar(1))
        known_i = np.asarray(known.to_numpy(zero_copy_only=False),
                             dtype=bool).astype(np.int64)
        rate = t["change_rate"].to_numpy(zero_copy_only=False)
        fast = np.asarray(
            pc.equal(t["revisit"], pa.scalar("fast")).to_numpy(
                zero_copy_only=False
            ),
            dtype=bool,
        ).astype(np.int64)
        return (
            pa.table(
                {"host": host,
                 "one": pa.array(np.ones(len(t), dtype=np.int64)),
                 "known": pa.array(known_i),
                 "fast": pa.array(fast),
                 "rate_sum": pa.array(np.where(known_i == 1, rate, 0.0))}
            )
            .group_by("host")
            .aggregate([("one", "sum"), ("known", "sum"),
                        ("fast", "sum"), ("rate_sum", "sum")])
        )

    out = (
        cr.map_batches(partial, batch_format="pyarrow")
        .groupby("host")
        .aggregate(
            Sum("one_sum", alias_name="n_urls"),
            Sum("known_sum", alias_name="n_known"),
            Sum("fast_sum", alias_name="n_fast"),
            Sum("rate_sum_sum", alias_name="rate_sum"),
        )
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {"host": pd.Series([], dtype=object),
             "n_urls": pd.Series([], dtype=np.int64),
             "n_known": pd.Series([], dtype=np.int64),
             "n_fast": pd.Series([], dtype=np.int64),
             "mean_rate": pd.Series([], dtype=np.float64),
             "priority": pd.Series([], dtype=np.float64)}
        )
    n_urls = out["n_urls"].to_numpy(dtype=np.int64)
    n_known = out["n_known"].to_numpy(dtype=np.int64)
    n_fast = out["n_fast"].to_numpy(dtype=np.int64)
    rate_sum = out["rate_sum"].to_numpy(dtype=np.float64)
    share_fast = n_fast / n_urls
    mean_rate = np.where(
        n_known > 0, rate_sum / np.maximum(n_known, 1), -1.0
    )
    priority = 0.5 * share_fast + 0.5 * np.maximum(mean_rate, 0.0)
    res = pd.DataFrame(
        {
            "host": out["host"],
            "n_urls": n_urls,
            "n_known": n_known,
            "n_fast": n_fast,
            "mean_rate": round_half_away(mean_rate, round_to),
            "priority": round_half_away(priority, round_to),
        }
    )
    return res.sort_values(["priority", "host"], ascending=[False, True],
                           kind="mergesort").reset_index(drop=True)


def revisit_priorities_sql(
    *,
    table: str,
    key_col: str = "url",
    ts_col: str = "ts",
    hash_col: str = "content_hash",
    fast_threshold: float = 0.5,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`revisit_priorities` (single-generator):
    the change-rate CTE verbatim + the same host rollup (urlsplit
    netloc regex, identical sentinel/priority arithmetic)."""
    inner = change_rate_sql(
        table=table, key_col=key_col, ts_col=ts_col, hash_col=hash_col,
        fast_threshold=fast_threshold, round_to=round_to,
    )
    return f"""
        WITH cr AS ({inner}),
        g AS (
            SELECT coalesce(
                       regexp_extract({key_col},
                                      '^[^/]*//([^/?#]*)', 1), ''
                   ) AS host,
                   count(*) AS n_urls,
                   sum(CASE WHEN n_caps > 1 THEN 1 ELSE 0 END) AS n_known,
                   sum(CASE WHEN revisit = 'fast' THEN 1 ELSE 0 END)
                       AS n_fast,
                   sum(CASE WHEN n_caps > 1 THEN change_rate
                            ELSE 0 END) AS rate_sum
            FROM cr GROUP BY 1
        )
        SELECT host,
               CAST(n_urls AS BIGINT) AS n_urls,
               CAST(n_known AS BIGINT) AS n_known,
               CAST(n_fast AS BIGINT) AS n_fast,
               CASE WHEN n_known > 0
                    THEN round(rate_sum / CAST(n_known AS DOUBLE),
                               {round_to})
                    ELSE -1.0 END AS mean_rate,
               round(0.5 * (n_fast / CAST(n_urls AS DOUBLE))
                     + 0.5 * greatest(
                           CASE WHEN n_known > 0
                                THEN rate_sum / CAST(n_known AS DOUBLE)
                                ELSE -1.0 END, 0.0),
                     {round_to}) AS priority
        FROM g
    """


def content_survival(
    ds: rd.Dataset,
    *,
    key_col: str = "url",
    ts_col: str = "ts",
    hash_col: str = "content_hash",
    num_parts: int = 32,
    round_to: int = 6,
) -> pd.DataFrame:
    """Corpus-level content-survival curve over capture AGE: for each
    revisit age k ≥ 1 (the k-th recapture of a url, in per-url capture
    order),

        hazard(k)   = changed_at_k / at_risk_k
        survival(k) = Π_{j ≤ k} (1 − hazard(j))

    — the content half-life a crawl planner reads to set DEFAULT
    revisit intervals before per-url evidence exists (q247 estimates
    per url, q254 rolls up per host; this is the corpus prior).
    "Changed" is the scd2 null-safe IS-DISTINCT-FROM boundary with the
    hash tie-break; at_risk_k counts urls with ≥ k+1 captures
    (right-censoring by capture depth, the q228 Kaplan-Meier
    convention).

    Survival multiplies UNROUNDED hazards via exp-of-cumulative-ln in
    the SAME age order on both engines (the q228 replay trick); a
    hazard of exactly 1 extinguishes the curve (survival 0 from that
    age on) via an explicit flag on both sides — DuckDB's ln(0)
    throws.  Scale shape: ONE salted url-hash shuffle, vectorized
    per-partition shift compare folding to ages-sized (at_risk,
    changed) partials; the driver holds |ages| rows (bounded by the
    max capture depth).  Output: (age:int64, n_at_risk:int64,
    n_changed:int64, hazard, survival) sorted by age.  SQL replay
    GENERATED by :func:`content_survival_sql`."""
    from .collect import collect_tables
    from .selection import round_half_away

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"age": pd.Series([], dtype=np.int64),
             "at_risk": pd.Series([], dtype=np.int64),
             "changed": pd.Series([], dtype=np.int64)}
        )
        g = g.dropna(subset=[key_col, ts_col])
        if not len(g):
            return empty
        g = g.sort_values([key_col, ts_col, hash_col], kind="mergesort")
        pk = g[key_col].shift()
        ph = g[hash_col].shift()
        h = g[hash_col]
        same_key = g[key_col] == pk
        same_hash = (h == ph) | (h.isna() & ph.isna())
        age = g.groupby(key_col, sort=False).cumcount()
        rows = pd.DataFrame(
            {"age": age[same_key].to_numpy(dtype=np.int64),
             "chg": (~same_hash[same_key]).to_numpy().astype(np.int64)}
        )
        if rows.empty:
            return empty
        agg = rows.groupby("age", sort=False).agg(
            at_risk=("chg", "size"), changed=("chg", "sum")
        ).reset_index()
        return pd.DataFrame(
            {"age": agg["age"].astype(np.int64),
             "at_risk": agg["at_risk"].astype(np.int64),
             "changed": agg["changed"].astype(np.int64)}
        )

    folded = (
        ds.map_batches(
            lambda t: add_key_partition(t, key_col, num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(per_partition, batch_format="pandas")
    )
    acc: dict = {}
    for t in collect_tables(folded, drop_empty=True):
        for a, r, c in zip(t["age"].to_pylist(), t["at_risk"].to_pylist(),
                           t["changed"].to_pylist()):
            ar, ch = acc.get(a, (0, 0))
            acc[a] = (ar + int(r), ch + int(c))
    if not acc:
        return pd.DataFrame(
            {"age": pd.Series([], dtype=np.int64),
             "n_at_risk": pd.Series([], dtype=np.int64),
             "n_changed": pd.Series([], dtype=np.int64),
             "hazard": pd.Series([], dtype=np.float64),
             "survival": pd.Series([], dtype=np.float64)}
        )
    ages = sorted(acc)
    at_risk = np.array([acc[a][0] for a in ages], dtype=np.int64)
    changed = np.array([acc[a][1] for a in ages], dtype=np.int64)
    hazard = changed / at_risk
    dead = np.maximum.accumulate(hazard >= 1.0)
    with np.errstate(divide="ignore"):
        lns = np.where(hazard < 1.0, np.log(1.0 - hazard), 0.0)
    survival = np.where(dead, 0.0, np.exp(np.cumsum(lns)))
    return pd.DataFrame(
        {
            "age": np.array(ages, dtype=np.int64),
            "n_at_risk": at_risk,
            "n_changed": changed,
            "hazard": round_half_away(hazard, round_to),
            "survival": round_half_away(survival, round_to),
        }
    )


def content_survival_sql(
    *,
    table: str,
    key_col: str = "url",
    ts_col: str = "ts",
    hash_col: str = "content_hash",
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`content_survival` (single-generator):
    identical age indexing, IS-DISTINCT boundary with hash tie-break,
    exp-of-cumulative-ln survival with the extinction flag (ln(0)
    throws in DuckDB, so dead ages short-circuit to 0.0)."""
    return f"""
        WITH base AS (
            SELECT {key_col} AS k, {ts_col} AS ts, {hash_col} AS h
            FROM {table}
            WHERE {key_col} IS NOT NULL AND {ts_col} IS NOT NULL
        ), o AS (
            SELECT k, h,
                   lag(h) OVER (PARTITION BY k ORDER BY ts, h) AS ph,
                   row_number() OVER (PARTITION BY k ORDER BY ts, h) - 1
                       AS age
            FROM base
        ), per_age AS (
            SELECT age, count(*) AS n_at_risk,
                   sum(CASE WHEN h IS DISTINCT FROM ph THEN 1 ELSE 0 END)
                       AS n_changed
            FROM o WHERE age >= 1 GROUP BY age
        ), hz AS (
            SELECT age, n_at_risk, n_changed,
                   n_changed / CAST(n_at_risk AS DOUBLE) AS h
            FROM per_age
        ), surv AS (
            SELECT age, n_at_risk, n_changed, h,
                   max(CASE WHEN h >= 1 THEN 1 ELSE 0 END) OVER (
                       ORDER BY age ROWS UNBOUNDED PRECEDING
                   ) AS dead,
                   sum(CASE WHEN h < 1 THEN ln(1 - h) ELSE 0 END) OVER (
                       ORDER BY age ROWS UNBOUNDED PRECEDING
                   ) AS lnsum
            FROM hz
        )
        SELECT CAST(age AS BIGINT) AS age,
               CAST(n_at_risk AS BIGINT) AS n_at_risk,
               CAST(n_changed AS BIGINT) AS n_changed,
               round(h, {round_to}) AS hazard,
               CASE WHEN dead = 1 THEN 0.0
                    ELSE round(exp(lnsum), {round_to}) END AS survival
        FROM surv
    """
