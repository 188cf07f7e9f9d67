"""First-order Markov transition model over per-key event streams.

The page-flow / next-event analytic (clickstream transition
probabilities, crawl navigation models): for every ordered pair of
consecutive states within a key's timeline, count transitions and
normalize per source state.

Scale shape: ONE key-hash shuffle co-locates each key's events
(`add_key_partition` coarse groups — partitions, not per-key Ray
groups), a vectorized per-partition pass (mergesort + shifted-key mask,
no Python loop) emits state-pair partial counts, and the driver folds
pair-vocab × partitions rows — bounded by |states|² × partitions, never
event-count-sized.

Reference anchor: the reference's per-record status flow
(processing → processed/error, service_handler.py:103-139) is a
hand-written two-state machine; this stage learns the transition
structure from the stream instead.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["transition_matrix"]


def transition_matrix(
    ds: rd.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("event_id",),
    state_col: str = "event_type",
    num_parts: int = 32,
) -> pd.DataFrame:
    """(cur, nxt, n, p) transition table: n = count of consecutive
    (cur → nxt) pairs within a key ordered by (ts, *order_cols);
    p = n / total transitions out of cur.  Ordering ties must be broken
    by ``order_cols`` (unique within key) for a deterministic result —
    identical to SQL ``lead() OVER (PARTITION BY key ORDER BY ts,
    *order_cols)``.  Output is |states|²-bounded (driver-safe)."""
    from .dedup import add_key_partition

    sort_cols = [key_col, ts_col, *order_cols]

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, kind="mergesort")
        k = g[key_col].to_numpy()
        s = g[state_col].to_numpy()
        if len(g) < 2:
            return pd.DataFrame({"cur": [], "nxt": [], "n": []})
        same = k[:-1] == k[1:]
        out = pd.DataFrame({"cur": s[:-1][same], "nxt": s[1:][same]})
        r = out.groupby(["cur", "nxt"], sort=False).size().reset_index(name="n")
        r["n"] = r["n"].astype("int64")
        return r

    partials = (
        ds.map_batches(
            lambda t: add_key_partition(t, key_col, num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(per_part, batch_format="pandas")
    )
    blocks = [
        b.to_pandas()
        for b in partials.iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    ]
    if not blocks:
        return pd.DataFrame(
            {"cur": pd.Series(dtype=object), "nxt": pd.Series(dtype=object),
             "n": pd.Series(dtype="int64"), "p": pd.Series(dtype="float64")}
        )
    folded = (
        pd.concat(blocks, ignore_index=True)
        .groupby(["cur", "nxt"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    folded["n"] = folded["n"].astype("int64")
    totals = folded.groupby("cur")["n"].transform("sum")
    folded["p"] = folded["n"] / totals.astype(np.float64)
    return folded.reset_index(drop=True)


def top_event_paths(
    ds: rd.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple = ("event_id",),
    state_col: str = "event_type",
    path_len: int = 3,
    k: int = 20,
    sep: str = ">",
    num_parts: int = 32,
) -> pd.DataFrame:
    """Top-k most frequent length-``path_len`` event-type paths across
    all user timelines — the clickstream path-mining sibling of the
    first-order :func:`transition_matrix` (which sees only pairs; a
    funnel like view>click>purchase is a path).  Paths are consecutive
    within a key, ordered by (ts, *order_cols); output (path, n) with
    the deterministic (n DESC, path ASC) tie-break.

    Scale shape: ONE key-hash coarse-partition shuffle (a key's
    timeline co-locates), vectorized per-partition shifted-mask path
    extraction + partial counts, then a |path-vocab|-bounded groupby
    folded by per-block top-k (`selection.global_top_k` — no global
    sort)."""
    from ray.data.aggregate import Sum

    from .dedup import add_key_partition
    from .selection import global_top_k

    sort_cols = [key_col, ts_col, *order_cols]

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        # null states would TypeError in the string concat below; they
        # carry no path information — drop them from the timeline
        g = g[g[state_col].notna()].sort_values(sort_cols, kind="mergesort")
        kk = g[key_col].to_numpy()
        s = g[state_col].to_numpy(dtype=object)
        n = len(g)
        if n < path_len:
            return pd.DataFrame({"path": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        m = path_len - 1
        same = np.ones(n - m, dtype=bool)
        for j in range(m):
            same &= kk[j : n - m + j] == kk[j + 1 : n - m + j + 1]
        path = s[:n - m].copy()
        for j in range(1, path_len):
            path = path + sep
            path = path + s[j : n - m + j]
        r = pd.Series(path[same]).value_counts()
        out = r.rename_axis("path").reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    counts = (
        ds.map_batches(
            lambda t: add_key_partition(t, key_col, num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(per_part, batch_format="pandas")
        .groupby("path")
        .aggregate(Sum("n", alias_name="n"))
    )
    out = global_top_k(counts, k=k, by=["n", "path"], descending=[True, False])
    if out.empty:  # no key had path_len consecutive events
        return pd.DataFrame(
            {"path": pd.Series([], dtype=object),
             "n": pd.Series([], dtype="int64")}
        )
    out["n"] = out["n"].astype(np.int64)
    return out[["path", "n"]]


def session_copairs(
    ds: rd.Dataset,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    gap_s: int = 1800,
    top_k: int = 20,
    num_parts: int = 32,
) -> pd.DataFrame:
    """Frequent co-occurring event-type pairs WITHIN sessions: gap-based
    sessionization (the q12 convention), then each session's DISTINCT
    unordered type pairs (a < b) counted by the number of sessions they
    co-occur in, top_k by (n DESC, a, b) — the unordered market-basket
    view next to the ORDERED transition matrix / top-paths operators
    (an (error, purchase) pair surfaces "errors happen in buying
    sessions" even when the two never occur adjacently).

    Scale shape: ONE user-hash coarse shuffle; per partition, every
    user sessionizes in one vectorized pass, sessions collapse to
    distinct (session, type) rows, and the pair expansion is a
    type-vocab-bounded pandas merge per session group (the type vocab
    is small by construction — event taxonomies are enums, not open
    sets; loud 10_000-type cap); partitions emit pair-count partials
    and the driver folds pairs-sized rows.  Output: (type_a, type_b,
    n_sessions:int64).  SQL replay: single-generator
    :func:`session_copairs_sql`."""
    from .dedup import add_key_partition

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "type_a": pd.Series([], dtype=object),
                "type_b": pd.Series([], dtype=object),
                "n": pd.Series([], dtype=np.int64),
            }
        )
        if not len(g):
            return empty
        if g[type_col].nunique(dropna=True) > 10_000:
            raise ValueError(
                "session_copairs: type vocabulary exceeds 10000 — pair "
                "expansion assumes an enum-sized taxonomy"
            )
        g = g.sort_values([key_col, ts_col, id_col], kind="mergesort")
        # SQL lag semantics: a NEW session iff the PREVIOUS row's ts is
        # NULL/absent or the gap exceeds gap_s — a null-ts CURRENT row
        # stays in the prior session (NULL > gap_s is falsy), which a
        # diff().isna() test would wrongly split
        prev = g.groupby(key_col, sort=False)[ts_col].shift()
        gap = (g[ts_col] - prev).dt.total_seconds()
        new_s = prev.isna() | (gap > gap_s)
        sid = new_s.cumsum()  # globally unique within the partition
        st = (
            pd.DataFrame({"sid": sid, "t": g[type_col]})
            .dropna(subset=["t"])
            .drop_duplicates(["sid", "t"])
        )
        pairs = st.merge(st, on="sid")
        pairs = pairs[pairs["t_x"] < pairs["t_y"]]
        out = (
            pairs.groupby(["t_x", "t_y"], sort=False)
            .size()
            .reset_index(name="n")
        )
        out.columns = ["type_a", "type_b", "n"]
        out["n"] = out["n"].astype(np.int64)
        return out

    folded = (
        ds.map_batches(
            lambda t: add_key_partition(t, key_col, num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(per_partition, batch_format="pandas")
        .to_pandas()
    )
    if not len(folded):
        return pd.DataFrame(
            {"type_a": pd.Series([], dtype=object),
             "type_b": pd.Series([], dtype=object),
             "n_sessions": pd.Series([], dtype=np.int64)}
        )
    agg = (
        folded.groupby(["type_a", "type_b"], as_index=False)["n"].sum()
        .sort_values(["n", "type_a", "type_b"],
                     ascending=[False, True, True], kind="mergesort")
        .head(top_k)
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "type_a": agg["type_a"],
            "type_b": agg["type_b"],
            "n_sessions": agg["n"].astype(np.int64),
        }
    )


def session_copairs_sql(
    *,
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    gap_s: int = 1800,
    top_k: int = 20,
) -> str:
    """DuckDB replay of :func:`session_copairs` (single-generator):
    the q12 sessionize CTE, DISTINCT (session, type), self-join a < b,
    (n DESC, a, b) top-k."""
    return f"""
        WITH o AS (
            SELECT {key_col}, {type_col}, {ts_col}, {id_col},
                   lag({ts_col}) OVER (PARTITION BY {key_col}
                                       ORDER BY {ts_col}, {id_col}) AS prev
            FROM {table}
        ), m AS (
            SELECT {key_col}, {type_col}, {ts_col}, {id_col},
                   CASE WHEN prev IS NULL
                             OR epoch({ts_col}) - epoch(prev) > {gap_s}
                        THEN 1 ELSE 0 END AS new_s
            FROM o
        ), s AS (
            SELECT {key_col}, {type_col},
                   sum(new_s) OVER (PARTITION BY {key_col}
                                    ORDER BY {ts_col}, {id_col}
                                    ROWS UNBOUNDED PRECEDING) AS session_id
            FROM m
        ), st AS (
            SELECT DISTINCT {key_col}, session_id, {type_col} AS t
            FROM s WHERE {type_col} IS NOT NULL
        ), p AS (
            SELECT a.t AS type_a, b.t AS type_b, count(*) AS n
            FROM st a
            JOIN st b ON a.{key_col} = b.{key_col}
                     AND a.session_id = b.session_id AND a.t < b.t
            GROUP BY a.t, b.t
        ), r AS (
            SELECT *, row_number() OVER (ORDER BY n DESC, type_a, type_b)
                       AS rn
            FROM p
        )
        SELECT type_a, type_b, CAST(n AS BIGINT) AS n_sessions
        FROM r WHERE rn <= {top_k}
    """
