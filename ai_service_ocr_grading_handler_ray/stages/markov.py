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
