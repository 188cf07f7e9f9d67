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
