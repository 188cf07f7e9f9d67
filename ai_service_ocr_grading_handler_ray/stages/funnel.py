"""Funnel analysis over an event stream — the ordered-progression
analytic (view → click → purchase) product pipelines run constantly:
how many users reached step i, where step i counts only if it happens
STRICTLY AFTER the user's step i-1 and within ``window_us`` of their
step-1 time.

Semantics (replayed exactly by the generated oracle,
:func:`funnel_sql` — single-generator policy):

    t_1(u) = min ts of step-1 events of u
    t_i(u) = min ts of step-i events with ts > t_{i-1}(u)
             and ts - t_1(u) <= window_us
    n_users(i) = |{u : t_i(u) exists}|

Scale shape: ONE user-hash shuffle (the sessionize pattern — a user's
events co-locate), then a fully VECTORIZED per-partition pass: each
step is one boolean mask + one per-user groupby-min + one mapped
filter — no per-user Python loop — and each partition emits only
``len(steps)`` partial-count rows, folded on the driver
(steps × partitions rows, never event-sized).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def funnel_counts(
    ds: rd.Dataset,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_us: int | None = None,
    num_parts: int = 32,
) -> pd.DataFrame:
    """Returns (step, step_idx, n_users) — one row per funnel step."""
    from .collect import collect_table
    from .dedup import add_key_partition

    if len(steps) < 1 or len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be non-empty and distinct")

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        users = g[user_col].to_numpy()
        et = g[type_col].to_numpy()
        counts = []
        t1: pd.Series | None = None
        tprev: pd.Series | None = None
        for i, s in enumerate(steps):
            m = et == s
            cand = pd.DataFrame({"u": users[m], "t": ts[m]})
            if tprev is not None:
                prev = cand["u"].map(tprev)
                first = cand["u"].map(t1)
                keep = prev.notna() & (cand["t"] > prev)
                if window_us is not None:
                    keep &= cand["t"] - first <= window_us
                cand = cand[keep]
            ti = cand.groupby("u")["t"].min()
            if t1 is None:
                t1 = ti
            tprev = ti
            counts.append(len(ti))
        return pd.DataFrame(
            {
                "step_idx": np.arange(1, len(steps) + 1, dtype=np.int64),
                "n": np.array(counts, dtype=np.int64),
            }
        )

    parts = (
        ds.map_batches(
            lambda t: add_key_partition(t, user_col, num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(per_partition, batch_format="pandas")
    )
    tbl = collect_table(parts).to_pandas()
    # an empty event stream yields a schema-less empty table — the
    # oracle returns one zero row per step, so must we
    if "step_idx" not in tbl.columns:
        tbl = pd.DataFrame({"step_idx": [], "n": []})
    folded = tbl.groupby("step_idx")["n"].sum()
    return pd.DataFrame(
        {
            "step": steps,
            "step_idx": np.arange(1, len(steps) + 1, dtype=np.int64),
            "n_users": [
                int(folded.get(i, 0)) for i in range(1, len(steps) + 1)
            ],
        }
    )


def funnel_sql(
    steps: list[str],
    *,
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    window_us: int | None = None,
) -> str:
    """DuckDB replay of :func:`funnel_counts`, generated from the SAME
    steps/window (single-generator policy)."""
    ctes = [
        f"s1 AS (SELECT {user_col}, min({ts_col}) AS t1 FROM {table}"
        f" WHERE {type_col} = '{steps[0]}' GROUP BY {user_col})"
    ]
    for i in range(2, len(steps) + 1):
        p = i - 1
        win = (
            f" AND epoch_us(e.{ts_col}) - epoch_us(s{p}.t1) <= {window_us}"
            if window_us is not None
            else ""
        )
        ctes.append(
            f"s{i} AS (SELECT e.{user_col}, min(e.{ts_col}) AS t{i},"
            f" any_value(s{p}.t1) AS t1"
            f" FROM {table} e JOIN s{p} USING ({user_col})"
            f" WHERE e.{type_col} = '{steps[i - 1]}'"
            f" AND e.{ts_col} > s{p}.t{p}{win}"
            f" GROUP BY e.{user_col})"
        )
    selects = [
        f"SELECT '{s}' AS step, CAST({i + 1} AS BIGINT) AS step_idx,"
        f" count(*) AS n_users FROM s{i + 1}"
        for i, s in enumerate(steps)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(selects)
