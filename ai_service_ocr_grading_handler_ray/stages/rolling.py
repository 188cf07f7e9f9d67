"""Per-key ROW-frame rolling window aggregates — the ordered
"last-N-rows" analytics (moving averages, deltas, running ranks) that
time-window operators (stages/streaming.py) can't express: frames are
counted in ROWS, not seconds, so a burst of events shares a frame and
a sparse key still gets full-width frames.

Per event, over the key's events ordered by (ts, id):

    rn        = 1-based position                    (row_number)
    delta     = value - previous row's value        (0 on the first row,
                                                     lag default=value)
    roll_sum  = sum  of the last `window` rows      (ROWS window-1
    roll_avg  = mean of the last `window` rows       PRECEDING..CURRENT)
    roll_max  = max  of the last `window` rows

replayed exactly by :func:`rolling_sql` (single-generator policy).
Sums add frame rows OLDEST-FIRST (matching the SQL frame order) and
both sides round to 6 decimals post-aggregation, which absorbs any
window-aggregator association drift.

Scale shape: ONE key-hash shuffle (``add_key_partition`` →
``groupby(_part).map_groups``), then a fully VECTORIZED per-partition
pass — one lexsort, then ``window`` masked shifted adds (no per-row
loop, no per-key loop).  Output is input-sized and streams from
map_groups.  Partitioning assumption: one key's events fit a worker
(the sessionize/funnel assumption).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def rolling_window(
    ds: rd.Dataset,
    *,
    window: int = 4,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    num_parts: int = 32,
    round_to: int = 6,
) -> rd.Dataset:
    """Per-event rolling aggregates over the last ``window`` rows of the
    event's key (see module docstring).  Output: (id, key, rn:int64,
    delta, roll_sum, roll_avg, roll_max — float64, rounded)."""
    from .dedup import add_key_partition

    if window < 1:
        raise ValueError("window must be >= 1")

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        ids = g[id_col].to_numpy()
        keys = g[key_col].to_numpy()
        vals = g[value_col].to_numpy().astype(np.float64)
        order = np.lexsort((ids, ts, keys))
        keys, ids, vals = keys[order], ids[order], vals[order]
        n = len(keys)
        if n == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=g[id_col].dtype),
                    key_col: pd.Series([], dtype=g[key_col].dtype),
                    "rn": pd.Series([], dtype=np.int64),
                    "delta": pd.Series([], dtype=np.float64),
                    "roll_sum": pd.Series([], dtype=np.float64),
                    "roll_avg": pd.Series([], dtype=np.float64),
                    "roll_max": pd.Series([], dtype=np.float64),
                }
            )

        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = keys[1:] != keys[:-1]
        seg_id = np.cumsum(new_key) - 1
        seg_first = np.flatnonzero(new_key)[seg_id]  # index of key's row 0
        pos = np.arange(n) - seg_first

        # masked shifted folds, oldest frame row first (the SQL frame
        # order): shift k rows back, zero where the frame crosses a key
        idx = np.arange(n)
        roll_sum = np.zeros(n, dtype=np.float64)
        roll_max = np.full(n, -np.inf, dtype=np.float64)
        for k in range(window - 1, -1, -1):
            take = idx - k
            valid = take >= seg_first
            shifted = vals[np.maximum(take, 0)]
            roll_sum = roll_sum + np.where(valid, shifted, 0.0)
            roll_max = np.maximum(roll_max, np.where(valid, shifted, -np.inf))
        cnt = np.minimum(pos + 1, window).astype(np.float64)

        prev = np.empty(n, dtype=np.float64)
        prev[0] = vals[0]
        prev[1:] = vals[:-1]
        prev[new_key] = vals[new_key]  # lag default = own value → delta 0

        f = 10.0**round_to

        def rnd(x: np.ndarray) -> np.ndarray:
            return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f

        return pd.DataFrame(
            {
                id_col: ids,
                key_col: keys,
                "rn": (pos + 1).astype(np.int64),
                "delta": rnd(vals - prev),
                "roll_sum": rnd(roll_sum),
                "roll_avg": rnd(roll_sum / cnt),
                "roll_max": roll_max,
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


def rolling_sql(
    *,
    window: int = 4,
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`rolling_window`, generated from the SAME
    parameters (single-generator policy)."""
    return f"""
        SELECT {id_col}, {key_col},
               CAST(row_number() OVER w0 AS BIGINT) AS rn,
               round({value_col} - lag({value_col}, 1, {value_col}) OVER w0,
                     {round_to}) AS delta,
               round(sum({value_col}) OVER w, {round_to}) AS roll_sum,
               round(sum({value_col}) OVER w / count(*) OVER w,
                     {round_to}) AS roll_avg,
               max({value_col}) OVER w AS roll_max
        FROM {table}
        WINDOW w0 AS (PARTITION BY {key_col} ORDER BY {ts_col}, {id_col}),
               w AS (PARTITION BY {key_col} ORDER BY {ts_col}, {id_col}
                     ROWS BETWEEN {window - 1} PRECEDING AND CURRENT ROW)
    """
