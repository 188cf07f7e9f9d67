"""Streaming-shaped windowed aggregation with per-bucket actor state
(ray_guide 'Streaming-shaped workloads': one actor per key-hash bucket,
fed batches in ts order, incremental state + watermark).

Ray Data has no event-time windows; this stage treats the events table as
an ordered partitioned log: rows hash to ``n_buckets`` stateful actors;
each actor keeps open tumbling windows per (key, window) and closes them
when its watermark (max ts seen − allowed lateness) passes the window
end.  A final ``flush`` emits still-open windows.

Ordering assumption (documented per guide): within one bucket, batches
arrive in ts order — callers sort per-bucket before feeding, as
``tumbling_window_aggregate`` does.  The batch path (q11) computes the
same result with a plain groupby; the streaming path exists for
incremental/stateful semantics and is equivalence-tested against it.
"""

from __future__ import annotations

import collections

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .hashing import bucket_ids


@ray.remote
class WindowBucketActor:
    """Incremental tumbling-window state for one key-hash bucket.

    ``ingest`` RETURNS the windows it closes instead of accumulating
    them: closed results flow back through the feeder task into the
    Dataset plane, so actor memory holds only OPEN windows (bounded by
    keys active inside one window span, not by the stream length)."""

    def __init__(self, window_s: int, lateness_s: int = 0) -> None:
        self.window_us = window_s * 1_000_000
        self.lateness_us = lateness_s * 1_000_000
        self.open: dict = collections.defaultdict(lambda: [0, 0.0])  # (key, w) -> [n, sum]
        self.watermark = -(2**62)

    def ingest(self, keys: list, ts_us: list[int], values: list[float]) -> list[tuple]:
        for k, t, v in zip(keys, ts_us, values):
            w = t // self.window_us
            slot = self.open[(k, w)]
            slot[0] += 1
            slot[1] += v
            if t > self.watermark:
                self.watermark = t
        # close (and emit) windows fully below the watermark
        horizon = (self.watermark - self.lateness_us) // self.window_us
        closed = []
        for key in [kw for kw in self.open if kw[1] < horizon]:
            n, s = self.open.pop(key)
            closed.append((key[0], key[1], n, s))
        return closed

    def flush(self) -> list[tuple]:
        out = [(k, w, n, s) for (k, w), (n, s) in sorted(self.open.items())]
        self.open.clear()
        return out

    def state_size(self) -> int:
        return len(self.open)


def tumbling_window_aggregate(
    events: pd.DataFrame,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_s: int = 3600,
    n_buckets: int = 4,
) -> pd.DataFrame:
    """Drive the actor stage over an event frame → closed-window table
    (key, window, n, sum_value).  Rows hash-route to bucket actors and
    are fed in ts order per bucket (micro-batched)."""
    actors = [WindowBucketActor.remote(window_s) for _ in range(n_buckets)]
    df = events[[key_col, ts_col, value_col]].copy()
    # explicit unit cast: pandas 2.x may carry datetime64[us] or [ns]
    df["_ts_us"] = df[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
    df["_bucket"] = bucket_ids(df[key_col], n_buckets)
    df = df.sort_values(["_bucket", "_ts_us"], kind="mergesort")

    pending = []
    for b, grp in df.groupby("_bucket", sort=True):
        # micro-batches preserve ts order within the bucket
        for i in range(0, len(grp), 1024):
            chunk = grp.iloc[i : i + 1024]
            pending.append(
                actors[b].ingest.remote(
                    chunk[key_col].tolist(),
                    chunk["_ts_us"].tolist(),
                    chunk[value_col].tolist(),
                )
            )
    rows: list[tuple] = []
    for closed in ray.get(pending):
        rows.extend(closed)
    for a in actors:
        rows.extend(ray.get(a.flush.remote()))
    for a in actors:
        ray.kill(a)
    out = pd.DataFrame(rows, columns=[key_col, "window", "n", "sum_value"])
    out["n"] = out["n"].astype("int64")
    out["window"] = out["window"].astype("int64")
    return out.sort_values([key_col, "window"], kind="mergesort").reset_index(drop=True)


def tumbling_window_aggregate_ds(
    events: rd.Dataset,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_s: int = 3600,
    n_buckets: int = 4,
) -> pd.DataFrame:
    """Streaming windowed aggregate fed from a Ray Data pipeline — the
    scale path of ``tumbling_window_aggregate``.  Ingestion is a
    ``groupby(bucket).map_groups`` stage: each bucket's rows arrive in one
    distributed task, get sorted by ts there, and stream to that bucket's
    actor in ordered micro-batches.  The driver never holds the event
    table; it only assembles the (small) closed-window result from the
    actors' flushes.

    Bucket actors hold pure Python dict state (no compute loops), so they
    are created with ``num_cpus=0`` — reserving a CPU per actor would
    starve the groupby tasks that feed them (the pool-sizing stall).

    Memory shape: closed windows return from ``ingest`` to the feeder
    task and become the feeder's map_groups OUTPUT — they flow through
    the Dataset plane, so actor state is bounded by OPEN windows only and
    the driver holds just the final closed-window table (the result)."""
    actors = [
        WindowBucketActor.options(num_cpus=0).remote(window_s) for _ in range(n_buckets)
    ]
    out_cols = [key_col, "window", "n", "sum_value"]

    def add_bucket(t: pa.Table) -> pa.Table:
        ts_us = (
            t[ts_col]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype("int64")
        )
        return pa.table(
            {
                key_col: t[key_col],
                value_col: t[value_col],
                "_ts_us": pa.array(ts_us),
                "_bucket": pa.array(bucket_ids(t[key_col], n_buckets)),
            }
        )

    def _closed_frame(rows: list[tuple], key_dtype) -> pd.DataFrame:
        df = pd.DataFrame(rows, columns=out_cols)
        return pd.DataFrame(
            {
                key_col: df[key_col].astype(key_dtype) if len(df) else pd.Series(dtype=key_dtype),
                "window": df["window"].astype("int64"),
                "n": df["n"].astype("int64"),
                "sum_value": df["sum_value"].astype("float64"),
            }
        )

    def feed(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["_bucket"].iloc[0])
        g = g.sort_values("_ts_us", kind="mergesort")
        pending = []
        for i in range(0, len(g), 1024):
            chunk = g.iloc[i : i + 1024]
            pending.append(
                actors[b].ingest.remote(
                    chunk[key_col].tolist(),
                    chunk["_ts_us"].tolist(),
                    chunk[value_col].tolist(),
                )
            )
        rows: list[tuple] = []
        for closed in ray.get(pending):
            rows.extend(closed)
        return _closed_frame(rows, g[key_col].dtype)

    try:
        fed = (
            events.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(feed, batch_format="pandas")
            .materialize()  # drive ingestion to completion before flushing
        )
        flush_rows: list[tuple] = []
        for a in actors:
            flush_rows.extend(ray.get(a.flush.remote()))
    finally:
        # a failed ingest must not orphan the zero-CPU state actors
        for a in actors:
            ray.kill(a)
    out = fed.to_pandas()
    if key_col not in out.columns:  # all feeder groups emitted empty
        out = pd.DataFrame(columns=out_cols)
    if flush_rows:
        key_dtype = (
            out[key_col].dtype
            if len(out)
            else pd.DataFrame(flush_rows, columns=out_cols)[key_col].dtype
        )
        out = pd.concat(
            [out, _closed_frame(flush_rows, key_dtype)], ignore_index=True
        )
    out["n"] = out["n"].astype("int64")
    out["window"] = out["window"].astype("int64")
    return out.sort_values([key_col, "window"], kind="mergesort").reset_index(drop=True)


def sliding_window_aggregate(
    events: rd.Dataset,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_s: int = 3600,
    slide_s: int = 900,
) -> "pd.DataFrame":
    """Overlapping (sliding) windows: every event replicates into the
    ``window_s / slide_s`` windows that contain it inside ``map_batches``
    (the standard explode-then-aggregate plan — replication factor is the
    overlap count, not the data size), then one grouped aggregate.
    Windows are identified by their start second (k * slide_s)."""
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Count, Sum

    w_us = window_s * 1_000_000
    s_us = slide_s * 1_000_000

    def explode(t: pa.Table) -> pa.Table:
        ts_us = (
            t[ts_col]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        k_hi = ts_us // s_us  # last window whose span contains ts
        k_lo = (ts_us - w_us) // s_us + 1
        reps = (k_hi - k_lo + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(ts_us)), reps)
        # per-row consecutive window indices k_lo..k_hi
        offsets = np.concatenate([[0], np.cumsum(reps)[:-1]])
        k = np.repeat(k_lo, reps) + (np.arange(reps.sum()) - np.repeat(offsets, reps))
        keys = t[key_col].take(pa.array(idx))
        vals = t[value_col].take(pa.array(idx))
        return pa.table(
            {
                key_col: keys,
                "window_start": pa.array(k * slide_s, type=pa.int64()),
                value_col: vals,
            }
        )

    out = (
        events.map_batches(explode, batch_format="pyarrow")
        .groupby([key_col, "window_start"])
        .aggregate(Count(alias_name="n"), Sum(value_col, alias_name="sum_value"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values([key_col, "window_start"], kind="mergesort").reset_index(
        drop=True
    )


@ray.remote
class SessionBucketActor:
    """Incremental gap-based session state for one key-hash bucket.

    Rows arrive in ts order (the feeder sorts per bucket); a session
    closes when its key's gap is exceeded or when the bucket watermark
    (max ts seen − gap) passes its last event — closed sessions can never
    reopen, so memory holds only OPEN sessions.

    Closed sessions are RETURNED from ``ingest`` as (key, start_ts_us,
    n_events) and session ordinals are assigned downstream (a grouped
    cumcount over start_ts) — round 2 kept a per-key sessions-closed
    counter forever, which grew with total key cardinality (VERDICT r2
    #6); now actor state is exactly the open-session dict."""

    def __init__(self, gap_s: int) -> None:
        self.gap_us = gap_s * 1_000_000
        self.open: dict = {}  # key -> [start_ts_us, last_ts_us, n_events]
        self.watermark = -(2**62)

    def _close(self, k) -> tuple:
        start, _last, n = self.open.pop(k)
        return (k, start, n)

    def ingest(self, keys: list, ts_us: list[int]) -> list[tuple]:
        closed: list[tuple] = []
        for k, t in zip(keys, ts_us):
            cur = self.open.get(k)
            if cur is not None and t - cur[1] <= self.gap_us:
                cur[1] = t
                cur[2] += 1
            else:
                if cur is not None:
                    closed.append(self._close(k))
                self.open[k] = [t, t, 1]
            if t > self.watermark:
                self.watermark = t
        # watermark pass: sessions idle past the gap can never extend
        horizon = self.watermark - self.gap_us
        for k in [k for k, (_s, last, _n) in self.open.items() if last < horizon]:
            closed.append(self._close(k))
        return closed

    def flush(self) -> list[tuple]:
        return [self._close(k) for k in sorted(self.open)]

    def state_size(self) -> int:
        return len(self.open)


def session_window_aggregate_ds(
    events: rd.Dataset,
    *,
    key_col: str,
    ts_col: str,
    gap_s: int = 1800,
    n_buckets: int = 4,
) -> pd.DataFrame:
    """Stateful STREAMING sessionization — the actor-state twin of the
    batch sessionizer (queries.q12): rows hash-route to bucket actors and
    stream in ts order per bucket; each actor keeps only open sessions
    (watermark-closed otherwise).  Output (key, session_id, n_events)
    equals the batch groupby formulation exactly (same SQL oracle).

    Closed sessions flow back through the feeder (see SessionBucketActor)
    as (key, start_ts_us, n_events); session ordinals are assigned at
    assembly time by a per-key cumcount over start_ts — a session's start
    order equals its close order within one key (all of a key's rows live
    in one bucket, fed in ts order)."""
    actors = [
        SessionBucketActor.options(num_cpus=0).remote(gap_s) for _ in range(n_buckets)
    ]
    raw_cols = [key_col, "_start_us", "n_events"]

    def add_bucket(t: pa.Table) -> pa.Table:
        ts_us = (
            t[ts_col]
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype("int64")
        )
        return pa.table(
            {
                key_col: t[key_col],
                "_ts_us": pa.array(ts_us),
                "_bucket": pa.array(bucket_ids(t[key_col], n_buckets)),
            }
        )

    def _raw_frame(rows: list[tuple], key_dtype) -> pd.DataFrame:
        df = pd.DataFrame(rows, columns=raw_cols)
        return pd.DataFrame(
            {
                key_col: df[key_col].astype(key_dtype)
                if len(df)
                else pd.Series(dtype=key_dtype),
                "_start_us": df["_start_us"].astype("int64"),
                "n_events": df["n_events"].astype("int64"),
            }
        )

    def feed(g: pd.DataFrame) -> pd.DataFrame:
        b = int(g["_bucket"].iloc[0])
        g = g.sort_values(["_ts_us", key_col], kind="mergesort")
        pending = []
        for i in range(0, len(g), 1024):
            chunk = g.iloc[i : i + 1024]
            pending.append(
                actors[b].ingest.remote(
                    chunk[key_col].tolist(), chunk["_ts_us"].tolist()
                )
            )
        rows: list[tuple] = []
        for closed in ray.get(pending):
            rows.extend(closed)
        return _raw_frame(rows, g[key_col].dtype)

    try:
        fed = (
            events.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("_bucket")
            .map_groups(feed, batch_format="pandas")
            .materialize()
        )
        flush_rows: list[tuple] = []
        for a in actors:
            flush_rows.extend(ray.get(a.flush.remote()))
    finally:
        # a failed ingest must not orphan the zero-CPU state actors
        for a in actors:
            ray.kill(a)
    out = fed.to_pandas()
    if key_col not in out.columns:  # all feeder groups emitted empty
        out = pd.DataFrame(columns=raw_cols)
    if flush_rows:
        key_dtype = (
            out[key_col].dtype
            if len(out)
            else pd.DataFrame(flush_rows, columns=raw_cols)[key_col].dtype
        )
        out = pd.concat(
            [out, _raw_frame(flush_rows, key_dtype)], ignore_index=True
        )
    out = out.sort_values([key_col, "_start_us"], kind="mergesort").reset_index(
        drop=True
    )
    out["session_id"] = (
        out.groupby(key_col, sort=False).cumcount() + 1
    ).astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out[[key_col, "session_id", "n_events"]]
