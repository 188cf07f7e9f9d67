"""Per-host crawl politeness scheduling.

Turns a prioritized frontier into concrete fetch slots: within each
host, candidates are ordered (priority DESC, url ASC — deterministic)
and the i-th fetch is offset ``i * delay_s`` seconds from the host's
crawl start, so no host is hit faster than one request per ``delay_s``
(the robots.txt Crawl-delay contract; composes with q127's gate and
q146's frontier priorities).

Scale shape: ONE host-hash coarse-partition shuffle
(``add_key_partition`` — a host's candidates co-locate, never one Ray
group per host), then a fully vectorized per-partition pass: one
mergesort over (host, -priority, url) + one cumcount per host.  Output
is slot numbers / offsets, int64 end-to-end (no FP in the schedule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["politeness_schedule"]


def politeness_schedule(
    ds: rd.Dataset,
    *,
    host_col: str = "host",
    url_col: str = "url",
    priority_col: str = "priority",
    delay_s: int = 5,
    num_parts: int = 64,
) -> rd.Dataset:
    """Lazy Dataset of the input columns + (slot, fetch_offset_s):
    slot = 0-based position in the host's (priority DESC, url ASC)
    order, fetch_offset_s = slot * delay_s."""
    from .dedup import add_key_partition

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["_part"]).sort_values(
            [host_col, priority_col, url_col],
            ascending=[True, False, True],
            kind="mergesort",
        )
        slot = df.groupby(host_col, sort=False).cumcount().to_numpy(np.int64)
        df["slot"] = slot
        df["fetch_offset_s"] = slot * np.int64(delay_s)
        return df.reset_index(drop=True)

    return (
        ds.map_batches(
            lambda t: add_key_partition(t, host_col, num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(per_part, batch_format="pandas")
    )
