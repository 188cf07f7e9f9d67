"""Cohort retention — the activity-matrix analytic next to funnel
(stages/funnel.py): users cohort by the CALENDAR MONTH of their first
event; ``n_users(cohort, k)`` counts users with any activity k months
after their cohort month.

Semantics (replayed exactly by the generated oracle,
:func:`cohort_retention_sql` — single-generator policy):

    t0(u)     = min event ts of u
    cohort(u) = strftime(month(t0), '%Y-%m')
    k(u, e)   = months(month(ts_e)) - months(month(t0))
    n_users(cohort, k) = |{u : some event of u at offset k}|

Scale shape: ONE user-hash shuffle (a user's events co-locate — the
funnel/sessionize pattern), then a fully VECTORIZED per-partition pass
(month floor via datetime64[M], per-user transform('min'), one
drop_duplicates) emitting only (cohort, k) partial-count rows; the
driver folds cohorts × horizon rows, never event-sized state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def cohort_retention(
    ds: rd.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    num_parts: int = 32,
) -> pd.DataFrame:
    """Returns (cohort:str 'YYYY-MM', k:int64, n_users:int64), sorted."""
    from .collect import collect_table
    from .dedup import add_key_partition

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        months = (
            g[ts_col]
            .to_numpy()
            .astype("datetime64[M]")
            .astype(np.int64)  # months since epoch
        )
        df = pd.DataFrame({"u": g[user_col].to_numpy(), "m": months})
        first = df.groupby("u")["m"].transform("min")
        df["c"] = first
        df["k"] = df["m"] - first
        df = df.drop_duplicates(["u", "k"])
        out = df.groupby(["c", "k"], sort=False).size().reset_index(name="n")
        out["n"] = out["n"].astype("int64")
        return out

    parts = (
        ds.map_batches(
            lambda t: add_key_partition(t, user_col, num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(per_partition, batch_format="pandas")
    )
    tbl = collect_table(parts).to_pandas()
    if "c" not in tbl.columns:
        tbl = pd.DataFrame({"c": [], "k": [], "n": []})
    folded = tbl.groupby(["c", "k"])["n"].sum().reset_index()
    cohort = np.datetime_as_string(
        folded["c"].to_numpy(dtype=np.int64).astype("datetime64[M]"), unit="M"
    )
    out = pd.DataFrame(
        {
            "cohort": cohort.astype(object),
            "k": folded["k"].astype("int64"),
            "n_users": folded["n"].astype("int64"),
        }
    )
    return out.sort_values(["cohort", "k"]).reset_index(drop=True)


def cohort_retention_sql(
    events_rel: str, *, user_col: str = "user_id", ts_col: str = "ts"
) -> str:
    """DuckDB replay of :func:`cohort_retention` over a relation/CTE
    named ``events_rel`` (single-generator policy)."""
    return f"""
        first AS (
          SELECT {user_col}, min({ts_col}) AS t0
          FROM {events_rel} GROUP BY {user_col}
        ),
        offs AS (
          SELECT DISTINCT e.{user_col},
                 strftime(date_trunc('month', f.t0), '%Y-%m') AS cohort,
                 datediff('month', date_trunc('month', f.t0),
                          date_trunc('month', e.{ts_col})) AS k
          FROM {events_rel} e JOIN first f USING ({user_col})
        )
        SELECT cohort, CAST(k AS BIGINT) AS k, count(*) AS n_users
        FROM offs GROUP BY cohort, k
    """
