"""Pairwise association rules over per-basket item sets (Agrawal &
Srikant's support/confidence framing, pair-only — the market-basket
screen for event co-occurrence: "users who search also purchase").

Distinct (basket, item) pairs come from per-batch Arrow dedupe partials
folded by ONE (basket, item) groupby; per-basket pair expansion runs
inside a coarse basket-hash cogroup (the ``add_key_partition``
convention) so the basket table never reaches the driver; pair supports
fold through a second tiny groupby bounded by the ITEM vocabulary
squared, never by basket count.  Rule scoring (confidence, lift) is a
driver fold over that item²-bounded table.

All counts are exact int64; confidence = supp(xy)/supp(x) and
lift = confidence / (supp(y)/n_baskets) divide in that order on both
engines (single-generator SQL replay :func:`association_rules_sql`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ray.data.aggregate import Sum

# pair-support table guard: |items|² rows fold on the driver
ITEM_PAIR_CAP = 1_000_000


def association_rules(
    ds: rd.Dataset,
    *,
    basket_col: str = "user_id",
    item_col: str = "event_type",
    min_support: int = 2,
    round_to: int = 6,
    num_parts: int = 32,
) -> pd.DataFrame:
    """All rules x→y (x ≠ y) with pair support ≥ ``min_support``:
    (antecedent, consequent, support:int64, confidence:f64, lift:f64),
    sorted by (antecedent, consequent).  Support counts BASKETS whose
    distinct item set contains both x and y; null baskets/items drop on
    both engines."""
    from .collect import collect_tables
    from .dedup import add_key_partition
    from .selection import round_half_away

    def dd_partial(t: pa.Table) -> pa.Table:
        t2 = pa.table({"b": t[basket_col], "i": t[item_col]}).drop_null()
        return t2.group_by(["b", "i"]).aggregate([([], "count_all")])

    # slim (basket, item) distinct table — consumed by the pair stage
    # AND the basket count, so pin it (bounded by baskets × item vocab)
    distinct = (
        ds.map_batches(dd_partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["b", "i"])
        .aggregate(Sum("count_all", alias_name="_n"))
    ).materialize()

    def pairs_partial(g: pd.DataFrame) -> pd.DataFrame:
        # per basket: item support rows + ordered (x < y) pair rows via
        # the fully-vectorized triangular expansion (no per-basket
        # Python loop); singles ride as type-consistent (x, x)
        # SELF-pairs (see below), and pre-counting per (x, y) here
        # keeps the global support shuffle pair-VOCAB-sized, not
        # pair-COUNT-sized
        if not len(g):
            return pd.DataFrame(
                {"x": pd.Series([], dtype=object),
                 "y": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64)}
            )
        sg = g.sort_values(["b", "i"], kind="mergesort")
        bs = sg["b"].to_numpy()
        its = sg["i"].to_numpy()
        new = np.empty(len(bs), dtype=bool)
        new[0] = True
        new[1:] = bs[1:] != bs[:-1]
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(bs)))
        if sizes.max() > 1024:
            raise ValueError(
                f"association_rules: basket with {int(sizes.max())} "
                "distinct items — pair expansion is quadratic; bucket "
                "the item space first"
            )
        # element e at within-basket position p (basket size s) leads
        # s-1-p pairs (e, e+1..end-of-basket)
        pos = np.arange(len(bs)) - starts[seg]
        lead = sizes[seg] - 1 - pos
        total = int(lead.sum())
        run_start = np.cumsum(lead) - lead
        run_id = np.repeat(np.arange(len(lead)), lead)
        off = np.arange(total, dtype=np.int64) - run_start[run_id]
        a_idx = run_id
        b_idx = run_id + 1 + off
        # singles ride as self-pairs (x, x): within-basket items are
        # distinct and sorted, so real pairs always have x < y — the
        # sentinel stays type-consistent for ANY item dtype (an ""
        # marker would mix types with integer item columns)
        pair_df = pd.DataFrame(
            {"x": np.concatenate([its, its[a_idx]]),
             "y": np.concatenate([its, its[b_idx]])}
        )
        counted = (
            pair_df.groupby(["x", "y"], sort=False).size()
            .reset_index(name="n")
        )
        counted["n"] = counted["n"].astype(np.int64)
        return counted

    support = (
        distinct.map_batches(
            lambda t: add_key_partition(t, "b", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(pairs_partial, batch_format="pandas")
        .groupby(["x", "y"])
        .aggregate(Sum("n", alias_name="supp"))
    )

    parts = [t for t in collect_tables(support, drop_empty=True)]
    empty = pd.DataFrame(
        {
            "antecedent": pd.Series([], dtype=object),
            "consequent": pd.Series([], dtype=object),
            "support": pd.Series([], dtype=np.int64),
            "confidence": pd.Series([], dtype=np.float64),
            "lift": pd.Series([], dtype=np.float64),
        }
    )
    if not parts:
        return empty
    tbl = pa.concat_tables([p.cast(parts[0].schema) for p in parts])
    if tbl.num_rows > ITEM_PAIR_CAP:
        raise ValueError(
            f"association_rules: {tbl.num_rows} item-support rows exceed "
            f"ITEM_PAIR_CAP={ITEM_PAIR_CAP} — the item vocabulary is too "
            "large for the driver rule fold; pre-bucket items or raise "
            "the cap"
        )
    df = tbl.to_pandas()
    is_single = df["x"] == df["y"]  # singles ride as self-pairs
    singles = df[is_single].set_index("x")["supp"]
    pairs = df[~is_single]
    # exact basket count: distinct is already deduped on (b, i), so the
    # number of distinct b = rows of one groupby(b) count (never
    # collected — .count() folds Dataset metadata)
    from ray.data.aggregate import Count as _Count

    n_baskets = distinct.groupby("b").aggregate(_Count(alias_name="_c")).count()
    if n_baskets == 0:
        return empty
    # vectorized rule fold (an iterrows loop here is minutes at the
    # ITEM_PAIR_CAP): keep pairs over min_support, emit both directions,
    # map per-item supports, then confidence / lift in the documented
    # division order
    kept = pairs[pairs["supp"] >= min_support]
    if not len(kept):
        return empty
    out = pd.DataFrame(
        {
            "antecedent": np.concatenate(
                [kept["x"].to_numpy(), kept["y"].to_numpy()]
            ),
            "consequent": np.concatenate(
                [kept["y"].to_numpy(), kept["x"].to_numpy()]
            ),
            "support": np.concatenate(
                [kept["supp"].to_numpy(), kept["supp"].to_numpy()]
            ).astype(np.int64),
        }
    )
    sx = out["antecedent"].map(singles).to_numpy(dtype=np.float64)
    sy = out["consequent"].map(singles).to_numpy(dtype=np.float64)
    conf = out["support"].to_numpy(dtype=np.int64) / sx
    lift = conf / (sy / n_baskets)
    out["confidence"] = round_half_away(conf, round_to)
    out["lift"] = round_half_away(lift, round_to)
    return (
        out.sort_values(["antecedent", "consequent"], kind="mergesort")
        .reset_index(drop=True)
    )


def association_rules_sql(
    *,
    table: str = "events",
    basket_col: str = "user_id",
    item_col: str = "event_type",
    min_support: int = 2,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`association_rules` (single-generator):
    identical distinct-set semantics, division order, rounding."""
    return f"""
        WITH d AS (
            SELECT DISTINCT {basket_col} AS b, {item_col} AS i
            FROM {table}
            WHERE {basket_col} IS NOT NULL AND {item_col} IS NOT NULL
        ),
        nb AS (SELECT count(DISTINCT b) AS n FROM d),
        s AS (SELECT i, count(*) AS supp FROM d GROUP BY i),
        p AS (
            SELECT a.i AS x, c.i AS y, count(*) AS supp_xy
            FROM d a JOIN d c ON a.b = c.b AND a.i < c.i
            GROUP BY 1, 2
        ),
        r AS (
            SELECT x AS antecedent, y AS consequent, supp_xy FROM p
            UNION ALL
            SELECT y AS antecedent, x AS consequent, supp_xy FROM p
        )
        SELECT r.antecedent, r.consequent,
               CAST(r.supp_xy AS BIGINT) AS support,
               round(r.supp_xy * 1.0 / sx.supp, {round_to}) AS confidence,
               round((r.supp_xy * 1.0 / sx.supp)
                     / (sy.supp * 1.0 / nb.n), {round_to}) AS lift
        FROM r
        JOIN s sx ON sx.i = r.antecedent
        JOIN s sy ON sy.i = r.consequent
        CROSS JOIN nb
        WHERE r.supp_xy >= {min_support}
        ORDER BY r.antecedent, r.consequent
    """
