"""Redirect-chain resolution: (src → dst) hops → final destinations.

A crawl's url space is full of 301/302 chains (http→https, www
canonicalization, moved paths); dedup keys, link graphs and frontier
scheduling all want the FINAL destination per source url, with loops
and over-long chains flagged instead of followed forever.

The redirect map is a FUNCTIONAL graph (≤1 out-edge per url — duplicate
sources raise loudly), so resolution is a walk, not a fixpoint.  Two
paths, auto-selected the way the Bloom joins pick theirs:

- **broadcast** (edge map ≤ ``BROADCAST_EDGE_CAP``): the whole map
  ships ONCE via ``ray.put`` and every task walks its frontier rows
  locally — ``max_hops`` vectorized ``Series.map`` hops, ZERO shuffles.
  Redirect maps are url-keyed but sparse (only urls that redirect), so
  this is the common case well past test scale.
- **cogroup** (above the cap): each round advances the unresolved
  frontier one hop via a bucketed cogroup against the edge map,
  resolved rows exit immediately, and the frontier can only shrink.
  Honest cost note: Ray's groupby re-sorts the UNION every round, so
  the edge map's rows re-shuffle each hop even though its blocks are
  materialized — max_hops × |E| shuffle volume.  That is still the
  right trade vs pointer doubling (log-round rewrites of the WHOLE map
  including long-resolved rows) because real chains are short
  (browsers cap ~20 hops) and the map never inflates, but callers with
  giant maps and tiny frontiers should pre-filter the map to sources
  reachable from the frontier.

Anything still walking after the budget (true cycles and over-budget
chains) reports ``status='unresolved'`` with sentinel final/hops,
exactly matching the bounded recursive-CTE oracle on BOTH paths (the
paths are equivalence-tested).  Driver state: nothing but lazy Dataset
handles (plus the cap-guarded edge table on the broadcast path);
per-round cogroup outputs checkpoint (materialize) because each is
consumed twice (exit rows + next round's frontier).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .dedup import add_key_partition

RESOLVED = "resolved"
UNRESOLVED = "unresolved"

# ~32 MB of url pairs — same order as the Bloom-join broadcast cap
BROADCAST_EDGE_CAP = 2_000_000


def _const(n: int, val, typ) -> pa.Array:
    return pa.array([val] * n, type=typ)


def _resolve_broadcast(
    edges: rd.Dataset, *, src_col: str, dst_col: str, max_hops: int
) -> rd.Dataset:
    """Zero-shuffle path: whole map broadcast once, in-task vectorized
    walk (max_hops Series.map hops per batch)."""
    import ray

    from .collect import collect_table

    tbl = collect_table(edges.select_columns([src_col, dst_col]))
    srcs = tbl[src_col].to_pandas()
    if srcs.duplicated().any():
        dup = srcs[srcs.duplicated()].iloc[0]
        raise ValueError(
            f"duplicate redirect source {dup!r}: the map must be "
            "functional (one out-edge per url)"
        )
    nxt_ref = ray.put(dict(zip(srcs, tbl[dst_col].to_pandas())))

    def walk(t: pa.Table) -> pa.Table:
        nxt = ray.get(nxt_ref)
        src = t[src_col].to_pandas()
        cur = src.map(nxt)  # hop 1 always exists (src IS an edge source)
        hops = np.ones(len(src), dtype=np.int64)
        alive = np.ones(len(src), dtype=bool)
        for _ in range(max_hops - 1):
            target = cur[alive].map(nxt)
            moved = target.notna().to_numpy()
            if not moved.any():
                alive[:] = False
                break
            idx = np.flatnonzero(alive)
            cur.iloc[idx[moved]] = target[moved].to_numpy()
            hops[idx[moved]] += 1
            alive[idx[~moved]] = False
        # still-alive rows: check one more hop to classify over-budget
        if alive.any():
            more = cur[alive].map(nxt).notna().to_numpy()
            idx = np.flatnonzero(alive)
            alive[idx[~more]] = False
        resolved = ~alive
        return pa.table(
            {
                "src": pa.array(src.to_numpy(), type=pa.string()),
                "final_url": pa.array(
                    np.where(resolved, cur.to_numpy(), ""), type=pa.string()
                ),
                "n_hops": pa.array(np.where(resolved, hops, 0)),
                "status": pa.array(
                    np.where(resolved, RESOLVED, UNRESOLVED), type=pa.string()
                ),
            }
        )

    return edges.map_batches(walk, batch_format="pyarrow")


def resolve_redirects(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 8,
    num_parts: int = 64,
    method: str = "auto",
) -> rd.Dataset:
    """One row per source url: (src, final_url, n_hops, status).

    ``resolved``: final_url does not redirect further, n_hops is the
    true chain length.  ``unresolved``: loop or chain longer than
    ``max_hops`` — final_url '' and n_hops 0 (sentinels shared with the
    SQL replay).  ``method``: 'auto' (broadcast under
    BROADCAST_EDGE_CAP, else cogroup), 'broadcast', or 'cogroup'."""
    if method not in ("auto", "broadcast", "cogroup"):
        raise ValueError(f"unknown method {method!r}")
    if method == "auto":
        method = (
            "broadcast" if edges.count() <= BROADCAST_EDGE_CAP else "cogroup"
        )
    if method == "broadcast":
        return _resolve_broadcast(
            edges, src_col=src_col, dst_col=dst_col, max_hops=max_hops
        )

    def part_on(col):
        return lambda t: add_key_partition(t, col, num_parts=num_parts)

    # the edge map: partitioned once on its join key (the source), with
    # schema aligned to the frontier's (+_dst payload, _is_edge tag)
    emap = (
        edges.map_batches(
            lambda t: pa.table(
                {
                    "src": t[src_col],
                    "cur": t[src_col],
                    "hops": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                    "_dst": t[dst_col],
                    "_is_edge": _const(t.num_rows, 1, pa.int8()),
                }
            ),
            batch_format="pyarrow",
        )
        .map_batches(part_on("cur"), batch_format="pyarrow")
        .materialize()
    )

    # frontier: (src, cur, hops) — starts as the edges themselves (hop 1)
    state = edges.map_batches(
        lambda t: pa.table(
            {
                "src": t[src_col],
                "cur": t[dst_col],
                "hops": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        ),
        batch_format="pyarrow",
    )

    def step(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["_is_edge"] == 1]
        s = g[g["_is_edge"] == 0]
        if e["cur"].duplicated().any():
            dup = e["cur"][e["cur"].duplicated()].iloc[0]
            raise ValueError(
                f"duplicate redirect source {dup!r}: the map must be "
                "functional (one out-edge per url)"
            )
        nxt = dict(zip(e["cur"], e["_dst"]))
        target = s["cur"].map(nxt)
        moved = target.notna().to_numpy()
        # typed Arrow output: a group holding only edge rows yields an
        # EMPTY frame, and object-dtype empties trip Ray's size sampler
        return pa.table(
            {
                "src": pa.array(s["src"].to_numpy(), type=pa.string()),
                "cur": pa.array(
                    np.where(moved, target, s["cur"]), type=pa.string()
                ),
                "hops": pa.array(
                    (s["hops"] + moved).to_numpy().astype(np.int64)
                ),
                "_alive": pa.array(moved.astype(np.int8)),
            }
        )

    def split(stepped: rd.Dataset, alive: int) -> rd.Dataset:
        return stepped.map_batches(
            lambda t: t.filter(pc.equal(t["_alive"], alive)).select(
                ["src", "cur", "hops"]
            ),
            batch_format="pyarrow",
        )

    done: list[rd.Dataset] = []
    for _ in range(max_hops):
        tagged = state.map_batches(
            lambda t: pa.table(
                {
                    "src": t["src"],
                    "cur": t["cur"],
                    "hops": t["hops"],
                    "_dst": _const(t.num_rows, None, pa.string()),
                    "_is_edge": _const(t.num_rows, 0, pa.int8()),
                }
            ),
            batch_format="pyarrow",
        ).map_batches(part_on("cur"), batch_format="pyarrow")

        stepped = (
            tagged.union(emap)
            .groupby("_part")
            .map_groups(step, batch_format="pandas")
            .materialize()
        )
        done.append(
            split(stepped, 0).map_batches(
                lambda t: pa.table(
                    {
                        "src": t["src"],
                        "final_url": t["cur"],
                        "n_hops": t["hops"],
                        "status": _const(t.num_rows, RESOLVED, pa.string()),
                    }
                ),
                batch_format="pyarrow",
            )
        )
        state = split(stepped, 1)
        if state.count() == 0:
            break

    out = state.map_batches(
        lambda t: pa.table(
            {
                "src": t["src"],
                "final_url": _const(t.num_rows, "", pa.string()),
                "n_hops": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "status": _const(t.num_rows, UNRESOLVED, pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
    for d in done:
        out = out.union(d)
    return out
