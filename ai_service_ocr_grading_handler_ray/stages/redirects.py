"""Redirect-chain resolution: (src → dst) hops → final destinations.

A crawl's url space is full of 301/302 chains (http→https, www
canonicalization, moved paths); dedup keys, link graphs and frontier
scheduling all want the FINAL destination per source url, with loops
and over-long chains flagged instead of followed forever.

The redirect map is a FUNCTIONAL graph (≤1 out-edge per url — duplicate
sources raise loudly), so resolution is a walk, not a fixpoint: each
round advances the unresolved frontier ONE hop via a bucketed cogroup
against the edge map, resolved rows exit immediately, and the frontier
can only shrink.  Real redirect chains are short (browsers cap ~20
hops), so ``max_hops`` linear rounds — each ONE shuffle over a shrinking
frontier, the edge map hash-partitioned once and reused — beats pointer
doubling's log-round rewrites of the WHOLE map at web scale; anything
still walking after the budget (true cycles and over-budget chains)
reports ``status='unresolved'`` with sentinel final/hops, exactly
matching the bounded recursive-CTE oracle (which cannot name a
canonical "current position" on a cycle either).

Driver state per round: nothing but lazy Dataset handles; per-round
outputs checkpoint (materialize) because each is consumed twice
(exit rows + next round's frontier), same policy as the
connected-components finish (stages/dedup.propagate_min_labels_ds).
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


def _const(n: int, val, typ) -> pa.Array:
    return pa.array([val] * n, type=typ)


def resolve_redirects(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 8,
    num_parts: int = 64,
) -> rd.Dataset:
    """One row per source url: (src, final_url, n_hops, status).

    ``resolved``: final_url does not redirect further, n_hops is the
    true chain length.  ``unresolved``: loop or chain longer than
    ``max_hops`` — final_url '' and n_hops 0 (sentinels shared with the
    SQL replay)."""

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
