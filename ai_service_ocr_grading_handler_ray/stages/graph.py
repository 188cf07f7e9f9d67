"""Host-graph PageRank — the web-graph ranking primitive a crawl
pipeline uses for crawl prioritization and domain-quality scoring.

Reference parity note: the reference repo has no graph surface — this
is part of the "operations a large-scale training-data pipeline would
need" mandate (cf. Common-Crawl host-level ranks used as a quality
signal by CCNet/RefinedWeb-style curation).

Scale shape (the partitioning assumption this operator relies on):

- the EDGE list is corpus-sized and never leaves Ray: it is reduced
  once by a ``groupby(src, dst).count()`` shuffle into a weighted
  host-pair table, materialized in the object store (spillable) so the
  power iterations re-scan blocks instead of re-running the upstream
  pipeline;
- the NODE universe (hosts) is assumed orders of magnitude smaller
  than the corpus (pages-per-host >> 1) and is held driver-side as a
  sorted array; every per-iteration fold is node-sized, never
  edge- or corpus-sized.  ``node_limit`` fails loudly when the
  assumption breaks instead of silently OOMing the driver;
- each power iteration is: ONE ``ray.put`` broadcast of the rank
  vector (node-sized float64, shipped once per iteration, not per
  batch), ONE shuffle-free ``map_batches`` scan over the weighted
  edges emitting sparse per-batch partial contribution sums
  (``np.bincount`` — no per-row loop), and one bounded driver fold
  (<= nodes x blocks sparse rows, node-sized after the fold).

Semantics (standard damped PageRank, uniform teleport, weighted
edges, dangling mass redistributed uniformly):

    r'(v) = (1-d)/N + d * ( sum_{u->v} r(u) * w(u,v) / outw(u)
                            + dangling_mass / N )

with ``dangling_mass = sum of r(u) over nodes with no out-edges``.
Self-loops are dropped before weighting (the convention the unrolled
SQL oracle replays).  Deterministic: node index is the sorted node
universe; per-batch partials are bincount-summed; the driver folds
partials in block order — stable across runs up to float addition
order across blocks (pinned by the oracle's 8-decimal rounding).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count


def weighted_host_edges(
    edges: rd.Dataset, *, src_col: str = "src", dst_col: str = "dst"
) -> rd.Dataset:
    """Reduce a raw (corpus-sized) edge stream to a weighted host-pair
    table: drop self-loops, then ONE ``groupby(src, dst)`` count
    shuffle.  Output columns: (src, dst, w:int64)."""
    def drop_self(t: pa.Table) -> pa.Table:
        keep = pa.compute.invert(pa.compute.equal(t[src_col], t[dst_col]))
        return t.filter(pa.compute.fill_null(keep, False))

    no_self = edges.map_batches(drop_self, batch_format="pyarrow")
    return no_self.groupby([src_col, dst_col]).aggregate(Count(alias_name="w"))


def _node_universe(
    edges_w: rd.Dataset, *, src_col: str, dst_col: str, node_limit: int
) -> np.ndarray:
    """Sorted distinct node array from both endpoint columns:
    per-batch distinct partials folded AMORTIZED on the driver — block
    distincts buffer up and merge into the sorted accumulator only when
    the buffer outgrows it (so each element is re-sorted O(log blocks)
    times, not once per block), and — unlike the previous groupby
    finish — no extra all-to-all execution runs before the iterations
    (measured ~1 s of fixed latency per pagerank/hits call, and one
    whole node shuffle at scale).  Driver memory stays bounded by
    nodes + the buffer (≤ 2×nodes before every merge)."""

    def partial(t: pa.Table) -> pa.Table:
        vals = pa.concat_arrays(
            [t[src_col].combine_chunks().cast(pa.string()),
             t[dst_col].combine_chunks().cast(pa.string())]
        )
        return pa.table({"node": vals.unique()})

    nodes = np.empty(0, dtype=object)
    buf: list[np.ndarray] = []
    buffered = 0
    for b in edges_w.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        if not b.num_rows:
            continue
        buf.append(b["node"].to_pandas().to_numpy(dtype=object))
        buffered += len(buf[-1])
        if buffered >= max(len(nodes), 1_048_576):
            nodes = np.unique(np.concatenate([nodes, *buf]))
            buf, buffered = [], 0
            if len(nodes) > node_limit:
                break  # fail below with the standard message
    if buf:
        nodes = np.unique(np.concatenate([nodes, *buf]))
    if len(nodes) > node_limit:
        raise ValueError(
            f"pagerank node universe {len(nodes)} exceeds node_limit="
            f"{node_limit}: the hosts-fit-on-driver assumption is broken; "
            "raise node_limit explicitly if the driver has the memory"
        )
    if len(nodes) == 0:
        raise ValueError("pagerank: empty edge set")
    return nodes


def _indexed_edges(
    edges_w: rd.Dataset, nodes: np.ndarray, *, src_col: str, dst_col: str
) -> rd.Dataset:
    """Weighted host-pair table → materialized (si, di, w) int-indexed
    edges: the sorted node universe broadcasts ONCE via ``ray.put`` and
    every task ``searchsorted``s into it.  Shared by :func:`pagerank`
    and :func:`hits` (one kernel to keep null/missing-host handling in
    sync)."""
    idx_ref = ray.put(nodes)

    def to_indexed(t: pa.Table, _ref=idx_ref) -> pa.Table:
        uni = ray.get(_ref)
        s = np.searchsorted(uni, t[src_col].to_numpy(zero_copy_only=False))
        d = np.searchsorted(uni, t[dst_col].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "si": pa.array(s.astype(np.int64)),
                "di": pa.array(d.astype(np.int64)),
                "w": pa.array(
                    t["w"].to_numpy(zero_copy_only=False).astype(np.float64)
                ),
            }
        )

    return edges_w.map_batches(to_indexed, batch_format="pyarrow").materialize()


def pagerank(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    n_iter: int = 3,
    node_limit: int = 50_000_000,
    rank_col: str = "pagerank",
    seeds: "list[str] | None" = None,
) -> rd.Dataset:
    """Damped PageRank over a (src, dst) edge Dataset; returns a
    node-sized Dataset (node:string, <rank_col>:float64).  See module
    docstring for the scale shape and the exact update rule.

    ``seeds`` switches to PERSONALIZED PageRank (random-walk-with-
    restart): the teleport vector (and the dangling-mass sink, and the
    r0 start) is uniform over the seed hosts present in the graph
    instead of uniform over all nodes — the topic/trust-rank variant
    crawl prioritization uses to rank "near my seed list".  Seeds
    absent from the edge set are ignored; all-absent raises.  The
    unseeded path keeps its exact original float arithmetic
    ((1−d)/n vs (1−d)·e differ in the last ulp), so existing oracles
    are untouched."""
    edges_w = weighted_host_edges(
        edges, src_col=src_col, dst_col=dst_col
    ).materialize()  # host-pair-sized (post-reduce), re-scanned per iteration

    nodes = _node_universe(
        edges_w, src_col=src_col, dst_col=dst_col, node_limit=node_limit
    )
    n = len(nodes)
    eidx = _indexed_edges(edges_w, nodes, src_col=src_col, dst_col=dst_col)

    # out-weight per source node: one scan of sparse bincount partials,
    # node-sized driver fold
    def out_partial(t: pa.Table) -> pa.Table:
        s = t["si"].to_numpy(zero_copy_only=False)
        w = t["w"].to_numpy(zero_copy_only=False)
        acc = np.bincount(s, weights=w, minlength=n)
        present = np.flatnonzero(acc)
        return pa.table({"i": pa.array(present.astype(np.int64)),
                         "v": pa.array(acc[present])})

    from .linalg import fold_sparse_partials

    outw = fold_sparse_partials(
        eidx.map_batches(out_partial, batch_format="pyarrow"),
        np.zeros(n, dtype=np.float64),
    )

    dangling = outw == 0.0
    rate_den = np.where(dangling, 1.0, outw)  # avoid div-by-0; dangling rows emit no edges anyway

    e = None
    if seeds is not None:
        seed_arr = np.array(sorted(set(seeds)), dtype=object)
        pos = np.searchsorted(nodes, seed_arr)
        pos_c = np.minimum(pos, n - 1)
        present = nodes[pos_c] == seed_arr
        sc = int(present.sum())
        if sc == 0:
            raise ValueError("personalized pagerank: no seed present in graph")
        e = np.zeros(n, dtype=np.float64)
        e[pos_c[present]] = 1.0 / sc
        r = e.copy()
    else:
        r = np.full(n, 1.0 / n, dtype=np.float64)
    for _ in range(n_iter):
        rate = r / rate_den
        rate_ref = ray.put(rate)

        def contrib_partial(t: pa.Table, _ref=rate_ref) -> pa.Table:
            rt = ray.get(_ref)
            s = t["si"].to_numpy(zero_copy_only=False)
            d = t["di"].to_numpy(zero_copy_only=False)
            w = t["w"].to_numpy(zero_copy_only=False)
            acc = np.bincount(d, weights=rt[s] * w, minlength=n)
            present = np.flatnonzero(acc)
            return pa.table({"i": pa.array(present.astype(np.int64)),
                             "v": pa.array(acc[present])})

        contrib = fold_sparse_partials(
            eidx.map_batches(contrib_partial, batch_format="pyarrow"),
            np.zeros(n, dtype=np.float64),
        )
        dm = float(r[dangling].sum())
        if e is None:
            r = (1.0 - damping) / n + damping * (contrib + dm / n)
        else:
            r = (1.0 - damping) * e + damping * (contrib + dm * e)

    return rd.from_arrow(
        pa.table({"node": pa.array(nodes, type=pa.string()),
                  rank_col: pa.array(r)})
    )


def pagerank_sql(
    edge_ctes: str,
    *,
    damping: float = 0.85,
    n_iter: int = 3,
    node_alias: str = "node",
    rank_col: str = "pagerank",
    round_to: int = 8,
) -> str:
    """ANSI-SQL replay of :func:`pagerank` — the power iterations
    unrolled as CTE chains, generated from ONE place so the oracle
    cannot desync from the engine (the same single-generator policy as
    ``stages/shuffle.splitmix64_sql``).

    ``edge_ctes`` must define a CTE named ``e`` with columns
    (src VARCHAR, dst VARCHAR, w DOUBLE), already self-loop-free and
    weight-aggregated (what :func:`weighted_host_edges` computes)."""
    d = repr(float(damping))
    parts = [
        f"WITH {edge_ctes},",
        "nodes AS (SELECT DISTINCT h FROM"
        " (SELECT src AS h FROM e UNION ALL SELECT dst AS h FROM e)),",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),",
        "outw AS (SELECT src, SUM(w) AS ow FROM e GROUP BY src),",
        "r0 AS (SELECT h, 1.0 / nn.n AS r FROM nodes CROSS JOIN nn),",
    ]
    for i in range(1, n_iter + 1):
        p = i - 1
        parts += [
            f"d{i} AS (SELECT COALESCE(SUM(r{p}.r), 0) AS dm FROM r{p}"
            f" LEFT JOIN outw ON r{p}.h = outw.src WHERE outw.src IS NULL),",
            f"c{i} AS (SELECT e.dst AS h, SUM(r{p}.r * e.w / outw.ow) AS c"
            f" FROM e JOIN r{p} ON e.src = r{p}.h"
            f" JOIN outw ON e.src = outw.src GROUP BY e.dst),",
            f"r{i} AS (SELECT nodes.h,"
            f" (1.0 - {d}) / nn.n + {d} * (COALESCE(c{i}.c, 0) + d{i}.dm / nn.n) AS r"
            f" FROM nodes CROSS JOIN nn CROSS JOIN d{i}"
            f" LEFT JOIN c{i} ON nodes.h = c{i}.h),",
        ]
    last = parts.pop()[:-1]  # strip trailing comma from the final CTE
    parts.append(last)
    parts.append(
        f"SELECT h AS {node_alias}, round(r, {round_to}) AS {rank_col}"
        f" FROM r{n_iter}"
    )
    return "\n".join(parts)


def personalized_pagerank_sql(
    edge_ctes: str,
    seeds: "list[str]",
    *,
    damping: float = 0.85,
    n_iter: int = 3,
    node_alias: str = "node",
    rank_col: str = "pagerank",
    round_to: int = 8,
) -> str:
    """ANSI-SQL replay of :func:`pagerank` with ``seeds`` (personalized
    teleport) — same single-generator policy and ``e`` edge contract as
    :func:`pagerank_sql`; r0 = teleport vector, dangling mass restarts
    at the seeds."""
    d = repr(float(damping))
    in_list = ", ".join(
        "'" + s.replace("'", "''") + "'" for s in sorted(set(seeds))
    )
    parts = [
        f"WITH {edge_ctes},",
        "nodes AS (SELECT DISTINCT h FROM"
        " (SELECT src AS h FROM e UNION ALL SELECT dst AS h FROM e)),",
        f"sn AS (SELECT CAST(count(*) AS DOUBLE) AS sc FROM nodes"
        f" WHERE h IN ({in_list})),",
        f"ev AS (SELECT h, CASE WHEN h IN ({in_list}) THEN 1.0 / sn.sc"
        f" ELSE 0.0 END AS e FROM nodes CROSS JOIN sn),",
        "outw AS (SELECT src, SUM(w) AS ow FROM e GROUP BY src),",
        "r0 AS (SELECT h, e AS r FROM ev),",
    ]
    for i in range(1, n_iter + 1):
        p = i - 1
        parts += [
            f"d{i} AS (SELECT COALESCE(SUM(r{p}.r), 0) AS dm FROM r{p}"
            f" LEFT JOIN outw ON r{p}.h = outw.src WHERE outw.src IS NULL),",
            f"c{i} AS (SELECT e.dst AS h, SUM(r{p}.r * e.w / outw.ow) AS c"
            f" FROM e JOIN r{p} ON e.src = r{p}.h"
            f" JOIN outw ON e.src = outw.src GROUP BY e.dst),",
            f"r{i} AS (SELECT ev.h,"
            f" (1.0 - {d}) * ev.e + {d} * (COALESCE(c{i}.c, 0) + d{i}.dm * ev.e) AS r"
            f" FROM ev CROSS JOIN d{i}"
            f" LEFT JOIN c{i} ON ev.h = c{i}.h),",
        ]
    last = parts.pop()[:-1]
    parts.append(last)
    parts.append(
        f"SELECT h AS {node_alias}, round(r, {round_to}) AS {rank_col}"
        f" FROM r{n_iter}"
    )
    return "\n".join(parts)


def hits(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    n_iter: int = 3,
    node_limit: int = 50_000_000,
) -> rd.Dataset:
    """HITS hubs & authorities over a (src, dst) edge Dataset — the
    link-analysis twin of :func:`pagerank` (Kleinberg 1999): a good hub
    points at good authorities and vice versa.  Returns a node-sized
    Dataset (node:string, hub:float64, authority:float64).

    Same scale shape as pagerank: the raw edge stream reduces ONCE to a
    weighted host-pair table (self-loops dropped); each iteration is one
    node-sized ``ray.put`` broadcast + one shuffle-free bincount scan
    per direction (authority from hubs, then hubs from the new
    authorities) + a node-sized driver fold.  Normalization is L1
    (scores sum to 1) per update — contraction the unrolled SQL oracle
    replays exactly; hub/authority start uniform."""
    edges_w = weighted_host_edges(
        edges, src_col=src_col, dst_col=dst_col
    ).materialize()
    nodes = _node_universe(
        edges_w, src_col=src_col, dst_col=dst_col, node_limit=node_limit
    )
    n = len(nodes)
    eidx = _indexed_edges(edges_w, nodes, src_col=src_col, dst_col=dst_col)

    from .linalg import fold_sparse_partials

    def _propagate(vec: np.ndarray, from_col: str, to_col: str) -> np.ndarray:
        """to[v] = sum over edges of vec[from] * w, one bincount scan."""
        ref = ray.put(vec)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            v = ray.get(_ref)
            f = t[from_col].to_numpy(zero_copy_only=False)
            g = t[to_col].to_numpy(zero_copy_only=False)
            w = t["w"].to_numpy(zero_copy_only=False)
            acc = np.bincount(g, weights=v[f] * w, minlength=n)
            present = np.flatnonzero(acc)
            return pa.table({"i": pa.array(present.astype(np.int64)),
                             "v": pa.array(acc[present])})

        return fold_sparse_partials(
            eidx.map_batches(partial, batch_format="pyarrow"),
            np.zeros(n, dtype=np.float64),
        )

    hub = np.full(n, 1.0 / n, dtype=np.float64)
    auth = np.full(n, 1.0 / n, dtype=np.float64)
    for _ in range(n_iter):
        auth = _propagate(hub, "si", "di")
        s = auth.sum()
        if s <= 0.0:  # unreachable with a nonempty self-loop-free edge set
            raise ValueError("hits: authority mass vanished")
        auth /= s
        hub = _propagate(auth, "di", "si")
        s = hub.sum()
        if s <= 0.0:
            raise ValueError("hits: hub mass vanished")
        hub /= s

    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, type=pa.string()),
                "hub": pa.array(hub),
                "authority": pa.array(auth),
            }
        )
    )


def canonical_edges(
    edges: rd.Dataset, *, src_col: str = "src", dst_col: str = "dst"
) -> rd.Dataset:
    """Raw (possibly directed, possibly duplicated) edge stream → the
    DISTINCT undirected edge set: drop self-loops and nulls, canonicalize
    each pair to (u, v) with u < v (string order), then ONE
    ``groupby(u, v)`` dedup shuffle.  Output columns: (u, v)."""

    def canon(t: pa.Table) -> pa.Table:
        pc = pa.compute
        keep = pc.and_(
            pc.and_(pc.is_valid(t[src_col]), pc.is_valid(t[dst_col])),
            pc.not_equal(t[src_col], t[dst_col]),
        )
        kept = t.filter(pc.fill_null(keep, False))
        s = kept[src_col].to_numpy(zero_copy_only=False)
        d = kept[dst_col].to_numpy(zero_copy_only=False)
        fwd = s < d
        lo = np.where(fwd, s, d)
        hi = np.where(fwd, d, s)
        return pa.table(
            {"u": pa.array(lo, type=pa.string()), "v": pa.array(hi, type=pa.string())}
        )

    return (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Count(alias_name="_m"))
        .select_columns(["u", "v"])
    )


# Above this many distinct edges the closed-wedge membership probe stops
# broadcasting the oriented-edge key array and falls back to a
# shuffled cogroup join (same AUTO-split convention as
# sketches.BROADCAST_KEY_CAP / redirects.BROADCAST_EDGE_CAP).
TRIANGLE_BROADCAST_EDGE_CAP = 4_000_000


def triangle_counts(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    node_limit: int = 50_000_000,
    broadcast_edge_cap: int = TRIANGLE_BROADCAST_EDGE_CAP,
) -> rd.Dataset:
    """Per-node triangle participation + local clustering coefficient
    over an undirected view of a (src, dst) edge Dataset — the graph
    cohesion signal next to :func:`pagerank`/:func:`hits` (link-farm /
    spam-cluster detection ranks hosts by how clique-like their
    neighborhoods are).  Returns a node-sized Dataset
    (node:string, degree:int64, n_tri:int64, clustering:float64), where
    ``clustering = 2*n_tri / (degree*(degree-1))`` (0 when degree < 2),
    rounded to 8 decimals (the convention :func:`triangle_sql` replays).

    Algorithm: degree-ordered wedge counting (the node-iterator with the
    classic low-degree orientation — Chiba–Nishizeki / "forward"
    algorithm).  Every edge is oriented from its lower-(degree, node)
    endpoint to the higher one; each triangle then has exactly ONE apex
    with both out-edges in the wedge, so membership of the closing
    oriented edge counts it exactly once.

    Scale shape:
    - ONE ``groupby(u, v)`` dedup shuffle reduces the raw edge stream to
      the distinct undirected edge set (:func:`canonical_edges`),
      materialized for the later passes;
    - node universe + degree vector are node-sized driver state (same
      assumption and ``node_limit`` guard as pagerank);
    - wedges generate per oriented-source group (ONE groupby shuffle);
      the low-degree orientation bounds out-degree by O(sqrt(m)), so a
      hub with degree 1M never pairs its own neighbors;
    - the closing-edge probe broadcasts the sorted oriented-edge key
      array once via ``ray.put`` when it fits ``broadcast_edge_cap``
      (one searchsorted per wedge batch, shuffle-free), else falls back
      to a salted cogroup of wedge keys against edge keys (both paths
      equivalence-tested);
    - per-node triangle counts fold as sparse bincount partials
      (node-sized driver state, never wedge-sized).
    """
    ce = canonical_edges(edges, src_col=src_col, dst_col=dst_col).materialize()
    nodes = _node_universe(ce, src_col="u", dst_col="v", node_limit=node_limit)
    n = len(nodes)
    n_edges = ce.count()

    idx_ref = ray.put(nodes)

    def to_idx(t: pa.Table, _ref=idx_ref) -> pa.Table:
        uni = ray.get(_ref)
        a = np.searchsorted(uni, t["u"].to_numpy(zero_copy_only=False))
        b = np.searchsorted(uni, t["v"].to_numpy(zero_copy_only=False))
        return pa.table(
            {"ai": pa.array(a.astype(np.int64)), "bi": pa.array(b.astype(np.int64))}
        )

    eidx = ce.map_batches(to_idx, batch_format="pyarrow").materialize()

    from .linalg import fold_sparse_partials

    # degree vector: one sparse-bincount scan, node-sized fold
    def deg_partial(t: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                t["ai"].to_numpy(zero_copy_only=False),
                t["bi"].to_numpy(zero_copy_only=False),
            ]
        )
        acc = np.bincount(both, minlength=n)
        present = np.flatnonzero(acc)
        return pa.table(
            {
                "i": pa.array(present.astype(np.int64)),
                "v": pa.array(acc[present].astype(np.float64)),
            }
        )

    deg = fold_sparse_partials(
        eidx.map_batches(deg_partial, batch_format="pyarrow"),
        np.zeros(n, dtype=np.float64),
    ).astype(np.int64)

    # rank = position in the (degree, node-index) total order; orient
    # every edge low-rank -> high-rank
    rank = np.empty(n, dtype=np.int64)
    rank[np.lexsort((np.arange(n), deg))] = np.arange(n)
    rank_ref = ray.put(rank)

    def orient(t: pa.Table, _ref=rank_ref) -> pa.Table:
        r = ray.get(_ref)
        a = t["ai"].to_numpy(zero_copy_only=False)
        b = t["bi"].to_numpy(zero_copy_only=False)
        fwd = r[a] < r[b]
        lo = np.where(fwd, a, b)
        hi = np.where(fwd, b, a)
        return pa.table({"o": pa.array(lo), "h": pa.array(hi)})

    oriented = eidx.map_batches(orient, batch_format="pyarrow").materialize()

    # wedge generation runs per COARSE source partition (hash(o) %
    # num_parts — one Ray group per partition, a numpy segment sweep
    # inside, not one Ray group per source node): a source's out-edges
    # co-locate, each source segment emits its triu neighbor pairs
    # ordered by rank (each triangle's apex emits its one wedge)
    num_parts = 64

    def _source_segments(g: "pd.DataFrame"):
        """Rows sorted by (apex, neighbor rank) + segment boundaries."""
        r = ray.get(rank_ref)
        apex = g["o"].to_numpy()
        nbr = g["h"].to_numpy()
        order = np.lexsort((r[nbr], apex))
        apex, nbr = apex[order], nbr[order]
        bounds = np.concatenate(
            [[0], np.flatnonzero(apex[1:] != apex[:-1]) + 1, [len(apex)]]
        )
        return apex, nbr, bounds

    def _iter_wedges(apex, nbr, bounds):
        for s, e in zip(bounds[:-1], bounds[1:]):
            k = e - s
            if k < 2:
                continue
            iu, ju = np.triu_indices(k, k=1)
            yield nbr[s + iu], nbr[s + ju], apex[s]

    # closing-edge membership probe on key = x*n + y (rank(x) < rank(y))
    def edge_keys(t: pa.Table) -> pa.Table:
        o = t["o"].to_numpy(zero_copy_only=False)
        h = t["h"].to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array(o * np.int64(n) + h)})

    ekeys = oriented.map_batches(edge_keys, batch_format="pyarrow")

    from .dedup import add_key_partition

    part_oriented = (
        oriented.map_batches(
            lambda t: add_key_partition(t, "o", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
    )

    if n_edges <= broadcast_edge_cap:
        from .collect import collect_tables

        karr = np.sort(
            np.concatenate(
                [
                    t["k"].to_numpy(zero_copy_only=False)
                    for t in collect_tables(ekeys, drop_empty=True)
                ]
                or [np.empty(0, dtype=np.int64)]
            )
        )
        karr_ref = ray.put(karr)

        # FUSED wedge-generate + closing probe + bincount: wedges never
        # leave the task, each partition emits node-sized sparse rows
        def wedge_close_partial(g: "pd.DataFrame", _ref=karr_ref) -> "pd.DataFrame":
            import pandas as pd

            ks = ray.get(_ref)
            apex, nbr, bounds = _source_segments(g)
            acc = np.zeros(n, dtype=np.int64)
            for x, y, a in _iter_wedges(apex, nbr, bounds):
                wk = x * np.int64(n) + y
                if len(ks) == 0:
                    continue
                pos = np.minimum(np.searchsorted(ks, wk), len(ks) - 1)
                hit = ks[pos] == wk
                nh = int(hit.sum())
                if nh:
                    acc += np.bincount(x[hit], minlength=n)
                    acc += np.bincount(y[hit], minlength=n)
                    acc[a] += nh
            present = np.flatnonzero(acc)
            return pd.DataFrame(
                {
                    "i": present.astype(np.int64),
                    "v": acc[present].astype(np.float64),
                }
            )

        tri_partials = part_oriented.map_groups(
            wedge_close_partial, batch_format="pandas"
        )
    else:
        # cogroup fallback: wedge keys and edge keys meet in one salted
        # groupby; a wedge closes iff its key group contains an edge row
        def wedge_partition(g: "pd.DataFrame") -> "pd.DataFrame":
            import pandas as pd

            apex, nbr, bounds = _source_segments(g)
            xs, ys, aps = [], [], []
            for x, y, a in _iter_wedges(apex, nbr, bounds):
                xs.append(x)
                ys.append(y)
                aps.append(np.full(len(x), a, dtype=np.int64))
            if not xs:
                return pd.DataFrame(
                    {
                        "k": pd.Series([], dtype=np.int64),
                        "apex": pd.Series([], dtype=np.int64),
                    }
                )
            x = np.concatenate(xs)
            y = np.concatenate(ys)
            return pd.DataFrame(
                {
                    "k": x * np.int64(n) + y,
                    "apex": np.concatenate(aps),
                }
            )

        wk = part_oriented.map_groups(wedge_partition, batch_format="pandas")
        ek = ekeys.map_batches(
            lambda t: t.append_column(
                "apex", pa.array(np.full(t.num_rows, -1, dtype=np.int64))
            ),
            batch_format="pyarrow",
        )

        # wedge keys and edge keys meet in one COARSE partition cogroup
        # (hash(k) % num_parts); inside, membership is one sorted
        # searchsorted of wedge keys into the partition's edge keys —
        # fully vectorized, no per-key group
        def close_partition(g: "pd.DataFrame") -> "pd.DataFrame":
            import pandas as pd

            a = g["apex"].to_numpy()
            keys = g["k"].to_numpy()
            ekeys_p = np.unique(keys[a < 0])
            wmask = a >= 0
            wkeys = keys[wmask]
            if not len(ekeys_p) or not len(wkeys):
                return pd.DataFrame(
                    {
                        "i": pd.Series([], dtype=np.int64),
                        "v": pd.Series([], dtype=np.float64),
                    }
                )
            pos = np.minimum(np.searchsorted(ekeys_p, wkeys), len(ekeys_p) - 1)
            hit = ekeys_p[pos] == wkeys
            hk = wkeys[hit]
            acc = np.bincount((hk // n).astype(np.int64), minlength=n)
            acc += np.bincount((hk % n).astype(np.int64), minlength=n)
            acc += np.bincount(a[wmask][hit], minlength=n)
            present = np.flatnonzero(acc)
            return pd.DataFrame(
                {
                    "i": present.astype(np.int64),
                    "v": acc[present].astype(np.float64),
                }
            )

        tri_partials = (
            wk.union(ek)
            .map_batches(
                lambda t: add_key_partition(t, "k", num_parts=num_parts),
                batch_format="pyarrow",
            )
            .groupby("_part")
            .map_groups(close_partition, batch_format="pandas")
        )

    tri = fold_sparse_partials(
        tri_partials, np.zeros(n, dtype=np.float64)
    ).astype(np.int64)

    degf = deg.astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        cc = np.where(deg < 2, 0.0, 2.0 * tri / (degf * (degf - 1.0)))
    cc = np.sign(cc) * np.floor(np.abs(cc) * 1e8 + 0.5) / 1e8
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, type=pa.string()),
                "degree": pa.array(deg),
                "n_tri": pa.array(tri),
                "clustering": pa.array(cc),
            }
        )
    )


def triangle_sql(
    edge_ctes: str,
    *,
    node_alias: str = "node",
    round_to: int = 8,
) -> str:
    """ANSI-SQL replay of :func:`triangle_counts` — canonical u<v edge
    dedup, the a<b<c three-way self-join (each triangle enumerated
    exactly once), per-node participation counts and the clustering
    coefficient, generated from ONE place so the oracle cannot desync
    from the engine (same single-generator policy as
    :func:`pagerank_sql`).  ``edge_ctes`` must define a CTE ``e`` with
    columns (src VARCHAR, dst VARCHAR) (extra columns ignored);
    self-loops are dropped here."""
    return f"""WITH {edge_ctes},
ce AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       FROM e WHERE src <> dst),
deg AS (SELECT h, count(*) AS d FROM
        (SELECT u AS h FROM ce UNION ALL SELECT v AS h FROM ce) GROUP BY h),
tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM ce e1
        JOIN ce e2 ON e2.u = e1.v
        JOIN ce e3 ON e3.u = e1.u AND e3.v = e2.v),
tn AS (SELECT h, count(*) AS t FROM
       (SELECT a AS h FROM tri UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri) GROUP BY h)
SELECT deg.h AS {node_alias},
       CAST(deg.d AS BIGINT) AS degree,
       CAST(COALESCE(tn.t, 0) AS BIGINT) AS n_tri,
       round(CASE WHEN deg.d < 2 THEN 0.0
             ELSE 2.0 * COALESCE(tn.t, 0) / (deg.d * (deg.d - 1.0)) END,
             {round_to}) AS clustering
FROM deg LEFT JOIN tn ON deg.h = tn.h"""


def bfs_depth(
    edges: rd.Dataset,
    seeds: list[str],
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 8,
    node_limit: int = 50_000_000,
) -> rd.Dataset:
    """Multi-source directed BFS over a (src, dst) edge Dataset — the
    crawl-depth signal (how many link hops from the seed list reach each
    host) frontier schedulers budget by.  Returns (node:string,
    depth:int64) for every node reachable within ``max_hops``; seeds are
    depth 0 (and appear in the output even when absent from the edge
    set, matching the SQL replay).

    Scale shape (same node-universe-fits-driver assumption as
    :func:`pagerank`, guarded by ``node_limit``): the edge stream
    reduces ONCE through :func:`weighted_host_edges` and indexes once;
    each hop is ONE ``ray.put`` broadcast of the sorted frontier index
    array + ONE shuffle-free scan over the indexed edges emitting
    sparse newly-touched-node partials + a node-sized driver fold.  The
    loop exits early when a frontier empties, so the cost is
    min(max_hops, eccentricity) scans."""
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    if not seeds:
        raise ValueError("bfs_depth: empty seed list")
    if len(set(seeds)) != len(seeds):
        raise ValueError("bfs_depth: duplicate seeds")

    edges_w = weighted_host_edges(
        edges, src_col=src_col, dst_col=dst_col
    ).materialize()
    nodes = _node_universe(
        edges_w, src_col=src_col, dst_col=dst_col, node_limit=node_limit
    )
    n = len(nodes)
    eidx = _indexed_edges(edges_w, nodes, src_col=src_col, dst_col=dst_col)

    from .linalg import fold_sparse_partials

    seed_arr = np.array(sorted(seeds), dtype=object)
    pos = np.searchsorted(nodes, seed_arr)
    in_graph = (pos < n) & (nodes[np.minimum(pos, n - 1)] == seed_arr)

    depth = np.full(n, -1, dtype=np.int64)
    depth[pos[in_graph]] = 0
    frontier = np.sort(pos[in_graph])

    for d in range(1, max_hops + 1):
        if not len(frontier):
            break
        f_ref = ray.put(frontier)

        def touch_partial(t: pa.Table, _ref=f_ref) -> pa.Table:
            fr = ray.get(_ref)
            s = t["si"].to_numpy(zero_copy_only=False)
            di = t["di"].to_numpy(zero_copy_only=False)
            p = np.minimum(np.searchsorted(fr, s), len(fr) - 1)
            hit = fr[p] == s
            touched = np.unique(di[hit])
            return pa.table(
                {
                    "i": pa.array(touched.astype(np.int64)),
                    "v": pa.array(np.ones(len(touched), dtype=np.float64)),
                }
            )

        reached = fold_sparse_partials(
            eidx.map_batches(touch_partial, batch_format="pyarrow"),
            np.zeros(n, dtype=np.float64),
        )
        new = np.flatnonzero((reached > 0) & (depth < 0))
        if not len(new):
            break
        depth[new] = d
        frontier = new  # flatnonzero is already sorted

    found = depth >= 0
    out_nodes = list(nodes[found])
    out_depth = list(depth[found])
    # seeds absent from the edge set still report depth 0
    for s, ok in zip(seed_arr, in_graph):
        if not ok:
            out_nodes.append(s)
            out_depth.append(0)
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(out_nodes, type=pa.string()),
                "depth": pa.array(np.array(out_depth, dtype=np.int64)),
            }
        )
    )


def bfs_sql(
    edge_ctes: str,
    seeds: list[str],
    *,
    max_hops: int = 8,
    node_alias: str = "node",
) -> str:
    """ANSI-SQL replay of :func:`bfs_depth` — a bounded recursive
    reachability CTE (the q128/q143 connected-components pattern) with
    min-hop fold, generated from the SAME seeds/budget (single-generator
    policy).  ``edge_ctes`` must define a CTE ``e`` with
    (src VARCHAR, dst VARCHAR); self-loops and duplicates are harmless
    here (they never shorten a path)."""
    seed_rows = " UNION ALL ".join(f"SELECT '{s}' AS n" for s in sorted(set(seeds)))
    return f"""WITH RECURSIVE {edge_ctes},
seeds AS ({seed_rows}),
rec AS (
  SELECT n, 0 AS d FROM seeds
  UNION
  SELECT e.dst AS n, rec.d + 1 AS d
  FROM rec JOIN e ON e.src = rec.n
  WHERE rec.d < {max_hops} AND e.src <> e.dst
)
SELECT n AS {node_alias}, CAST(min(d) AS BIGINT) AS depth
FROM rec GROUP BY n"""


def hits_sql(
    edge_ctes: str,
    *,
    n_iter: int = 3,
    node_alias: str = "node",
    round_to: int = 8,
) -> str:
    """ANSI-SQL replay of :func:`hits` — the mutual-reinforcement
    iterations unrolled as CTE chains, generated from ONE place so the
    oracle cannot desync from the engine (same single-generator policy
    as :func:`pagerank_sql`).  ``edge_ctes`` must define a CTE ``e``
    with (src VARCHAR, dst VARCHAR, w DOUBLE), self-loop-free and
    weight-aggregated."""
    parts = [
        f"WITH {edge_ctes},",
        "nodes AS (SELECT DISTINCT h FROM"
        " (SELECT src AS h FROM e UNION ALL SELECT dst AS h FROM e)),",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),",
        "h0 AS (SELECT h, 1.0 / nn.n AS v FROM nodes CROSS JOIN nn),",
    ]
    for i in range(1, n_iter + 1):
        p = i - 1
        parts += [
            # authority from hubs, L1-normalized
            f"ar{i} AS (SELECT e.dst AS h, SUM(h{p}.v * e.w) AS v"
            f" FROM e JOIN h{p} ON e.src = h{p}.h GROUP BY e.dst),",
            f"as{i} AS (SELECT SUM(v) AS s FROM ar{i}),",
            f"a{i} AS (SELECT nodes.h, COALESCE(ar{i}.v, 0) / as{i}.s AS v"
            f" FROM nodes CROSS JOIN as{i}"
            f" LEFT JOIN ar{i} ON nodes.h = ar{i}.h),",
            # hubs from the NEW authorities, L1-normalized
            f"hr{i} AS (SELECT e.src AS h, SUM(a{i}.v * e.w) AS v"
            f" FROM e JOIN a{i} ON e.dst = a{i}.h GROUP BY e.src),",
            f"hs{i} AS (SELECT SUM(v) AS s FROM hr{i}),",
            f"h{i} AS (SELECT nodes.h, COALESCE(hr{i}.v, 0) / hs{i}.s AS v"
            f" FROM nodes CROSS JOIN hs{i}"
            f" LEFT JOIN hr{i} ON nodes.h = hr{i}.h),",
        ]
    last = parts.pop()[:-1]
    parts.append(last)
    parts.append(
        f"SELECT h{n_iter}.h AS {node_alias},"
        f" round(h{n_iter}.v, {round_to}) AS hub,"
        f" round(a{n_iter}.v, {round_to}) AS authority"
        f" FROM h{n_iter} JOIN a{n_iter} ON h{n_iter}.h = a{n_iter}.h"
    )
    return "\n".join(parts)


def degree_distribution(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    num_parts: int = 64,
) -> "pd.DataFrame":
    """In/out-degree distribution + CCDF of a link graph — the
    power-law-tail diagnostic next to pagerank/HITS/triangles (hub
    detection, crawl-frontier fanout budgeting).  Degree counts DISTINCT
    neighbors (self-loops dropped), matching the ``e`` edge convention
    every other graph oracle here uses.

    Output: one row per (direction, deg) with n_hosts and
    ccdf = P(degree >= deg) among hosts that appear on that side.

    Scale shape: ONE node-hash coarse-partition shuffle total (the
    add_key_partition pattern — a first cut ran dedup + degree-count +
    histogram as THREE sequential all-to-alls, 2.5× slower at sf0.1):
    per-batch (direction, node, nbr) dedup partials act as the map-side
    combiner, each partition re-dedups cross-batch duplicates and folds
    its nodes to (direction, deg) histogram rows, and the driver merge
    is |distinct degrees × partitions|-sized.  A node's pairs co-locate
    by construction (hash on node), so no second pass is needed; giant
    hosts are bounded by per-partition memory, not per-task Python.
    """
    import pandas as pd
    from .collect import collect_table
    from .dedup import add_key_partition
    from .selection import round_half_away

    def pairs(t: pa.Table) -> pa.Table:
        keep = pa.compute.invert(pa.compute.equal(t[src_col], t[dst_col]))
        t = t.filter(pa.compute.fill_null(keep, False))
        node = pa.concat_arrays(
            [t[src_col].combine_chunks().cast(pa.string()),
             t[dst_col].combine_chunks().cast(pa.string())]
        )
        nbr = pa.concat_arrays(
            [t[dst_col].combine_chunks().cast(pa.string()),
             t[src_col].combine_chunks().cast(pa.string())]
        )
        direction = pa.concat_arrays(
            [pa.array(["out"] * t.num_rows), pa.array(["in"] * t.num_rows)]
        )
        trip = pa.table({"direction": direction, "node": node, "nbr": nbr})
        trip = trip.group_by(["direction", "node", "nbr"]).aggregate([])
        return add_key_partition(trip, "node", num_parts=num_parts)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["direction", "node", "nbr"])
        deg = d.groupby(["direction", "node"], sort=False).size()
        hist = (
            deg.rename("deg").reset_index()
            .groupby(["direction", "deg"], sort=False)
            .size()
            .rename("n_hosts")
            .reset_index()
        )
        hist["deg"] = hist["deg"].astype("int64")
        hist["n_hosts"] = hist["n_hosts"].astype("int64")
        return hist

    partials = (
        edges.map_batches(pairs, batch_format="pyarrow", batch_size=65536)
        .groupby("_part")
        .map_groups(per_part, batch_format="pandas")
    )
    hist = (
        collect_table(partials)
        .to_pandas()
        .groupby(["direction", "deg"], as_index=False)["n_hosts"]
        .sum()
    )
    out = []
    for direction, sub in hist.groupby("direction", sort=True):
        sub = sub.sort_values("deg", ascending=False).reset_index(drop=True)
        total = int(sub["n_hosts"].sum())
        cum = sub["n_hosts"].cumsum().to_numpy(dtype=np.float64)
        sub["ccdf"] = round_half_away(cum / float(total), 6)
        out.append(sub)
    res = pd.concat(out, ignore_index=True).sort_values(
        ["direction", "deg"]
    ).reset_index(drop=True)
    res["deg"] = res["deg"].astype(np.int64)
    res["n_hosts"] = res["n_hosts"].astype(np.int64)
    return res[["direction", "deg", "n_hosts", "ccdf"]]


def degree_distribution_sql(edge_ctes: str) -> str:
    """DuckDB replay of :func:`degree_distribution` over the shared edge
    convention (``edge_ctes`` must define CTE ``e`` with (src, dst) as
    distinct self-loop-free pairs — the same contract as
    :func:`pagerank_sql`)."""
    return f"""
        WITH {edge_ctes},
        d AS (
          SELECT 'out' AS direction, src AS node, CAST(count(*) AS BIGINT) AS deg
          FROM e GROUP BY src
          UNION ALL
          SELECT 'in', dst, CAST(count(*) AS BIGINT) FROM e GROUP BY dst
        ),
        h AS (
          SELECT direction, deg, CAST(count(*) AS BIGINT) AS n_hosts
          FROM d GROUP BY direction, deg
        )
        SELECT direction, deg, n_hosts,
               round(CAST(sum(n_hosts) OVER (PARTITION BY direction
                       ORDER BY deg DESC) AS DOUBLE)
                     / sum(n_hosts) OVER (PARTITION BY direction), 6) AS ccdf
        FROM h
    """


def kcore_members(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    k: int = 3,
    max_rounds: int = 12,
    node_limit: int = 50_000_000,
) -> "pd.DataFrame":
    """k-core decomposition of the UNDIRECTED host graph: iteratively
    peel nodes whose degree (within the surviving subgraph) is < k
    until a fixed point — the survivors are the k-core, the densest
    "everyone here has ≥ k neighbours here" backbone.  Crawl/quality
    use: the k-core separates the genuinely interlinked web (navigable
    hubs, topical clusters) from pendant leaf hosts and chains that a
    single spam campaign can fabricate; PageRank ranks nodes, k-core
    certifies MUTUAL density (a node cannot buy its way in without k
    in-core neighbours).

    Scale shape (the pagerank cost model): the edge list is reduced by
    :func:`canonical_edges`' ONE dedup shuffle to the distinct
    undirected pair table, int-indexed against the sorted node
    universe and materialized; each peel round is ONE ``ray.put`` of
    the node-sized alive bitmask + ONE shuffle-free ``map_batches``
    scan emitting sparse bincount degree partials + a node-sized
    driver fold.  Rounds are data-bounded (every round either removes
    a node or terminates); after ``max_rounds`` without convergence it
    RAISES (the unrolled SQL replay has exactly ``max_rounds`` layers,
    so a silent partial peel could desync the engines).

    Output: (node:string, core_degree:int64) for k-core members —
    core_degree is the degree within the final core — sorted by node.
    SQL replay GENERATED by :func:`kcore_sql` (single-generator)."""
    import pandas as pd

    from .linalg import fold_sparse_partials

    ce = canonical_edges(edges, src_col=src_col, dst_col=dst_col).materialize()
    try:
        nodes = _node_universe(
            ce, src_col="u", dst_col="v", node_limit=node_limit
        )
    except ValueError as e:
        if "empty edge set" not in str(e):
            raise
        # only self-loops / null endpoints survive canonicalization:
        # the k-core of the empty graph is empty (the SQL replay
        # returns zero rows here too, so the engines stay in sync)
        return pd.DataFrame(
            {"node": pd.Series([], dtype=object),
             "core_degree": pd.Series([], dtype=np.int64)}
        )
    n = len(nodes)
    idx_ref = ray.put(nodes)

    def to_idx(t: pa.Table, _ref=idx_ref) -> pa.Table:
        uni = ray.get(_ref)
        s = np.searchsorted(uni, t["u"].to_numpy(zero_copy_only=False))
        d = np.searchsorted(uni, t["v"].to_numpy(zero_copy_only=False))
        return pa.table({"si": pa.array(s.astype(np.int64)),
                         "di": pa.array(d.astype(np.int64))})

    eidx = ce.map_batches(to_idx, batch_format="pyarrow").materialize()

    alive = np.ones(n, dtype=bool)
    deg = np.zeros(n, dtype=np.float64)
    for _ in range(max_rounds + 1):
        alive_ref = ray.put(alive)

        def deg_partial(t: pa.Table, _ref=alive_ref) -> pa.Table:
            a = ray.get(_ref)
            s = t["si"].to_numpy(zero_copy_only=False)
            d = t["di"].to_numpy(zero_copy_only=False)
            keep = a[s] & a[d]
            s, d = s[keep], d[keep]
            acc = np.bincount(s, minlength=n).astype(np.float64)
            acc += np.bincount(d, minlength=n)
            present = np.flatnonzero(acc)
            return pa.table({"i": pa.array(present.astype(np.int64)),
                             "v": pa.array(acc[present])})

        deg = fold_sparse_partials(
            eidx.map_batches(deg_partial, batch_format="pyarrow"),
            np.zeros(n, dtype=np.float64),
        )
        new_alive = alive & (deg >= k)
        if (new_alive == alive).all():
            break
        alive = new_alive
    else:
        raise RuntimeError(
            f"kcore_members: peel did not converge within max_rounds="
            f"{max_rounds} (graph has a deeper peel sequence); raise "
            "max_rounds — the SQL replay must be regenerated with the "
            "same value"
        )

    members = np.flatnonzero(alive)
    return pd.DataFrame(
        {
            "node": pd.Series(nodes[members], dtype=object),
            "core_degree": deg[members].astype(np.int64),
        }
    ).sort_values("node", kind="mergesort").reset_index(drop=True)


def kcore_sql(edge_ctes: str, *, k: int = 3, max_rounds: int = 12,
              node_col: str = "node") -> str:
    """DuckDB replay of :func:`kcore_members` (single-generator):
    ``edge_ctes`` must define ``e(src, dst, ...)``; the peel is
    unrolled to exactly ``max_rounds`` fixed-point layers (extra
    layers past convergence are no-ops, and the engine RAISES if it
    would need more — the two can never silently diverge)."""
    layers = []
    prev = "n0"
    for i in range(1, max_rounds + 1):
        cur = f"a{i}"
        layers.append(f"""{cur} AS MATERIALIZED (
            SELECT v FROM (
                SELECT v, count(*) AS c FROM (
                    SELECT u.a AS v FROM u
                    JOIN {prev} x ON u.a = x.v JOIN {prev} y ON u.b = y.v
                    UNION ALL
                    SELECT u.b FROM u
                    JOIN {prev} x ON u.a = x.v JOIN {prev} y ON u.b = y.v
                ) GROUP BY v
            ) WHERE c >= {k}
        )""")
        prev = cur
    chain = ",\n".join(layers)
    return f"""
        WITH {edge_ctes},
        u AS MATERIALIZED (
            SELECT least(src, dst) AS a, greatest(src, dst) AS b
            FROM e WHERE src <> dst AND src IS NOT NULL
                  AND dst IS NOT NULL
            GROUP BY 1, 2
        ),
        n0 AS (SELECT a AS v FROM u UNION SELECT b FROM u),
        {chain}
        SELECT v AS {node_col}, CAST(c AS BIGINT) AS core_degree FROM (
            SELECT v, count(*) AS c FROM (
                SELECT u.a AS v FROM u
                JOIN {prev} x ON u.a = x.v JOIN {prev} y ON u.b = y.v
                UNION ALL
                SELECT u.b FROM u
                JOIN {prev} x ON u.a = x.v JOIN {prev} y ON u.b = y.v
            ) GROUP BY v
        ) WHERE c >= {k}
    """


def cocitation_similarity(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    max_in_degree: int = 10_000,
    num_parts: int = 32,
    round_to: int = 6,
) -> "pd.DataFrame":
    """Co-citation similarity between source hosts: Jaccard over their
    distinct OUT-neighbour sets, |N(a) ∩ N(b)| / |N(a) ∪ N(b)| — two
    hosts are similar when they link to the same places, the
    link-structure analogue of the content-based mirror detector
    (stages/mirrors.py) and the set-based twin of PageRank's
    "who links to whom" (here: "who links ALIKE").  Classic use:
    grouping syndication networks / link farms whose PAGES differ but
    whose out-link profiles are near-identical.

    Destinations whose in-degree exceeds ``max_in_degree`` are
    EXCLUDED before pairing (both engines): a mega-hub everyone links
    to carries no similarity signal and would blow the per-destination
    pair expansion up quadratically (the standard co-citation
    practice; the threshold is the q204-style loud-cap convention but
    deterministic, so the SQL replay applies the same HAVING filter).

    Scale shape: per-batch local (src, dst) dedup partials, then ONE
    dst-hash coarse shuffle — every dst's rows co-locate, so the
    GLOBAL distinct, the in-degree cap, the per-src set-size partials
    AND the pair emission all happen inside the partition scan (the
    first version ran a separate distinct groupby + a sizes execution
    + a pair shuffle — three sequential all-to-alls whose fixed
    latency dominated at sf0.1); sizes and pair counts fold
    driver-side (|hosts| + co-cited-pairs rows — pairs sharing nothing
    never materialize; they'd be Jaccard 0).  Output: (host_a, host_b,
    n_common:int64, n_a:int64, n_b:int64, jaccard) for a < b with ≥ 1
    shared destination, sorted.  SQL replay GENERATED by
    :func:`cocitation_sql`."""
    import pandas as pd
    import pyarrow.compute as pc

    from .collect import collect_tables
    from .dedup import add_key_partition
    from .selection import round_half_away

    def local_distinct(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t[src_col]), pc.is_valid(t[dst_col]))
        t = t.filter(keep).select([src_col, dst_col])
        return t.group_by([src_col, dst_col]).aggregate([])

    def per_partition(df: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame(
            {"kind": pd.Series([], dtype=object),
             "a": pd.Series([], dtype=object),
             "b": pd.Series([], dtype=object),
             "n": pd.Series([], dtype=np.int64)}
        )
        if df.empty:
            return empty
        # global distinct: all rows of a dst live in THIS partition
        df = df[[src_col, dst_col]].drop_duplicates()
        # per-src set-size partials over ALL dsts (sizes count the
        # full neighbourhood; only the PAIRING excludes mega-hubs)
        sizes = (
            df.groupby(src_col, sort=False).size().reset_index(name="n")
        )
        sizes.insert(0, "kind", "s")
        sizes["b"] = ""
        sizes.columns = ["kind", "a", "n", "b"]
        indeg = df.groupby(dst_col, sort=False)[src_col].transform("size")
        kept = df[indeg <= max_in_degree]
        parts = [sizes[["kind", "a", "b", "n"]]]
        if len(kept):
            slim = kept[[dst_col, src_col]]
            m = slim.merge(slim, on=dst_col)
            m = m[m[f"{src_col}_x"] < m[f"{src_col}_y"]]
            if len(m):
                pairs = (
                    m.groupby([f"{src_col}_x", f"{src_col}_y"],
                              sort=False).size().reset_index(name="n")
                )
                pairs.columns = ["a", "b", "n"]
                pairs.insert(0, "kind", "p")
                parts.append(pairs[["kind", "a", "b", "n"]])
        out = pd.concat(parts, ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        return out

    folded = (
        edges.map_batches(local_distinct, batch_format="pyarrow")
        .map_batches(
            lambda t: add_key_partition(t, dst_col, num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(per_partition, batch_format="pandas")
    )
    sizes: dict = {}
    pair_n: dict = {}
    for t in collect_tables(folded, drop_empty=True):
        for kind, a, b, n in zip(t["kind"].to_pylist(), t["a"].to_pylist(),
                                 t["b"].to_pylist(), t["n"].to_pylist()):
            if kind == "s":
                sizes[a] = sizes.get(a, 0) + int(n)
            else:
                pair_n[(a, b)] = pair_n.get((a, b), 0) + int(n)
    if not pair_n:
        return pd.DataFrame(
            {"host_a": pd.Series([], dtype=object),
             "host_b": pd.Series([], dtype=object),
             "n_common": pd.Series([], dtype=np.int64),
             "n_a": pd.Series([], dtype=np.int64),
             "n_b": pd.Series([], dtype=np.int64),
             "jaccard": pd.Series([], dtype=np.float64)}
        )
    pairs = pd.DataFrame(
        [(a, b, n) for (a, b), n in pair_n.items()],
        columns=["a", "b", "n_common"],
    )
    na = pairs["a"].map(sizes).to_numpy(dtype=np.int64)
    nb = pairs["b"].map(sizes).to_numpy(dtype=np.int64)
    inter = pairs["n_common"].to_numpy(dtype=np.int64)
    jac = inter.astype(np.float64) / (na + nb - inter)
    return pd.DataFrame(
        {
            "host_a": pairs["a"],
            "host_b": pairs["b"],
            "n_common": inter.astype(np.int64),
            "n_a": na,
            "n_b": nb,
            "jaccard": round_half_away(jac, round_to),
        }
    ).sort_values(["host_a", "host_b"], kind="mergesort").reset_index(
        drop=True
    )


def cocitation_sql(
    edge_ctes: str, *, max_in_degree: int = 10_000, round_to: int = 6
) -> str:
    """DuckDB replay of :func:`cocitation_similarity`
    (single-generator): ``edge_ctes`` must define ``e(src, dst, ...)``;
    identical distinct sets, in-degree cap, a < b triangle."""
    return f"""
        WITH {edge_ctes},
        d AS (SELECT DISTINCT src, dst FROM e),
        v AS (SELECT src, count(*) AS n FROM d GROUP BY src),
        keep AS (
            SELECT dst FROM d GROUP BY dst
            HAVING count(*) <= {max_in_degree}
        ),
        p AS (
            SELECT a.src AS ga, b.src AS gb, count(*) AS n_common
            FROM d a
            JOIN d b ON a.dst = b.dst AND a.src < b.src
            JOIN keep k ON k.dst = a.dst
            GROUP BY a.src, b.src
        )
        SELECT p.ga AS host_a, p.gb AS host_b,
               CAST(p.n_common AS BIGINT) AS n_common,
               CAST(va.n AS BIGINT) AS n_a, CAST(vb.n AS BIGINT) AS n_b,
               round(p.n_common
                     / CAST(va.n + vb.n - p.n_common AS DOUBLE),
                     {round_to}) AS jaccard
        FROM p JOIN v va ON p.ga = va.src JOIN v vb ON p.gb = vb.src
    """


def assortativity(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    node_limit: int = 50_000_000,
    round_to: int = 6,
) -> "pd.DataFrame":
    """Degree assortativity coefficient of the undirected graph
    (Newman 2002): the Pearson correlation of endpoint degrees across
    edges — positive when hubs link hubs (social-style cores),
    negative when hubs link leaves (web/spam star patterns).  The
    single-number structure check next to the degree DISTRIBUTION
    (q171: what degrees exist) and k-core (q244: where density is):
    assortativity says how degrees MIX.

        e2 = Σ(j+k) / 2M,   r = (Σjk/M − e2²) / (Σ(j²+k²)/2M − e2²)

    over the M distinct undirected edges with endpoint degrees (j, k).

    Scale shape: ONE canonical-edge dedup shuffle; degrees are ONE
    node-sized bincount fold (the pagerank cost model: hosts ≪ pages);
    the moment pass is ONE shuffle-free scan with the degree vector
    broadcast once via ray.put, folding 4 float sums per batch.
    Output: one row (n_edges:int64, r) — r is NULL/NaN on degenerate
    (degree-constant) graphs on both engines.  SQL replay GENERATED
    by :func:`assortativity_sql`."""
    import pandas as pd

    from .collect import collect_tables
    from .linalg import fold_sparse_partials

    ce = canonical_edges(edges, src_col=src_col, dst_col=dst_col).materialize()
    try:
        nodes = _node_universe(
            ce, src_col="u", dst_col="v", node_limit=node_limit
        )
    except ValueError as e:
        if "empty edge set" not in str(e):
            raise
        return pd.DataFrame(
            {"n_edges": pd.Series([0], dtype=np.int64),
             "r": pd.Series([np.nan], dtype=np.float64)}
        )
    n = len(nodes)
    idx_ref = ray.put(nodes)

    def to_idx(t: pa.Table, _ref=idx_ref) -> pa.Table:
        uni = ray.get(_ref)
        s = np.searchsorted(uni, t["u"].to_numpy(zero_copy_only=False))
        d = np.searchsorted(uni, t["v"].to_numpy(zero_copy_only=False))
        return pa.table({"si": pa.array(s.astype(np.int64)),
                         "di": pa.array(d.astype(np.int64))})

    eidx = ce.map_batches(to_idx, batch_format="pyarrow").materialize()

    def deg_partial(t: pa.Table) -> pa.Table:
        s = t["si"].to_numpy(zero_copy_only=False)
        d = t["di"].to_numpy(zero_copy_only=False)
        acc = np.bincount(s, minlength=n).astype(np.float64)
        acc += np.bincount(d, minlength=n)
        present = np.flatnonzero(acc)
        return pa.table({"i": pa.array(present.astype(np.int64)),
                         "v": pa.array(acc[present])})

    deg = fold_sparse_partials(
        eidx.map_batches(deg_partial, batch_format="pyarrow"),
        np.zeros(n, dtype=np.float64),
    )
    deg_ref = ray.put(deg)

    def moment_partial(t: pa.Table, _ref=deg_ref) -> pa.Table:
        dv = ray.get(_ref)
        j = dv[t["si"].to_numpy(zero_copy_only=False)]
        k = dv[t["di"].to_numpy(zero_copy_only=False)]
        return pa.table(
            {"m": pa.array([np.int64(len(j))]),
             "sjk": pa.array([float((j * k).sum())]),
             "sjpk": pa.array([float((j + k).sum())]),
             "sj2k2": pa.array([float((j * j + k * k).sum())])}
        )

    m = 0
    sjk = sjpk = sj2k2 = 0.0
    for t in collect_tables(
        eidx.map_batches(moment_partial, batch_format="pyarrow"),
        drop_empty=True,
    ):
        m += int(sum(t["m"].to_pylist()))
        sjk += float(sum(t["sjk"].to_pylist()))
        sjpk += float(sum(t["sjpk"].to_pylist()))
        sj2k2 += float(sum(t["sj2k2"].to_pylist()))
    e2 = sjpk / (2.0 * m)
    num = sjk / m - e2 * e2
    den = sj2k2 / (2.0 * m) - e2 * e2
    from .selection import round_half_away

    r = num / den if den != 0.0 else np.nan
    return pd.DataFrame(
        {"n_edges": pd.Series([m], dtype=np.int64),
         "r": pd.Series(round_half_away(np.array([r]), round_to))}
    )


def assortativity_sql(edge_ctes: str, *, round_to: int = 6) -> str:
    """DuckDB replay of :func:`assortativity` (single-generator):
    identical canonicalization, degree join, moment arithmetic."""
    return f"""
        WITH {edge_ctes},
        u AS (
            SELECT least(src, dst) AS a, greatest(src, dst) AS b
            FROM e WHERE src <> dst AND src IS NOT NULL
                  AND dst IS NOT NULL
            GROUP BY 1, 2
        ),
        degs AS (
            SELECT v, CAST(count(*) AS DOUBLE) AS d FROM (
                SELECT a AS v FROM u UNION ALL SELECT b FROM u
            ) GROUP BY v
        ),
        mom AS (
            SELECT count(*) AS m,
                   sum(da.d * db.d) AS sjk,
                   sum(da.d + db.d) AS sjpk,
                   sum(da.d * da.d + db.d * db.d) AS sj2k2
            FROM u JOIN degs da ON u.a = da.v JOIN degs db ON u.b = db.v
        )
        SELECT CAST(m AS BIGINT) AS n_edges,
               round((sjk / m - (sjpk / (2.0 * m)) * (sjpk / (2.0 * m)))
                     / (sj2k2 / (2.0 * m)
                        - (sjpk / (2.0 * m)) * (sjpk / (2.0 * m))),
                     {round_to}) AS r
        FROM mom
    """


def reciprocity(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    round_to: int = 6,
) -> "pd.DataFrame":
    """Reciprocity of the DIRECTED graph: the fraction of distinct
    non-loop edges whose reverse edge also exists — mutual-linking
    structure (blogrolls, partner networks) vs one-way broadcast
    (spam farms point AT targets that never point back).  Complements
    assortativity (degree mixing) and k-core (density) as the third
    one-number graph-health check.

    Scale shape: ONE (src, dst) distinct shuffle, a shuffle-free
    canonical-fold partial scan (each distinct edge maps to its
    unordered pair carrying a direction bit), ONE pair groupby; pairs
    present in BOTH directions contribute 2 reciprocal edges.  The
    driver folds a single counter row.  Output: one row
    (n_edges:int64, n_reciprocal:int64, reciprocity).  SQL replay
    GENERATED by :func:`reciprocity_sql`."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Sum

    from .collect import collect_tables
    from .selection import round_half_away

    def canon_dir(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.is_valid(t[src_col]), pc.is_valid(t[dst_col])),
            pc.not_equal(t[src_col], t[dst_col]),
        )
        kept = t.filter(pc.fill_null(keep, False))
        s = kept[src_col].to_numpy(zero_copy_only=False)
        d = kept[dst_col].to_numpy(zero_copy_only=False)
        fwd = s < d
        lo = np.where(fwd, s, d)
        hi = np.where(fwd, d, s)
        return pa.table(
            {"u": pa.array(lo, type=pa.string()),
             "v": pa.array(hi, type=pa.string()),
             "f": pa.array(fwd.astype(np.int64)),
             "r": pa.array((~fwd).astype(np.int64))}
        )

    pairs = (
        edges.map_batches(canon_dir, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Max("f", alias_name="has_f"),
                   Max("r", alias_name="has_r"))
    )

    def fold(t: pa.Table) -> pa.Table:
        f = t["has_f"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = t["has_r"].to_numpy(zero_copy_only=False).astype(np.int64)
        n_edges = int((f + r).sum())
        n_rec = int(2 * (f & r).sum())
        return pa.table({"n_edges": pa.array([n_edges]),
                         "n_rec": pa.array([n_rec])})

    n_edges = n_rec = 0
    for t in collect_tables(
        pairs.map_batches(fold, batch_format="pyarrow"), drop_empty=True
    ):
        n_edges += int(sum(t["n_edges"].to_pylist()))
        n_rec += int(sum(t["n_rec"].to_pylist()))
    rec = n_rec / n_edges if n_edges else np.nan
    return pd.DataFrame(
        {"n_edges": pd.Series([n_edges], dtype=np.int64),
         "n_reciprocal": pd.Series([n_rec], dtype=np.int64),
         "reciprocity": pd.Series(
             round_half_away(np.array([rec]), round_to))}
    )


def reciprocity_sql(edge_ctes: str, *, round_to: int = 6) -> str:
    """DuckDB replay of :func:`reciprocity` (single-generator):
    distinct non-loop edges, reverse-membership self-join."""
    return f"""
        WITH {edge_ctes},
        d AS (
            SELECT DISTINCT src, dst FROM e
            WHERE src <> dst AND src IS NOT NULL AND dst IS NOT NULL
        ),
        rec AS (
            SELECT count(*) AS n_rec
            FROM d a JOIN d b ON a.src = b.dst AND a.dst = b.src
        ),
        tot AS (SELECT count(*) AS n_edges FROM d)
        SELECT CAST(tot.n_edges AS BIGINT) AS n_edges,
               CAST(rec.n_rec AS BIGINT) AS n_reciprocal,
               round(rec.n_rec / CAST(tot.n_edges AS DOUBLE),
                     {round_to}) AS reciprocity
        FROM tot, rec
    """
