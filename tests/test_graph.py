"""PageRank (stages/graph.py): numpy-reference equivalence, dangling
mass, self-loop drop, node-limit guard, SQL-generator parity."""

import collections

import pandas as pd
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.graph import (
    pagerank,
    pagerank_sql,
    weighted_host_edges,
)


def _reference(edge_list, damping=0.85, n_iter=3):
    """Plain-python damped PageRank with uniform teleport + dangling
    redistribution (the module docstring's update rule)."""
    ew = collections.Counter()
    for s, t in edge_list:
        if s != t:
            ew[(s, t)] += 1
    nodes = sorted({x for e in ew for x in e})
    n = len(nodes)
    outw = collections.Counter()
    for (s, _), w in ew.items():
        outw[s] += w
    r = {h: 1.0 / n for h in nodes}
    for _ in range(n_iter):
        dm = sum(r[h] for h in nodes if outw[h] == 0)
        c = collections.Counter()
        for (s, t), w in ew.items():
            c[t] += r[s] * w / outw[s]
        r = {h: (1 - damping) / n + damping * (c[h] + dm / n) for h in nodes}
    return r


def _edges_ds(edge_list):
    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in edge_list], type=pa.string()),
                "dst": pa.array([t for _, t in edge_list], type=pa.string()),
            }
        )
    )


EDGES = [
    ("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("c", "d"),
    ("a", "a"),               # self loop: dropped
    ("b", "c"), ("b", "c"),   # weight 3 total on b->c
    # d has no out-edges: dangling
]


def test_pagerank_matches_reference(ray_session):
    out = pagerank(_edges_ds(EDGES), n_iter=3).to_pandas()
    ref = _reference(EDGES, n_iter=3)
    assert list(out["node"]) == sorted(ref)
    got = dict(zip(out["node"], out["pagerank"]))
    for h, v in ref.items():
        assert got[h] == pytest.approx(v, abs=1e-12)
    # ranks are a probability distribution (teleport + dangling conserve mass)
    assert out["pagerank"].sum() == pytest.approx(1.0, abs=1e-12)


def test_pagerank_more_iterations_converge(ray_session):
    r3 = pagerank(_edges_ds(EDGES), n_iter=3).to_pandas()
    r20 = pagerank(_edges_ds(EDGES), n_iter=20).to_pandas()
    r21 = pagerank(_edges_ds(EDGES), n_iter=21).to_pandas()
    # 20 vs 21 iterations differ less than 3 vs 20 (power iteration contracts)
    d_far = np.abs(r3["pagerank"].to_numpy() - r20["pagerank"].to_numpy()).max()
    d_near = np.abs(r20["pagerank"].to_numpy() - r21["pagerank"].to_numpy()).max()
    assert d_near < d_far
    assert d_near < 1e-3


def test_weighted_edges_drop_self_and_count(ray_session):
    w = weighted_host_edges(_edges_ds(EDGES)).to_pandas()
    pairs = {(r.src, r.dst): r.w for r in w.itertuples()}
    assert ("a", "a") not in pairs
    assert pairs[("b", "c")] == 3
    assert pairs[("a", "b")] == 1


def test_node_limit_guard(ray_session):
    with pytest.raises(ValueError, match="node_limit"):
        pagerank(_edges_ds(EDGES), node_limit=2)


def test_empty_edges_raises(ray_session):
    only_self = _edges_ds([("a", "a")])
    with pytest.raises(ValueError, match="empty"):
        pagerank(only_self)


def test_pagerank_sql_matches_engine(ray_session):
    """The generated unrolled SQL replays the engine bit-for-bit (at the
    oracle's 8-decimal rounding) on an inline DuckDB edge table."""
    duckdb = pytest.importorskip("duckdb")
    rows = ",".join(f"('{s}','{t}')" for s, t in EDGES)
    edge_cte = (
        f"raw(src, dst) AS (SELECT * FROM (VALUES {rows})), "
        "e AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w "
        "FROM raw WHERE src <> dst GROUP BY 1, 2)"
    )
    sql = pagerank_sql(edge_cte, n_iter=3)
    got = duckdb.sql(sql).df().sort_values("node").reset_index(drop=True)
    eng = pagerank(_edges_ds(EDGES), n_iter=3).to_pandas()
    assert list(got["node"]) == list(eng["node"])
    np.testing.assert_allclose(
        got["pagerank"].to_numpy(),
        np.round(eng["pagerank"].to_numpy(), 8),
        atol=1e-8,
    )


def test_hits_matches_dense_numpy_reference(ray_session):
    """stages/graph.hits vs a dense numpy power iteration (same L1
    normalization, weights = parallel-edge counts, self-loops dropped)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.graph import hits

    rng = np.random.RandomState(11)
    src = rng.randint(0, 12, size=400)
    dst = (src + 1 + rng.randint(0, 11, size=400)) % 12  # no self-loops
    names = np.array([f"n{i:02d}" for i in range(12)], dtype=object)
    ds = rd.from_pandas(pd.DataFrame({"src": names[src], "dst": names[dst]}))
    out = hits(ds, n_iter=4).to_pandas().sort_values("node").reset_index(drop=True)

    W = np.zeros((12, 12))
    for s, d in zip(src, dst):
        W[s, d] += 1.0
    h = np.full(12, 1 / 12)
    for _ in range(4):
        a = W.T @ h
        a /= a.sum()
        h = W @ a
        h /= h.sum()
    assert np.allclose(out["hub"].to_numpy(), h, atol=1e-12)
    assert np.allclose(out["authority"].to_numpy(), a, atol=1e-12)
    assert abs(out["hub"].sum() - 1.0) < 1e-9
    assert abs(out["authority"].sum() - 1.0) < 1e-9


# --- triangle counting (stages/graph.triangle_counts) -----------------------


def _brute_triangles(edge_list):
    """Per-node triangle counts + degrees over the distinct undirected
    self-loop-free edge set — plain-python reference."""
    es = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    nodes = sorted({x for e in es for x in e})
    adj = {v: set() for v in nodes}
    for u, v in es:
        adj[u].add(v)
        adj[v].add(u)
    tri = {v: 0 for v in nodes}
    import itertools

    for a, b, c in itertools.combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    deg = {v: len(adj[v]) for v in nodes}
    return nodes, deg, tri


def test_triangle_counts_matches_brute(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.graph import triangle_counts

    rng = np.random.RandomState(7)
    edge_list = [
        (f"n{a:02d}", f"n{b:02d}")
        for a, b in zip(rng.randint(0, 25, 300), rng.randint(0, 25, 300))
    ]
    out = triangle_counts(_edges_ds(edge_list)).to_pandas()
    out = out.sort_values("node").reset_index(drop=True)
    nodes, deg, tri = _brute_triangles(edge_list)
    assert list(out["node"]) == nodes
    assert list(out["degree"]) == [deg[v] for v in nodes]
    assert list(out["n_tri"]) == [tri[v] for v in nodes]
    # clustering = 2t / d(d-1), 0 below degree 2
    for _, r in out.iterrows():
        d, t = r["degree"], r["n_tri"]
        want = 0.0 if d < 2 else 2.0 * t / (d * (d - 1))
        assert abs(r["clustering"] - want) < 1e-8


def test_triangle_dedup_and_self_loops(ray_session):
    """Duplicate, reversed, and self-loop edges collapse to one
    undirected edge before counting."""
    from ai_service_ocr_grading_handler_ray.stages.graph import triangle_counts

    edge_list = [
        ("a", "b"), ("b", "a"), ("a", "b"),   # one undirected edge
        ("b", "c"), ("c", "a"),
        ("c", "c"),                           # self loop: dropped
    ]
    out = (
        triangle_counts(_edges_ds(edge_list))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert list(out["node"]) == ["a", "b", "c"]
    assert list(out["n_tri"]) == [1, 1, 1]
    assert list(out["degree"]) == [2, 2, 2]
    assert np.allclose(out["clustering"], 1.0)


def test_triangle_broadcast_vs_cogroup_paths(ray_session):
    """broadcast_edge_cap=0 forces the shuffled-cogroup closing-edge
    probe; both paths must produce identical tables."""
    import pandas as pd

    from ai_service_ocr_grading_handler_ray.stages.graph import triangle_counts

    rng = np.random.RandomState(13)
    edge_list = [
        (f"n{a}", f"n{b}")
        for a, b in zip(rng.randint(0, 40, 500), rng.randint(0, 40, 500))
    ]
    a = (
        triangle_counts(_edges_ds(edge_list))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    b = (
        triangle_counts(_edges_ds(edge_list), broadcast_edge_cap=0)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_triangle_sql_generator_parity(ray_session):
    """stages/graph.triangle_sql over an inline edge CTE == engine."""
    import duckdb

    from ai_service_ocr_grading_handler_ray.stages.graph import (
        triangle_counts,
        triangle_sql,
    )

    rng = np.random.RandomState(3)
    src = rng.randint(0, 15, 120)
    dst = rng.randint(0, 15, 120)
    vals = ", ".join(f"('n{a:02d}', 'n{b:02d}')" for a, b in zip(src, dst))
    cte = f"e AS (SELECT * FROM (VALUES {vals}) AS t(src, dst))"
    got = (
        duckdb.sql(triangle_sql(cte))
        .df()
        .sort_values("node")
        .reset_index(drop=True)
    )
    edge_list = [(f"n{a:02d}", f"n{b:02d}") for a, b in zip(src, dst)]
    eng = (
        triangle_counts(_edges_ds(edge_list))
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert list(got["node"]) == list(eng["node"])
    assert list(got["degree"]) == list(eng["degree"])
    assert list(got["n_tri"]) == list(eng["n_tri"])
    np.testing.assert_allclose(
        got["clustering"].to_numpy(), eng["clustering"].to_numpy(), atol=1e-8
    )


def test_triangle_free_graph(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.graph import triangle_counts

    # a path graph has no triangles
    edge_list = [("a", "b"), ("b", "c"), ("c", "d")]
    out = triangle_counts(_edges_ds(edge_list)).to_pandas()
    assert out["n_tri"].sum() == 0
    assert np.allclose(out["clustering"], 0.0)


# --- multi-source BFS depth (stages/graph.bfs_depth) ------------------------


def _brute_bfs(edge_list, seeds, max_hops):
    adj = {}
    for s, t in edge_list:
        if s != t:
            adj.setdefault(s, set()).add(t)
    depth = {s: 0 for s in seeds}
    frontier = set(seeds)
    for d in range(1, max_hops + 1):
        nxt = set()
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in depth:
                    depth[v] = d
                    nxt.add(v)
        frontier = nxt
    return depth


def test_bfs_depth_matches_brute(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.graph import bfs_depth

    rng = np.random.RandomState(29)
    edge_list = [
        (f"n{a:02d}", f"n{b:02d}")
        for a, b in zip(rng.randint(0, 30, 200), rng.randint(0, 30, 200))
    ]
    seeds = ["n03", "n17"]
    out = bfs_depth(_edges_ds(edge_list), seeds, max_hops=4).to_pandas()
    got = dict(zip(out["node"], out["depth"]))
    assert got == _brute_bfs(edge_list, seeds, 4)


def test_bfs_is_directed(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.graph import bfs_depth

    out = bfs_depth(_edges_ds([("a", "b"), ("c", "b")]), ["a"], max_hops=3).to_pandas()
    got = dict(zip(out["node"], out["depth"]))
    assert got == {"a": 0, "b": 1}  # c unreachable against edge direction


def test_bfs_max_hops_truncates(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.graph import bfs_depth

    chain = [(f"c{i}", f"c{i+1}") for i in range(10)]
    out = bfs_depth(_edges_ds(chain), ["c0"], max_hops=4).to_pandas()
    assert out["depth"].max() == 4
    assert len(out) == 5


def test_bfs_seed_not_in_graph_reports_zero(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.graph import bfs_depth

    out = bfs_depth(
        _edges_ds([("a", "b")]), ["a", "zzz"], max_hops=2
    ).to_pandas()
    got = dict(zip(out["node"], out["depth"]))
    assert got == {"a": 0, "b": 1, "zzz": 0}


def test_bfs_sql_generator_parity(ray_session):
    import duckdb

    from ai_service_ocr_grading_handler_ray.stages.graph import bfs_depth, bfs_sql

    rng = np.random.RandomState(31)
    src = rng.randint(0, 20, 150)
    dst = rng.randint(0, 20, 150)
    vals = ", ".join(f"('n{a:02d}', 'n{b:02d}')" for a, b in zip(src, dst))
    cte = f"e AS (SELECT * FROM (VALUES {vals}) AS t(src, dst))"
    seeds = ["n05", "n11"]
    got = (
        duckdb.sql(bfs_sql(cte, seeds, max_hops=3))
        .df()
        .sort_values("node")
        .reset_index(drop=True)
    )
    edge_list = [(f"n{a:02d}", f"n{b:02d}") for a, b in zip(src, dst)]
    eng = (
        bfs_depth(_edges_ds(edge_list), seeds, max_hops=3)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert list(got["node"]) == list(eng["node"])
    assert list(got["depth"]) == list(eng["depth"])


# --- degree_distribution -----------------------------------------------------


def test_degree_distribution_matches_brute(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.graph import degree_distribution

    rng = np.random.default_rng(9)
    src = rng.integers(0, 30, 600)
    dst = rng.integers(0, 30, 600)
    df = pd.DataFrame(
        {"src": [f"h{s}" for s in src], "dst": [f"h{d}" for d in dst]}
    )
    out = degree_distribution(rd.from_pandas(df).repartition(5))

    dedup = df[df.src != df.dst].drop_duplicates()
    for direction, col in [("out", "src"), ("in", "dst")]:
        deg = dedup.groupby(col).size()
        hist = deg.value_counts().sort_index()
        sel = out[out.direction == direction].set_index("deg")
        assert dict(sel.n_hosts) == {int(k): int(v) for k, v in hist.items()}
        total = hist.sum()
        for d in hist.index:
            exp = hist[hist.index >= d].sum() / total
            assert sel.loc[d, "ccdf"] == pytest.approx(exp, abs=1e-6)


def test_degree_distribution_self_loops_dropped(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.graph import degree_distribution

    df = pd.DataFrame({"src": ["a", "a", "b"], "dst": ["a", "b", "c"]})
    out = degree_distribution(rd.from_pandas(df))
    # a->a dropped: out-degrees a=1, b=1; in-degrees b=1, c=1
    assert dict(zip(out.direction + "_" + out.deg.astype(str), out.n_hosts)) == {
        "in_1": 2, "out_1": 2
    }


# --- personalized pagerank -----------------------------------------------


def _dense_ppr(edges_df, seeds, d=0.85, n_iter=3):
    """Dense numpy replay of the personalized update rule."""
    ew = edges_df[edges_df.src != edges_df.dst].groupby(
        ["src", "dst"]
    ).size().reset_index(name="w")
    nodes = sorted(set(ew.src) | set(ew.dst))
    idx = {h: i for i, h in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for r in ew.itertuples():
        W[idx[r.src], idx[r.dst]] = r.w
    outw = W.sum(axis=1)
    e = np.zeros(n)
    present = [idx[s] for s in seeds if s in idx]
    e[present] = 1.0 / len(present)
    r = e.copy()
    for _ in range(n_iter):
        rate = np.where(outw > 0, r / np.where(outw > 0, outw, 1), 0.0)
        contrib = rate @ W
        dm = r[outw == 0].sum()
        r = (1 - d) * e + d * (contrib + dm * e)
    return dict(zip(nodes, r))


def test_personalized_pagerank_matches_dense(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.graph import pagerank

    rng = np.random.default_rng(21)
    df = pd.DataFrame(
        {
            "src": [f"h{x}" for x in rng.integers(0, 15, 300)],
            "dst": [f"h{x}" for x in rng.integers(0, 15, 300)],
        }
    )
    seeds = ["h0", "h3", "h-not-in-graph"]
    out = pagerank(
        rd.from_pandas(df).repartition(4), seeds=seeds, n_iter=3
    ).to_pandas().set_index("node")["pagerank"]
    exp = _dense_ppr(df, seeds)
    for h, v in exp.items():
        assert out[h] == pytest.approx(v, abs=1e-12)
    # mass concentrates: seeds rank above the median node
    med = out.median()
    assert out["h0"] > med and out["h3"] > med


def test_personalized_pagerank_all_seeds_absent_raises(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.graph import pagerank

    df = pd.DataFrame({"src": ["a"], "dst": ["b"]})
    with pytest.raises(Exception, match="no seed present"):
        pagerank(rd.from_pandas(df), seeds=["zz"])


def test_unseeded_pagerank_unchanged_by_refactor(ray_session):
    # the seeds=None path must keep its exact original float arithmetic
    from ai_service_ocr_grading_handler_ray.stages.graph import pagerank

    df = pd.DataFrame(
        {"src": ["a", "b", "c", "a"], "dst": ["b", "c", "a", "c"]}
    )
    out = pagerank(rd.from_pandas(df), n_iter=3).to_pandas()
    assert abs(out.pagerank.sum() - 1.0) < 1e-12
