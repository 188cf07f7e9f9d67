"""PageRank (stages/graph.py): numpy-reference equivalence, dangling
mass, self-loop drop, node-limit guard, SQL-generator parity."""

import collections

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
