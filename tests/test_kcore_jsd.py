"""k-core decomposition (stages/graph.kcore_members) and pairwise
Jensen-Shannon divergence (stages/text_analysis.jsd_by_group):
hand-computed fixtures, multi-round peels, convergence contract,
JSD boundary values (0 for identical, ln 2 for disjoint)."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.graph import kcore_members
from ai_service_ocr_grading_handler_ray.stages.text_analysis import jsd_by_group


def _edges(pairs):
    return rd.from_arrow(
        pa.table(
            {"src": pa.array([p[0] for p in pairs], type=pa.string()),
             "dst": pa.array([p[1] for p in pairs], type=pa.string())}
        )
    )


def test_kcore_triangle_with_pendant_chain(ray_session):
    # triangle a-b-c (2-core) + chain c-d-e (peels at k=2, one node
    # per round -> exercises the multi-round loop)
    ds = _edges([("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("d", "e")])
    out = kcore_members(ds, k=2, max_rounds=12)
    assert out["node"].tolist() == ["a", "b", "c"]
    assert out["core_degree"].tolist() == [2, 2, 2]


def test_kcore_chain_peels_to_empty(ray_session):
    ds = _edges([("a", "b"), ("b", "c"), ("c", "d")])
    out = kcore_members(ds, k=2, max_rounds=12)
    assert len(out) == 0


def test_kcore_whole_graph_is_core(ray_session):
    # K4: every node has degree 3
    nodes = ["a", "b", "c", "d"]
    pairs = [(u, v) for i, u in enumerate(nodes) for v in nodes[i + 1:]]
    out = kcore_members(_edges(pairs), k=3, max_rounds=12)
    assert out["node"].tolist() == nodes
    assert set(out["core_degree"]) == {3}


def test_kcore_ignores_direction_and_duplicates(ray_session):
    # duplicated + reversed edges collapse to one undirected edge
    ds = _edges([("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"),
                 ("a", "c")])
    out = kcore_members(ds, k=2, max_rounds=12)
    assert out["node"].tolist() == ["a", "b", "c"]


def test_kcore_raises_past_max_rounds(ray_session):
    # a 5-chain at k=2 peels one end per round; max_rounds=1 cannot
    # reach the fixed point -> loud RuntimeError, never a partial peel
    ds = _edges([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
                 ("e", "f")])
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore_members(ds, k=2, max_rounds=1)


def _docs(rows):
    return rd.from_arrow(
        pa.table(
            {"text": pa.array([r[0] for r in rows], type=pa.string()),
             "source": pa.array([r[1] for r in rows], type=pa.string())}
        )
    )


def test_jsd_identical_distributions_is_zero(ray_session):
    out = jsd_by_group(_docs([("a b b", "s1"), ("a b b", "s2")]))
    assert len(out) == 1
    assert out.iloc[0]["jsd"] == 0.0
    assert out.iloc[0]["n_common"] == 2


def test_jsd_disjoint_supports_is_ln2(ray_session):
    out = jsd_by_group(_docs([("a a", "s1"), ("b c", "s2")]))
    assert len(out) == 1
    assert out.iloc[0]["n_common"] == 0
    assert out.iloc[0]["jsd"] == pytest.approx(math.log(2), abs=1e-6)


def test_jsd_hand_computed_half_overlap(ray_session):
    # P = {a: 1}, Q = {a: 0.5, b: 0.5}
    # m_a = 0.75, m_b = 0.25
    # JSD = 0.5*(1*ln(1/0.75)) + 0.5*(0.5*ln(0.5/0.75) + 0.5*ln(0.5/0.25))
    expect = 0.5 * math.log(1 / 0.75) + 0.5 * (
        0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(2.0)
    )
    out = jsd_by_group(_docs([("a", "s1"), ("a b", "s2")]))
    assert out.iloc[0]["jsd"] == pytest.approx(expect, abs=1e-6)
    assert out.iloc[0]["n_common"] == 1


def test_jsd_all_pairs_present_and_sorted(ray_session):
    out = jsd_by_group(
        _docs([("x", "s1"), ("y", "s2"), ("z", "s3")])
    )
    assert [tuple(r) for r in out[["group_a", "group_b"]].to_numpy()] == [
        ("s1", "s2"), ("s1", "s3"), ("s2", "s3")
    ]
    assert np.allclose(out["jsd"].to_numpy(), math.log(2), atol=1e-6)


def test_jsd_null_source_drops(ray_session):
    t = pa.table(
        {"text": pa.array(["a", "b"], type=pa.string()),
         "source": pa.array(["s1", None], type=pa.string())}
    )
    out = jsd_by_group(rd.from_arrow(t))
    assert len(out) == 0  # one group -> no pairs


def test_kcore_self_loops_only_is_empty(ray_session):
    # canonicalization drops everything -> empty frame, not a raise
    # (the SQL replay returns zero rows on the same input)
    out = kcore_members(_edges([("a", "a"), ("b", "b")]), k=2)
    assert len(out) == 0
    assert list(out.columns) == ["node", "core_degree"]
