"""Graph-health one-numbers (graph.assortativity, graph.reciprocity)
and stream regularity (sequence.burstiness_by_type): hand-computed
fixtures, sign conventions, degenerate inputs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.graph import (
    assortativity,
    reciprocity,
)
from ai_service_ocr_grading_handler_ray.stages.sequence import (
    burstiness_by_type,
)

US = 1_000_000


def _edges(pairs):
    return rd.from_arrow(
        pa.table(
            {"src": pa.array([p[0] for p in pairs], type=pa.string()),
             "dst": pa.array([p[1] for p in pairs], type=pa.string())}
        )
    )


def test_assortativity_star_is_negative(ray_session):
    # a star: the hub (degree 4) only links leaves (degree 1)
    out = assortativity(_edges([("h", "a"), ("h", "b"), ("h", "c"),
                                ("h", "d")]))
    assert out.iloc[0]["n_edges"] == 4
    assert out.iloc[0]["r"] == -1.0


def test_assortativity_two_tiers_mix(ray_session):
    # two K2 pairs joined by a bridge: mixed degrees, -1 < r < 1
    out = assortativity(
        _edges([("a", "b"), ("c", "d"), ("b", "c")])
    )
    assert -1.0 < out.iloc[0]["r"] < 1.0


def test_assortativity_degree_regular_is_nan(ray_session):
    # a 4-cycle: every node degree 2 -> zero variance -> NaN
    out = assortativity(
        _edges([("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    )
    assert np.isnan(out.iloc[0]["r"])


def test_assortativity_empty_graph(ray_session):
    out = assortativity(_edges([("a", "a")]))
    assert out.iloc[0]["n_edges"] == 0
    assert np.isnan(out.iloc[0]["r"])


def test_reciprocity_hand_computed(ray_session):
    # a->b and b->a are mutual; a->c is not: 2/3
    out = reciprocity(_edges([("a", "b"), ("b", "a"), ("a", "c")]))
    r = out.iloc[0]
    assert r["n_edges"] == 3 and r["n_reciprocal"] == 2
    assert r["reciprocity"] == pytest.approx(2 / 3, abs=1e-6)


def test_reciprocity_duplicates_and_loops_drop(ray_session):
    out = reciprocity(_edges([("a", "b"), ("a", "b"), ("a", "a")]))
    r = out.iloc[0]
    assert r["n_edges"] == 1 and r["n_reciprocal"] == 0
    assert r["reciprocity"] == 0.0


def _ev(rows):
    """rows: (event_id, ts_us, type)."""
    return rd.from_pandas(
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
                "event_type": [r[2] for r in rows],
            }
        )
    )


def test_burstiness_metronome_is_minus_one(ray_session):
    # perfectly regular gaps: sigma = 0 -> B = -1
    out = burstiness_by_type(
        _ev([(i, i * 60 * US, "tick") for i in range(5)])
    )
    assert out.iloc[0]["burstiness"] == -1.0
    assert out.iloc[0]["n_gaps"] == 4
    assert out.iloc[0]["mean_gap_s"] == 60.0


def test_burstiness_bursty_is_positive(ray_session):
    # gaps [1, 1, 1, 10**4]s: one-hot tail -> sigma/mu -> sqrt(3),
    # B -> (sqrt(3)-1)/(sqrt(3)+1) ~ 0.268
    ts = [0, 1, 2, 3, 10_003]
    out = burstiness_by_type(
        _ev([(i, t * US, "x") for i, t in enumerate(ts)])
    )
    assert out.iloc[0]["burstiness"] == pytest.approx(0.268, abs=0.01)


def test_burstiness_types_are_independent(ray_session):
    # interleaved types: gaps computed within each type, not globally
    out = burstiness_by_type(
        _ev([(1, 0, "a"), (2, 30 * US, "b"), (3, 60 * US, "a"),
             (4, 90 * US, "b")])
    ).set_index("event_type")
    assert out.loc["a"]["mean_gap_s"] == 60.0
    assert out.loc["b"]["mean_gap_s"] == 60.0


def test_burstiness_single_event_type_drops(ray_session):
    out = burstiness_by_type(_ev([(1, 0, "once"), (2, 0, "twice"),
                                  (3, 60 * US, "twice")]))
    assert out["event_type"].tolist() == ["twice"]
