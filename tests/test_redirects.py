"""Redirect-chain resolution (stages/redirects.py)."""

import pandas as pd
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.redirects import resolve_redirects

EDGES = (
    [{"src": "a", "dst": "b"}, {"src": "b", "dst": "c"}]        # chain to c
    + [{"src": "x", "dst": "y"}, {"src": "y", "dst": "x"}]      # 2-cycle
    + [{"src": "self", "dst": "self"}]                          # 1-cycle
    + [{"src": f"l{i}", "dst": f"l{i+1}"} for i in range(10)]   # 10-chain
)


def _run(edges=EDGES, **kw):
    out = resolve_redirects(rd.from_items(edges), **kw).to_pandas()
    return out.sort_values("src").set_index("src")


def test_chains_resolve_with_true_hop_counts():
    out = _run(max_hops=8)
    assert tuple(out.loc["a", ["final_url", "n_hops", "status"]]) == ("c", 2, "resolved")
    assert tuple(out.loc["b", ["final_url", "n_hops", "status"]]) == ("c", 1, "resolved")
    assert tuple(out.loc["l9", ["final_url", "n_hops"]]) == ("l10", 1)
    assert tuple(out.loc["l2", ["final_url", "n_hops"]]) == ("l10", 8)


def test_cycles_and_over_budget_chains_unresolved():
    out = _run(max_hops=8)
    for src in ("x", "y", "self", "l0", "l1"):
        assert tuple(out.loc[src, ["final_url", "n_hops", "status"]]) == (
            "", 0, "unresolved",
        )


def test_one_row_per_source():
    out = _run(max_hops=8)
    assert len(out) == len(EDGES)


def test_bigger_budget_resolves_longer_chains():
    out = _run(max_hops=12)
    assert tuple(out.loc["l0", ["final_url", "n_hops", "status"]]) == (
        "l10", 10, "resolved",
    )
    assert out.loc["x", "status"] == "unresolved"  # cycles never resolve


def test_duplicate_source_raises():
    bad = EDGES + [{"src": "a", "dst": "elsewhere"}]
    with pytest.raises(Exception, match="duplicate redirect source"):
        resolve_redirects(rd.from_items(bad), max_hops=4).to_pandas()


def test_partitioning_invariance():
    a = resolve_redirects(
        rd.from_items(EDGES), max_hops=8
    ).to_pandas().sort_values("src").reset_index(drop=True)
    b = resolve_redirects(
        rd.from_items(EDGES).repartition(5), max_hops=8, num_parts=3
    ).to_pandas().sort_values("src").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_broadcast_and_cogroup_paths_equivalent(ray_session):
    """The zero-shuffle broadcast walk and the cogroup rounds resolve
    identically: terminals at every depth, exact-budget chains,
    over-budget chains and 2-cycles."""
    import pandas as pd
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.redirects import (
        resolve_redirects,
    )

    # chains 1..12 hops: c{k}_0 -> c{k}_1 -> ... -> c{k}_k (terminal),
    # plus a 2-cycle x<->y
    rows = []
    for k in range(1, 13):
        for i in range(k):
            rows.append({"src": f"c{k}_{i}", "dst": f"c{k}_{i + 1}"})
    rows += [{"src": "x", "dst": "y"}, {"src": "y", "dst": "x"}]
    df = pd.DataFrame(rows)
    outs = {}
    for method in ("broadcast", "cogroup"):
        outs[method] = (
            resolve_redirects(
                rd.from_pandas(df).repartition(4), max_hops=8, method=method
            )
            .to_pandas()
            .sort_values("src")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs["broadcast"], outs["cogroup"])
    b = outs["broadcast"].set_index("src")
    assert b.loc["c3_0", "status"] == "resolved"
    assert b.loc["c3_0", "n_hops"] == 3 and b.loc["c3_0", "final_url"] == "c3_3"
    assert b.loc["c8_0", "n_hops"] == 8          # exactly at budget
    assert b.loc["c12_0", "status"] == "unresolved"
    assert b.loc["c12_4", "n_hops"] == 8         # 8 hops left → resolved
    assert b.loc["x", "status"] == "unresolved"
    assert b.loc["x", "final_url"] == "" and b.loc["x", "n_hops"] == 0
