"""Mirror diagnostics (stages/mirrors.py) + sitemap coverage."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.mirrors import (
    host_dup_profile,
    mirror_host_pairs,
)


def _pages():
    # hosts a,b mirror contents m1,m2; host c has unique pages plus m1
    rows = [
        ("a", "m1"), ("a", "m2"), ("a", "u1"),
        ("b", "m1"), ("b", "m2"),
        ("c", "m1"), ("c", "u2"), ("c", "u3"),
        ("a", "m1"),  # duplicate copy within a host
    ]
    return pd.DataFrame(rows, columns=["host", "content_hash"])


def test_host_dup_profile(ray_session):
    out = host_dup_profile(
        rd.from_pandas(_pages()).repartition(3)
    ).set_index("host")
    # m1 occurs 4x, m2 2x -> dup pages: a: m1,m2,m1 =3 of 4; b: 2 of 2; c: m1 =1 of 3
    assert (out.loc["a", "n_pages"], out.loc["a", "n_dup"]) == (4, 3)
    assert (out.loc["b", "n_pages"], out.loc["b", "n_dup"]) == (2, 2)
    assert (out.loc["c", "n_pages"], out.loc["c", "n_dup"]) == (3, 1)
    assert out.loc["b", "dup_rate"] == 1.0


def test_mirror_pairs(ray_session):
    out = mirror_host_pairs(rd.from_pandas(_pages()).repartition(3), k=10)
    got = {(r.host_a, r.host_b): r.n for r in out.itertuples()}
    # shared DISTINCT contents: (a,b): m1,m2 =2; (a,c): m1 =1; (b,c): m1 =1
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}
    assert list(out.itertuples(index=False))[0][:2] == ("a", "b")


def test_mirror_pairs_cap_raises(ray_session):
    df = pd.DataFrame(
        {"host": [f"h{i}" for i in range(10)], "content_hash": ["x"] * 10}
    )
    with pytest.raises(Exception, match="hosts_per_hash_cap"):
        mirror_host_pairs(rd.from_pandas(df), hosts_per_hash_cap=5)


def test_sitemap_coverage(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.sitemaps import (
        sitemap_coverage,
    )

    exp = pd.DataFrame(
        {
            "host": ["a", "a", "a", "b"],
            "url": ["u1", "u2", "u2", "u4"],  # u2 declared twice -> dedup
        }
    )
    got = pd.DataFrame({"host": ["?", "?"], "url": ["u1", "u9"]})
    out = sitemap_coverage(
        rd.from_pandas(exp).repartition(2), rd.from_pandas(got)
    ).set_index("host")
    assert (out.loc["a", "n_expected"], out.loc["a", "n_covered"]) == (2, 1)
    assert out.loc["a", "coverage"] == 0.5
    assert (out.loc["b", "n_expected"], out.loc["b", "n_covered"]) == (1, 0)
