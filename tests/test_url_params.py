"""URL query-param profiling (stages/url_params.py): parse semantics
(fragments, missing '=', duplicate keys, no-query urls), profile
reference equivalence, partition invariance, trap flag."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.url_params import (
    param_cardinality_profile,
    parse_query_params,
)


def test_parse_semantics():
    t = pa.table(
        {
            "url": [
                "https://a.com/x?k=1&k=2&m=z",  # duplicate key
                "https://a.com/y?flag&k=",  # no '=' and empty value
                "https://b.com/z?p=1#frag?fake=2",  # fragment cut
                "https://b.com/plain",  # no query
                "https://c.com/e?v=a=b",  # '=' inside value
                None,
            ]
        }
    )
    df = parse_query_params(t)
    rows = set(map(tuple, df.to_numpy()))
    assert rows == {
        ("a.com", "k", "1"),
        ("a.com", "k", "2"),
        ("a.com", "m", "z"),
        ("a.com", "flag", ""),
        ("a.com", "k", ""),
        ("b.com", "p", "1"),
        ("c.com", "v", "a=b"),
    }


def _profile_df(ds, **kw):
    return (
        param_cardinality_profile(ds, **kw)
        .to_pandas()
        .sort_values(["host", "pkey"])
        .reset_index(drop=True)
    )


def test_profile_counts_and_trap(ray_session):
    urls = [f"https://s.com/p?sid={i}&page={i % 3}" for i in range(20)]
    ds = rd.from_arrow(pa.table({"url": urls})).repartition(4)
    out = _profile_df(ds, trap_min_n=10)
    sid = out[out.pkey == "sid"].iloc[0]
    page = out[out.pkey == "page"].iloc[0]
    assert sid.n == 20 and sid.n_distinct == 20 and sid.is_trap
    assert page.n == 20 and page.n_distinct == 3 and not page.is_trap
    np.testing.assert_allclose(sid.distinct_ratio, 1.0)
    np.testing.assert_allclose(page.distinct_ratio, 0.15)


def test_partition_invariant(ray_session):
    urls = [f"https://h{i%3}.com/p?a={i%7}&b={i}" for i in range(50)]
    t = pa.table({"url": urls})
    a = _profile_df(rd.from_arrow(t))
    b = _profile_df(rd.from_arrow(t).repartition(8), num_parts=5)
    pd.testing.assert_frame_equal(a, b)


def test_no_query_urls_empty(ray_session):
    # zero params → zero groups: the profile Dataset is empty (its
    # schema is the degenerate no-group case, so count, not columns)
    ds = rd.from_arrow(pa.table({"url": ["https://a.com/x", "https://b.com/"]}))
    assert param_cardinality_profile(ds).count() == 0


def test_url_templates(ray_session):
    import pandas as pd
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.url_params import url_templates

    urls = (
        [f"https://a.com/p/{i}/r/{i % 3}" for i in range(30)]
        + [f"https://a.com/blog/2024/{i}" for i in range(10)]
        + ["https://a.com/static/page"] * 5
        + [f"https://a.com/p/{i}/r/9?q={i}#frag" for i in range(4)]
    )
    out = url_templates(
        rd.from_pandas(pd.DataFrame({"url": urls})).repartition(3), k=3
    )
    assert list(out.template) == [
        "https://a.com/p/{n}/r/{n}",   # 30 + 4 (query/fragment stripped)
        "https://a.com/blog/{n}/{n}",
        "https://a.com/static/page",
    ]
    assert list(out.n) == [34, 10, 5]
