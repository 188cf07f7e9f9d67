"""SURT canonicalization + CDX keep-latest (stages/surt.py)."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.surt import (
    cdx_latest_per_surt,
    surt_hosts,
    surt_keys_batch,
    surt_sql,
)


def _keys(urls):
    t = pa.table({"url": pa.array(urls, type=pa.string())})
    return surt_keys_batch(t)["surt_key"].to_pylist()


def test_surt_key_canonical_form():
    assert _keys(["https://news.example.org/a/b?q=1"]) == [
        "org,example,news)/a/b?q=1"
    ]


def test_scheme_case_and_www_collapse():
    a, b, c = _keys(
        [
            "https://h001.example.org/p/7",
            "http://WWW.H001.Example.ORG/p/7",
            "HTTPS://h001.EXAMPLE.org/p/7",
        ]
    )
    assert a == b == c == "org,example,h001)/p/7"


def test_only_one_leading_www_stripped():
    # www.www.x.org strips ONE www; a host that IS just www keeps nothing
    (k,) = _keys(["https://www.www.x.org/"])
    assert k == "org,x,www)/"


def test_authority_ends_at_query_and_fragment():
    q, f = _keys(["http://host.org?q=1", "http://host.org#frag"])
    assert q == "org,host)?q=1"
    assert f == "org,host)#frag"


def test_empty_rest_becomes_slash():
    (k,) = _keys(["https://a.b.c.d.example.org"])
    assert k == "org,example,d,c,b,a)/"


def test_query_variants_are_distinct_keys():
    a, b = _keys(["https://x.org/p", "https://x.org/p?x=1"])
    assert a != b


def test_surt_hosts_vectorized_matches_scalar_spec():
    hosts = pd.Series(
        ["news.Example.org", "WWW.a.b", "single", "", "x.y.z.w.v.u"]
    )
    got = surt_hosts(hosts).tolist()
    want = [
        ",".join(reversed(h.lower().removeprefix("www.").split(".")))
        if h
        else ""
        for h in hosts
    ]
    assert got == want


def test_surt_sql_matches_kernel(tmp_path):
    import duckdb

    urls = [
        "https://news.example.org/a/b?q=1",
        "http://WWW.H001.Example.ORG/p/7",
        "https://a.b.c.example.org",
        "http://host.org?q=1",
        "http://host.org#frag",
        "https://x.org/p?x=1&y=2",
    ]
    got = duckdb.sql(
        f"SELECT {surt_sql('url')} AS k FROM (SELECT unnest({urls!r}) AS url)"
    ).df()["k"].tolist()
    assert got == _keys(urls)


def test_cdx_latest_keeps_max_ts_then_min_url(ray_session):
    rows = pa.table(
        {
            "url": pa.array(
                [
                    "https://a.org/p",          # ts 10
                    "http://WWW.A.ORG/p",       # ts 30  <- winner (same key)
                    "https://a.org/p?x=1",      # different key
                    "https://b.org/q",          # ts 5, tie with next
                    "http://b.org/q",           # ts 5, smaller url wins
                ]
            ),
            "ts_us": pa.array([10, 30, 7, 5, 5], type=pa.int64()),
        }
    )
    out = (
        cdx_latest_per_surt(rd.from_arrow(rows), ts_col="ts_us")
        .to_pandas()
        .sort_values("surt_key")
        .reset_index(drop=True)
    )
    assert out["surt_key"].tolist() == [
        "org,a)/p",
        "org,a)/p?x=1",
        "org,b)/q",
    ]
    assert out["url"].tolist() == [
        "http://WWW.A.ORG/p",
        "https://a.org/p?x=1",
        "http://b.org/q",
    ]
    assert out["n_captures"].tolist() == [2, 1, 2]
