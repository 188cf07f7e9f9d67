"""Sitemap ingestion (stages/sitemaps.py)."""

import pandas as pd
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.sitemaps import (
    parse_sitemap,
    sitemap_host_freshness,
    sitemap_urls,
)


def test_parse_loc_and_lastmod():
    xml = (
        "<urlset><url><loc>https://a.org/1</loc>"
        "<lastmod>2024-01-02</lastmod></url>"
        "<url><loc> https://a.org/2 </loc></url></urlset>"
    )
    assert parse_sitemap(xml) == [
        ("https://a.org/1", "2024-01-02"),
        ("https://a.org/2", ""),
    ]


def test_parse_multiline_and_case():
    xml = "<URL>\n <LOC>\n  https://a.org/x\n </LOC>\n</URL>"
    assert parse_sitemap(xml) == [("https://a.org/x", "")]


def test_block_without_loc_skipped():
    xml = "<url><lastmod>2024-01-01</lastmod></url><url><loc>https://b.org/</loc></url>"
    assert parse_sitemap(xml) == [("https://b.org/", "")]


def test_sitemapindex_yields_nothing():
    xml = "<sitemapindex><sitemap><loc>https://a.org/s1.xml</loc></sitemap></sitemapindex>"
    assert parse_sitemap(xml) == []


def test_empty_and_garbage_safe():
    assert parse_sitemap("") == []
    assert parse_sitemap(None) == []
    assert parse_sitemap("not xml at all") == []


def _urls_ds(xmls):
    return sitemap_urls(rd.from_items([{"xml": x} for x in xmls]))


def test_urls_scan_hosts():
    out = _urls_ds(
        ["<url><loc>https://h1.org/a?x=1</loc></url>"]
    ).to_pandas()
    assert list(out["host"]) == ["h1.org"]  # authority ends at '?'


def test_freshness_rollup():
    xmls = [
        "<url><loc>https://a.org/1</loc><lastmod>2024-03-01</lastmod></url>"
        "<url><loc>https://a.org/2</loc><lastmod>2024-01-01</lastmod></url>",
        "<url><loc>https://a.org/3</loc></url>"
        "<url><loc>https://b.org/1</loc></url>",
    ]
    out = (
        sitemap_host_freshness(_urls_ds(xmls))
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    a = out[out["host"] == "a.org"].iloc[0]
    assert (a["n_urls"], a["n_dated"], a["last_mod"]) == (3, 2, "2024-03-01")
    b = out[out["host"] == "b.org"].iloc[0]
    assert (b["n_urls"], b["n_dated"], b["last_mod"]) == (1, 0, "")


def test_partitioning_invariance():
    xmls = [
        f"<url><loc>https://h{i % 7}.org/{i}</loc>"
        + (f"<lastmod>2024-01-{i % 28 + 1:02d}</lastmod>" if i % 3 else "")
        + "</url>"
        for i in range(80)
    ]
    one = (
        sitemap_host_freshness(_urls_ds(xmls))
        .to_pandas().sort_values("host").reset_index(drop=True)
    )
    many = (
        sitemap_host_freshness(
            sitemap_urls(
                rd.from_items([{"xml": x} for x in xmls]).repartition(9)
            )
        )
        .to_pandas().sort_values("host").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(one, many)
