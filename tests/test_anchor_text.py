"""Anchor-text extraction + per-destination aggregation (stages/links.py)."""

import pandas as pd
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.links import (
    anchor_term_counts,
    extract_anchors,
    top_anchor_terms,
)


def test_extract_anchors_quote_styles_and_markup():
    html = (
        '<a href="https://x.org/a">plain text</a>'
        "<a href='https://x.org/b'><b>bold</b> tail</a>"
        "<a href=https://x.org/c>bare</a>"
    )
    assert extract_anchors(html) == [
        ("https://x.org/a", "plain text"),
        ("https://x.org/b", "bold tail"),
        ("https://x.org/c", "bare"),
    ]


def test_extract_anchors_skip_rules_match_href_extractor():
    html = (
        '<a href="#frag">skip</a><a href="javascript:void(0)">skip</a>'
        '<a href="mailto:a@b.c">skip</a><a href="/keep">kept</a>'
    )
    assert extract_anchors(html) == [("/keep", "kept")]


def test_unclosed_anchor_never_matches():
    html = '<a href="https://x.org/open">never closed'
    assert extract_anchors(html) == []


def test_whitespace_collapse_and_multiline_body():
    html = '<a href="/p">  two\n   words \t</a>'
    assert extract_anchors(html) == [("/p", "two words")]


def _pages(rows):
    return rd.from_items(
        [{"url": u, "html": h.encode()} for u, h in rows]
    )


def test_terms_attributed_to_destination_not_source():
    ds = _pages(
        [
            ("https://src1.org/", '<a href="https://dst.org/x">great docs</a>'),
            ("https://src2.org/", '<a href="https://dst.org/y">great site</a>'),
        ]
    )
    out = anchor_term_counts(ds).to_pandas()
    agg = out.groupby(["dst", "term"])["n"].sum().to_dict()
    assert agg == {
        ("dst.org", "great"): 2,
        ("dst.org", "docs"): 1,
        ("dst.org", "site"): 1,
    }


def test_self_links_dropped_by_default():
    ds = _pages(
        [("https://a.org/", '<a href="/nav">menu</a><a href="https://b.org/">out</a>')]
    )
    out = anchor_term_counts(ds).to_pandas()
    assert set(out["dst"]) == {"b.org"}


def test_top_k_tie_break_and_sum_across_batches():
    counts = rd.from_items(
        [
            {"dst": "d", "term": "beta", "n": 2},
            {"dst": "d", "term": "beta", "n": 1},     # sums to 3
            {"dst": "d", "term": "alpha", "n": 3},    # ties beta at 3
            {"dst": "d", "term": "gamma", "n": 1},
        ]
    )
    out = top_anchor_terms(counts, k=2).to_pandas()
    assert list(out["term"]) == ["alpha", "beta"]  # tie → lexicographic


def test_partitioning_invariance():
    rows = [
        (
            f"https://s{i % 5}.org/",
            f'<a href="https://d{i % 3}.org/p">w{i % 4} common</a>',
        )
        for i in range(60)
    ]
    a = top_anchor_terms(anchor_term_counts(_pages(rows)), k=3).to_pandas()
    b = top_anchor_terms(
        anchor_term_counts(_pages(rows).repartition(7)), k=3
    ).to_pandas()
    key = ["dst", "term"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
