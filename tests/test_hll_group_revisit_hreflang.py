"""Per-group HLL (sketches.approx_distinct_by_group), revisit
scheduler capstone (snapshots.revisit_priorities) and hreflang rollup
(html_meta.hreflang_rollup): estimator accuracy vs exact, bit-length
kernel exactness, sentinel/priority arithmetic, parse-vs-build."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.html_meta import hreflang_rollup
from ai_service_ocr_grading_handler_ray.stages.sketches import (
    _bit_length_u64,
    approx_distinct_by_group,
)
from ai_service_ocr_grading_handler_ray.stages.snapshots import (
    revisit_priorities,
)


def test_bit_length_u64_exact():
    # powers of two are exactly where float log2 would round wrong
    vals = [0, 1, 2, 3, 4, (1 << 53) - 1, 1 << 53, (1 << 53) + 1,
            (1 << 54) - 1, 1 << 54, (1 << 63) - 1]
    w = np.array(vals, dtype=np.uint64)
    got = _bit_length_u64(w)
    want = np.array([int(v).bit_length() for v in vals])
    assert (got == want).all()


def test_hll_group_accuracy_within_rse(ray_session):
    # p=9 -> ~4.6% RSE; distinct counts 1000 and 200 must estimate
    # within 3 sigma (~14%)
    g = ["a"] * 3000 + ["b"] * 600
    v = list(range(1000)) * 3 + list(range(200)) * 3
    ds = rd.from_arrow(
        pa.table({"g": pa.array(g, type=pa.string()),
                  "v": pa.array(v, type=pa.int64())})
    )
    out = approx_distinct_by_group(
        ds, group_col="g", value_col="v"
    ).set_index("g")
    assert abs(out.loc["a"]["approx_distinct"] - 1000) < 140
    assert abs(out.loc["b"]["approx_distinct"] - 200) < 28


def test_hll_group_duplicates_do_not_inflate(ray_session):
    ds = rd.from_arrow(
        pa.table({"g": pa.array(["a"] * 1000, type=pa.string()),
                  "v": pa.array([7] * 1000, type=pa.int64())})
    )
    out = approx_distinct_by_group(ds, group_col="g", value_col="v")
    assert out.iloc[0]["n_set"] == 1
    assert out.iloc[0]["approx_distinct"] == pytest.approx(1.0, abs=0.01)


def test_hll_group_null_rows_drop(ray_session):
    ds = rd.from_arrow(
        pa.table({"g": pa.array(["a", "a", None], type=pa.string()),
                  "v": pa.array([1, None, 2], type=pa.int64())})
    )
    out = approx_distinct_by_group(ds, group_col="g", value_col="v")
    assert len(out) == 1
    assert out.iloc[0]["n_set"] == 1


def _caps(rows):
    return rd.from_arrow(
        pa.table(
            {"url": pa.array([r[0] for r in rows], type=pa.string()),
             "ts": pa.array([r[1] for r in rows], type=pa.int64()),
             "content_hash": pa.array([r[2] for r in rows],
                                      type=pa.string())}
        )
    )


def test_revisit_priorities_hand_computed(ray_session):
    # host x: url1 fast (rate 1.0), url2 single-capture (unknown)
    #   share_fast = 0.5, mean_rate = 1.0 -> priority 0.75
    # host y: url3 static (rate 0.0) -> priority 0
    out = revisit_priorities(
        _caps([
            ("https://x.org/1", 0, "a"), ("https://x.org/1", 1, "b"),
            ("https://x.org/2", 0, "a"),
            ("https://y.org/3", 0, "a"), ("https://y.org/3", 1, "a"),
        ])
    ).set_index("host")
    assert out.loc["x.org"]["priority"] == 0.75
    assert out.loc["x.org"][["n_urls", "n_known", "n_fast"]].tolist() == [2, 1, 1]
    assert out.loc["y.org"]["priority"] == 0.0
    assert out.loc["y.org"]["mean_rate"] == 0.0


def test_revisit_priorities_no_evidence_sentinel(ray_session):
    out = revisit_priorities(_caps([("https://z.org/1", 0, "a")]))
    assert out.iloc[0]["mean_rate"] == -1.0
    assert out.iloc[0]["priority"] == 0.0  # max(mean, 0) clips the sentinel


def test_revisit_priorities_sorted_by_priority_desc(ray_session):
    out = revisit_priorities(
        _caps([
            ("https://hot.org/1", 0, "a"), ("https://hot.org/1", 1, "b"),
            ("https://cold.org/2", 0, "a"), ("https://cold.org/2", 1, "a"),
        ])
    )
    assert out["host"].tolist() == ["hot.org", "cold.org"]


def _pages(htmls):
    return rd.from_arrow(
        pa.table({"html": pa.array([h.encode() for h in htmls],
                                   type=pa.binary())})
    )


def test_hreflang_parse_counts_links_and_pages(ray_session):
    out = hreflang_rollup(_pages([
        '<head><link rel="alternate" hreflang="de" href="/de">'
        '<link rel="alternate" hreflang="de" href="/de2">'
        '<link rel="alternate" hreflang="fr" href="/fr"></head>',
        '<head><link rel="alternate" hreflang="de" href="/de"></head>',
    ])).set_index("hreflang")
    assert out.loc["de"].tolist() == [3, 2]  # 3 links on 2 pages
    assert out.loc["fr"].tolist() == [1, 1]


def test_hreflang_ignores_non_alternate_links(ray_session):
    out = hreflang_rollup(_pages([
        '<head><link rel="canonical" href="/x">'
        '<link rel="stylesheet" href="/s.css"></head>',
    ]))
    assert len(out) == 0


def test_hreflang_case_insensitive_and_quotes(ray_session):
    out = hreflang_rollup(_pages([
        "<head><LINK REL='alternate' HREFLANG='pt-BR' HREF='/br'></head>",
    ]))
    assert out.iloc[0]["hreflang"] == "pt-BR"


def test_hreflang_non_utf8_html_replaces(ray_session):
    # FIXTURES.md promises ~5% non-UTF8 garbage html rows: the decode
    # must replace bad bytes, not raise ArrowInvalid (review fix)
    bad = b"\xff\xfe<head><link rel=\"alternate\" hreflang=\"de\" " \
          b"href=\"/de\"></head>"
    ds = rd.from_arrow(
        pa.table({"html": pa.array([bad], type=pa.binary())})
    )
    out = hreflang_rollup(ds)
    assert out.iloc[0]["hreflang"] == "de"
