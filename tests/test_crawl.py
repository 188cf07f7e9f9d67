"""Crawl-frontier capstone: keep-latest dedup, politeness cap, ranking
tie-break, unlinked-host semantics, layout independence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ai_service_ocr_grading_handler_ray.pipelines.crawl import (
    crawl_frontier,
    frontier_priority_sql,
)

US_DAY = 86_400_000_000


def _pages(rows):
    return rd.from_pandas(pd.DataFrame(rows))


def test_crawl_frontier_semantics(ray_session):
    # two hosts; a.example.org outranks b (more in-links); h0 url crawled
    # twice — the LATER ts must win (higher freshness)
    ref = 100 * US_DAY
    pages = _pages(
        [
            {"url": "https://a.example.org/old", "ts_us": ref - 90 * US_DAY},
            {"url": "https://a.example.org/old", "ts_us": ref - 1 * US_DAY},
            {"url": "https://a.example.org/new", "ts_us": ref - 2 * US_DAY},
            {"url": "https://b.example.org/x", "ts_us": ref - 1 * US_DAY},
            {"url": "https://c-unlinked.example.org/y", "ts_us": ref},
        ]
    )
    edges = rd.from_pandas(
        pd.DataFrame(
            {
                "src": ["b.example.org"] * 3
                + ["a.example.org", "z.example.org"],
                "dst": ["a.example.org"] * 3
                + ["b.example.org", "a.example.org"],
            }
        )
    )
    out = (
        crawl_frontier(pages, edges, ref_us=ref, k=5)
        .to_pandas()
        .sort_values(["host", "host_rank"])
        .reset_index(drop=True)
    )
    # unlinked host dropped (inner-join semantics)
    assert set(out["host"]) == {"a.example.org", "b.example.org"}
    a = out[out["host"] == "a.example.org"].set_index("url")
    # keep-latest: /old kept the 1-day-age crawl, so it outranks /new (2 days)
    assert a.loc["https://a.example.org/old", "host_rank"] == 1
    assert a.loc["https://a.example.org/new", "host_rank"] == 2
    # a gets 3 of 4 weighted in-links → higher pagerank → higher priority
    assert (
        a["priority"].max()
        > out[out["host"] == "b.example.org"]["priority"].max()
    )
    # keep_unlinked surfaces the orphan host at priority 0
    out2 = crawl_frontier(pages, edges, ref_us=ref, k=5, keep_unlinked=True).to_pandas()
    orphan = out2[out2["host"] == "c-unlinked.example.org"]
    assert len(orphan) == 1 and orphan["priority"].iloc[0] == 0.0


def test_crawl_frontier_cap_and_ties(ray_session):
    ref = 10 * US_DAY
    # 8 urls on one host, all the SAME ts → priority ties → url-asc order
    pages = _pages(
        [
            {"url": f"https://h.example.org/p{i}", "ts_us": ref - US_DAY}
            for i in range(8)
        ]
    )
    edges = rd.from_pandas(
        pd.DataFrame({"src": ["x.example.org"], "dst": ["h.example.org"]})
    )
    out = (
        crawl_frontier(pages, edges, ref_us=ref, k=3)
        .to_pandas()
        .sort_values("host_rank")
        .reset_index(drop=True)
    )
    h = out[out["host"] == "h.example.org"]
    assert len(h) == 3  # politeness cap
    assert list(h["url"]) == [
        "https://h.example.org/p0",
        "https://h.example.org/p1",
        "https://h.example.org/p2",
    ]
    assert list(h["host_rank"]) == [1, 2, 3]


def test_crawl_frontier_layout_independent(ray_session):
    ref = 50 * US_DAY
    rng = np.random.default_rng(9)
    rows = [
        {
            "url": f"https://h{i % 6}.example.org/p{i}",
            "ts_us": ref - int(rng.integers(1, 40)) * US_DAY,
        }
        for i in range(120)
    ]
    edges = pd.DataFrame(
        {
            "src": [f"h{i % 6}.example.org" for i in range(60)],
            "dst": [f"h{(i + 1) % 6}.example.org" for i in range(60)],
        }
    )
    a = (
        crawl_frontier(
            _pages(rows).repartition(1), rd.from_pandas(edges), ref_us=ref, k=4
        )
        .to_pandas()
        .sort_values(["host", "host_rank"])
        .reset_index(drop=True)
    )
    b = (
        crawl_frontier(
            _pages(list(reversed(rows))).repartition(7),
            rd.from_pandas(edges.sample(frac=1.0, random_state=2)),
            ref_us=ref,
            k=4,
        )
        .to_pandas()
        .sort_values(["host", "host_rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert (a.groupby("host").size() <= 4).all()


def test_frontier_priority_sql_shape():
    s = frontier_priority_sql(ts_diff_us="d", pagerank_col="p", decay_days=30.0)
    assert "86400000000.0" in s and "round(" in s and "exp(" in s


def test_crawl_frontier_from_warc(ray_session, tmp_path):
    """End-to-end web-crawl story: WARC archives on disk → read_warc →
    link extraction from the archived html → crawl_frontier.  Ties the
    source (sources/warc.py), the extractor (stages/links.py) and the
    capstone (pipelines/crawl.py) together on real bytes."""
    import pyarrow as pa
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.sources.warc import (
        pages_to_warc_bytes,
        read_warc,
    )
    from ai_service_ocr_grading_handler_ray.stages.links import outlink_host_edges

    ref = 40 * US_DAY

    def page(url, hrefs):
        body = "".join(f'<a href="{h}">x</a>' for h in hrefs)
        return f"<html><body>{body}</body></html>".encode()

    rows = []
    for i in range(12):
        host = f"w{i % 3}.example.org"
        url = f"https://{host}/p{i}"
        # every page links to the hub and to the next host
        rows.append(
            {
                "url": url,
                "warc_ts": (ref - (i % 7 + 1) * US_DAY),
                "html": page(url, [
                    "https://hub.example.org/",
                    f"https://w{(i + 1) % 3}.example.org/q",
                ]),
            }
        )
    t = pa.table(
        {
            "url": pa.array([r["url"] for r in rows], type=pa.string()),
            "warc_ts": pa.array(
                [r["warc_ts"] for r in rows], type=pa.timestamp("us")
            ),
            "html": pa.array([r["html"] for r in rows], type=pa.binary()),
        }
    )
    path = tmp_path / "crawl.warc.gz"
    path.write_bytes(pages_to_warc_bytes(t))

    pages = read_warc(str(path))

    def to_ts(tb: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": tb["url"],
                "ts_us": tb["warc_ts"].cast(pa.int64()),
            }
        )

    out = crawl_frontier(
        pages.map_batches(to_ts, batch_format="pyarrow"),
        outlink_host_edges(pages),
        ref_us=ref,
        k=3,
    ).to_pandas()
    # hub receives every page's link → highest pagerank, but owns no
    # urls; the three w-hosts each cap at k=3 of their 4 urls
    assert set(out["host"]) == {"w0.example.org", "w1.example.org", "w2.example.org"}
    assert (out.groupby("host").size() == 3).all()
    # fresher urls (smaller age) rank first within a host
    for _, g in out.groupby("host"):
        g = g.sort_values("host_rank")
        assert g["priority"].is_monotonic_decreasing
