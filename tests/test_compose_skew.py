"""Group-compose (A5/A6), number prediction (J5/M24), salted aggregation."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.payloads import decode_image_text, encode_image_text
from ai_service_ocr_grading_handler_ray.stages.compose import (
    BORDER,
    GAP,
    CHAR_H,
    compose_stacked_image,
    number_list_flatten,
    predict_number,
    predict_numbers_for_group,
)
from ai_service_ocr_grading_handler_ray.stages.skew import host_of_url, salted_count


def test_compose_geometry():
    p1 = encode_image_text("abcd\nef")  # w=24, h=20
    p2 = encode_image_text("xyz")  # w=18, h=10
    stacked, w, h = compose_stacked_image([p1, p2])
    assert w == 24 + 2 * BORDER
    assert h == 20 + 10 + GAP + 2 * BORDER
    assert decode_image_text(stacked) == "abcd\nef\n\nxyz"


def test_number_list_flatten_drops_falsy():
    # reference drops 0s too (llm_number_prediction.py:35 `if v:`)
    assert number_list_flatten([[1, 0, 2], [3], 4, [None]]) == [1, 2, 3, 4]


def test_predict_number():
    assert predict_number("the answer is 42 ok") == 42
    assert predict_number("no digits") == 0


def test_predict_numbers_group_scoring():
    g = pd.DataFrame(
        {
            "scan_id": ["s1"] * 3,
            "que_id": ["q1", "q2", "q3"],
            "student_answer_payload": [
                encode_image_text("answer 7"),
                encode_image_text("value 9"),
                encode_image_text("nothing here"),
            ],
            "correct_answer": ["7", "8", None],
            "max_score": [2.0, 3.0, 1.0],
        }
    )
    out = predict_numbers_for_group(g)
    assert out["predicted_number"].tolist() == [7, 9, 0]
    # J5: equal → max_score; unequal → 0 (reference unbound-score bug fixed)
    assert out["score"].tolist() == [2.0, 0.0, 0.0]


def test_group_compose_via_map_groups():
    rows = []
    for scan in ("a", "b"):
        for i in range(3):
            rows.append(
                {
                    "scan_id": scan,
                    "que_id": f"{scan}{i}",
                    "student_answer_payload": encode_image_text(f"num {i + 1}"),
                    "correct_answer": str(i + 1),
                    "max_score": 1.0,
                }
            )
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = (
        ds.groupby("scan_id")
        .map_groups(predict_numbers_for_group, batch_format="pandas")
        .to_pandas()
    )
    assert len(out) == 6
    assert (out["score"] == 1.0).all()  # every prediction matches


def test_host_of_url():
    assert host_of_url("https://big.example.com/x/y") == "big.example.com"
    assert host_of_url("garbage") == ""


def test_salted_count_matches_plain_groupby(sf_dir):
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"])
    salted = salted_count(
        ds, key="user_id", salt_from="event_id", salt=8, sum_col="value"
    ).sort_values("user_id").reset_index(drop=True)

    import duckdb

    ref = (
        duckdb.sql(
            f"""SELECT user_id, CAST(count(*) AS BIGINT) AS n, sum(value) AS sum_value
            FROM read_parquet('{sf_dir}/events.parquet') GROUP BY user_id ORDER BY user_id"""
        )
        .df()
        .reset_index(drop=True)
    )
    assert salted["user_id"].tolist() == ref["user_id"].tolist()
    assert salted["n"].tolist() == ref["n"].tolist()
    assert (salted["sum_value"].round(6) == ref["sum_value"].round(6)).all()


def test_streaming_window_incremental_close():
    """Windows close incrementally as the watermark advances (not only at
    flush) — the stateful-streaming semantics the batch groupby lacks."""
    import ray as _ray

    from ai_service_ocr_grading_handler_ray.stages.streaming import WindowBucketActor

    a = WindowBucketActor.remote(window_s=10)
    closed = _ray.get(a.ingest.remote(["k"], [5_000_000], [1.0]))
    assert closed == []  # first window still open
    closed = _ray.get(a.ingest.remote(["k"], [25_000_000], [2.0]))
    assert closed == [("k", 0, 1, 1.0)]  # watermark passed window 0 → emitted
    final = _ray.get(a.flush.remote())
    assert final == [("k", 2, 1, 2.0)]  # only the still-open window remains
    _ray.kill(a)


def test_hosts_of_urls_matches_scalar():
    import pyarrow as pa

    from ai_service_ocr_grading_handler_ray.stages.skew import (
        host_of_url,
        hosts_of_urls,
    )

    urls = [
        "https://big.example.com/p/1",
        "http://a.b/x",
        "//bare.host/q",
        "https://no-path.example.com",
        # authority ends at '?'/'#' even with no path (ADVICE r3) —
        # urlsplit netloc semantics in both the scalar and the kernel
        "http://host?q=1",
        "http://host#frag",
        "http://host?q=1#frag",
        "",
        None,
    ]
    vec = hosts_of_urls(pa.array(urls, type=pa.string())).to_pylist()
    ref = [host_of_url(u or "") for u in urls]
    assert vec == ref
    assert host_of_url("http://host?q=1") == "host"
    assert host_of_url("http://host#f") == "host"
