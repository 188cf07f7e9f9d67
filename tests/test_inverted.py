"""Inverted-index build: kernel semantics, df bounds, hot-term pre-drop
equivalence, determinism across layouts."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.inverted import (
    distinct_term_doc_pairs,
    inverted_index,
    inverted_index_sql,
)


def _ref_index(docs: dict[int, str], min_df=1, max_df=None):
    """Plain-Python reference with string_split semantics."""
    post: dict[str, set] = {}
    for d, text in docs.items():
        for w in set(text.split(" ")):
            if w:
                post.setdefault(w, set()).add(d)
    out = {}
    for t, ids in post.items():
        if len(ids) < min_df or (max_df is not None and len(ids) > max_df):
            continue
        out[t] = (len(ids), ",".join(str(i) for i in sorted(ids)))
    return out


def test_distinct_pairs_kernel():
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(["a b a", "", "b  c"], type=pa.string()),
        }
    )
    out = distinct_term_doc_pairs(t)
    pairs = set(zip(out["term"].to_pylist(), out["doc_id"].to_pylist()))
    # within-doc dedup ('a' once for doc 1); '' (empty text, double space)
    # dropped on both sides like the SQL WHERE term <> ''
    assert pairs == {("a", 1), ("b", 1), ("b", 3), ("c", 3)}


def test_inverted_index_matches_reference(ray_session):
    docs = {i: f"w{i % 5} w{i % 3} common filler-{i}" for i in range(60)}
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    for min_df, max_df in [(1, None), (2, None), (1, 30), (2, 12)]:
        got = (
            inverted_index(
                rd.from_pandas(df).repartition(5), min_df=min_df, max_df=max_df
            )
            .to_pandas()
            .sort_values("term")
        )
        ref = _ref_index(docs, min_df=min_df, max_df=max_df)
        assert {
            r.term: (r.df, r.postings) for r in got.itertuples()
        } == ref, (min_df, max_df)
        # 'common' (df=60) must be pre-dropped when max_df caps it
        if max_df is not None and max_df < 60:
            assert "common" not in set(got["term"])


def test_inverted_index_layout_independent(ray_session):
    df = pd.DataFrame(
        {"doc_id": range(40), "text": [f"x y{i % 4} z{i % 7}" for i in range(40)]}
    )
    a = (
        inverted_index(rd.from_pandas(df).repartition(1), max_df=30)
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    b = (
        inverted_index(
            rd.from_pandas(df.sample(frac=1.0, random_state=3)).repartition(8),
            max_df=30,
        )
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_inverted_index_sql_expression_cap():
    sql = inverted_index_sql(min_df=2, max_df="floor(0.5 * 10)")
    assert "count(*) <= (floor(0.5 * 10))" in sql
    assert "count(*) >= 2" in sql
