"""BM25 retrieval scoring (stages/bm25.py)."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.bm25 import (
    B_DEFAULT,
    K1_DEFAULT,
    bm25_scores,
)

CORPUS = [
    "the fast join merge join",          # join x2
    "window scan sort",                  # no hits
    "dup dup dup join",                  # dup x3, join x1
    "",                                  # empty text (dl = 1, the '' token)
    "vector vector scan dup",            # vector x2, dup x1
    "a b c d e f g h i j k l m n o p",   # long doc, no hits
]
TERMS = ["dup", "join", "vector"]


def _reference_bm25(corpus, terms, k1=K1_DEFAULT, b=B_DEFAULT):
    """Plain-Python BM25 (Lucene idf), the slow obvious implementation."""
    toks = [(t or "").split(" ") for t in corpus]
    n = len(corpus)
    avgdl = sum(len(w) for w in toks) / n
    df = {q: sum(1 for w in toks if q in w) for q in terms}
    out = {}
    for i, w in enumerate(toks):
        s, hits = 0.0, 0
        for q in terms:
            tf = w.count(q)
            if tf == 0:
                continue
            hits += 1
            idf = math.log(1.0 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * len(w) / avgdl))
        if hits:
            out[i] = (hits, s)
    return out


def _ds(corpus):
    return rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(corpus)]
    )


def test_matches_plain_python_reference():
    got = bm25_scores(_ds(CORPUS), TERMS).to_pandas()
    want = _reference_bm25(CORPUS, TERMS)
    assert set(got["doc_id"]) == set(want)
    for _, r in got.iterrows():
        hits, score = want[r["doc_id"]]
        assert r["n_hits"] == hits
        assert r["bm25"] == pytest.approx(score, rel=1e-12)


def test_no_hit_and_empty_docs_excluded():
    got = bm25_scores(_ds(CORPUS), TERMS).to_pandas()
    assert set(got["doc_id"]) == {0, 2, 4}


def test_rare_term_outranks_common_term():
    # one doc with the rare term vs one with a common term, equal tf/dl
    corpus = ["rare x", "common x"] + ["common y"] * 20
    got = (
        bm25_scores(_ds(corpus), ["rare", "common"])
        .to_pandas()
        .set_index("doc_id")["bm25"]
    )
    assert got[0] > got[1]


def test_partitioning_invariance():
    one = bm25_scores(_ds(CORPUS), TERMS).to_pandas()
    many = bm25_scores(_ds(CORPUS).repartition(5), TERMS).to_pandas()
    a = one.sort_values("doc_id").reset_index(drop=True)
    b = many.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_absent_term_is_a_noop():
    base = bm25_scores(_ds(CORPUS), TERMS).to_pandas()
    plus = bm25_scores(_ds(CORPUS), TERMS + ["nosuchterm"]).to_pandas()
    a = base.sort_values("doc_id").reset_index(drop=True)
    b = plus.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_tf_saturation_bounded_by_k1_plus_1():
    # the tf factor saturates at (k1+1): a 1000x tf gives < (k1+1)/1 gain
    corpus = ["q " * 1000, "q x"]
    got = (
        bm25_scores(_ds(corpus), ["q"])
        .to_pandas()
        .set_index("doc_id")["bm25"]
    )
    assert got[0] < got[1] * (K1_DEFAULT + 1.0) * 2


def test_rejects_bad_query_sets():
    with pytest.raises(ValueError):
        bm25_scores(_ds(CORPUS), [])
    with pytest.raises(ValueError):
        bm25_scores(_ds(CORPUS), ["dup", "dup"])


def test_lazy_output_and_slim_schema():
    out = bm25_scores(_ds(CORPUS), TERMS)
    assert isinstance(out, rd.Dataset)
    assert set(out.schema().names) == {"doc_id", "n_hits", "bm25"}
