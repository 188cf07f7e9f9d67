"""Windowed co-occurrence + PMI: kernel semantics vs a plain-Python
reference, empty-token renumbering, layout independence."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.cooccur import (
    pair_counts,
    pair_counts_partial,
    pmi_pairs,
)


def _ref_pairs(texts: list[str], window: int) -> dict:
    out: dict = {}
    for t in texts:
        toks = [w for w in t.split(" ") if w]
        for i, a in enumerate(toks):
            for off in range(1, window + 1):
                if i + off < len(toks):
                    k = (a, toks[i + off])
                    out[k] = out.get(k, 0) + 1
    return out


def test_pair_counts_partial_kernel():
    texts = ["a b c", "a  b", "", "x"]
    t = pa.table({"text": pa.array(texts, type=pa.string())})
    out = pair_counts_partial(t, window=2)
    got = {
        (a, b): n
        for a, b, n in zip(
            out["a"].to_pylist(), out["b"].to_pylist(), out["n"].to_pylist()
        )
    }
    # 'a  b' (double space) pairs a-b after empty-drop renumbering;
    # pairs never cross documents; single-token and empty docs emit none
    assert got == _ref_pairs(texts, 2)


def test_pmi_matches_reference(ray_session):
    texts = [f"w{i % 3} common w{i % 5} common tail{i % 2}" for i in range(50)]
    df = pd.DataFrame({"doc_id": range(50), "text": texts})
    out = (
        pmi_pairs(rd.from_pandas(df).repartition(6), window=2, min_count=5)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    ref_pairs = _ref_pairs(texts, 2)
    n_pairs = sum(ref_pairs.values())
    uni: dict = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                uni[w] = uni.get(w, 0) + 1
    n_tok = sum(uni.values())
    exp = {
        k: (
            n,
            math.log((n / n_pairs) / ((uni[k[0]] / n_tok) * (uni[k[1]] / n_tok))),
        )
        for k, n in ref_pairs.items()
        if n >= 5
    }
    assert {(r.a, r.b): r.n for r in out.itertuples()} == {
        k: v[0] for k, v in exp.items()
    }
    for r in out.itertuples():
        assert abs(r.pmi - exp[(r.a, r.b)][1]) < 1e-9
    # layout independence
    out2 = (
        pmi_pairs(
            rd.from_pandas(df.sample(frac=1.0, random_state=4)).repartition(3),
            window=2,
            min_count=5,
        )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_pair_counts_window_one(ray_session):
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["a b a b", "b a"]})
    out = pair_counts(rd.from_pandas(df), window=1).to_pandas()
    got = {(r.a, r.b): r.n for r in out.itertuples()}
    assert got == {("a", "b"): 2, ("b", "a"): 2}
