"""Winnowing fingerprints (stages/winnow.py): the MOSS guarantee,
rightmost-min tie rule, determinism, overlap join."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.winnow import (
    winnow_doc,
    winnow_overlap,
)

NGRAM, WINDOW = 3, 4
GUARANTEE = WINDOW + NGRAM - 1  # any common run of >= 6 words shares a fp


def test_winnow_deterministic_and_subset_of_gram_hashes():
    words = "the quick brown fox jumps over the lazy dog again".split()
    a = winnow_doc(words, ngram=NGRAM, window=WINDOW)
    b = winnow_doc(words, ngram=NGRAM, window=WINDOW)
    assert (a == b).all()
    assert len(a) >= 1
    # density: ~2/(w+1) of grams, never more than the gram count
    assert len(a) <= len(words) - NGRAM + 1


def test_winnow_shared_passage_guarantee():
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(500)]
    passage = ["shared%d" % i for i in range(GUARANTEE)]  # 6 words
    for trial in range(20):
        left = list(rng.choice(vocab, size=30)) + passage + list(
            rng.choice(vocab, size=25)
        )
        right = list(rng.choice(vocab, size=40)) + passage + list(
            rng.choice(vocab, size=10)
        )
        fa = set(winnow_doc(left, ngram=NGRAM, window=WINDOW).tolist())
        fb = set(winnow_doc(right, ngram=NGRAM, window=WINDOW).tolist())
        assert fa & fb, f"guarantee violated on trial {trial}"


def test_winnow_short_text_single_fingerprint():
    assert len(winnow_doc(["one", "two"], ngram=NGRAM, window=WINDOW)) == 1
    assert len(winnow_doc([], ngram=NGRAM, window=WINDOW)) == 0


def test_winnow_overlap_join(ray_session):
    rng = np.random.default_rng(5)
    vocab = [f"tok{i}" for i in range(300)]
    passage = " ".join(f"quoted{i}" for i in range(12))
    texts = {
        1: " ".join(rng.choice(vocab, size=50)) + " " + passage,
        2: passage + " " + " ".join(rng.choice(vocab, size=60)),
        3: " ".join(rng.choice(vocab, size=55)),
    }
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(list(texts), type=pa.int64()),
             "text": pa.array(list(texts.values()), type=pa.string())}
        )
    )
    out = winnow_overlap(
        ds, ngram=NGRAM, window=WINDOW, min_shared=1
    ).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    # docs 1 and 2 share the 12-word passage -> must pair; 3 pairs with
    # nobody (disjoint vocab)
    assert (1, 2) in set(zip(out["a"], out["b"]))
    assert 3 not in set(out["a"]) and 3 not in set(out["b"])


def test_winnow_overlap_layout_independent(ray_session):
    rng = np.random.default_rng(7)
    vocab = [f"v{i}" for i in range(200)]
    base = " ".join(rng.choice(vocab, size=80))
    rows = []
    for i in range(40):
        t = " ".join(rng.choice(vocab, size=60))
        if i % 5 == 0:
            t = t + " " + base[:120]
        rows.append((i, t))
    t = pa.table(
        {"doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
         "text": pa.array([r[1] for r in rows], type=pa.string())}
    )
    a = (
        winnow_overlap(rd.from_arrow(t), min_shared=1)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    b = (
        winnow_overlap(rd.from_arrow(t).repartition(9), min_shared=1)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert a.equals(b)


def test_winnow_duplicate_doc_ids_no_self_pairs(ray_session):
    """Code-review r5b: duplicate doc ids must not yield a == b
    self-pairs or double counts (matches the oracle's DISTINCT picks)."""
    passage = " ".join(f"dup{i}" for i in range(12))
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([7, 7, 8], type=pa.int64()),
             "text": pa.array([passage, passage, passage], type=pa.string())}
        )
    )
    out = winnow_overlap(ds, min_shared=1).to_pandas()
    assert (out["a"] != out["b"]).all()
    pair = out[(out["a"] == 7) & (out["b"] == 8)]
    assert len(pair) == 1
