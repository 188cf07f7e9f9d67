"""Naive Bayes classifier (stages/nbayes.py): distributed-vs-reference
equivalence, block-layout determinism, OOV smoothing, learning sanity."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.nbayes import (
    nb_reference,
    nb_score,
    nb_train,
)

TEXTS = [
    "measured results analysis figure",
    "analysis results section table",
    "click cheap deal win",
    "cheap prize win now",
    "",
    "figure section measured analysis",
    "deal deal click prize",
]
LABELS = ["good", "good", "bad", "bad", "good", "good", "bad"]


def _ds(texts=TEXTS, labels=LABELS, n_blocks=1):
    t = pa.table(
        {
            "doc_id": list(range(len(texts))),
            "text": pa.array(texts, type=pa.string()),
            "label": pa.array(labels, type=pa.string()),
        }
    )
    ds = rd.from_arrow(t)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def _scores(ds, model):
    df = (
        nb_score(ds, model, text_col="text", id_col="doc_id")
        .to_pandas()
        .sort_values(["doc_id", "label"])
        .reset_index(drop=True)
    )
    return {(int(r.doc_id), r.label): r.nb_logprob for _, r in df.iterrows()}


def test_matches_plain_python_reference(ray_session):
    model = nb_train(_ds(), label_col="label")
    got = _scores(_ds(), model)
    ref = nb_reference(TEXTS, LABELS, TEXTS)
    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], atol=1e-12)


def test_block_layout_deterministic(ray_session):
    m1 = nb_train(_ds(n_blocks=1), label_col="label")
    m4 = nb_train(_ds(n_blocks=4), label_col="label")
    np.testing.assert_array_equal(m1.hashes, m4.hashes)
    np.testing.assert_array_equal(m1.counts, m4.counts)
    np.testing.assert_array_equal(m1.log_priors, m4.log_priors)
    assert m1.labels == m4.labels and m1.vocab_size == m4.vocab_size
    s1 = _scores(_ds(n_blocks=1), m1)
    s4 = _scores(_ds(n_blocks=4), m4)
    assert s1 == s4


def test_learns_planted_classes(ray_session):
    model = nb_train(_ds(), label_col="label")
    got = _scores(_ds(), model)
    for i, lab in enumerate(LABELS):
        if TEXTS[i] == "":
            continue  # empty doc scores priors only — no signal
        other = "bad" if lab == "good" else "good"
        assert got[(i, lab)] > got[(i, other)], (i, lab)


def test_oov_tokens_smooth_not_crash(ray_session):
    model = nb_train(_ds(), label_col="label")
    unseen = ["zzz qqq unseen tokens only"]
    t = pa.table({"doc_id": [99], "text": unseen})
    got = _scores(rd.from_arrow(t), model)
    ref = nb_reference(TEXTS, LABELS, unseen)
    for lab in model.labels:
        np.testing.assert_allclose(
            got[(99, lab)], ref[(0, lab)], atol=1e-12
        )
    # every OOV token contributes ln(1/(n_c+V)) — finite, negative
    assert all(np.isfinite(v) and v < 0 for v in got.values())


def test_empty_text_scores_prior_plus_empty_token(ray_session):
    # '' tokenizes to one empty token (the SQL string_split convention),
    # so an empty doc is prior + one smoothed term per class
    model = nb_train(_ds(), label_col="label")
    got = _scores(_ds(), model)
    ref = nb_reference(TEXTS, LABELS, TEXTS)
    i = TEXTS.index("")
    for lab in model.labels:
        np.testing.assert_allclose(got[(i, lab)], ref[(i, lab)], atol=1e-12)
