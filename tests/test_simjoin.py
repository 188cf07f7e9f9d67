"""Exact Jaccard set-similarity join (stages/simjoin.py): brute-force
equivalence, prefix-filter completeness, threshold boundary inclusion,
shingle-convention edge cases, the bucket-pair-cap guard."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.dedup import batch_shingle_hashes
from ai_service_ocr_grading_handler_ray.stages.simjoin import similarity_join


def _docs(texts):
    return rd.from_pandas(
        pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                      "text": texts})
    )


def _brute(texts, num, den, ngram=3):
    """All-pairs reference over the SAME hashed-shingle sets."""
    flat, off = batch_shingle_hashes(list(texts), ngram)
    sets = [np.unique(flat[off[i]: off[i + 1]]) for i in range(len(texts))]
    out = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = sets[i], sets[j]
            if not len(a) or not len(b):
                continue
            inter = len(np.intersect1d(a, b, assume_unique=True))
            uni = len(a) + len(b) - inter
            if den * inter >= num * uni:
                out.append((i, j, inter, uni))
    return sorted(out)


def _corpus(rng, n=60):
    """Templated docs with planted near-dups: pairs (2k, 2k+1) share a
    long common body with a small mutation."""
    vocab = [f"w{i}" for i in range(80)]
    texts = []
    for k in range(n // 2):
        body = " ".join(rng.choice(vocab, size=40))
        texts.append(body)
        words = body.split()
        words[rng.randint(len(words))] = "MUT"
        texts.append(" ".join(words))
    return texts


def test_simjoin_matches_brute_force(ray_session):
    rng = np.random.RandomState(17)
    texts = _corpus(rng)
    eng = (
        similarity_join(_docs(texts), threshold=(1, 2))
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    ref = _brute(texts, 1, 2)
    got = list(eng[["a", "b", "inter", "uni"]].itertuples(index=False, name=None))
    assert got == ref
    assert len(ref) >= 30  # the planted pairs are actually found
    # jaccard column is inter/uni rounded to 6
    assert np.allclose(
        eng["jaccard"], np.round(eng["inter"] / eng["uni"], 6), atol=1e-9
    )


def test_simjoin_high_threshold_subset(ray_session):
    """Raising the threshold can only shrink the result, and matches
    brute force at the new threshold too."""
    rng = np.random.RandomState(23)
    texts = _corpus(rng, n=40)
    lo = similarity_join(_docs(texts), threshold=(1, 2)).to_pandas()
    hi = similarity_join(_docs(texts), threshold=(9, 10)).to_pandas()
    assert len(hi) <= len(lo)
    ref = _brute(texts, 9, 10)
    got = sorted(hi[["a", "b", "inter", "uni"]].itertuples(index=False, name=None))
    assert got == ref


def test_simjoin_threshold_boundary_inclusive(ray_session):
    """A pair at EXACTLY the threshold is kept (>=, integer test).
    7-word docs sharing only their first 3-gram: 5 shingles each,
    1 shared → J = 1/9 exactly."""
    texts = ["a b c d e f g", "a b c x y z w"]
    out = similarity_join(_docs(texts), threshold=(1, 9)).to_pandas()
    assert len(out) == 1
    assert out["inter"].iloc[0] == 1 and out["uni"].iloc[0] == 9
    out2 = similarity_join(_docs(texts), threshold=(1, 8)).to_pandas()
    assert len(out2) == 0  # 1/9 < 1/8


def test_simjoin_short_and_empty_texts(ray_session):
    """<ngram-word texts collapse to one all-words shingle (the
    batch_shingle_hashes convention); empty texts never pair."""
    texts = ["x y", "x y", "", "x y z w", "completely different words here"]
    out = (
        similarity_join(_docs(texts), threshold=(1, 2))
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    pairs = list(out[["a", "b"]].itertuples(index=False, name=None))
    assert (0, 1) in pairs          # identical short docs: J = 1
    assert all(2 not in p for p in pairs)  # empty doc joins nothing


def test_simjoin_identical_docs_jaccard_one(ray_session):
    texts = ["one two three four five six"] * 3 + ["other words entirely now"]
    out = similarity_join(_docs(texts), threshold=(1, 1)).to_pandas()
    pairs = sorted(out[["a", "b"]].itertuples(index=False, name=None))
    assert pairs == [(0, 1), (0, 2), (1, 2)]
    assert (out["jaccard"] == 1.0).all()


def test_simjoin_bucket_pair_cap_raises(ray_session):
    """A degenerate corpus (every doc identical) concentrates one
    prefix bucket; the cap must fail loudly, not hang."""
    texts = ["same words every time here"] * 40
    with pytest.raises(Exception, match="bucket_pair_cap|exceeds"):
        similarity_join(
            _docs(texts), threshold=(1, 2), bucket_pair_cap=10
        ).materialize()


# --------------------------------------------------------------------------
# containment join
# --------------------------------------------------------------------------

from ai_service_ocr_grading_handler_ray.stages.simjoin import containment_join


def _brute_containment(texts, num, den, ngram=3):
    """All ORDERED pairs (a != b) with |A∩B| >= (num/den)·|A|, over the
    same hashed-shingle sets."""
    flat, off = batch_shingle_hashes(list(texts), ngram)
    sets = [np.unique(flat[off[i]: off[i + 1]]) for i in range(len(texts))]
    out = []
    for i in range(len(texts)):
        if not len(sets[i]):
            continue
        for j in range(len(texts)):
            if i == j or not len(sets[j]):
                continue
            inter = len(np.intersect1d(sets[i], sets[j], assume_unique=True))
            if den * inter >= num * len(sets[i]):
                out.append((i, j, inter, len(sets[i])))
    return sorted(out)


def _containment_result(texts, num, den, **kw):
    out = containment_join(
        _docs(texts), threshold=(num, den), ngram=3, **kw
    ).to_pandas()
    if out.empty:
        return []
    return sorted(
        (int(a), int(b), int(i), int(n))
        for a, b, i, n in zip(out["a"], out["b"], out["inter"], out["na"])
    )


def test_containment_matches_brute():
    rng = np.random.RandomState(7)
    texts = _corpus(rng, n=40)
    # plant genuine quotes: doc k's first 60% of words as a new doc
    quotes = []
    for k in (0, 5, 11):
        words = texts[k].split()
        quotes.append(" ".join(words[: (3 * len(words) + 4) // 5]))
    texts = texts + quotes
    assert _containment_result(texts, 4, 5) == _brute_containment(texts, 4, 5)


def test_containment_finds_quote_jaccard_misses():
    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(500)]
    long_doc = " ".join(rng.choice(vocab, size=400))
    quote = " ".join(long_doc.split()[:30])
    filler = [
        " ".join(rng.choice(vocab, size=50)) for _ in range(10)
    ]
    texts = [long_doc, quote] + filler
    cont = _containment_result(texts, 9, 10)
    assert any(a == 1 and b == 0 for a, b, _, _ in cont)  # quote ⊂ original
    # the symmetric Jaccard join at 0.5 misses it (J ≈ 30/400)
    sym = similarity_join(_docs(texts), threshold=(1, 2), ngram=3).to_pandas()
    assert sym.empty or not len(sym[(sym["a"] == 0) & (sym["b"] == 1)])


def test_containment_is_directed_and_excludes_self():
    # identical docs contain each other: both directions, never (x, x)
    texts = ["alpha beta gamma delta epsilon zeta", 
             "alpha beta gamma delta epsilon zeta"]
    got = _containment_result(texts, 1, 1)
    pairs = [(a, b) for a, b, _, _ in got]
    assert (0, 1) in pairs and (1, 0) in pairs
    assert all(a != b for a, b in pairs)


def test_containment_threshold_integer_boundary():
    # A has 4 shingles, 3 shared: C = 3/4 — included at 3/4, not at 4/5
    base = "a b c d e f"          # shingles: abc bcd cde def
    other = "a b c d e zz"        # shares abc bcd cde (3 of A's 4)
    texts = [base, other]
    got34 = _containment_result(texts, 3, 4)
    got45 = _containment_result(texts, 4, 5)
    assert any(a == 0 and b == 1 for a, b, _, _ in got34)
    assert not any(a == 0 and b == 1 for a, b, _, _ in got45)


def test_containment_string_ids(ray_session):
    df = pd.DataFrame(
        {
            "url": ["u/long", "u/quote", "u/other"],
            "text": [
                "one two three four five six seven eight nine ten",
                "one two three four five six",
                "unrelated words entirely here now",
            ],
        }
    )
    out = containment_join(
        rd.from_pandas(df), id_col="url", text_col="text", threshold=(4, 5)
    ).to_pandas()
    assert ("u/quote", "u/long") in set(zip(out["a"], out["b"]))
    assert out["a"].dtype == object


def test_containment_bucket_pair_cap_raises():
    texts = ["same words here always"] * 40
    with pytest.raises(Exception, match="bucket_pair_cap"):
        _containment_result(texts, 1, 2, bucket_pair_cap=10)
