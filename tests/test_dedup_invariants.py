"""Oracle-adjacent invariant checks for the rows-only registry entries
(VERDICT r3 #8): q32/q88/q101/q112 are not SQL-expressible (minhash /
iterative k-means / the engine's own extraction), so the driver records
rows-only checks for them.  These tests assert the SQL-checkable
INVARIANTS of each result at the driver's compare scale (sf0.01) —
referenced from each query's docstring."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.01"


def _df(name: str):
    from ai_service_ocr_grading_handler_ray.pipelines.queries import QUERIES

    out = QUERIES[name](SF)
    return out.to_pandas() if hasattr(out, "to_pandas") else out


def _doc_ids() -> np.ndarray:
    return (
        pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])["doc_id"]
        .to_numpy(zero_copy_only=False)
    )


def test_q32_minhash_cluster_invariants():
    out = _df("q32_minhash_dedup")
    ids = _doc_ids()
    expected = set(ids.tolist()) | {int(i) + 1_000_000 for i in ids if i % 7 == 0}
    # every id exactly once; labels point INTO the id universe
    assert sorted(out["doc_id"]) == sorted(expected)
    assert set(out["cluster_id"]) <= expected
    # cluster_id = min member id of its component
    mins = out.groupby("cluster_id")["doc_id"].min()
    assert (mins.index == mins.values).all()
    # SOUNDNESS (exact, the verify stage recomputes true Jaccard): a
    # variant that clustered with its source must have word-3-gram
    # Jaccard >= the 0.55 threshold.  (Most drop-every-5th-word variants
    # sit near 0.30 and correctly stay singletons.)
    from ai_service_ocr_grading_handler_ray.stages.dedup import ngram_jaccard

    texts = (
        pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
        .set_index("doc_id")["text"]
    )
    cl = dict(zip(out["doc_id"], out["cluster_id"]))
    for i in (int(x) for x in ids if x % 7 == 0):
        if cl[i + 1_000_000] == cl[i]:
            w = (texts[i] or "").split()
            var = " ".join(x for j, x in enumerate(w) if j % 5 != 0)
            assert ngram_jaccard(texts[i], var) >= 0.55


def test_q88_semantic_dedup_invariants():
    out = _df("q88_semantic_dedup")
    vec_ids = (
        pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id"])["vec_id"]
        .to_numpy(zero_copy_only=False)
    )
    copies = [int(i) + 1_000_000 for i in vec_ids if i % 11 == 0]
    expected = set(vec_ids.tolist()) | set(copies)
    assert sorted(out["vec_id"]) == sorted(expected)
    kept = dict(zip(out["vec_id"], out["keep"]))
    # an identical copy (cosine exactly 1 to a lower id in the same
    # k-means cell) must always prune; its source must survive
    assert all(not kept[c] for c in copies)
    assert all(kept[c - 1_000_000] for c in copies)


def test_q101_tier_extract_invariants():
    out = _df("q101_tier_extract")
    # one row per unique extracted url
    assert out["url"].is_unique
    assert set(out["tier"]) <= {"head", "middle", "tail"}
    assert (out["n_tokens"] >= 1).all()
    assert np.isfinite(out["avg_logprob"]).all()
    # EXACT per-language terciles: tier sizes within a language differ
    # by at most 1 (languages with <3 docs degenerate — skip those)
    sizes = out.groupby(["lang", "tier"]).size().unstack(fill_value=0)
    big = sizes[sizes.sum(axis=1) >= 3]
    assert ((big.max(axis=1) - big.min(axis=1)) <= 1).all()


def test_q112_url_near_dup_invariants():
    out = _df("q112_url_near_dup")
    assert out["url"].is_unique
    urls = set(out["url"])
    assert set(out["cluster_id"]) <= urls
    # representative is the lexicographic-min member url
    mins = out.groupby("cluster_id")["url"].min()
    assert (mins.index == mins.values).all()
    # variant pages ('?variant=2' twins) overwhelmingly cluster with
    # their source page
    cl = dict(zip(out["url"], out["cluster_id"]))
    variants = [u for u in urls if u.endswith("?variant=2")]
    assert len(variants) > 0
    hits = sum(
        cl[v] == cl[v.removesuffix("?variant=2")] for v in variants
    )
    assert hits >= 0.8 * len(variants)
