"""Sequence packing + the round-3 curation additions (unigram LM
scoring, blocklist filter): semantics that the DuckDB oracle can't pin
alone — budget boundaries, custom-LM scoring, OOV handling, empty text,
the batch tokenizer's segment contract."""

import math
import pandas as pd

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.clean import filter_blocked_words
from ai_service_ocr_grading_handler_ray.stages.packing import (
    add_ws_token_count,
    pack_sequences,
)
from ai_service_ocr_grading_handler_ray.stages.text_analysis import (
    batch_words,
    score_unigram_logprob,
    unigram_counts,
)


def _docs(rows):
    return rd.from_arrow(pa.table(rows))


# --- batch_words -------------------------------------------------------------


def test_batch_words_segments_match_per_text_split():
    texts = ["a b c", "", "single", "x  y"]  # note double space -> empty token
    words, lens = batch_words(texts)
    assert lens.tolist() == [3, 1, 1, 3]
    assert words.tolist() == ["a", "b", "c", "", "single", "x", "", "y"]
    # reduceat over cumsum(lens) recovers exact per-text segments
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    segs = [words[s : s + l].tolist() for s, l in zip(starts, lens)]
    assert segs == [t.split(" ") for t in texts]


def test_batch_words_empty_batch():
    words, lens = batch_words([])
    assert len(words) == 0 and len(lens) == 0


# --- token count kernel ------------------------------------------------------


def test_add_ws_token_count_matches_split_len():
    t = pa.table({"text": ["a b", "", None, "one"]})
    out = add_ws_token_count(t)
    # SQL len(string_split(...)): '' -> 1; NULL fills to '' -> 1
    assert out["n_tokens"].to_pylist() == [2, 1, 1, 1]


# --- pack_sequences ----------------------------------------------------------


def test_pack_sequences_budget_boundary():
    # group g: doc 1 has 4 tokens, doc 2 has 4, doc 3 has 1; budget 4
    # offsets: 0, 4, 8 -> seq ids 0, 1, 2 (doc starting exactly at the
    # boundary opens the next sequence)
    ds = _docs(
        {
            "doc_id": [1, 2, 3],
            "source": ["g", "g", "g"],
            "text": ["a b c d", "e f g h", "i"],
        }
    )
    out = (
        pack_sequences(ds, budget=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["tok_offset"].tolist() == [0, 4, 8]
    assert out["seq_id"].tolist() == [0, 1, 2]


def test_pack_sequences_groups_independent_and_order_col():
    ds = _docs(
        {
            "doc_id": [10, 11, 20, 21],
            "source": ["a", "a", "b", "b"],
            "text": ["w x y", "z", "p q", "r s t u v"],
        }
    )
    out = pack_sequences(ds, budget=3).to_pandas().set_index("doc_id")
    # each group restarts at offset 0
    assert out.loc[10, "tok_offset"] == 0 and out.loc[20, "tok_offset"] == 0
    assert out.loc[11, "tok_offset"] == 3 and out.loc[11, "seq_id"] == 1
    assert out.loc[21, "tok_offset"] == 2 and out.loc[21, "seq_id"] == 0


def test_pack_sequences_precomputed_token_col():
    ds = _docs({"doc_id": [1, 2], "source": ["g", "g"], "n_tok": [5, 7]})
    out = (
        pack_sequences(ds, budget=6, token_col="n_tok")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["n_tokens"].tolist() == [5, 7]
    assert out["tok_offset"].tolist() == [0, 5]
    assert out["seq_id"].tolist() == [0, 0]


def test_pack_sequences_rejects_bad_budget():
    ds = _docs({"doc_id": [1], "source": ["g"], "text": ["a"]})
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(ds, budget=0)


# --- filter_blocked_words ----------------------------------------------------


def test_filter_blocked_words_exact_token_match_only():
    ds = _docs(
        {
            "doc_id": [1, 2, 3],
            "source": ["s"] * 3,
            "text": ["clean words here", "has badword inside", "badwords plural ok"],
        }
    )
    out = filter_blocked_words(ds, ["badword"]).to_pandas()
    # substring "badwords" must NOT match (token-exact semantics)
    assert sorted(out["doc_id"].tolist()) == [1, 3]
    assert "text" not in out.columns
    assert out.set_index("doc_id").loc[3, "n_tokens"] == 3


def test_filter_blocked_words_empty_blocklist_keeps_all():
    ds = _docs({"doc_id": [1, 2], "source": ["s", "s"], "text": ["a", "b c"]})
    out = filter_blocked_words(ds, []).to_pandas()
    assert len(out) == 2


# --- unigram LM scoring ------------------------------------------------------


def test_unigram_counts_sum_to_corpus_tokens():
    ds = _docs({"doc_id": [1, 2], "text": ["a b a", "b c"]})
    counts = unigram_counts(ds).to_pandas().set_index("token")["n"]
    assert counts.to_dict() == {"a": 2, "b": 2, "c": 1}


def test_score_unigram_logprob_self_trained_exact():
    ds = _docs({"doc_id": [1, 2], "text": ["a b a", "b c"]})
    out = score_unigram_logprob(ds).to_pandas().set_index("doc_id")
    # corpus: a=2, b=2, c=1, total=5
    exp1 = (2 * math.log(2 / 5) + math.log(2 / 5)) / 3
    exp2 = (math.log(2 / 5) + math.log(1 / 5)) / 2
    assert out.loc[1, "avg_logprob"] == pytest.approx(exp1)
    assert out.loc[2, "avg_logprob"] == pytest.approx(exp2)
    assert out.loc[1, "n_tokens"] == 3


def test_score_unigram_logprob_external_lm_and_oov():
    ds = _docs({"doc_id": [1], "text": ["known unknown"]})
    lm = rd.from_arrow(
        pa.table({"token": ["known"], "n": pa.array([4], type=pa.int64())})
    )
    out = score_unigram_logprob(ds, counts=lm, oov_logprob=-9.0).to_pandas()
    # known: ln(4/4)=0; unknown: -9.0 -> mean -4.5
    assert out["avg_logprob"][0] == pytest.approx(-4.5)


# --- repetition signals (Gopher) ---------------------------------------------


def test_repetition_signals_hand_computed():
    from ai_service_ocr_grading_handler_ray.stages.text_analysis import (
        repetition_signals,
    )

    ds = _docs(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a a a b",      # top=3/4, dup=3/4; 2grams: [a a, a a, a b] -> dup 2/3
                "x y z",         # no repetition at all
                "solo",          # single token: no 2-grams -> 0.0
            ],
        }
    )
    out = repetition_signals(ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "frac_top_word"] == pytest.approx(0.75)
    assert out.loc[1, "frac_dup_words"] == pytest.approx(0.75)
    assert out.loc[1, "frac_dup_2grams"] == pytest.approx(2 / 3)
    assert out.loc[2, "frac_top_word"] == pytest.approx(1 / 3)
    assert out.loc[2, "frac_dup_words"] == 0.0
    assert out.loc[2, "frac_dup_2grams"] == 0.0
    assert out.loc[3, "n_tokens"] == 1
    assert out.loc[3, "frac_dup_2grams"] == 0.0


def test_repetition_signals_batch_boundaries_do_not_leak():
    from ai_service_ocr_grading_handler_ray.stages.text_analysis import (
        repetition_signals,
    )

    # two docs sharing vocabulary must not pollute each other's counts
    # even inside one batch (per-doc grouping is keyed by doc position)
    ds = _docs({"doc_id": [1, 2], "text": ["a b", "a b"]})
    out = repetition_signals(ds).to_pandas()
    assert (out["frac_dup_words"] == 0.0).all()
    assert (out["frac_dup_2grams"] == 0.0).all()


# --- DSIR importance weights -------------------------------------------------


def test_dsir_weights_hand_computed():
    from ai_service_ocr_grading_handler_ray.stages.text_analysis import (
        dsir_importance_weights,
    )

    # raw corpus: a=2, b=1, c=1 (total 4); target: a=1, b=1 (total 2)
    docs = _docs({"doc_id": [1, 2], "text": ["a b", "a c"]})
    target = _docs({"doc_id": [1], "text": ["a b"]})
    out = dsir_importance_weights(docs, target).to_pandas().set_index("doc_id")
    w1 = (
        (math.log(1 / 2) - math.log(2 / 4)) + (math.log(1 / 2) - math.log(1 / 4))
    ) / 2
    # c is OOV in target -> ln(0.5/2)
    w2 = (
        (math.log(1 / 2) - math.log(2 / 4))
        + (math.log(0.5 / 2) - math.log(1 / 4))
    ) / 2
    assert out.loc[1, "dsir_weight"] == pytest.approx(w1)
    assert out.loc[2, "dsir_weight"] == pytest.approx(w2)


def test_dsir_target_docs_rank_higher():
    from ai_service_ocr_grading_handler_ray.stages.text_analysis import (
        dsir_importance_weights,
    )

    docs = _docs(
        {
            "doc_id": [1, 2],
            "text": ["shared english words here", "completamente otro idioma aqui"],
        }
    )
    target = _docs({"doc_id": [1], "text": ["shared english words here"]})
    out = dsir_importance_weights(docs, target).to_pandas().set_index("doc_id")
    assert out.loc[1, "dsir_weight"] > out.loc[2, "dsir_weight"]


# --- keep-first segment dedup --------------------------------------------------


def test_segment_dedup_keep_first_semantics():
    from ai_service_ocr_grading_handler_ray.stages.clean import (
        dedup_segments_keep_first,
    )

    ds = _docs(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a b c d",       # segments: "a b", "c d" — doc 1 keeps both
                "a b x y",       # "a b" lost to doc 1, keeps "x y"
                "a b c d",       # both segments lost -> doc dropped
            ],
        }
    )
    out = dedup_segments_keep_first(ds, words_per_seg=2).to_pandas().set_index(
        "doc_id"
    )
    assert sorted(out.index.tolist()) == [1, 2]
    assert out.loc[1, "text_clean"] == "a b c d"
    assert out.loc[2, "text_clean"] == "x y"
    assert out.loc[2, "n_segs_kept"] == 1


def test_segment_dedup_within_doc_duplicates_kept_in_keeper():
    from ai_service_ocr_grading_handler_ray.stages.clean import (
        dedup_segments_keep_first,
    )

    # "a b" twice inside the keeper doc: both occurrences stay
    ds = _docs({"doc_id": [5, 9], "text": ["a b a b", "a b z z"]})
    out = dedup_segments_keep_first(ds, words_per_seg=2).to_pandas().set_index(
        "doc_id"
    )
    assert out.loc[5, "text_clean"] == "a b a b"
    assert out.loc[9, "text_clean"] == "z z"


# --- fused quality filter ------------------------------------------------------


def test_fused_quality_filter_matches_component_ops():
    from ai_service_ocr_grading_handler_ray.stages.text_analysis import (
        fused_quality_filter,
        repetition_signals,
        score_unigram_logprob,
    )

    rows = {
        "doc_id": [1, 2, 3],
        "text": ["a b c d e f", "x x x x", "one two three four five six"],
    }
    fused = fused_quality_filter(_docs(rows)).to_pandas().set_index("doc_id")
    rep = repetition_signals(_docs(rows)).to_pandas().set_index("doc_id")
    lm = score_unigram_logprob(_docs(rows)).to_pandas().set_index("doc_id")
    for d in (1, 2, 3):
        assert fused.loc[d, "frac_dup_words"] == pytest.approx(
            rep.loc[d, "frac_dup_words"]
        )
        assert fused.loc[d, "frac_top_word"] == pytest.approx(
            rep.loc[d, "frac_top_word"]
        )
        assert fused.loc[d, "avg_logprob"] == pytest.approx(
            lm.loc[d, "avg_logprob"]
        )


def test_fused_quality_filter_verdict_thresholds():
    from ai_service_ocr_grading_handler_ray.stages.text_analysis import (
        fused_quality_filter,
    )

    rows = {"doc_id": [1, 2], "text": ["a b c", "x x x x x"]}
    out = (
        fused_quality_filter(
            _docs(rows), min_tokens=3, max_tokens=4, max_frac_dup_words=0.5
        )
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "keep"] == 1          # 3 tokens, no dups
    assert out.loc[2, "keep"] == 0          # 5 tokens > max AND all-dup
    assert out["keep"].dtype.kind == "i"    # 0/1 int64, auditable column


# --- token-quota corpus mixing -------------------------------------------------


def test_select_token_quota_uniform():
    from ai_service_ocr_grading_handler_ray.stages.packing import select_token_quota

    ds = _docs(
        {
            "doc_id": [1, 2, 3],
            "source": ["g", "g", "g"],
            "text": ["a b c", "d e f", "g h i"],  # 3 tokens each
        }
    )
    # quota 6: offsets 0, 3, 6 -> doc 3 starts AT the quota -> excluded
    out = select_token_quota(ds, 6).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [1, 2]
    assert out["tok_offset"].tolist() == [0, 3]


def test_select_token_quota_dict_and_missing_group_excluded():
    from ai_service_ocr_grading_handler_ray.stages.packing import select_token_quota

    ds = _docs(
        {
            "doc_id": [1, 2, 3],
            "source": ["a", "a", "b"],
            "text": ["w x", "y z", "p q"],
        }
    )
    out = (
        select_token_quota(ds, {"a": 3})
        .to_pandas()
        .sort_values("doc_id")
    )
    # source b absent from dict -> quota 0 -> excluded entirely
    assert out["doc_id"].tolist() == [1, 2]
    assert out[out["doc_id"] == 2]["tok_offset"].tolist() == [2]


def test_segment_dedup_join_path_equivalent_to_broadcast():
    from ai_service_ocr_grading_handler_ray.stages.clean import (
        dedup_segments_keep_first,
    )

    rows = {
        "doc_id": [3, 1, 7, 2, 9],
        "text": [
            "a b c d a b",
            "c d e f",
            "a b x y z w",
            "e f e f",
            "q r s t",
        ],
    }
    got = {}
    for method in ("broadcast", "join"):
        got[method] = (
            dedup_segments_keep_first(_docs(rows), words_per_seg=2, method=method)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    assert got["broadcast"].equals(got["join"])
    # spot-check the rule itself: "c d" belongs to doc 1 (min id), so doc
    # 3 keeps only its "a b ... a b" occurrences ("a b" min doc is 3)
    b = got["broadcast"].set_index("doc_id")
    assert b.loc[3, "text_clean"] == "a b a b"
    assert b.loc[1, "text_clean"] == "c d e f"


def test_segment_dedup_auto_picks_broadcast_under_cap():
    from ai_service_ocr_grading_handler_ray.stages.clean import (
        dedup_segments_keep_first,
    )

    ds = _docs({"doc_id": [1, 2], "text": ["a b", "a b"]})
    out = dedup_segments_keep_first(ds, method="auto").to_pandas()
    assert out["doc_id"].tolist() == [1]


def test_remove_frequent_segments_bloom_superset_of_exact():
    import pandas as pd

    from ai_service_ocr_grading_handler_ray.stages.clean import (
        remove_frequent_segments,
    )

    rows = {
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "nav bar body one here",
            "nav bar body two there",
            "nav bar body three also",
            "nav bar",
            "unique standalone content piece",
        ],
    }
    exact = (
        remove_frequent_segments(_docs(rows), min_docs=4, words_per_seg=2)
        .to_pandas()
        .set_index("doc_id")
    )
    bloom = (
        remove_frequent_segments(
            _docs(rows), min_docs=4, words_per_seg=2, method="bloom"
        )
        .to_pandas()
        .set_index("doc_id")
    )
    # bloom removal is a superset: every bloom survivor's segments
    # appear in the exact survivor for the same doc, never vice versa
    assert set(bloom.index) <= set(exact.index)
    for d in bloom.index:
        b_segs = bloom.loc[d, "text_clean"].split(" ")
        e_segs = exact.loc[d, "text_clean"].split(" ")
        assert set(b_segs) <= set(e_segs) | {""}
    # at this corpus size + fp 0.001 the two are in fact identical
    pd.testing.assert_frame_equal(exact, bloom)


def test_score_unigram_join_path_equivalent_to_broadcast(sf_dir):
    out = {}
    for method in ("broadcast", "join"):
        out[method] = (
            score_unigram_logprob(
                rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]),
                method=method,
            )
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    b, j = out["broadcast"], out["join"]
    assert b["doc_id"].tolist() == j["doc_id"].tolist()
    assert b["n_tokens"].tolist() == j["n_tokens"].tolist()
    # summation order differs between the two plans -> approx, not exact
    np.testing.assert_allclose(
        b["avg_logprob"].to_numpy(), j["avg_logprob"].to_numpy(), rtol=1e-12
    )


def test_score_unigram_join_path_oov_floor():
    lm = rd.from_arrow(
        pa.table({"token": ["known"], "n": pa.array([4], type=pa.int64())})
    )
    ds = _docs({"doc_id": [1], "text": ["known unknown"]})
    out = score_unigram_logprob(
        ds, counts=lm, oov_logprob=-9.0, method="join"
    ).to_pandas()
    assert out["avg_logprob"][0] == pytest.approx(-4.5)


# --- lpt_shard_assign ----------------------------------------------------


def test_lpt_balance_and_determinism(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.packing import lpt_shard_assign

    rng = np.random.default_rng(8)
    groups = [f"s{i:02d}" for i in range(30)]
    df = pd.DataFrame(
        {
            "g": np.repeat(groups, 10),
            "w": rng.integers(1, 1000, 300),
        }
    )
    out = lpt_shard_assign(
        rd.from_pandas(df).repartition(5), group_col="g", weight_col="w",
        n_shards=4,
    )
    # every group assigned exactly once, shards in range
    assert sorted(out.g) == groups
    assert set(out.shard) <= {0, 1, 2, 3}
    # per-group totals correct
    exp = df.groupby("g")["w"].sum()
    for r in out.itertuples():
        assert r.w == exp[r.g]
    # LPT balance: max load - min load <= max single group weight
    loads = out.groupby("shard")["w"].sum()
    assert loads.max() - loads.min() <= out.w.max()
    # deterministic
    out2 = lpt_shard_assign(
        rd.from_pandas(df).repartition(2), group_col="g", weight_col="w",
        n_shards=4,
    )
    pd.testing.assert_frame_equal(out, out2)


def test_lpt_hand_case(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.packing import lpt_shard_assign

    # LPT trace for weights 7,5,4,3,3 into 2 shards:
    # a(7)->s0, b(5)->s1, c(4)->s1 (5<7 -> 9), d(3)->s0 (7<9 -> 10),
    # e(3)->s1 (9<10 -> 12)
    df = pd.DataFrame(
        {"g": ["a", "b", "c", "d", "e"], "w": [7, 5, 4, 3, 3]}
    )
    out = lpt_shard_assign(
        rd.from_pandas(df), group_col="g", weight_col="w", n_shards=2
    ).set_index("g")
    assert dict(out.shard) == {"a": 0, "b": 1, "c": 1, "d": 0, "e": 1}
    assert dict(out.shard_total) == {"a": 10, "b": 12, "c": 12, "d": 10, "e": 12}
