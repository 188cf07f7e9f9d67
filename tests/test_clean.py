"""PII redaction, URL canonicalization, repetition ratio."""

import pyarrow as pa

from ai_service_ocr_grading_handler_ray.stages.clean import (
    add_canonical_url,
    add_redacted,
    normalize_url,
    redact_pii,
    repetition_ratio,
)


class TestRedaction:
    def test_email(self):
        assert redact_pii("mail me at jo.doe+x@mail.example.org please") == (
            "mail me at <EMAIL> please"
        )

    def test_phone(self):
        assert redact_pii("call +1 (555) 123-4567 now") == "call <PHONE> now"

    def test_ip(self):
        assert redact_pii("server at 192.168.001.1 down") == "server at <IP> down"

    def test_mixed_and_clean_text_unchanged(self):
        s = "no pii here just words and numbers like 42"
        assert redact_pii(s) == s
        out = redact_pii("a@b.co or 555-123-9876 or 10.0.0.1")
        assert out == "<EMAIL> or <PHONE> or <IP>"

    def test_batch(self):
        b = pa.table({"text": ["x@y.io", None]})
        out = add_redacted(b)
        assert out["redacted"].to_pylist() == ["<EMAIL>", ""]


class TestUrlNormalize:
    def test_canonical_rules(self):
        assert (
            normalize_url("HTTPS://Example.COM:443/Path/?utm_source=x&b=2&a=1#frag")
            == "https://example.com/Path?a=1&b=2"
        )

    def test_trailing_slash_and_root(self):
        assert normalize_url("http://a.com/x/") == "http://a.com/x"
        assert normalize_url("http://a.com") == "http://a.com/"

    def test_idempotent(self):
        u = "https://example.com/path?a=1"
        assert normalize_url(normalize_url(u)) == normalize_url(u)

    def test_batch(self):
        b = pa.table({"url": ["HTTP://A.com/p/?fbclid=zz"]})
        out = add_canonical_url(b)
        assert out["canonical_url"].to_pylist() == ["http://a.com/p"]


class TestRepetition:
    def test_no_repeats(self):
        assert repetition_ratio("one two three four five six") == 0.0

    def test_full_loop(self):
        r = repetition_ratio("spam ham eggs " * 50)
        assert r > 0.9

    def test_short_text(self):
        assert repetition_ratio("ab") == 0.0


class TestFrequentSegments:
    def _corpus(self):
        import ray.data as rd

        # "cookie banner" boilerplate segment in 4 of 5 docs
        rows = {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "cookie banner unique one text here",
                "cookie banner unique two more words",
                "cookie banner unique three extra stuff",
                "cookie banner",  # fully boilerplate -> dropped
                "totally different document body",
            ],
        }
        return rd.from_arrow(pa.table(rows))

    def test_doc_frequency_counts(self):
        from ai_service_ocr_grading_handler_ray.stages.clean import segment_doc_frequency

        freq = (
            segment_doc_frequency(self._corpus(), words_per_seg=2)
            .to_pandas()
            .set_index("segment")["n_docs"]
        )
        assert freq["cookie banner"] == 4
        assert freq["totally different"] == 1

    def test_remove_and_reassemble(self):
        from ai_service_ocr_grading_handler_ray.stages.clean import remove_frequent_segments

        out = (
            remove_frequent_segments(self._corpus(), min_docs=4, words_per_seg=2)
            .to_pandas()
            .set_index("doc_id")
        )
        # doc 4 was pure boilerplate -> dropped entirely
        assert sorted(out.index.tolist()) == [1, 2, 3, 5]
        # surviving segments keep their order
        assert out.loc[1, "text_clean"] == "unique one text here"
        assert out.loc[1, "n_segs_kept"] == 2
        assert out.loc[5, "text_clean"] == "totally different document body"

    def test_segmentation_tail_and_empty(self):
        from ai_service_ocr_grading_handler_ray.stages.clean import _doc_segments

        assert _doc_segments("a b c d e", 2) == ["a b", "c d", "e"]
        assert _doc_segments("", 2) == [""]  # matches SQL string_split('')
        assert _doc_segments("one", 3) == ["one"]


def test_within_doc_segment_dedup():
    import pandas as pd
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.clean import dedup_segments_within_doc

    texts = [
        "a b a b c d a b",   # segs(2): 'a b','a b','c d','a b' → keep 'a b','c d'
        "x y z",             # segs: 'x y','z' → unchanged
        "",                  # '' → one empty segment kept
        "p p p p",           # 'p p','p p' → one kept
    ]
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ).repartition(2)
    got = (
        dedup_segments_within_doc(ds, words_per_seg=2)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(got["text_clean"]) == ["a b c d", "x y z", "", "p p"]
    assert list(got["n_segs_kept"]) == [2, 2, 1, 1]


def test_remove_frequent_segments_string_ids():
    """String doc ids flow through both rewrite paths unchanged — the
    rewriters force-cast the id column to int64 (ADVICE r3) even though
    the rest of the dedup surface is string-id aware."""
    import pandas as pd
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.clean import remove_frequent_segments

    rows = pd.DataFrame(
        {
            "doc_id": [f"url://{i}" for i in range(5)],
            "text": [
                "cookie banner unique one text here",
                "cookie banner unique two more words",
                "cookie banner unique three extra stuff",
                "cookie banner",
                "totally different document body",
            ],
        }
    )
    for method in ("broadcast", "bloom"):
        out = remove_frequent_segments(
            rd.from_pandas(rows), min_docs=4, words_per_seg=2, method=method
        ).to_pandas()
        assert sorted(out["doc_id"]) == [f"url://{i}" for i in [0, 1, 2, 4]]
        assert out["doc_id"].dtype == object


# --- C4 line-level filter ----------------------------------------------------


class TestC4LineFilter:
    def _run(self, texts, **kw):
        import ray.data as rd
        from ai_service_ocr_grading_handler_ray.stages.clean import c4_line_filter

        ds = rd.from_arrow(
            pa.table({"doc_id": list(range(len(texts))), "text": texts})
        )
        df = c4_line_filter(ds, **kw).to_pandas()
        return df.set_index("doc_id") if len(df) else df

    def test_rules(self):
        out = self._run(
            [
                # kept: >=5 words, ends '.', no blocked substring
                "this line is long enough.\nshort one.\nno terminal here at all",
                # javascript (case-insensitive) blocked even when well-formed
                "Please enable JavaScript to view this page.",
                # lorem ipsum blocked; '{' blocked; good line survives
                "Lorem Ipsum dolor sit amet and more.\nvar x = { a: 1 };\n"
                "a perfectly good closing sentence stands here!",
            ],
            min_words=5,
        )
        assert out.loc[0, "text"] == "this line is long enough."
        assert out.loc[0, "n_lines"] == 3 and out.loc[0, "n_kept"] == 1
        assert 1 not in out.index  # zero kept lines -> doc dropped
        assert out.loc[2, "text"] == "a perfectly good closing sentence stands here!"

    def test_strip_and_terminal_chars(self):
        out = self._run(
            ['  does trailing quote count as terminal "\n\tand a question mark too ?  '],
            min_words=5,
        )
        # lines are stripped before every check; kept lines re-join stripped
        assert out.loc[0, "n_kept"] == 2
        assert out.loc[0, "text"] == (
            'does trailing quote count as terminal "\nand a question mark too ?'
        )

    def test_min_kept_lines_doc_gate(self):
        texts = ["one good sentence right here ok.\nanother good sentence follows it now."]
        assert len(self._run(texts, min_words=5, min_kept_lines=3)) == 0
        assert len(self._run(texts, min_words=5, min_kept_lines=2)) == 1

    def test_empty_and_null_text(self):
        import ray.data as rd
        from ai_service_ocr_grading_handler_ray.stages.clean import c4_line_filter

        ds = rd.from_arrow(
            pa.table({"doc_id": [0, 1], "text": pa.array(["", None], type=pa.string())})
        )
        assert c4_line_filter(ds).count() == 0


# --- double-encoding repair --------------------------------------------------


class TestFixDoubleEncoding:
    def test_latin1_and_cp1252_roundtrip(self):
        from ai_service_ocr_grading_handler_ray.stages.clean import fix_double_encoding

        # (no U+201D: its UTF-8 has byte 0x9D, unmapped in cp1252 — such
        # garble arrives via the latin-1 read path instead)
        for clean in ["café résumé naïve", "price — it’s ‘fine’", "über straße"]:
            moj = clean.encode("utf-8").decode("cp1252")
            assert fix_double_encoding(moj) == (clean, True)
        moj = "café".encode("utf-8").decode("latin-1")
        assert fix_double_encoding(moj) == ("café", True)

    def test_clean_text_untouched(self):
        from ai_service_ocr_grading_handler_ray.stages.clean import fix_double_encoding

        for s in ["plain ascii.", "clean café text", "Ãx not a continuation", ""]:
            assert fix_double_encoding(s) == (s, False)

    def test_invalid_utf8_left_unchanged(self):
        from ai_service_ocr_grading_handler_ray.stages.clean import fix_double_encoding

        # signature present but the re-encoded bytes are not valid UTF-8
        # (C3 A9 then a bare C3 lead byte) — repair must refuse, not corrupt
        s = "Ã©Ã"
        assert fix_double_encoding(s) == (s, False)

    def test_batch_kernel(self):
        import ray.data as rd
        from ai_service_ocr_grading_handler_ray.stages.clean import add_fixed_encoding

        clean = "café and résumé — done."
        moj = clean.encode("utf-8").decode("cp1252")
        ds = rd.from_arrow(
            pa.table({"doc_id": [0, 1], "text": [moj, "plain text."]})
        ).map_batches(add_fixed_encoding, batch_format="pyarrow")
        df = ds.to_pandas().set_index("doc_id")
        assert df.loc[0, "text"] == clean and bool(df.loc[0, "fixed"])
        assert df.loc[1, "text"] == "plain text." and not df.loc[1, "fixed"]


# --- k-anonymity suppression -------------------------------------------------


class TestKAnonymity:
    def test_small_groups_dropped(self):
        import pandas as pd
        import ray.data as rd
        from ai_service_ocr_grading_handler_ray.stages.clean import (
            suppress_small_groups,
        )

        df = pd.DataFrame(
            {
                "id": range(10),
                "a": ["x"] * 6 + ["y"] * 3 + ["z"],
                "b": ["1"] * 6 + ["1"] * 3 + ["1"],
            }
        )
        out = suppress_small_groups(
            rd.from_pandas(df).repartition(3), group_cols=["a", "b"], k=3
        ).to_pandas()
        assert set(out.a) == {"x", "y"}  # z (n=1) suppressed
        assert len(out) == 9

    def test_composite_key_no_collision(self):
        import pandas as pd
        import ray.data as rd
        from ai_service_ocr_grading_handler_ray.stages.clean import (
            suppress_small_groups,
        )

        # ('a','bc') must not merge with ('ab','c')
        df = pd.DataFrame(
            {"x": ["a", "a", "ab"], "y": ["bc", "bc", "c"]}
        )
        out = suppress_small_groups(
            rd.from_pandas(df), group_cols=["x", "y"], k=2
        ).to_pandas()
        assert len(out) == 2 and set(out.x) == {"a"}


def test_k_anonymity_null_group_raises():
    import pandas as pd
    import pytest
    import ray.data as rd
    from ai_service_ocr_grading_handler_ray.stages.clean import (
        suppress_small_groups,
    )

    df = pd.DataFrame({"a": ["x", None], "b": ["1", "1"]})
    with pytest.raises(Exception, match="NULL in k-anonymity"):
        suppress_small_groups(rd.from_pandas(df), group_cols=["a", "b"], k=1).to_pandas()
