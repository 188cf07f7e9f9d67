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
