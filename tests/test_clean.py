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
