"""Unicode canonicalization (stages/clean.normalize_unicode)."""

import pyarrow as pa

from ai_service_ocr_grading_handler_ray.stages.clean import (
    add_normalized_text,
    normalize_unicode,
)


def test_combining_sequence_composes():
    assert normalize_unicode("é") == "é"          # é
    assert normalize_unicode("Ä") == "Ä"          # Ä


def test_compatibility_singleton_folds():
    assert normalize_unicode("Å") == "Å"           # Å (angstrom)


def test_controls_stripped_but_layout_whitespace_kept():
    assert normalize_unicode("a\x07b\tc\nd\x00e\x7ff") == "ab\tc\nd" + "ef"


def test_nfc_runs_before_strip():
    # a control BETWEEN base and combining mark blocks composition, so
    # the output stays DECOMPOSED (e + U+0301); stripping first would
    # have composed to U+00E9 — pins the NFC-then-strip order
    assert normalize_unicode("e\x07\u0301") == "e\u0301"
    assert normalize_unicode("e\x07\u0301") != "\u00e9"


def test_empty_and_none_safe():
    assert normalize_unicode("") == ""
    assert normalize_unicode(None) == ""


def test_already_canonical_text_unchanged():
    s = "plain ascii text 123"
    assert normalize_unicode(s) == s


def test_batch_wrapper_counts_codepoints():
    t = pa.table({"doc_id": [1], "text": ["é\x07x"]})
    out = add_normalized_text(t)
    assert out["text_norm"][0].as_py() == "éx"
    assert out["n_cp_raw"][0].as_py() == 4
    assert out["n_cp_norm"][0].as_py() == 2
