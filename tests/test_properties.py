"""Property-based tests (hypothesis): extractor totality/determinism,
XY-cut round-trips, codec round-trips, minhash similarity bounds."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from ai_service_ocr_grading_handler_ray.payloads import (
    decode_image_text,
    decode_pdf_glyphs,
    encode_image_text,
    encode_pdf_glyphs,
    layout_text_as_glyphs,
)
from ai_service_ocr_grading_handler_ray.stages.dedup import minhash_signature, ngram_jaccard
from ai_service_ocr_grading_handler_ray.stages.html_extract import extract_html
from ai_service_ocr_grading_handler_ray.stages.pdf_layout import parse_pdf_layout

words = st.lists(
    st.text(alphabet=string.ascii_lowercase + string.digits, min_size=1, max_size=10),
    min_size=0,
    max_size=120,
).map(" ".join)


@given(st.binary(max_size=2048))
@settings(max_examples=200, deadline=None)
def test_extract_html_total_on_arbitrary_bytes(payload):
    """The HTML extractor never raises and is deterministic on ANY bytes."""
    a = extract_html(payload)
    b = extract_html(payload)
    assert a == b
    assert isinstance(a[0], str) and a[1] >= 0


@given(words)
@settings(max_examples=100, deadline=None)
def test_pdf_layout_roundtrip(text):
    """layout → XY-cut parse recovers the exact word sequence."""
    glyphs = layout_text_as_glyphs(text)
    recovered, _ = parse_pdf_layout(glyphs)
    assert " ".join(recovered.split()) == " ".join(text.split())


@given(words)
@settings(max_examples=100, deadline=None)
def test_codecs_roundtrip(text):
    assert decode_image_text(encode_image_text(text)) == text
    glyphs = layout_text_as_glyphs(text, columns=1)
    assert decode_pdf_glyphs(encode_pdf_glyphs(glyphs)) == glyphs


@given(words, words)
@settings(max_examples=50, deadline=None)
def test_jaccard_bounds_and_symmetry(a, b):
    j = ngram_jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == ngram_jaccard(b, a)
    assert ngram_jaccard(a, a) == 1.0


@given(words)
@settings(max_examples=50, deadline=None)
def test_minhash_signature_shape(text):
    sig = minhash_signature(text)
    assert sig.shape == (64,)
    assert (minhash_signature(text) == sig).all()


@given(st.binary(max_size=2048))
@settings(max_examples=200, deadline=None)
def test_fast_extractor_total_on_arbitrary_bytes(payload):
    from ai_service_ocr_grading_handler_ray.stages.html_extract import extract_html_fast

    a = extract_html_fast(payload)
    assert a == extract_html_fast(payload)
    assert isinstance(a[0], str) and a[1] >= 0
