"""Unit tests: boilerplate stripper on hand-built DOM fixtures
(SURVEY.md §5 item 1 — nav/footer/link-farm vs content blocks)."""

from ai_service_ocr_grading_handler_ray.stages.html_extract import extract_html

CONTENT_A = "This is the first real paragraph of the article with enough characters."
CONTENT_B = "A second substantive paragraph that should also survive the classifier."


def test_keeps_content_drops_nav_footer():
    html = f"""
    <html><head><title>T</title><script>var x=1;</script></head><body>
    <nav><a href="/">Home</a> <a href="/news">News</a> <a href="/sports">Sports and recreation section</a></nav>
    <article><p>{CONTENT_A}</p><p>{CONTENT_B}</p></article>
    <footer><p>Copyright 2024 example.com all rights reserved worldwide</p></footer>
    </body></html>"""
    text, n = extract_html(html)
    assert text == f"{CONTENT_A}\n\n{CONTENT_B}"
    assert n == 2


def test_drops_link_farm_by_link_density():
    farm = " ".join(f'<a href="/{i}">interesting link number {i}</a>' for i in range(10))
    html = f"<body><div>{farm}</div><p>{CONTENT_A}</p></body>"
    text, n = extract_html(html)
    assert text == CONTENT_A
    assert n == 1


def test_drops_short_blocks():
    html = f"<body><p>tiny</p><p>{CONTENT_A}</p></body>"
    text, _ = extract_html(html)
    assert text == CONTENT_A


def test_drops_boilerplate_by_class():
    html = (
        f'<body><div class="sidebar-widget"><p>{CONTENT_A}</p></div>'
        f"<p>{CONTENT_B}</p></body>"
    )
    text, _ = extract_html(html)
    assert text == CONTENT_B


def test_moderate_inline_links_kept():
    html = (
        f'<body><p>{CONTENT_A} See <a href="/x">this page</a> for details '
        f"about the subject at hand.</p></body>"
    )
    text, n = extract_html(html)
    assert n == 1
    assert "See this page for details" in text


def test_whitespace_normalized_and_entities():
    html = "<body><p>Alpha&amp;Beta   with\n\n   spaced   out words making it long enough</p></body>"
    text, _ = extract_html(html)
    assert text == "Alpha&Beta with spaced out words making it long enough"


def test_malformed_html_never_raises():
    text, n = extract_html(b"<div><p>unclosed " + bytes([0xFF, 0xFE]) + b" tail")
    assert isinstance(text, str) and n >= 0


def test_empty_input():
    assert extract_html(b"") == ("", 0)


def test_deterministic():
    html = f"<body><p>{CONTENT_A}</p><div class='menu'><a href='/'>m</a></div></body>"
    assert extract_html(html) == extract_html(html)


def test_fast_engine_equivalent_on_corpus():
    """The regex-scanner tokenizer must produce byte-identical output to
    the stdlib html.parser path over every synthetic html page."""
    import pyarrow.parquet as pq

    from ai_service_ocr_grading_handler_ray.stages.classify import classify_payload_kind
    from ai_service_ocr_grading_handler_ray.stages.html_extract import (
        extract_html_fast,
        extract_html_with_title,
    )
    from ai_service_ocr_grading_handler_ray.synth import docs_to_pages

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    pages = classify_payload_kind(docs_to_pages(docs))
    n = 0
    for payload, kind in zip(pages["html"].to_pylist(), pages["payload_kind"].to_pylist()):
        if kind == "html":
            assert extract_html_fast(payload) == extract_html_with_title(payload)
            n += 1
    assert n > 390


def test_fast_engine_handles_tricky_html():
    from ai_service_ocr_grading_handler_ray.stages.html_extract import (
        extract_html_fast,
        extract_html_with_title,
    )

    tricky = (
        '<html><head><title>T &amp; U</title><script>if (a<b) { x="</p>"; }</script>'
        "</head><body><!-- comment with <p>fake</p> -->"
        f"<p>{CONTENT_A}</p>"
        f'<div class="related-promo"><p>{CONTENT_B}</p></div>'
        f"<p>Entity test &lt;tag&gt; and &quot;quotes&quot; inside a long paragraph here.</p>"
        "</body></html>"
    )
    fast = extract_html_fast(tricky)
    std = extract_html_with_title(tricky)
    assert fast == std
    assert fast[2] == "T & U"
    assert CONTENT_B not in fast[0]  # promo class dropped
    assert "<tag>" in fast[0]  # entities decoded
