"""XY-cut layout parser on synthetic glyph boxes (SURVEY.md §5 item 1)."""

from ai_service_ocr_grading_handler_ray.payloads import (
    decode_pdf_glyphs,
    encode_pdf_glyphs,
    layout_text_as_glyphs,
)
from ai_service_ocr_grading_handler_ray.stages.pdf_layout import (
    block_to_text,
    parse_pdf_layout,
    xy_cut_blocks,
)


def _glyph_line(text: str, x0: int = 0, y0: int = 0, w: int = 6, h: int = 10):
    out = []
    for i, ch in enumerate(text):
        if ch != " ":
            out.append((x0 + i * w, y0, w, h, ch))
    return out


def test_single_line_roundtrip():
    glyphs = _glyph_line("hello world")
    text, n = parse_pdf_layout(glyphs)
    assert text == "hello world"
    assert n == 1


def test_two_columns_read_left_column_first():
    # left column: two lines; right column (x offset 300): two lines
    glyphs = (
        _glyph_line("left one", 0, 0)
        + _glyph_line("left two", 0, 12)
        + _glyph_line("right one", 300, 0)
        + _glyph_line("right two", 300, 12)
    )
    blocks = xy_cut_blocks(glyphs)
    assert len(blocks) == 2
    assert block_to_text(blocks[0]) == "left one\nleft two"
    assert block_to_text(blocks[1]) == "right one\nright two"


def test_vertical_band_split_before_columns():
    top = _glyph_line("top band", 0, 0)
    bottom_l = _glyph_line("bot left", 0, 100)
    bottom_r = _glyph_line("bot right", 300, 100)
    text, n = parse_pdf_layout(top + bottom_l + bottom_r)
    assert text == "top band\n\nbot left\n\nbot right"
    assert n == 3


def test_layout_roundtrip_column_major():
    # Long text laid out in 2 columns must come back in original word order.
    words = " ".join(f"word{i:03d}" for i in range(300))
    glyphs = layout_text_as_glyphs(words)
    text, _ = parse_pdf_layout(glyphs)
    assert " ".join(text.split()) == words


def test_codec_roundtrip():
    glyphs = layout_text_as_glyphs("alpha beta gamma delta")
    payload = encode_pdf_glyphs(glyphs)
    assert payload.startswith(b"%PDF-")
    assert decode_pdf_glyphs(payload) == glyphs


def test_empty():
    assert parse_pdf_layout([]) == ("", 0)
