"""Payload-kind sniffing (SURVEY.md M2 replacement)."""

import pyarrow as pa

from ai_service_ocr_grading_handler_ray.payloads import encode_image_text, encode_pdf_glyphs
from ai_service_ocr_grading_handler_ray.stages.classify import classify_payload_kind


def _batch(payloads: list[bytes]) -> pa.Table:
    return pa.table({"html": pa.array(payloads, type=pa.binary())})


def test_kinds():
    out = classify_payload_kind(
        _batch(
            [
                b"<html><body>x</body></html>",
                b"  \n\t<!DOCTYPE html><html>",
                encode_pdf_glyphs([(0, 0, 6, 10, "a")]),
                encode_image_text("hi"),
                b"RIFF\x00\x00\x00\x00WEBPVP8 ",
                b"",
                bytes([0xFF, 0xFE, 0x99] * 10),
            ]
        )
    )
    assert out["payload_kind"].to_pylist() == [
        "html",
        "html",
        "pdf",
        "image",
        "image",
        "blank",
        "error",
    ]


def test_real_png_is_image():
    out = classify_payload_kind(_batch([b"\x89PNG\r\n\x1a\n" + b"\x00" * 20]))
    assert out["payload_kind"].to_pylist() == ["image"]
