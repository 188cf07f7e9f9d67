"""Payload-kind router — the engine's replacement for the reference's
per-record model-class dispatch (``gen_ai_calling.py:128-415``, SURVEY.md M2).

Instead of a per-row Python switch, a single vectorized ``map_batches``
stage sniffs magic bytes of the ``html`` binary column and emits a
``payload_kind`` column in {"html", "pdf", "image", "blank", "error"}.
Downstream extraction mask-selects rows per kind — no N small datasets,
no per-row dispatch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..payloads import PDF_MAGIC, PNG_MAGIC, WEBP_RIFF, WEBP_TAG

KINDS = ("html", "pdf", "image", "blank", "error")


def classify_payload_kind(batch: pa.Table, column: str = "html") -> pa.Table:
    """Append ``payload_kind`` derived from magic-byte sniffing.

    Fully vectorized (binary_slice + equal + case-when); never decodes the
    payload body.  Zero-copy over the Arrow binary column.
    """
    b = batch[column]
    if isinstance(b, pa.ChunkedArray):
        b = b.combine_chunks()

    empty = pc.equal(pc.binary_length(b), 0)
    is_pdf = pc.equal(pc.binary_slice(b, 0, len(PDF_MAGIC)), PDF_MAGIC)
    is_png = pc.equal(pc.binary_slice(b, 0, len(PNG_MAGIC)), PNG_MAGIC)
    is_webp = pc.and_(
        pc.equal(pc.binary_slice(b, 0, 4), WEBP_RIFF),
        pc.equal(pc.binary_slice(b, 8, 12), WEBP_TAG),
    )
    # HTML: a '<' within the first 16 bytes (covers leading whitespace /
    # doctype). match_substring operates on raw binary, so invalid UTF-8
    # garbage can't poison the kernel.
    is_html = pc.match_substring(pc.binary_slice(b, 0, 16), "<")

    kind = pc.case_when(
        pc.make_struct(
            pc.fill_null(empty, True),
            pc.fill_null(is_pdf, False),
            pc.fill_null(pc.or_(is_png, is_webp), False),
            pc.fill_null(is_html, False),
        ),
        "blank",
        "pdf",
        "image",
        "html",
        "error",
    )
    return batch.append_column("payload_kind", kind)
