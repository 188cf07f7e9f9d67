"""Stage-A extraction: one `map_batches` actor class covering all payload
kinds by mask-dispatch (SURVEY.md M2 replacement for the per-record switch
at ``gen_ai_calling.py:278-415``).

Rows are grouped by ``payload_kind`` inside the batch; each kind's
extractor runs over its sub-batch; results are scattered back into
document order.  Parser state (OCR engine, thresholds) is warmed once per
actor in ``__init__``.  Per-row failures follow the poison-pill policy
(SURVEY.md §4): the row gets ``status='error'`` and empty text instead of
failing the block — mirroring the reference's degraded-response records
(``llm_calling.py:111-112,173-174``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..payloads import decode_pdf_glyphs
from .html_extract import extract_html
from .ocr import OcrEngine
from .pdf_layout import parse_pdf_layout


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


class ExtractActor:
    """Callable class for ``map_batches(ExtractActor, concurrency=N, ...)``.

    Input batch columns: url, warc_ts, html(binary), text, lang,
    payload_kind.  Output: EXTRACTED_SCHEMA (schema.py).
    """

    def __init__(self, min_len: int = 25, max_link_pct: int = 33) -> None:
        self.min_len = min_len
        self.max_link_pct = max_link_pct
        self.ocr = OcrEngine()  # warm engine state, once per actor

    def _extract_one(self, kind: str, payload: bytes) -> tuple[str, int, str]:
        """→ (extracted_text, n_blocks, status)."""
        if kind == "blank":
            return "", 0, "blank"
        try:
            if kind == "html":
                text, n = extract_html(payload, self.min_len, self.max_link_pct)
                return text, n, ("ok" if text else "blank")
            if kind == "pdf":
                text, n = parse_pdf_layout(decode_pdf_glyphs(payload))
                return text, n, ("ok" if text else "blank")
            if kind == "image":
                text = self.ocr.recognize(payload)
                return text, (1 if text else 0), ("ok" if text else "blank")
            return "", 0, "error"
        except Exception:
            return "", 0, "error"

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["payload_kind"].to_pylist()
        payloads = batch["html"]
        n = len(batch)
        texts: list[str] = [""] * n
        blocks = np.zeros(n, dtype=np.int32)
        statuses: list[str] = ["error"] * n
        digests: list[str] = [""] * n
        for i in range(n):
            # .as_py() copies only this row's payload out of the Arrow buffer
            payload = payloads[i].as_py() or b""
            text, nb, st = self._extract_one(kinds[i], payload)
            texts[i] = text
            blocks[i] = nb
            statuses[i] = st
            digests[i] = sha256_hex(text)
        is_blank = np.array([not t.strip() for t in texts], dtype=bool)
        return pa.table(
            {
                "url": batch["url"],
                "warc_ts": batch["warc_ts"],
                "lang": batch["lang"],
                "payload_kind": batch["payload_kind"],
                "extracted_text": pa.array(texts, type=pa.large_string()),
                "content_sha256": pa.array(digests, type=pa.string()),
                "n_blocks": pa.array(blocks),
                "is_blank": pa.array(is_blank),
                "status": pa.array(statuses, type=pa.string()),
            }
        )
