"""Deterministic synthetic page-table generation (FIXTURES.md §1).

Every payload byte is a pure function of ``(url, doc text)``, so golden
digests are stable across runs and machines.  Pages derive from the
driver's read-only ``documents`` table: the document text becomes the page
main content; the url determines payload kind, boilerplate shape, host
skew and url-duplication.

Payload mix (keyed by sha256(url) bucket):
  ~80% HTML (nav/footer/link-farm boilerplate + content paragraphs),
  ~10% synthetic PDF (%PDF magic + glyph boxes, 2-column layout),
   ~5% synthetic image (PNG magic + compressed text for the OCR actor),
   ~5% edge rows (empty, truncated HTML, non-UTF8 garbage).
Host skew: ~20% of rows land on one giant host (salting tests).
Url duplication: consecutive doc_id pairs share a url (~4% of rows) for
exact-dedup-by-url tests (SURVEY.md §2.5).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from .payloads import encode_image_text, encode_pdf_glyphs, layout_text_as_glyphs

_NAV_WORDS = ["Home", "News", "Sports", "Culture", "Tech", "Login", "Register", "Contact"]
_FARM_TOPICS = [
    "cheap flights", "best deals", "hot offers", "top stories", "trending now",
    "weather today", "local events", "job listings", "used cars", "real estate",
    "free games", "daily horoscope", "lottery results", "tv guide", "recipes",
    "health tips", "travel guide", "movie times", "stock quotes", "sale items",
]
_EPOCH_2024_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds


def _h(url: str) -> int:
    return int.from_bytes(hashlib.sha256(url.encode("utf-8")).digest()[:8], "big")


def url_for_doc(doc_id: int, source: str, lang: str) -> str:
    """Deterministic url with host skew and duplicate pairs."""
    if doc_id % 53 in (1, 2):  # consecutive pair shares one url (~3.8%)
        return f"https://dup.example.com/{lang}/page-{doc_id // 53}"
    if doc_id % 5 == 0:  # giant host owns ~20% of rows (skew fixture)
        return f"https://big.example.com/{source}/{lang}/doc-{doc_id}"
    return f"https://{source}.example.org/{lang}/doc-{doc_id}"


def _paragraphs(text: str, words_per_para: int = 18) -> list[str]:
    words = text.split()
    paras = [
        " ".join(words[i : i + words_per_para])
        for i in range(0, len(words), words_per_para)
    ] or [""]
    # merge a short tail paragraph into its predecessor so every content
    # paragraph clears the extractor's min-length rule (verbatim invariant)
    if len(paras) >= 2 and len(paras[-1]) < 30:
        paras[-2] = f"{paras[-2]} {paras[-1]}"
        paras.pop()
    return paras


def edge_bucket(url: str) -> bool:
    """True for urls whose payload is an edge row (empty / truncated /
    garbage) — content fidelity is not expected for these."""
    return _h(url) % 100 >= 95


def render_html_page(url: str, text: str, lang: str, title: str) -> bytes:
    """Boilerplate-rich HTML whose main content is exactly ``text``'s
    paragraphs.  Boilerplate shape varies deterministically with the url."""
    h = _h(url)
    nav = " ".join(
        f'<a href="/{w.lower()}">{w}</a>' for w in _NAV_WORDS[: 4 + h % 5]
    )
    farm = " ".join(
        f'<a href="/t/{i}">{_FARM_TOPICS[(h + i) % len(_FARM_TOPICS)]}</a>'
        for i in range(12 + h % 9)
    )
    paras = "\n".join(f"<p>{p}</p>" for p in _paragraphs(text))
    aside = f"<aside><p>Related: {_FARM_TOPICS[h % len(_FARM_TOPICS)]}</p></aside>"
    short = f"<p>tag{h % 100}</p>"  # below min_len → dropped
    doc = (
        f'<!DOCTYPE html><html lang="{lang}"><head><title>{title}</title>'
        f"<style>body{{margin:0}}</style><script>var x={h % 7};</script></head>"
        f"<body><nav>{nav}</nav><header><h1>{title}</h1></header>"
        f'<main><article>{paras}{short}</article></main>{aside}'
        f'<div class="links">{farm}</div>'
        f"<footer><p>© 2024 {url.split('/')[2]} — all rights reserved — "
        f"terms privacy imprint</p></footer></body></html>"
    )
    return doc.encode("utf-8")


def render_page(url: str, text: str, lang: str, doc_id: int) -> bytes:
    """Pure function (url, text) → payload bytes of the url-keyed kind."""
    bucket = _h(url) % 100
    if bucket < 80:
        return render_html_page(url, text, lang, f"Document {doc_id}")
    if bucket < 90:
        return encode_pdf_glyphs(layout_text_as_glyphs(text))
    if bucket < 95:
        return encode_image_text(text)
    # edge rows
    if bucket < 97:
        return b""
    if bucket < 99:
        return b"<html><body><div>truncated " + text[:40].encode("utf-8")
    # non-UTF8 garbage, deterministic, no '<' in the sniffed prefix
    seed = hashlib.sha256(url.encode("utf-8")).digest()
    return bytes(b if b != 0x3C else 0x3D for b in (seed * 8)[:197])


def docs_to_pages(batch: pa.Table) -> pa.Table:
    """``map_batches`` fn: documents(doc_id,text,lang,source,n_chars) → pages.

    Distributed page synthesis — runs inside Ray tasks, never on the driver,
    so benchmark inputs of any scale stream through the object store.
    """
    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    sources = batch["source"].to_pylist()
    urls = [url_for_doc(d, s, lg) for d, s, lg in zip(doc_ids, sources, langs)]
    payloads = [
        render_page(u, t or "", lg or "en", d)
        for u, t, lg, d in zip(urls, texts, langs, doc_ids)
    ]
    ts = pa.array(
        [_EPOCH_2024_US + d * 1_000_000 for d in doc_ids], type=pa.timestamp("us")
    )
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": ts,
            "html": pa.array(payloads, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )
