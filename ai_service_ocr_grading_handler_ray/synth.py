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


# --- grading-request synthesis (FIXTURES.md §2) -----------------------------

_GRADING_PROMPTS = [
    "default", "ocr", "gpt-ocr", "claude-ocr", "expository-essay-ocr",
    "whole-page-ocr", "omr", "gemini-number", "argumentative-essay-ocr",
]
_SUBJECT_BY_LANG = {"en": "english", "de": "science", "fr": "mathematics",
                    "es": "english", "zh": "science"}


def _answer_text(text: str, d: int) -> str:
    """Lossy student answer: deterministically drop every k-th word so
    rubric overlap (and thus scores) vary across records."""
    words = text.split()
    k = 2 + d % 4
    return " ".join(w for i, w in enumerate(words) if (i + d) % k != 0)


def docs_to_grading_requests(batch: pa.Table) -> pa.Table:
    """``map_batches`` fn: documents → grading_requests (reference reqobj
    shape, testCase.txt:350-459).  Deterministic per doc_id."""
    from .schema import RUBRIC_TYPE

    doc_ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()

    rows: dict[str, list] = {k: [] for k in (
        "model_name", "grading_prompt", "subject", "scan_id", "student_id",
        "que_id", "question", "student_answer", "student_answer_payload",
        "max_score", "rubrics", "correct_answer")}
    for d, text, lang in zip(doc_ids, texts, langs):
        text = text or ""
        words = text.split()
        gp = _GRADING_PROMPTS[d % len(_GRADING_PROMPTS)]
        rows["grading_prompt"].append(gp)
        rows["model_name"].append("synthetic")
        rows["subject"].append(_SUBJECT_BY_LANG.get(lang, "english"))
        rows["scan_id"].append(f"scan-{d // 10}")
        rows["student_id"].append(f"stu-{d % 97}")
        rows["que_id"].append(f"q-{d}")
        rows["question"].append(" ".join(words[:8]))
        # ~30% of rows carry the answer inline (text-only classes,
        # gen_ai_calling.py:174-182); the rest carry a binary payload
        ans = _answer_text(text, d)
        if d % 10 < 3:
            rows["student_answer"].append(ans)
            rows["student_answer_payload"].append(b"")
        elif d % 10 == 3:  # blank-page rows (M19 short-circuit fixture)
            rows["student_answer"].append("")
            rows["student_answer_payload"].append(b"")
        elif gp == "gemini-number":
            # the number-prediction path is image crops by definition
            # (llm_number_prediction.py:39-55)
            rows["student_answer"].append("")
            rows["student_answer_payload"].append(encode_image_text(ans))
        else:
            rows["student_answer"].append("")
            kind = d % 3
            if kind == 0:
                rows["student_answer_payload"].append(
                    render_html_page(f"https://crops/{d}", ans, lang or "en", f"Answer {d}")
                )
            elif kind == 1:
                rows["student_answer_payload"].append(
                    encode_pdf_glyphs(layout_text_as_glyphs(ans))
                )
            else:
                rows["student_answer_payload"].append(encode_image_text(ans))
        n_rub = 2 + d % 2
        seg = max(1, len(words) // max(1, n_rub))
        rubrics = []
        for i in range(n_rub):
            crit_words = words[i * seg : (i + 1) * seg][:10]
            rubrics.append(
                {
                    "rubric_id": f"r-{d}-{i}",
                    "score": float(1 + (d + i) % 3),
                    "criteria": " ".join(crit_words) or "content present",
                }
            )
        rows["rubrics"].append(rubrics)
        rows["max_score"].append(sum(r["score"] for r in rubrics))
        if gp == "gemini-number":
            rows["correct_answer"].append(str(d % 10))
        elif gp == "omr":
            # MCQ key: the first word of the full text (the lossy answer
            # sometimes drops it → a deterministic mix of correct/incorrect)
            rows["correct_answer"].append(words[0] if words else "")
        else:
            rows["correct_answer"].append(None)

    return pa.table(
        {
            "model_name": pa.array(rows["model_name"], type=pa.string()),
            "grading_prompt": pa.array(rows["grading_prompt"], type=pa.string()),
            "subject": pa.array(rows["subject"], type=pa.string()),
            "scan_id": pa.array(rows["scan_id"], type=pa.string()),
            "student_id": pa.array(rows["student_id"], type=pa.string()),
            "que_id": pa.array(rows["que_id"], type=pa.string()),
            "question": pa.array(rows["question"], type=pa.string()),
            "student_answer": pa.array(rows["student_answer"], type=pa.string()),
            "student_answer_payload": pa.array(rows["student_answer_payload"], type=pa.binary()),
            "max_score": pa.array(rows["max_score"], type=pa.float64()),
            "rubrics": pa.array(rows["rubrics"], type=RUBRIC_TYPE),
            "correct_answer": pa.array(rows["correct_answer"], type=pa.string()),
        }
    )
