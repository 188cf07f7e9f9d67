"""Robustness: very wide binary rows (memory-aware batching) and
non-ASCII content fidelity."""

import pyarrow as pa
import ray
import ray.data as rd

from ai_service_ocr_grading_handler_ray.pipelines.extract import extract_pages
from ai_service_ocr_grading_handler_ray.stages.classify import classify_payload_kind
from ai_service_ocr_grading_handler_ray.stages.extract import ExtractActor
from ai_service_ocr_grading_handler_ray.synth import render_html_page
from ai_service_ocr_grading_handler_ray.stages.collect import collect_tables


def _pages_table(urls_texts_langs):
    rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
    for i, (url, text, lang) in enumerate(urls_texts_langs):
        rows["url"].append(url)
        rows["warc_ts"].append(1_704_067_200_000_000 + i)
        rows["html"].append(render_html_page(url, text, lang, f"T{i}"))
        rows["text"].append(text)
        rows["lang"].append(lang)
    return pa.table(
        {
            "url": pa.array(rows["url"]),
            "warc_ts": pa.array(rows["warc_ts"], type=pa.timestamp("us")),
            "html": pa.array(rows["html"], type=pa.binary()),
            "text": pa.array(rows["text"]),
            "lang": pa.array(rows["lang"]),
        }
    )


def test_multi_mb_payloads_stream_through():
    """~2 MB html per row, tiny batches: blocks must split and stream, not
    OOM or stall (SURVEY.md §4 memory notes)."""
    big_text = "lorem ipsum dolor sit amet consectetur " * 50_000  # ~2 MB
    tbl = _pages_table(
        [(f"https://big.example.com/mb-{i}", big_text, "en") for i in range(12)]
    )
    ds = rd.from_arrow(tbl)
    out = extract_pages(ds, batch_size=2)
    result = pa.concat_tables(collect_tables(out, drop_empty=False))
    assert result.num_rows == 12
    assert all(s == "ok" for s in result["status"].to_pylist())
    text = result["extracted_text"][0].as_py()
    assert " ".join(text.split()) == " ".join(big_text.split())


def test_unicode_content_byte_fidelity():
    """CJK / diacritics / emoji survive extraction byte-exactly."""
    samples = [
        ("https://u.example.com/zh", "这是 一段 中文 测试 文本 其中 包含 标点 符号 等等 内容 继续 填充 更多 词语 保证 长度 足够", "zh"),
        ("https://u.example.com/fr", "l'été était très chaud à Besançon où les élèves étudiaient la géométrie différentielle avancée", "fr"),
        ("https://u.example.com/emoji", "unusual content 🎉 with emoji 🚀 and symbols ∑∫√ mixed into a long enough paragraph of text", "en"),
    ]
    tbl = classify_payload_kind(_pages_table(samples))
    result = ExtractActor()(tbl)
    for (url, text, _lang), extracted, status in zip(
        samples, result["extracted_text"].to_pylist(), result["status"].to_pylist()
    ):
        assert status == "ok", url
        assert " ".join(extracted.split()) == " ".join(text.split()), url
