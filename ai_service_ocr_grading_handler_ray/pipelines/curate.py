"""End-to-end training-data curation pipeline — the composition of the
engine's webtext operators into one streaming job:

    pages
      → classify + extract                (stages/extract, task compute)
      → canonical-url exact dedup         (stages/clean + dedup: earliest
                                           snapshot per canonical url)
      → PII redaction                     (stages/clean)
      → quality + repetition filters      (stages/text_analysis + clean)
      → language ID                       (stages/text_analysis)
      → deterministic train/eval split    (stages/sampling)

Everything is lazy map_batches/groupby — one url-hash shuffle total (the
dedup); every other stage streams.  Output: curated train/eval page
tables with provenance columns (url, canonical_url, lang_pred,
quality_score, repetition_ratio, split).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..stages.clean import add_canonical_url, add_redacted, add_repetition_ratio
from ..stages.text_analysis import add_language_id, add_quality_metrics
from .extract import build_pages_dataset, extract_pages


def curate_pages(
    pages: rd.Dataset,
    *,
    min_quality: float = 0.35,
    max_repetition: float = 0.5,
    train_frac_16ths: int = 12,
    **extract_kwargs,
) -> rd.Dataset:
    """pages → curated rows with a ``split`` column ('train'/'eval')."""
    extracted = extract_pages(pages, **extract_kwargs)

    ok = extracted.map_batches(
        lambda t: t.filter(pc.equal(t["status"], "ok")), batch_format="pyarrow"
    )

    # canonical-url dedup: earliest snapshot per canonical url
    import pandas as pd

    with_canon = ok.map_batches(
        lambda t: add_canonical_url(t, url_col="url"), batch_format="pyarrow"
    )

    from ..stages.dedup import add_key_partition

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(["warc_ts", "content_sha256"], kind="mergesort")
            .drop_duplicates(subset=["canonical_url"], keep="first")
            .drop(columns=["_part"])
        )

    deduped = (
        with_canon.map_batches(
            lambda t: add_key_partition(t, "canonical_url"), batch_format="pyarrow"
        )
        .groupby("_part")
        .map_groups(first, batch_format="pandas")
    )

    def enrich(t: pa.Table) -> pa.Table:
        t = add_redacted(t, text_col="extracted_text", out="curated_text")
        t = add_quality_metrics(t, text_col="curated_text")
        t = add_repetition_ratio(t, text_col="curated_text")
        t = add_language_id(t, text_col="curated_text")
        keep = pc.and_(
            pc.greater_equal(t["quality_score"], min_quality),
            pc.less_equal(t["repetition_ratio"], max_repetition),
        )
        t = t.filter(keep)
        return t.select(
            [
                "url", "canonical_url", "warc_ts", "lang", "lang_pred", "title",
                "curated_text", "content_sha256", "quality_score", "repetition_ratio",
            ]
        )

    enriched = deduped.map_batches(enrich, batch_format="pyarrow")

    cut = format(train_frac_16ths, "x")

    def add_split(t: pa.Table) -> pa.Table:
        # same md5-threshold rule as stages/sampling.train_eval_split
        import hashlib

        split = [
            "train" if hashlib.md5(str(u).encode()).hexdigest() < cut else "eval"
            for u in t["canonical_url"].to_pylist()
        ]
        return t.append_column("split", pa.array(split, type=pa.string()))

    return enriched.map_batches(add_split, batch_format="pyarrow")


def curation_pipeline(sf_dir: str, **kwargs) -> rd.Dataset:
    return curate_pages(build_pages_dataset(sf_dir), **kwargs)
