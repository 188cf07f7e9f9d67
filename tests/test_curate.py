"""End-to-end curation pipeline: extract -> dedup -> redact -> filter -> split."""

import pyarrow as pa
import pytest
import ray

from ai_service_ocr_grading_handler_ray.pipelines.curate import curation_pipeline


@pytest.fixture(scope="module")
def curated(sf_dir) -> pa.Table:
    ds = curation_pipeline(sf_dir)
    return pa.concat_tables(ray.get(ds.to_arrow_refs()))


def test_schema_and_rows(curated):
    assert set(curated.column_names) == {
        "url", "canonical_url", "warc_ts", "lang", "lang_pred", "title",
        "curated_text", "content_sha256", "quality_score", "repetition_ratio", "split",
    }
    # 482 ok rows minus url-dups minus quality rejects → a substantial majority
    assert 350 < curated.num_rows <= 482


def test_canonical_urls_unique(curated):
    urls = curated["canonical_url"].to_pylist()
    assert len(urls) == len(set(urls))


def test_quality_and_repetition_bounds(curated):
    import pyarrow.compute as pc

    assert pc.min(curated["quality_score"]).as_py() >= 0.35
    assert pc.max(curated["repetition_ratio"]).as_py() <= 0.5


def test_split_deterministic_and_proportioned(curated):
    splits = curated["split"].to_pylist()
    frac = splits.count("train") / len(splits)
    assert 0.6 < frac < 0.9  # ~75% target
    # determinism: same url always lands in the same split
    from ai_service_ocr_grading_handler_ray.pipelines.curate import curation_pipeline

    again = pa.concat_tables(
        ray.get(curation_pipeline("/root/testdata/sf0.001").to_arrow_refs())
    )
    a = dict(zip(curated["canonical_url"].to_pylist(), splits))
    b = dict(zip(again["canonical_url"].to_pylist(), again["split"].to_pylist()))
    assert a == b


def test_no_raw_pii_survives(curated):
    # synthetic pages contain no real PII, but the redaction stage ran:
    # any email-shaped artifact would have been tokenized
    import re

    email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    for t in curated["curated_text"].to_pylist()[:100]:
        assert not email.search(t)
