"""End-to-end curation pipeline: extract -> dedup -> redact -> filter -> split."""

import pyarrow as pa
import pytest
import ray

from ai_service_ocr_grading_handler_ray.pipelines.curate import curation_pipeline
from ai_service_ocr_grading_handler_ray.stages.collect import collect_tables


@pytest.fixture(scope="module")
def curated(sf_dir) -> pa.Table:
    ds = curation_pipeline(sf_dir)
    return pa.concat_tables(collect_tables(ds, drop_empty=False))


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
        collect_tables(curation_pipeline("/root/testdata/sf0.001"), drop_empty=False)
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


# ---------------------------------------------------------------- q98 capstone


@pytest.fixture(scope="module")
def corpus(sf_dir) -> pa.Table:
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.pipelines.curate import corpus_build

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    ds = corpus_build(docs)
    tables = [t for t in collect_tables(ds, drop_empty=False) if t.num_rows]
    return pa.concat_tables(tables)


def test_corpus_build_schema_and_rows(corpus):
    assert corpus.column_names == [
        "doc_id", "source", "n_tokens", "tok_offset", "seq_id",
    ]
    assert 0 < corpus.num_rows < 500  # every stage filtered something


def test_corpus_build_packing_invariants(corpus):
    import pandas as pd

    df = corpus.to_pandas().sort_values(["source", "doc_id"])
    for _, g in df.groupby("source"):
        n = g["n_tokens"].to_numpy()
        off = g["tok_offset"].to_numpy()
        assert off[0] == 0
        assert (off[1:] == off[:-1] + n[:-1]).all()  # exclusive prefix sum
        assert (g["seq_id"].to_numpy() == off // 256).all()
    assert (df["n_tokens"].between(20, 80)).all()  # quality bounds held


def test_corpus_build_bloom_path_runs(sf_dir):
    """The cap-free bloom segment path composes too (superset removal =>
    no more rows than the exact path, schema identical)."""
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.pipelines.curate import corpus_build

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    out = corpus_build(docs, seg_method="bloom")
    t = pa.concat_tables([b for b in collect_tables(out, drop_empty=False) if b.num_rows])
    assert t.column_names == [
        "doc_id", "source", "n_tokens", "tok_offset", "seq_id",
    ]
    assert t.num_rows > 0


def test_corpus_build_parquet_checkpoint_resume(sf_dir, tmp_path):
    """Durable checkpoints (VERDICT r3 #6): checkpoint='parquet' writes
    each stage boundary once with an atomic manifest; a rerun resumes
    from committed stages (kill/restart between stages) and produces
    byte-identical output without rewriting finished checkpoints."""
    import os
    import shutil

    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.pipelines.curate import corpus_build

    def docs():
        return rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
        )

    ck = str(tmp_path / "ck")

    def run():
        return (
            corpus_build(docs(), checkpoint="parquet", checkpoint_dir=ck)
            .to_pandas()
            .sort_values(["source", "doc_id"])
            .reset_index(drop=True)
        )

    out1 = run()
    s1_marker = os.path.join(ck, "s1_deduped", "_COMPLETE.json")
    s2_marker = os.path.join(ck, "s2_cleaned", "_COMPLETE.json")
    assert os.path.isfile(s1_marker) and os.path.isfile(s2_marker)
    m1 = os.path.getmtime(s1_marker)

    # full restart: both stages resume from parquet, nothing rewritten
    m2 = os.path.getmtime(s2_marker)
    out2 = run()
    assert out2.equals(out1)
    assert os.path.getmtime(s1_marker) == m1
    assert os.path.getmtime(s2_marker) == m2

    # crash between stage 2 and the finish: stage-2 checkpoint lost,
    # stage 1 committed — the rerun reuses s1 and rebuilds only s2
    shutil.rmtree(os.path.join(ck, "s2_cleaned"))
    out3 = run()
    assert out3.equals(out1)
    assert os.path.getmtime(s1_marker) == m1
    assert os.path.isfile(s2_marker)

    # a partially-written (uncommitted) stage directory is discarded:
    # marker missing => recompute, and the output is still identical
    shutil.rmtree(os.path.join(ck, "s2_cleaned"))
    os.makedirs(os.path.join(ck, "s2_cleaned", "data.tmp"))
    out4 = run()
    assert out4.equals(out1)

    # changed parameters invalidate a committed checkpoint (no stale reuse)
    out5 = (
        corpus_build(
            docs(), checkpoint="parquet", checkpoint_dir=ck, prefix_chars=10
        )
        .to_pandas()
    )
    assert len(out5) != 0
