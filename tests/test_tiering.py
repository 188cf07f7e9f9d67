"""Tier-extraction capstone (pipelines/tiering.py): extraction feeds
CCNet per-language tercile tiering; output is partitionable by
(lang, tier) and deterministic."""

import math

import pyarrow.dataset as pads
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.pipelines.extract import build_pages_dataset
from ai_service_ocr_grading_handler_ray.pipelines.tiering import (
    tier_extract,
    tier_extract_sf,
    write_tiered,
)


@pytest.fixture(scope="module")
def tiers_df(sf_dir):
    return tier_extract_sf(sf_dir).to_pandas()


def test_rows_are_ok_extractions(sf_dir, tiers_df):
    # 500 pages at sf0.001 → 481 unique-url ok extractions (golden count:
    # 482 ok extractions, minus 1 repeated-url snapshot)
    assert len(tiers_df) == 481
    assert set(tiers_df.columns) == {
        "url", "lang", "n_tokens", "avg_logprob", "tier"
    }
    assert tiers_df["url"].is_unique
    assert set(tiers_df["tier"]) <= {"head", "middle", "tail"}


def test_terciles_per_language(tiers_df):
    for lang, sub in tiers_df.groupby("lang"):
        n = len(sub)
        tc = sub["tier"].value_counts()
        assert tc.sum() == n
        if n >= 3:
            # ties only ever grow the lower tier
            assert tc.get("head", 0) <= n - math.ceil(2 * n / 3) + 1
        # scores must respect the tier ordering within a language
        h = sub[sub["tier"] == "head"]["avg_logprob"]
        m = sub[sub["tier"] == "middle"]["avg_logprob"]
        t = sub[sub["tier"] == "tail"]["avg_logprob"]
        if len(h) and len(m):
            assert h.min() > m.max() or math.isclose(h.min(), m.max())
            assert h.min() >= m.max()
        if len(m) and len(t):
            assert m.min() >= t.max()


def test_deterministic_across_block_layouts(sf_dir, tiers_df):
    pages = build_pages_dataset(sf_dir).repartition(9)
    again = (
        tier_extract(pages)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = tiers_df.sort_values("url").reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(again, want)


def test_page_lang_mode(sf_dir):
    out = tier_extract(build_pages_dataset(sf_dir), detect_lang=False).to_pandas()
    # page-table langs only (no 'und' detections)
    import pyarrow.parquet as pq

    page_langs = set(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["lang"])["lang"]
        .to_pylist()
    )
    assert set(out["lang"]) <= page_langs


def test_write_tiered_partitions(sf_dir, tmp_path, tiers_df):
    out = str(tmp_path / "tiered")
    write_tiered(rd.from_pandas(tiers_df), out)
    d = pads.dataset(out, format="parquet", partitioning="hive")
    assert d.count_rows() == len(tiers_df)
    frags = {f.path.split(out)[-1] for f in d.get_fragments()}
    assert any("tier=head" in p for p in frags)
    assert all("lang=" in p and "tier=" in p for p in frags)
