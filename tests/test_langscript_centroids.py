"""Lang-vs-script audit (text_analysis.lang_script_audit) and
per-label centroid cosines (linalg.label_centroid_cosines):
mismatch flags, share arithmetic, centroid geometry."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.linalg import (
    label_centroid_cosines,
)
from ai_service_ocr_grading_handler_ray.stages.text_analysis import (
    lang_script_audit,
)


def _docs(rows):
    """rows: (doc_id, text, lang)."""
    return rd.from_arrow(
        pa.table(
            {"doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
             "text": pa.array([r[1] for r in rows], type=pa.string()),
             "lang": pa.array([r[2] for r in rows], type=pa.string())}
        )
    )


def test_audit_flags_mismatch(ray_session):
    out = lang_script_audit(_docs([
        (0, "hello world", "en"),          # latin, expected
        (1, "你好世界", "en"),  # CJK tagged en: flag
        (2, "你好", "zh"),         # CJK, expected
    ]))
    got = out.set_index(["lang", "dominant_script"])
    assert got.loc[("en", "latin")]["is_expected"] == 1
    assert got.loc[("en", "cjk")]["is_expected"] == 0
    assert got.loc[("zh", "cjk")]["is_expected"] == 1


def test_audit_shares_sum_per_lang(ray_session):
    out = lang_script_audit(_docs([
        (0, "abc", "en"), (1, "def", "en"),
        (2, "你好", "en"),
    ]))
    en = out[out["lang"] == "en"]
    assert en["share"].sum() == pytest.approx(1.0, abs=1e-5)
    assert en["n_docs"].sum() == 3


def test_audit_unknown_lang_never_expected(ray_session):
    out = lang_script_audit(_docs([(0, "abc", "xx")]))
    assert out.iloc[0]["is_expected"] == 0


def test_audit_null_lang_drops(ray_session):
    out = lang_script_audit(_docs([(0, "abc", None), (1, "abc", "en")]))
    assert out["lang"].tolist() == ["en"]


def _emb(rows):
    """rows: (label, vec)."""
    return rd.from_arrow(
        pa.table(
            {"label": pa.array([r[0] for r in rows], type=pa.int32()),
             "embedding": pa.array([r[1] for r in rows],
                                   type=pa.list_(pa.float32()))}
        )
    )


def test_centroid_cosines_orthogonal_and_parallel(ray_session):
    rows = [
        (0, [1.0, 0.0]), (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [2.0, 0.0]),
    ]
    out = label_centroid_cosines(_emb(rows)).set_index(
        ["label_a", "label_b"]
    )
    assert out.loc[(0, 1)]["cosine"] == 0.0
    assert out.loc[(0, 2)]["cosine"] == 1.0  # same direction
    assert out.loc[(1, 2)]["cosine"] == 0.0
    assert out.loc[(0, 1)]["n_a"] == 2


def test_centroid_is_mean_not_sum(ray_session):
    # label 0 mean = [1, 1]; label 1 = [1, 1] -> cosine exactly 1
    rows = [(0, [2.0, 0.0]), (0, [0.0, 2.0]), (1, [1.0, 1.0])]
    out = label_centroid_cosines(_emb(rows))
    assert out.iloc[0]["cosine"] == 1.0


def test_centroid_single_label_empty(ray_session):
    out = label_centroid_cosines(_emb([(0, [1.0, 2.0])]))
    assert len(out) == 0
