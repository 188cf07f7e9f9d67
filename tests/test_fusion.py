"""Reciprocal-rank fusion (stages/fusion.py)."""

import numpy as np
import pandas as pd
import pytest

from ai_service_ocr_grading_handler_ray.stages.fusion import rrf_fuse


def test_hand_example():
    a = pd.DataFrame({"doc_id": [3, 1, 2]})  # ranks 1,2,3
    b = pd.DataFrame({"doc_id": [2, 9]})     # ranks 1,2
    out = rrf_fuse([("a", a), ("b", b)], rrf_k=60).set_index("doc_id")
    assert out.loc[2, "r_a"] == 3 and out.loc[2, "r_b"] == 1
    assert out.loc[2, "rrf"] == round(1 / 63 + 1 / 61, 6)
    assert out.loc[9, "r_a"] == 0  # absent sentinel
    assert out.loc[9, "rrf"] == round(1 / 62, 6)
    assert list(out.index) == [1, 2, 3, 9]  # sorted by id


def test_single_list_and_dtypes():
    out = rrf_fuse([("only", pd.DataFrame({"doc_id": [5, 4]}))])
    assert out.r_only.dtype == np.int64
    assert list(out.doc_id) == [4, 5] and list(out.r_only) == [2, 1]


def test_errors():
    df = pd.DataFrame({"doc_id": [1]})
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="duplicate"):
        rrf_fuse([("x", df), ("x", df)])


def test_duplicate_id_within_list_raises():
    # review finding: a repeated id in one list silently double-counted
    with pytest.raises(ValueError, match="duplicate id"):
        rrf_fuse([("x", pd.DataFrame({"doc_id": [1, 1, 2]}))])
