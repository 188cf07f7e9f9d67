"""unpivot (stages/reshape.py), KWIC snippets (stages/kwic.py) and the
Benford digit audit (stages/profile.benford_profile): hand-computed
fixtures, edge clamps, multibyte codepoint semantics, null handling,
input-validation errors."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.kwic import kwic_snippets
from ai_service_ocr_grading_handler_ray.stages.profile import benford_profile
from ai_service_ocr_grading_handler_ray.stages.reshape import unpivot


def test_unpivot_hand_computed(ray_session):
    ds = rd.from_pandas(
        pd.DataFrame({"id": [1, 2], "a": [10, 20], "b": [0.5, 1.5]})
    )
    out = (
        unpivot(ds, id_cols=["id"], value_cols=["a", "b"])
        .to_pandas()
        .sort_values(["id", "metric"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "id": [1, 1, 2, 2],
            "metric": ["a", "b", "a", "b"],
            "value": [10.0, 0.5, 20.0, 1.5],
        }
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    assert out["value"].dtype == np.float64  # ints cast to the supertype


def test_unpivot_validates(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"id": [1], "metric": [2.0]}))
    with pytest.raises(ValueError, match="non-empty"):
        unpivot(ds, id_cols=["id"], value_cols=[])
    with pytest.raises(ValueError, match="collide"):
        unpivot(ds, id_cols=["id"], value_cols=["metric"])


def test_kwic_hand_computed(ray_session):
    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "xx needle yy",          # mid-string
                    "needle at start",       # clamp left
                    "no match here",         # dropped
                    "tail ends in needle",   # clamp right
                ],
            }
        )
    )
    out = (
        kwic_snippets(ds, term="needle", context=3)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(out["id"]) == [1, 2, 4]
    assert list(out["pos"]) == [4, 1, 14]  # 1-based codepoints
    assert list(out["snippet"]) == ["xx needle yy", "needle at", "in needle"]


def test_kwic_multibyte_codepoints(ray_session):
    # émoji before the term shifts BYTE offsets but not codepoints
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["ééé needle x"]}))
    out = kwic_snippets(ds, term="needle", context=2).to_pandas()
    assert out.loc[0, "pos"] == 5
    assert out.loc[0, "snippet"] == "é needle x"


def test_kwic_validates(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError, match="non-empty"):
        kwic_snippets(ds, term="")
    with pytest.raises(ValueError, match="context"):
        kwic_snippets(ds, term="x", context=-1)


def test_benford_hand_computed(ray_session):
    # group g: first digits 1,1,2 (0.005 quantizes to 1 at 2 decimals;
    # 19.5 → 1950 → 1); non-positive values drop
    ds = rd.from_pandas(
        pd.DataFrame(
            {
                "event_type": ["g", "g", "g", "g", "g"],
                "value": [0.005, 19.5, 2.0, 0.0, -3.0],
            }
        )
    )
    out = benford_profile(ds, decimals=2).to_pandas()
    assert len(out) == 9  # all nine digits, zeros included
    byd = out.set_index("digit")
    assert byd.loc[1, "n"] == 2 and byd.loc[2, "n"] == 1
    assert byd.loc[9, "n"] == 0
    assert abs(byd.loc[1, "expected"] - np.log10(2)) < 1e-6
    assert (out["share"].sum() - 1.0) < 1e-9
    # chi-square identical on every row of the group
    assert out["chi2"].nunique() == 1
    # hand chi2: sum over 9 cells of (n - 3p)^2 / (3p)
    p = np.log10(1 + 1 / np.arange(1, 10))
    n = byd.sort_index()["n"].to_numpy()
    want = float(((n - 3 * p) ** 2 / (3 * p)).sum())
    assert abs(out["chi2"].iloc[0] - want) < 1e-5


def test_benford_group_cap(ray_session):
    ds = rd.from_pandas(
        pd.DataFrame(
            {"event_type": [f"g{i}" for i in range(10_001)],
             "value": [1.0] * 10_001}
        )
    )
    with pytest.raises(ValueError, match="low-cardinality"):
        benford_profile(ds)


def test_benford_empty(ray_session):
    ds = rd.from_pandas(
        pd.DataFrame({"event_type": ["g"], "value": [-1.0]})
    )
    out = benford_profile(ds).to_pandas()
    assert len(out) == 0
