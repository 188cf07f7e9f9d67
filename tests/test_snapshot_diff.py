"""Crawl-snapshot diffing (stages/snapshots.py)."""

import pandas as pd
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.snapshots import snapshot_diff

OLD = [
    {"url": "a", "content_hash": "h1"},
    {"url": "b", "content_hash": "h2"},
    {"url": "c", "content_hash": "h3"},
]
NEW = [
    {"url": "b", "content_hash": "h2"},       # unchanged
    {"url": "c", "content_hash": "h3x"},      # changed
    {"url": "d", "content_hash": "h4"},       # added
]                                              # a: removed


def _run(old=OLD, new=NEW, **kw):
    out = snapshot_diff(rd.from_items(old), rd.from_items(new), **kw).to_pandas()
    return out.sort_values("url").reset_index(drop=True)


def test_all_four_changes():
    out = _run()
    assert dict(zip(out["url"], out["change"])) == {
        "a": "removed", "b": "unchanged", "c": "changed", "d": "added",
    }


def test_hash_sentinels():
    out = _run().set_index("url")
    assert out.loc["a", "new_hash"] == ""      # gone pages have no new hash
    assert out.loc["d", "old_hash"] == ""      # new pages have no old hash
    assert out.loc["c", "old_hash"] == "h3" and out.loc["c", "new_hash"] == "h3x"


def test_one_row_per_distinct_url():
    out = _run()
    assert len(out) == 4
    assert out["url"].is_unique


def test_duplicate_key_within_side_raises():
    bad = OLD + [{"url": "a", "content_hash": "h9"}]
    with pytest.raises(Exception, match="duplicate key"):
        _run(old=bad)


def test_partitioning_invariance():
    old = [{"url": f"u{i}", "content_hash": f"h{i % 5}"} for i in range(200)]
    new = [
        {"url": f"u{i}", "content_hash": f"h{(i + i % 3) % 5}"}
        for i in range(50, 250)
    ]
    a = snapshot_diff(
        rd.from_items(old), rd.from_items(new)
    ).to_pandas().sort_values("url").reset_index(drop=True)
    b = snapshot_diff(
        rd.from_items(old).repartition(7), rd.from_items(new).repartition(3)
    ).to_pandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_lazy_dataset_output():
    out = snapshot_diff(rd.from_items(OLD), rd.from_items(NEW))
    assert isinstance(out, rd.Dataset)


# --- host_churn ------------------------------------------------------------


def test_host_churn_rollup(ray_session):
    import pandas as pd
    from ai_service_ocr_grading_handler_ray.stages.snapshots import (
        host_churn,
        snapshot_diff,
    )

    old = pd.DataFrame(
        {
            "url": [
                "https://a.org/1", "https://a.org/2", "https://a.org/3",
                "https://b.org/1",
            ],
            "content_hash": ["h1", "h2", "h3", "h4"],
        }
    )
    new = pd.DataFrame(
        {
            "url": [
                "https://a.org/1",  # unchanged
                "https://a.org/2",  # changed
                "https://a.org/4",  # added
                "https://b.org/1",  # unchanged
            ],
            "content_hash": ["h1", "hX", "h5", "h4"],
        }
    )
    out = host_churn(
        snapshot_diff(rd.from_pandas(old), rd.from_pandas(new))
    ).set_index("host")
    a = out.loc["a.org"]
    assert (a.n_added, a.n_removed, a.n_changed, a.n_unchanged) == (1, 1, 1, 1)
    assert a.churn_rate == 0.75
    b = out.loc["b.org"]
    assert (b.n_added, b.n_removed, b.n_changed, b.n_unchanged) == (0, 0, 0, 1)
    assert b.churn_rate == 0.0
