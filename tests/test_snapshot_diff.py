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


# --- SCD-2 history ----------------------------------------------------------

from ai_service_ocr_grading_handler_ray.stages.snapshots import (  # noqa: E402
    scd2_history,
)


def _scd2(rows, **kw):
    out = scd2_history(
        rd.from_pandas(
            pd.DataFrame(rows, columns=["url", "ts", "content_hash"])
        ),
        **kw,
    ).to_pandas()
    return out.sort_values(["url", "valid_from"]).reset_index(drop=True)


def test_scd2_runs_and_intervals():
    out = _scd2(
        [
            ("a", 0, "h1"),
            ("a", 1, "h1"),   # same content -> same run
            ("a", 2, "h2"),   # change -> new run
            ("a", 3, "h2"),
            ("b", 0, "h9"),   # single capture
        ]
    )
    a = out[out.url == "a"]
    assert a["content_hash"].to_list() == ["h1", "h2"]
    assert a["valid_from"].to_list() == [0, 2]
    assert a["valid_to"].to_list()[0] == 2
    assert pd.isna(a["valid_to"].to_list()[1])     # current version open
    assert a["version"].to_list() == [1, 2]
    b = out[out.url == "b"]
    assert len(b) == 1 and b["version"].iloc[0] == 1


def test_scd2_null_safe_boundary():
    # x -> NULL and NULL -> x are changes; NULL -> NULL is NOT.
    out = _scd2(
        [
            ("a", 0, "h1"),
            ("a", 1, None),
            ("a", 2, None),
            ("a", 3, "h1"),
        ]
    )
    assert out["valid_from"].to_list() == [0, 1, 3]
    assert out["content_hash"].to_list()[1] is None
    assert out["version"].to_list() == [1, 2, 3]


def test_scd2_null_key_ts_drop_and_key_isolation():
    out = _scd2(
        [
            ("a", 0, "h1"),
            (None, 1, "h1"),
            ("b", None, "h1"),
            ("b", 5, "h1"),   # b starts its own run even though hash == a's
        ]
    )
    assert out["url"].to_list() == ["a", "b"]
    assert out["version"].to_list() == [1, 1]


@pytest.mark.parametrize("num_parts", [1, 5, 32])
def test_scd2_partition_invariance(num_parts):
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [
        (
            f"u{int(rng.integers(0, 40))}",
            int(i),
            f"h{int(rng.integers(0, 3))}",
        )
        for i in range(600)
    ]
    # make (url, ts) unique: ts is the global row index, unique anyway
    base = _scd2(rows, num_parts=32)
    got = _scd2(rows, num_parts=num_parts)
    pd.testing.assert_frame_equal(got, base, check_dtype=False)
