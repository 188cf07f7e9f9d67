"""Session entry/exit/bounce (stages/sequence.entry_exit_pages) and
capture change-rate (stages/snapshots.change_rate): hand-computed
session fixtures, null-ts/null-type placement, IS-DISTINCT-FROM
boundaries, the single-capture sentinel, bucket thresholds."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.sequence import entry_exit_pages
from ai_service_ocr_grading_handler_ray.stages.snapshots import change_rate

US = 1_000_000


def _ev(rows):
    """rows: (event_id, ts_us_or_None, user_id, type_or_None)."""
    return rd.from_pandas(
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
                "user_id": [r[2] for r in rows],
                "event_type": [r[3] for r in rows],
            }
        )
    )


def test_entry_exit_two_sessions(ray_session):
    # user 1: [view, click] then (gap > 30 min) [buy] (a bounce)
    out = entry_exit_pages(
        _ev([(1, 0, 1, "view"), (2, 60 * US, 1, "click"),
             (3, 4000 * US * 60, 1, "buy")])
    )
    got = out.set_index("event_type")
    assert got.loc["view"].tolist() == [1, 0, 0]
    assert got.loc["click"].tolist() == [0, 1, 0]
    assert got.loc["buy"].tolist() == [1, 1, 1]


def test_entry_exit_single_event_session_is_all_three(ray_session):
    out = entry_exit_pages(_ev([(1, 0, 1, "view")]))
    assert out.iloc[0].tolist() == ["view", 1, 1, 1]


def test_entry_exit_null_type_occupies_position(ray_session):
    # session [None, click]: no entry row anywhere, click is the exit
    out = entry_exit_pages(
        _ev([(1, 0, 1, None), (2, 60 * US, 1, "click")])
    )
    assert out["event_type"].tolist() == ["click"]
    assert out.iloc[0].tolist() == ["click", 0, 1, 0]


def test_entry_exit_null_ts_sorts_last(ray_session):
    # null-ts row stays in the prior session (q226 lag semantics) and
    # sorts LAST -> it is the exit
    out = entry_exit_pages(
        _ev([(1, 0, 1, "view"), (2, None, 1, "late")])
    )
    got = out.set_index("event_type")
    assert got.loc["view"].tolist() == [1, 0, 0]
    assert got.loc["late"].tolist() == [0, 1, 0]


def test_entry_exit_users_are_independent_sessions(ray_session):
    out = entry_exit_pages(
        _ev([(1, 0, 1, "a"), (2, 0, 2, "a")])
    )
    assert out.iloc[0].tolist() == ["a", 2, 2, 2]


def _caps(rows):
    """rows: (url, ts, hash_or_None)."""
    return rd.from_arrow(
        pa.table(
            {"url": pa.array([r[0] for r in rows], type=pa.string()),
             "ts": pa.array([r[1] for r in rows], type=pa.int64()),
             "content_hash": pa.array([r[2] for r in rows],
                                      type=pa.string())}
        )
    )


def test_change_rate_buckets(ray_session):
    ds = _caps([
        ("fast", 0, "a"), ("fast", 1, "b"), ("fast", 2, "c"),
        ("slow", 0, "a"), ("slow", 1, "a"), ("slow", 2, "a"),
        ("slow", 3, "b"),
        ("static", 0, "a"), ("static", 1, "a"),
        ("once", 0, "a"),
    ])
    out = change_rate(ds).to_pandas().set_index("url")
    assert out.loc["fast"].tolist() == [3, 2, 1.0, "fast"]
    assert out.loc["slow"].tolist() == [4, 1, _round6(1 / 3), "slow"]
    assert out.loc["static"].tolist() == [2, 0, 0.0, "static"]
    assert out.loc["once"].tolist() == [1, 0, -1.0, "unknown"]


def _round6(x: float) -> float:
    return float(np.sign(x) * np.floor(abs(x) * 1e6 + 0.5) / 1e6)


def test_change_rate_null_hash_is_distinct_from(ray_session):
    # a -> NULL -> NULL -> a : changes at cap 2 (a->NULL) and cap 4
    # (NULL->a); NULL->NULL is NOT a change
    ds = _caps([("u", 0, "a"), ("u", 1, None), ("u", 2, None),
                ("u", 3, "a")])
    out = change_rate(ds).to_pandas()
    assert out.iloc[0]["n_changes"] == 2
    assert out.iloc[0]["n_caps"] == 4


def test_change_rate_threshold_boundary(ray_session):
    # rate exactly 0.5 -> fast (>= threshold)
    ds = _caps([("u", 0, "a"), ("u", 1, "b"), ("u", 2, "b")])
    out = change_rate(ds).to_pandas()
    assert out.iloc[0]["revisit"] == "fast"
    assert out.iloc[0]["change_rate"] == 0.5


def test_entry_exit_null_user_drops(ray_session):
    # null-key rows own no session on EITHER engine (pandas would give
    # each its own session; a SQL window would merge all NULLs) —
    # review fix: both now drop them
    out = entry_exit_pages(
        _ev([(1, 0, None, "a"), (2, 60 * US, None, "b"),
             (3, 0, 1, "a")])
    )
    got = out.set_index("event_type")
    assert got.loc["a"].tolist() == [1, 1, 1]  # only user 1's bounce
    assert "b" not in got.index


def test_change_rate_tied_ts_breaks_by_hash(ray_session):
    # equal (url, ts) captures with different hashes: the hash
    # tie-break pins visit order to a-then-b on both engines
    # (a@4, then ties a,b at 5 -> changes: a->a no, a->b yes = 1)
    ds = _caps([("u", 5, "b"), ("u", 4, "a"), ("u", 5, "a")])
    out = change_rate(ds).to_pandas()
    assert out.iloc[0]["n_changes"] == 1
    assert out.iloc[0]["n_caps"] == 3


def test_content_survival_hand_computed(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.snapshots import (
        content_survival,
    )

    # url u1: a,a,b  (age1 unchanged, age2 changed)
    # url u2: a,b    (age1 changed)
    # age1: at_risk 2, changed 1 -> hazard .5, survival .5
    # age2: at_risk 1, changed 1 -> hazard 1 -> survival 0 (extinction)
    ds = _caps([("u1", 0, "a"), ("u1", 1, "a"), ("u1", 2, "b"),
                ("u2", 0, "a"), ("u2", 1, "b")])
    out = content_survival(ds).set_index("age")
    assert out.loc[1][["n_at_risk", "n_changed"]].tolist() == [2, 1]
    assert out.loc[1]["hazard"] == 0.5
    assert out.loc[1]["survival"] == 0.5
    assert out.loc[2]["hazard"] == 1.0
    assert out.loc[2]["survival"] == 0.0


def test_content_survival_null_hash_boundary(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.snapshots import (
        content_survival,
    )

    # a -> NULL is a change; NULL -> NULL is not
    ds = _caps([("u", 0, "a"), ("u", 1, None), ("u", 2, None)])
    out = content_survival(ds).set_index("age")
    assert out.loc[1]["n_changed"] == 1
    assert out.loc[2]["n_changed"] == 0


def test_content_survival_single_captures_empty(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.snapshots import (
        content_survival,
    )

    out = content_survival(_caps([("u", 0, "a"), ("v", 0, "b")]))
    assert len(out) == 0
