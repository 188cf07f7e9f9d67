"""Changelog compaction (stages/changelog.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.changelog import apply_changelog


def _base(rows):
    return rd.from_pandas(pd.DataFrame(rows, columns=["url", "content_hash"]))


def _log(rows):
    return rd.from_pandas(
        pd.DataFrame(rows, columns=["url", "seq", "op", "content_hash"])
    )


def _result(base, log, **kw):
    out = apply_changelog(_base(base), _log(log), **kw).to_pandas()
    return {
        u: (h, int(s))
        for u, h, s in zip(out["url"], out["content_hash"], out["last_seq"])
    }


def test_upsert_delete_insert_untouched(ray_session):
    base = [("a", "h_a"), ("b", "h_b"), ("c", "h_c")]
    log = [
        ("a", 3, "upsert", "h_a2"),    # update existing
        ("b", 1, "delete", ""),        # delete existing
        ("d", 2, "upsert", "h_d"),     # insert new
        ("e", 5, "delete", ""),        # delete absent: no-op
    ]
    got = _result(base, log)
    assert got == {"a": ("h_a2", 3), "c": ("h_c", -1), "d": ("h_d", 2)}


def test_latest_seq_wins_including_delete_then_upsert(ray_session):
    base = [("a", "h0")]
    log = [
        ("a", 1, "upsert", "h1"),
        ("a", 2, "delete", ""),
        ("a", 3, "upsert", "h3"),      # resurrect after delete
        ("b", 1, "upsert", "hb1"),
        ("b", 2, "delete", ""),        # delete wins for b
    ]
    got = _result(base, log)
    assert got == {"a": ("h3", 3)}


def test_duplicate_key_seq_raises(ray_session):
    base = [("a", "h0")]
    log = [("a", 1, "upsert", "x"), ("a", 1, "upsert", "y")]
    with pytest.raises(Exception, match="duplicate"):
        _result(base, log)


def test_negative_seq_and_bad_op_raise(ray_session):
    base = [("a", "h0")]
    with pytest.raises(Exception, match="seq"):
        _result(base, [("a", -1, "upsert", "x")])
    with pytest.raises(Exception, match="unknown op"):
        _result(base, [("a", 1, "replace", "x")])


def test_matches_brute_random(ray_session):
    rng = np.random.RandomState(17)
    base = [(f"u{i}", f"h{i}") for i in range(80)]
    log = []
    seq = 0
    for _ in range(300):
        u = f"u{rng.randint(120)}"  # some keys beyond the base
        op = "delete" if rng.rand() < 0.3 else "upsert"
        log.append((u, seq, op, f"n{seq}"))
        seq += 1
    got = _result(base, log)
    # brute force
    latest = {u: (h, -1, "base") for u, h in base}
    for u, s, op, h in log:
        if u not in latest or latest[u][1] < s:
            latest[u] = (h, s, op)
    ref = {
        u: (h, s) for u, (h, s, op) in latest.items() if op != "delete"
    }
    assert got == ref
