"""Markov transition matrix (stages/markov.py): plain-Python reference
equivalence, ordering tie-breaks, partition invariance, probability
invariants."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.markov import transition_matrix


def _events(rows):
    ids, users, tss, types = zip(*rows)
    return pa.table(
        {
            "event_id": pa.array(ids, type=pa.int64()),
            "user_id": pa.array(users, type=pa.int64()),
            "ts": pa.array(
                np.array(tss, dtype="datetime64[us]"), type=pa.timestamp("us")
            ),
            "event_type": pa.array(types, type=pa.string()),
        }
    )


ROWS = [
    # (event_id, user_id, ts, event_type)
    (1, 1, "2024-01-01T00:00", "view"),
    (2, 1, "2024-01-01T00:01", "click"),
    (3, 1, "2024-01-01T00:02", "view"),
    (4, 2, "2024-01-01T00:00", "view"),
    (5, 2, "2024-01-01T00:03", "purchase"),
    (6, 3, "2024-01-01T00:00", "click"),  # single-transition user below
    (7, 3, "2024-01-01T00:05", "click"),
    (8, 4, "2024-01-01T00:00", "view"),  # lone event: no transition
]


def _reference(rows):
    by_user = {}
    for eid, uid, ts, et in rows:
        by_user.setdefault(uid, []).append((ts, eid, et))
    pairs = {}
    for evs in by_user.values():
        evs.sort()
        for a, b in zip(evs, evs[1:]):
            pairs[(a[2], b[2])] = pairs.get((a[2], b[2]), 0) + 1
    totals = {}
    for (c, _), n in pairs.items():
        totals[c] = totals.get(c, 0) + n
    return {k: (n, n / totals[k[0]]) for k, n in pairs.items()}


def test_matches_reference(ray_session):
    out = transition_matrix(rd.from_arrow(_events(ROWS)))
    ref = _reference(ROWS)
    got = {(r.cur, r.nxt): (r.n, r.p) for r in out.itertuples()}
    assert set(got) == set(ref)
    for k, (n, p) in ref.items():
        assert got[k][0] == n
        np.testing.assert_allclose(got[k][1], p, atol=1e-12)


def test_partition_invariant(ray_session):
    t = _events(ROWS)
    a = transition_matrix(rd.from_arrow(t))
    b = transition_matrix(rd.from_arrow(t).repartition(5), num_parts=7)
    pd.testing.assert_frame_equal(a, b)


def test_tie_broken_by_order_cols(ray_session):
    # two events at the SAME ts: event_id decides the order
    rows = [
        (10, 9, "2024-01-01T00:00", "a"),
        (11, 9, "2024-01-01T00:00", "b"),
        (12, 9, "2024-01-01T00:01", "c"),
    ]
    out = transition_matrix(rd.from_arrow(_events(rows)))
    got = {(r.cur, r.nxt) for r in out.itertuples()}
    assert got == {("a", "b"), ("b", "c")}


def test_probabilities_sum_to_one_per_cur(ray_session):
    out = transition_matrix(rd.from_arrow(_events(ROWS)))
    sums = out.groupby("cur")["p"].sum()
    np.testing.assert_allclose(sums.to_numpy(), 1.0, atol=1e-12)


def test_empty_and_lone_events(ray_session):
    empty = transition_matrix(
        rd.from_arrow(_events([(1, 1, "2024-01-01T00:00", "view")]))
    )
    assert len(empty) == 0
    assert list(empty.columns) == ["cur", "nxt", "n", "p"]


# --- top_event_paths -----------------------------------------------------


def test_top_paths_matches_brute(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.markov import top_event_paths

    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 25, n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
            "event_id": np.arange(n),
            "event_type": rng.choice(list("abcd"), n),
        }
    )
    out = top_event_paths(
        rd.from_pandas(df).repartition(6), path_len=3, k=10
    )
    s = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    paths = []
    for _, sub in s.groupby("user_id"):
        e = sub.event_type.tolist()
        paths += [">".join(e[i : i + 3]) for i in range(len(e) - 2)]
    exp = (
        pd.Series(paths).value_counts().rename_axis("path").reset_index(name="n")
        .sort_values(["n", "path"], ascending=[False, True], kind="mergesort")
        .head(10)
        .reset_index(drop=True)
    )
    assert list(out.path) == list(exp.path)
    assert list(out.n) == list(exp.n)


def test_top_paths_never_crosses_users(ray_session):
    from ai_service_ocr_grading_handler_ray.stages.markov import top_event_paths

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 2],
            "ts": pd.to_datetime(["2024-01-01"] * 4) + pd.to_timedelta([0, 1, 2, 3], unit="s"),
            "event_id": [0, 1, 2, 3],
            "event_type": ["a", "b", "c", "d"],
        }
    )
    out = top_event_paths(rd.from_pandas(df), path_len=3, k=5)
    assert len(out) == 0  # no user has 3 consecutive events
