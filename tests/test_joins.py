"""Explicit bucketed hash join vs the built-in Dataset.join."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.joins import bucketed_inner_join


def test_matches_dataset_join(sf_dir):
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    mine = (
        bucketed_inner_join(
            orders, cust, left_key="o_custkey", right_key="c_custkey", n_buckets=8
        )
        .to_pandas()
        .sort_values(["o_orderkey"])
        .reset_index(drop=True)
    )
    builtin = (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
        .join(
            rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]),
            join_type="inner",
            num_partitions=4,
            on=("o_custkey",),
            right_on=("c_custkey",),
        )
        .to_pandas()
        .sort_values(["o_orderkey"])
        .reset_index(drop=True)
    )
    assert len(mine) == len(builtin) == 1500
    assert mine["o_orderkey"].tolist() == builtin["o_orderkey"].tolist()
    assert mine["c_mktsegment"].tolist() == builtin["c_mktsegment"].tolist()


def test_no_match_keys_dropped():
    l = rd.from_arrow(pa.table({"k": [1, 2, 3], "a": ["x", "y", "z"]}))
    r = rd.from_arrow(pa.table({"j": [2, 3, 4], "b": ["p", "q", "r"]}))
    out = bucketed_inner_join(l, r, left_key="k", right_key="j").to_pandas()
    assert sorted(out["k"]) == [2, 3]


def test_overlapping_columns_rejected():
    l = rd.from_arrow(pa.table({"k": [1], "v": [1]}))
    r = rd.from_arrow(pa.table({"k2": [1], "v": [2]}))
    with pytest.raises(ValueError, match="overlap"):
        bucketed_inner_join(l, r, left_key="k", right_key="k2")


def test_asof_join_string_key():
    """String join keys must bucket deterministically across worker
    processes (blake2b, not PYTHONHASHSEED-randomized hash())."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.asof import asof_join_backward

    left = pa.table(
        {
            "k": ["a", "a", "b", "c"],
            "lts": pa.array([10, 30, 20, 5], type=pa.timestamp("us")),
            "lv": [1, 2, 3, 4],
        }
    )
    right = pa.table(
        {
            "k": ["a", "a", "b"],
            "rts": pa.array([5, 25, 15], type=pa.timestamp("us")),
            "rv": [100, 200, 300],
        }
    )
    out = (
        asof_join_backward(
            rd.from_arrow(left), rd.from_arrow(right),
            key="k", left_ts="lts", right_ts="rts",
        )
        .to_pandas()
        .sort_values(["k", "lts"])
        .reset_index(drop=True)
    )
    assert out["rv"].tolist() == [100, 200, 300, pd.NA] or (
        out["rv"].tolist()[:3] == [100, 200, 300] and pd.isna(out["rv"].iloc[3])
    )


def test_skewed_join_equals_bucketed_join():
    """Hot-key broadcast plan ∪ cold bucketed plan must equal the plain
    bucketed join, including a forced giant hot key."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.joins import (
        bucketed_inner_join,
        skewed_inner_join,
    )

    n = 2000
    # key 7 owns ~40% of the left side (the giant-host shape)
    keys = [7 if i % 5 < 2 else (i % 50) for i in range(n)]
    left = pa.table(
        {"k": pa.array(keys, type=pa.int64()),
         "v": pa.array(list(range(n)), type=pa.int64())}
    )
    right = pa.table(
        {"rk": pa.array(list(range(50)), type=pa.int64()),
         "tag": [f"t{i}" for i in range(50)]}
    )

    plain = (
        bucketed_inner_join(
            rd.from_arrow(left), rd.from_arrow(right), left_key="k", right_key="rk"
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    skewed = (
        skewed_inner_join(
            rd.from_arrow(left), rd.from_arrow(right),
            left_key="k", right_key="rk", hot_k=4,
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    # dtype flavor may differ (bucketed cold path restores ints as
    # pandas nullable Int64; the all-broadcast path keeps arrow int64) —
    # values and KIND must match (the driver hashes raw values)
    pd.testing.assert_frame_equal(plain, skewed, check_like=True, check_dtype=False)
    assert plain["k"].dtype.kind == "i" and skewed["k"].dtype.kind == "i"


def test_asof_join_matches_pandas_reference():
    """Randomized as-of join vs a direct pandas merge_asof reference
    (per-key, driver-side) — exercises bucketing, typed-null widening,
    and int restoration across many shapes."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.asof import asof_join_backward

    rng = np.random.default_rng(7)
    for trial in range(3):
        nl, nr = 400, 150
        lk = rng.integers(0, 40, nl)
        lts = rng.integers(0, 10_000, nl) * 1000
        rk = rng.integers(0, 40, nr)
        rts_raw = rng.integers(0, 10_000, nr) * 1000
        # one right row per (key, ts): dedupe for deterministic ties
        rdf = (
            pd.DataFrame({"k": rk, "rts": rts_raw, "rv": np.arange(nr)})
            .groupby(["k", "rts"], as_index=False)
            .agg(rv=("rv", "max"))
        )
        left = pa.table(
            {"k": pa.array(lk, type=pa.int64()),
             "lts": pa.array(lts.astype("datetime64[us]")),
             "lv": pa.array(np.arange(nl), type=pa.int64())}
        )
        right = pa.table(
            {"k": pa.array(rdf["k"].to_numpy(), type=pa.int64()),
             "rts": pa.array(rdf["rts"].to_numpy().astype("datetime64[us]")),
             "rv": pa.array(rdf["rv"].to_numpy(), type=pa.int64())}
        )
        out = (
            asof_join_backward(
                rd.from_arrow(left), rd.from_arrow(right),
                key="k", left_ts="lts", right_ts="rts",
            )
            .to_pandas()
            .sort_values(["k", "lts", "lv"])
            .reset_index(drop=True)
        )
        # reference: per-key pandas merge_asof on the driver
        ldf = left.to_pandas().sort_values("lts", kind="mergesort")
        rr = right.to_pandas().sort_values("rts", kind="mergesort")
        ref = pd.merge_asof(ldf, rr, left_on="lts", right_on="rts",
                            by="k", direction="backward")
        ref = ref.sort_values(["k", "lts", "lv"]).reset_index(drop=True)
        assert len(out) == len(ref) == nl
        for col in ["k", "lv"]:
            assert out[col].astype("int64").tolist() == ref[col].astype("int64").tolist()
        a = out["rv"].astype("Int64")
        b = ref["rv"].astype("Int64")
        assert a.isna().equals(b.isna())
        assert a.dropna().tolist() == b.dropna().tolist()
        assert out["rv"].dtype.kind in "i" or str(out["rv"].dtype) == "Int64"


def test_bucketed_join_tolerates_nullable_int_columns():
    """A source with nulls in a non-key int column must join (nullable
    Int64 restoration), not crash on an int64 astype of NaN."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.joins import bucketed_inner_join

    left = pa.table(
        {"k": pa.array([1, 2, 3], type=pa.int64()),
         "opt": pa.array([10, None, 30], type=pa.int64())}
    )
    right = pa.table(
        {"rk": pa.array([1, 2, 3], type=pa.int64()),
         "tag": ["a", "b", "c"]}
    )
    out = (
        bucketed_inner_join(
            rd.from_arrow(left), rd.from_arrow(right), left_key="k", right_key="rk"
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["k"].astype("int64").tolist() == [1, 2, 3]
    assert pd.isna(out["opt"].iloc[1]) and int(out["opt"].iloc[0]) == 10


def test_skewed_join_rejects_unsupported_auto_detect_key():
    """Float keys can't round-trip through the MG sketch's stringified
    counters — auto-detection must refuse instead of silently running
    the whole plan with an empty hot set.  Detection only runs on the
    large-right path (a dimension-sized right broadcasts whole, no
    detection needed), so force it with broadcast_right_limit=0."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.joins import skewed_inner_join

    left = pa.table({"k": pa.array([1.5, 2.5]), "v": [1, 2]})
    right = pa.table({"rk": pa.array([1.5]), "tag": ["a"]})
    with pytest.raises(TypeError, match="pass hot_keys"):
        skewed_inner_join(
            rd.from_arrow(left), rd.from_arrow(right), left_key="k", right_key="rk",
            broadcast_right_limit=0,
        )

    # the broadcast path needs no detection: same float key, small right —
    # must succeed and equal a plain pandas merge
    got = (
        skewed_inner_join(
            rd.from_arrow(left), rd.from_arrow(right), left_key="k", right_key="rk"
        )
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    assert got["k"].tolist() == [1.5] and got["tag"].tolist() == ["a"]


def test_skewed_join_bucketed_cold_branch_equals_broadcast_cold():
    """Forcing the bucketed cold path (broadcast_right_limit=0) must
    produce the same rows as the default dimension-broadcast cold path."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.joins import skewed_inner_join

    n = 2000
    keys = [7 if i % 5 < 2 else (i % 50) for i in range(n)]
    left = pa.table(
        {"k": pa.array(keys, type=pa.int64()),
         "v": pa.array(list(range(n)), type=pa.int64())}
    )
    right = pa.table(
        {"rk": pa.array(list(range(50)), type=pa.int64()),
         "tag": [f"t{i}" for i in range(50)]}
    )

    def run(limit):
        return (
            skewed_inner_join(
                rd.from_arrow(left), rd.from_arrow(right),
                left_key="k", right_key="rk", hot_k=4,
                broadcast_right_limit=limit,
            )
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )

    a, b = run(200_000), run(0)
    pd.testing.assert_frame_equal(a, b, check_like=True, check_dtype=False)
    assert a["k"].dtype.kind == "i" and b["k"].dtype.kind == "i"


def test_asof_join_directions_match_pandas():
    """forward / nearest directions must equal a single-node merge_asof
    over the same frames (backward is oracle-covered by q47)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.asof import asof_join_backward

    rng = np.random.default_rng(3)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 20, 500).astype("int64"),
            "ts": pd.to_datetime(rng.integers(0, 10**6, 500), unit="s").astype("datetime64[us]"),
            "lv": np.arange(500, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 20, 200).astype("int64"),
            "rts": pd.to_datetime(rng.integers(0, 10**6, 200), unit="s").astype("datetime64[us]"),
            "rv": np.arange(200, dtype="int64"),
        }
    )
    # deterministic ties: one row per (k, rts)
    right = right.drop_duplicates(["k", "rts"]).reset_index(drop=True)

    for direction in ("forward", "nearest"):
        got = (
            asof_join_backward(
                rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)),
                rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)),
                key="k", left_ts="ts", right_ts="rts", direction=direction,
            )
            .to_pandas()
            .sort_values(["k", "ts", "lv"], kind="mergesort")
            .reset_index(drop=True)
        )
        ref = pd.merge_asof(
            left.sort_values("ts", kind="mergesort"),
            right.sort_values("rts", kind="mergesort"),
            left_on="ts", right_on="rts", by="k", direction=direction,
        ).sort_values(["k", "ts", "lv"], kind="mergesort").reset_index(drop=True)
        for c in ("rv",):
            ref[c] = ref[c].astype("Int64")
        pd.testing.assert_frame_equal(
            got[["k", "ts", "lv", "rts", "rv"]],
            ref[["k", "ts", "lv", "rts", "rv"]],
            check_dtype=False,
        )


def test_asof_join_right_tiebreak_deterministic():
    """Duplicate (key, right_ts) rows: right_tiebreak picks the row with
    the LARGEST tiebreak for backward (last eligible) and forward (first
    eligible) — equivalent to the groupby(key, ts).max() pre-aggregate,
    without its shuffle."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.asof import asof_join_backward

    rng = np.random.default_rng(11)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 8, 300).astype("int64"),
            "ts": pd.to_datetime(rng.integers(0, 10**5, 300), unit="s").astype("datetime64[us]"),
            "lv": np.arange(300, dtype="int64"),
        }
    )
    # heavy duplication on (k, rts): ~4 rows per (k, ts) pair on average
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 8, 400).astype("int64"),
            "rts": pd.to_datetime(rng.integers(0, 10**5 // 100, 400) * 100, unit="s").astype("datetime64[us]"),
            "rv": rng.permutation(400).astype("int64"),
        }
    )

    for direction in ("backward", "forward"):
        got = (
            asof_join_backward(
                rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)),
                rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)),
                key="k", left_ts="ts", right_ts="rts",
                direction=direction, right_tiebreak=["rv"],
            )
            .to_pandas()
            .sort_values(["k", "ts", "lv"], kind="mergesort")
            .reset_index(drop=True)
        )
        # reference: pre-aggregate to max(rv) per (k, rts), plain merge_asof
        agg = (
            right.groupby(["k", "rts"], as_index=False)["rv"].max()
            .sort_values("rts", kind="mergesort")
        )
        ref = pd.merge_asof(
            left.sort_values("ts", kind="mergesort"),
            agg,
            left_on="ts", right_on="rts", by="k", direction=direction,
        ).sort_values(["k", "ts", "lv"], kind="mergesort").reset_index(drop=True)
        ref["rv"] = ref["rv"].astype("Int64")
        pd.testing.assert_frame_equal(
            got[["k", "ts", "lv", "rts", "rv"]],
            ref[["k", "ts", "lv", "rts", "rv"]],
            check_dtype=False,
        )


def test_asof_join_schema_hints_match_probed():
    """Passing left_schema/right_schema (skipping the limit-1 probe
    executions) must not change the output."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.asof import asof_join_backward

    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 100).astype("int64"),
            "ts": pd.to_datetime(rng.integers(0, 10**4, 100), unit="s").astype("datetime64[us]"),
            "lv": np.arange(100, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 50).astype("int64"),
            "rts": pd.to_datetime(rng.integers(0, 10**4, 50), unit="s").astype("datetime64[us]"),
            "rv": np.arange(50, dtype="int64"),
        }
    ).drop_duplicates(["k", "rts"])
    lt = pa.Table.from_pandas(left, preserve_index=False)
    rt = pa.Table.from_pandas(right, preserve_index=False)

    probed = asof_join_backward(
        rd.from_arrow(lt), rd.from_arrow(rt), key="k", left_ts="ts", right_ts="rts"
    ).to_pandas().sort_values(["k", "ts", "lv"]).reset_index(drop=True)
    hinted = asof_join_backward(
        rd.from_arrow(lt), rd.from_arrow(rt), key="k", left_ts="ts", right_ts="rts",
        left_schema=lt.schema, right_schema=rt.schema,
    ).to_pandas().sort_values(["k", "ts", "lv"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(probed, hinted)


# --- bucketed_outer_join ----------------------------------------------------


def _outer_fixture():
    import pyarrow as pa

    left = pa.table(
        {"lk": pa.array([1, 2, 3, 3], type=pa.int64()),
         "lval": ["a", "b", "c", "d"]}
    )
    right = pa.table(
        {"rk": pa.array([2, 3, 3, 9], type=pa.int64()),
         "rval": pa.array([20, 30, 31, 90], type=pa.int64())}
    )
    return left, right


def _outer_pandas(how):
    left, right = _outer_fixture()
    lg, rg = left.to_pandas(), right.to_pandas()
    m = lg.merge(rg, left_on="lk", right_on="rk",
                 how={"left": "left", "right": "right", "full": "outer"}[how])
    if how in ("right", "full"):
        m["lk"] = m["lk"].where(m["lk"].notna(), m["rk"])
    m = m.drop(columns=["rk"])
    return m.sort_values(["lk", "lval", "rval"], na_position="last").reset_index(drop=True)


def _outer_ray(how, n_buckets=4):
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.joins import bucketed_outer_join

    left, right = _outer_fixture()
    out = bucketed_outer_join(
        rd.from_arrow(left).repartition(2),
        rd.from_arrow(right).repartition(3),
        left_key="lk",
        right_key="rk",
        how=how,
        n_buckets=n_buckets,
    ).to_pandas()
    out["lk"] = out["lk"].astype("Int64")
    out["rval"] = out["rval"].astype("Int64")
    return out.sort_values(["lk", "lval", "rval"], na_position="last").reset_index(drop=True)


@pytest.mark.parametrize("how", ["left", "right", "full"])
def test_outer_join_matches_pandas(ray_session, how):
    got = _outer_ray(how)
    exp = _outer_pandas(how)
    exp["lk"] = exp["lk"].astype("Int64")
    exp["rval"] = exp["rval"].astype("Int64")
    pd.testing.assert_frame_equal(
        got[["lk", "lval", "rval"]], exp[["lk", "lval", "rval"]]
    )


def test_outer_join_dangling_sides(ray_session):
    got = _outer_ray("full")
    # left-only key 1 and right-only key 9 both survive
    assert 1 in got.lk.tolist() and 9 in got.lk.tolist()
    row9 = got[got.lk == 9].iloc[0]
    assert pd.isna(row9.lval) and row9.rval == 90


def test_outer_join_rejects_bad_how(ray_session):
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.joins import bucketed_outer_join

    left, right = _outer_fixture()
    with pytest.raises(ValueError, match="how must be"):
        bucketed_outer_join(
            rd.from_arrow(left), rd.from_arrow(right),
            left_key="lk", right_key="rk", how="inner",
        )
