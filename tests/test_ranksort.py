"""Distributed global rank via sample-based range partitioning
(stages/ranksort.py)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.ranksort import global_rank


def _rank_df(df, **kw):
    out = global_rank(rd.from_pandas(df), **kw).to_pandas()
    return out.sort_values("rank").reset_index(drop=True)


def test_rank_matches_argsort_numeric(ray_session):
    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {"id": np.arange(5000), "v": rng.randint(0, 400, size=5000)}
    )
    out = _rank_df(df, key_col="v", id_col="id", num_buckets=16,
                   sample_per_block=8)
    ref = df.sort_values(["v", "id"], kind="mergesort").reset_index(drop=True)
    assert list(out["id"]) == list(ref["id"])
    assert list(out["rank"]) == list(range(1, 5001))
    assert out["rank"].dtype == np.int64


def test_rank_string_keys(ray_session):
    df = pd.DataFrame(
        {"id": [1, 2, 3, 4, 5], "k": ["m", "a", "zz", "a", "b"]}
    )
    out = _rank_df(df, key_col="k", id_col="id", num_buckets=4,
                   sample_per_block=2)
    assert list(out["id"]) == [2, 4, 5, 1, 3]   # (k, id) order
    assert list(out["rank"]) == [1, 2, 3, 4, 5]


def test_rank_heavy_skew_exact(ray_session):
    # one dominant key value: cuts collapse, ranks must stay exact
    df = pd.DataFrame(
        {"id": np.arange(3000), "v": np.zeros(3000, dtype=np.int64)}
    )
    df.loc[::100, "v"] = np.arange(30) + 1
    out = _rank_df(df, key_col="v", id_col="id", num_buckets=8,
                   sample_per_block=4)
    ref = df.sort_values(["v", "id"], kind="mergesort")
    assert list(out["id"]) == list(ref["id"])


def test_rank_null_keys_raise(ray_session):
    df = pd.DataFrame({"id": [1, 2], "v": [1.0, np.nan]})
    ds = rd.from_pandas(df).map_batches(
        lambda t: t, batch_format="pyarrow"
    )
    with pytest.raises(Exception, match="null keys"):
        global_rank(ds, key_col="v", id_col="id").to_pandas()


def test_rank_single_block_and_tiny(ray_session):
    df = pd.DataFrame({"id": [7], "v": [1.5]})
    out = _rank_df(df, key_col="v", id_col="id")
    assert list(out["rank"]) == [1]
