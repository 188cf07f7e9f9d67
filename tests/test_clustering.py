"""Distributed k-means (stages/clustering) vs a plain numpy Lloyd
reference: multi-iteration equivalence, block-layout invariance,
deterministic seeding, empty-cluster convention."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.clustering import (
    assign_clusters,
    kmeans_fit,
    kmeans_iterate,
    smallest_k_vectors,
)


def _lloyd_reference(V: np.ndarray, C: np.ndarray, n_iter: int) -> np.ndarray:
    C = C.astype(np.float64).copy()
    for _ in range(n_iter):
        d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for j in range(len(C)):
            if (a == j).any():
                C[j] = V[a == j].mean(axis=0)
    return C


def _ds(V: np.ndarray, nparts: int = 4) -> rd.Dataset:
    df = pd.DataFrame(
        {"vec_id": np.arange(len(V)), "embedding": [list(map(float, v)) for v in V]}
    )
    return rd.from_pandas(df).repartition(nparts)


def test_kmeans_matches_numpy_lloyd():
    rng = np.random.default_rng(7)
    V = rng.normal(size=(300, 8)) + np.repeat(
        rng.normal(scale=6.0, size=(3, 8)), 100, axis=0
    )
    ds = _ds(V)
    got = kmeans_fit(ds, k=3, n_iter=5, id_col="vec_id", vec_col="embedding")
    want = _lloyd_reference(V, V[:3], 5)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_kmeans_block_layout_invariant():
    rng = np.random.default_rng(11)
    V = rng.normal(size=(120, 5))
    a = kmeans_fit(_ds(V, 1), k=4, n_iter=3, id_col="vec_id", vec_col="embedding")
    b = kmeans_fit(_ds(V, 9), k=4, n_iter=3, id_col="vec_id", vec_col="embedding")
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


def test_smallest_k_seed_is_order_independent():
    rng = np.random.default_rng(3)
    V = rng.normal(size=(50, 4))
    df = pd.DataFrame(
        {"vec_id": np.arange(50), "embedding": [list(map(float, v)) for v in V]}
    ).sample(frac=1.0, random_state=5)  # shuffled row order
    ds = rd.from_pandas(df).repartition(6)
    seeds = smallest_k_vectors(ds, id_col="vec_id", vec_col="embedding", k=3)
    np.testing.assert_allclose(seeds, V[:3])


def test_empty_cluster_keeps_previous_centroid():
    # all points at the origin; the far-away second seed attracts nothing
    V = np.zeros((10, 3))
    C0 = np.array([[0.0, 0.0, 0.0], [100.0, 100.0, 100.0]])
    out = kmeans_iterate(_ds(V, 2), C0, vec_col="embedding", n_iter=2)
    np.testing.assert_allclose(out[0], np.zeros(3))
    np.testing.assert_allclose(out[1], C0[1])


def test_assign_clusters_ties_break_to_lowest_index():
    V = np.array([[0.0, 0.0], [2.0, 0.0], [1.0, 0.0]])  # row 2 is equidistant
    C = np.array([[0.0, 0.0], [2.0, 0.0]])
    out = (
        assign_clusters(_ds(V, 1), C, vec_col="embedding", keep_cols=["vec_id"])
        .to_pandas()
        .sort_values("vec_id")
    )
    assert list(out["cluster"]) == [0, 1, 0]


def test_kmeans_fit_rejects_too_few_rows():
    with pytest.raises(ValueError, match="k="):
        kmeans_fit(_ds(np.zeros((2, 3)), 1), k=5, n_iter=1,
                   id_col="vec_id", vec_col="embedding")


def _prune_replay(V, C, keep_frac=0.5):
    import math

    d2p = (C * C).sum(axis=1)[None, :] - 2.0 * (V @ C.T)
    a = np.argmin(d2p, axis=1)
    d2 = (V * V).sum(axis=1) + d2p[np.arange(len(a)), a]
    kept = []
    for j in np.unique(a):
        idx = np.flatnonzero(a == j)
        vals = np.sort(d2[idx])
        thr = vals[max(1, math.ceil(keep_frac * len(idx))) - 1]
        kept.extend(idx[d2[idx] <= thr])
    return sorted(kept)


def test_cluster_prune_matches_replay():
    from ai_service_ocr_grading_handler_ray.stages.clustering import cluster_prune

    rng = np.random.default_rng(17)
    V = rng.normal(size=(200, 6))
    C = V[:3].copy()
    got = (
        cluster_prune(_ds(V, 5), C, id_col="vec_id", vec_col="embedding")
        .to_pandas()
        .sort_values("vec_id")
    )
    assert list(got["vec_id"]) == _prune_replay(V, C)
    # pruning keeps roughly half of each cluster (ties can exceed)
    assert 90 <= len(got) <= 120


def test_cluster_prune_keeps_all_threshold_ties():
    from ai_service_ocr_grading_handler_ray.stages.clustering import cluster_prune

    # 4 points at distance 0 and 4 at equal distance 1 → threshold is 0
    # at ceil(8/2)=4th smallest → only the 4 zero-distance rows survive;
    # with 5 zeros the tie group at the threshold value is kept whole
    V = np.array([[0.0]] * 5 + [[1.0]] * 3)
    C = np.array([[0.0]])
    got = cluster_prune(_ds(V, 2), C, id_col="vec_id", vec_col="embedding").to_pandas()
    assert sorted(got["vec_id"]) == [0, 1, 2, 3, 4]


def test_kmeans_iterate_empty_input_keeps_centroids():
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.clustering import kmeans_iterate

    empty = rd.from_pandas(
        pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                      "embedding": pd.Series([], dtype="object")})
    )
    C = np.array([[1.0, 2.0], [3.0, 4.0]])
    out = kmeans_iterate(empty, C, vec_col="embedding", n_iter=2)
    np.testing.assert_allclose(out, C)
