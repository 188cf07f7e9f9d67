"""Distributed moments/covariance/PCA (stages/linalg) vs numpy."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.linalg import (
    covariance,
    moments,
    pca_fit,
    pca_project,
)


def _ds(V, nparts=4):
    return rd.from_pandas(
        pd.DataFrame(
            {"vec_id": np.arange(len(V)),
             "embedding": [list(map(float, v)) for v in V]}
        )
    ).repartition(nparts)


def test_covariance_matches_numpy():
    rng = np.random.default_rng(5)
    V = rng.normal(size=(300, 7)) * np.arange(1, 8)
    mu, cov = covariance(_ds(V))
    np.testing.assert_allclose(mu, V.mean(axis=0), rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(cov, np.cov(V.T, bias=True), rtol=1e-8, atol=1e-10)


def test_moments_layout_invariant():
    rng = np.random.default_rng(6)
    V = rng.normal(size=(100, 4))
    a = moments(_ds(V, 1))
    b = moments(_ds(V, 8))
    assert a[0] == b[0] == 100
    np.testing.assert_allclose(a[1], b[1], rtol=1e-12)
    np.testing.assert_allclose(a[2], b[2], rtol=1e-12)


def test_pca_recovers_dominant_direction_and_projects():
    rng = np.random.default_rng(7)
    w = np.array([3.0, 1.0, 0.2])
    basis, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    V = rng.normal(size=(500, 3)) * w @ basis.T + np.array([5.0, -2.0, 1.0])
    mu, comps = pca_fit(_ds(V), k=2)
    # top component aligns with the largest-variance direction
    assert abs(float(comps[:, 0] @ basis[:, 0])) > 0.98
    # sign convention: max-|coefficient| entry positive
    for j in range(2):
        assert comps[np.argmax(np.abs(comps[:, j])), j] > 0
    out = pca_project(_ds(V), mu, comps, keep_cols=["vec_id"]).to_pandas()
    P = np.array(out.sort_values("vec_id")["pca"].tolist())
    np.testing.assert_allclose(P, (V - mu) @ comps, rtol=1e-8, atol=1e-9)
    # projections are centered and decorrelated
    np.testing.assert_allclose(P.mean(axis=0), 0, atol=1e-9)
    c = np.cov(P.T, bias=True)
    assert abs(c[0, 1]) < 1e-6 and c[0, 0] > c[1, 1]


def test_moments_empty_raises():
    empty = rd.from_pandas(
        pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                      "embedding": pd.Series([], dtype="object")})
    )
    with pytest.raises(ValueError, match="empty"):
        moments(empty)
