"""Round-5 additions B: golden-record survivorship merge, day-of-week
seasonality, PCA projection invariants."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.linalg import pca_fit, pca_project
from ai_service_ocr_grading_handler_ray.stages.sequence import golden_record
from ai_service_ocr_grading_handler_ray.stages.trend import dow_seasonality


class TestGoldenRecord:
    def _events(self, rows):
        """rows: (event_id, ts_us, user_id, event_type, value)."""
        return rd.from_arrow(
            pa.table(
                {
                    "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                    "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
                    "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
                    "event_type": pa.array([r[3] for r in rows], type=pa.string()),
                    "value": pa.array([r[4] for r in rows], type=pa.float64()),
                }
            )
        )

    def test_fieldwise_latest_non_null(self, ray_session):
        rows = [
            (1, 100, 7, "a", 1.0),
            (2, 200, 7, None, 2.0),   # latest value, type stays "b"...
            (3, 300, 7, "b", None),   # latest type, value stays 2.0
            (4, 100, 8, None, None),  # all-null columns stay null
        ]
        out = (
            golden_record(
                self._events(rows), key_col="user_id", ts_col="ts",
                id_col="event_id", value_cols=["event_type", "value"],
            )
            .to_pandas().sort_values("user_id").reset_index(drop=True)
        )
        assert out["user_id"].tolist() == [7, 8]
        r7 = out.iloc[0]
        assert r7["n_versions"] == 3
        assert r7["event_type"] == "b" and r7["value"] == 2.0
        r8 = out.iloc[1]
        assert pd.isna(r8["event_type"]) and pd.isna(r8["value"])

    def test_ts_tie_breaks_by_id(self, ray_session):
        rows = [(1, 100, 1, "x", 1.0), (2, 100, 1, "y", 2.0)]
        out = golden_record(
            self._events(rows), key_col="user_id", ts_col="ts",
            id_col="event_id", value_cols=["event_type", "value"],
        ).to_pandas()
        assert out.iloc[0]["event_type"] == "y"  # higher id wins the tie

    def test_null_keys_drop(self, ray_session):
        rows = [(1, 100, None, "x", 1.0), (2, 100, 2, "y", 2.0)]
        out = golden_record(
            self._events(rows), key_col="user_id", ts_col="ts",
            id_col="event_id", value_cols=["event_type", "value"],
        ).to_pandas()
        assert out["user_id"].tolist() == [2]


class TestDowSeasonality:
    def test_hand_computed(self, ray_session):
        # 1970-01-01 (Thu, dow 4): 1+2=3; 1970-01-08 (Thu): 5
        # 1970-01-04 (Sun, dow 0): 7
        day = 86_400_000_000
        ds = rd.from_arrow(
            pa.table(
                {
                    "ts": pa.array([0, 1, 7 * day, 3 * day],
                                   type=pa.timestamp("us")),
                    "value": pa.array([1.0, 2.0, 5.0, 7.0]),
                }
            )
        )
        out = dow_seasonality(ds)
        sun = out[out["dow"] == 0].iloc[0]
        thu = out[out["dow"] == 4].iloc[0]
        assert sun["n_days"] == 1 and sun["seasonal_mean"] == 7.0
        assert sun["residual_rms"] == 0.0
        assert thu["n_days"] == 2 and thu["seasonal_mean"] == 4.0  # (3+5)/2
        assert thu["residual_rms"] == pytest.approx(1.0, abs=1e-9)  # |3-4|

    def test_empty(self, ray_session):
        ds = rd.from_arrow(
            pa.table({"ts": pa.array([], type=pa.timestamp("us")),
                      "value": pa.array([], type=pa.float64())})
        )
        assert len(dow_seasonality(ds)) == 0


class TestPcaProject:
    def _vecs(self, V):
        return rd.from_arrow(
            pa.table(
                {"vec_id": pa.array(range(len(V)), type=pa.int64()),
                 "embedding": pa.array([list(map(float, v)) for v in V],
                                       type=pa.list_(pa.float32()))}
            )
        )

    def test_matches_numpy_and_invariants(self, ray_session):
        rng = np.random.default_rng(5)
        # anisotropic cloud so the eigen order is unambiguous
        V = rng.normal(size=(400, 6)) * np.array([10, 5, 2, 1, 0.5, 0.1])
        ds = self._vecs(V)
        mu, W = pca_fit(ds, 3, vec_col="embedding")
        # orthonormal components
        assert np.allclose(W.T @ W, np.eye(3), atol=1e-8)
        # matches driver-side eigh on the float32-rounded data
        Vf = V.astype(np.float32).astype(np.float64)
        muref = Vf.mean(axis=0)
        cov = (Vf - muref).T @ (Vf - muref) / len(Vf)
        w, v = np.linalg.eigh(cov)
        order = np.argsort(w)[::-1][:3]
        ref = v[:, order]
        for j in range(3):
            i = int(np.argmax(np.abs(ref[:, j])))
            if ref[i, j] < 0:
                ref[:, j] = -ref[:, j]
        assert np.allclose(mu, muref, atol=1e-6)
        assert np.allclose(W, ref, atol=1e-6)
        # projection: distributed == numpy
        out = (
            pca_project(ds, mu, W, vec_col="embedding", keep_cols=["vec_id"])
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
        )
        P = np.array([np.asarray(p) for p in out["pca"]])
        assert np.allclose(P, (Vf - mu) @ W, atol=1e-8)
        # variance concentrates in order
        var = P.var(axis=0)
        assert var[0] > var[1] > var[2]

    def test_layout_independent(self, ray_session):
        rng = np.random.default_rng(9)
        V = rng.normal(size=(300, 4))
        a = pca_fit(self._vecs(V), 2, vec_col="embedding")
        b = pca_fit(self._vecs(V).repartition(11), 2, vec_col="embedding")
        assert np.allclose(a[0], b[0], atol=1e-9)
        assert np.allclose(a[1], b[1], atol=1e-9)
