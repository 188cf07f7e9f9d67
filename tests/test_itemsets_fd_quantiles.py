"""Round-5 additions: association rules, FD audit, binned-quantile
sketch, k-center coreset — hand-computed fixtures and invariants."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.clustering import kcenter_coreset
from ai_service_ocr_grading_handler_ray.stages.histogram import binned_quantiles
from ai_service_ocr_grading_handler_ray.stages.itemsets import association_rules
from ai_service_ocr_grading_handler_ray.stages.profile import fd_audit


def _events(rows):
    """rows: (user_id, event_type)."""
    return rd.from_arrow(
        pa.table(
            {"user_id": pa.array([r[0] for r in rows], type=pa.int64()),
             "event_type": pa.array([r[1] for r in rows], type=pa.string())}
        )
    )


class TestAssociationRules:
    def test_hand_computed(self, ray_session):
        # baskets: u1 {a,b}, u2 {a,b}, u3 {a}, u4 {b,c} -> n_baskets=4
        rows = [(1, "a"), (1, "b"), (1, "b"),  # duplicate (1,b) collapses
                (2, "a"), (2, "b"), (3, "a"), (4, "b"), (4, "c")]
        out = association_rules(_events(rows), min_support=2)
        # only pair with support >= 2 is (a,b): supp=2
        assert len(out) == 2
        ab = out[(out["antecedent"] == "a") & (out["consequent"] == "b")].iloc[0]
        # conf(a->b) = 2/3; lift = (2/3) / (3/4) = 8/9
        assert ab["support"] == 2
        assert ab["confidence"] == pytest.approx(round(2 / 3, 6), abs=1e-9)
        assert ab["lift"] == pytest.approx(round((2 / 3) / (3 / 4), 6), abs=1e-9)
        ba = out[(out["antecedent"] == "b") & (out["consequent"] == "a")].iloc[0]
        assert ba["confidence"] == pytest.approx(round(2 / 3, 6), abs=1e-9)

    def test_null_rows_drop_and_empty(self, ray_session):
        ds = rd.from_arrow(
            pa.table(
                {"user_id": pa.array([1, None, 2], type=pa.int64()),
                 "event_type": pa.array(["a", "b", None], type=pa.string())}
            )
        )
        out = association_rules(ds, min_support=1)
        assert len(out) == 0  # no basket has two items


class TestFdAudit:
    def test_hand_computed(self, ray_session):
        # det=1: deps x,x,y (maj 2 -> 1 violation); det=2: z,z (exact)
        ds = rd.from_arrow(
            pa.table(
                {"s": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
                 "l": pa.array(["x", "x", "y", "z", "z"], type=pa.string())}
            )
        )
        out = fd_audit(ds, det_col="s", dep_col="l")
        r = out.iloc[0]
        assert r["n_groups"] == 2 and r["exact_groups"] == 1
        assert r["n_rows"] == 5 and r["violation_rows"] == 1
        assert r["violation_share"] == pytest.approx(0.2, abs=1e-9)

    def test_exact_fd(self, ray_session):
        ds = rd.from_arrow(
            pa.table({"s": pa.array([1, 2, 2]), "l": pa.array(["a", "b", "b"])})
        )
        r = fd_audit(ds, det_col="s", dep_col="l").iloc[0]
        assert r["violation_rows"] == 0 and r["exact_groups"] == 2


class TestBinnedQuantiles:
    def test_uniform_grid(self, ray_session):
        # 0..999: p50 target=500 -> interpolated near 500
        ds = rd.from_arrow(
            pa.table({"v": pa.array(np.arange(1000, dtype=np.float64))})
        )
        out = binned_quantiles(ds, value_col="v", qs=(0.5,), n_bins=100)
        r = out.iloc[0]
        assert r["n"] == 1000
        # bin width = 999/100 = 9.99; estimate within one bin of 499.5
        assert abs(r["estimate"] - 500.0) <= r["bin_width"] + 1e-9

    def test_error_bound_all_quantiles(self, ray_session):
        rng = np.random.default_rng(3)
        v = rng.normal(0, 10, size=20_000)
        ds = rd.from_arrow(pa.table({"v": pa.array(v)}))
        qs = (0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
        out = binned_quantiles(ds, value_col="v", qs=qs, n_bins=2048)
        for _, r in out.iterrows():
            exact = np.quantile(v, r["q"])
            assert abs(r["estimate"] - exact) <= 2 * r["bin_width"] + 1e-9

    def test_constant_and_empty(self, ray_session):
        ds = rd.from_arrow(pa.table({"v": pa.array([7.0, 7.0, 7.0])}))
        out = binned_quantiles(ds, value_col="v", qs=(0.5, 0.9))
        assert (out["estimate"] == 7.0).all() and (out["bin_width"] == 0).all()
        e = rd.from_arrow(pa.table({"v": pa.array([], type=pa.float64())}))
        assert len(binned_quantiles(e, value_col="v")) == 0

    def test_merge_property(self, ray_session):
        # the sketch folds per-batch counts by addition: any block layout
        # gives identical output
        v = np.arange(5000, dtype=np.float64)
        a = rd.from_arrow(pa.table({"v": pa.array(v)}))
        b = rd.from_arrow(pa.table({"v": pa.array(v)})).repartition(17)
        oa = binned_quantiles(a, value_col="v")
        ob = binned_quantiles(b, value_col="v")
        assert oa.equals(ob)


class TestKCenterCoreset:
    def _vecs(self, V, ids=None):
        ids = ids if ids is not None else list(range(len(V)))
        return rd.from_arrow(
            pa.table(
                {"vec_id": pa.array(ids, type=pa.int64()),
                 "embedding": pa.array([list(map(float, v)) for v in V],
                                       type=pa.list_(pa.float32()))}
            )
        )

    def test_matches_numpy_reference(self, ray_session):
        rng = np.random.default_rng(11)
        V = rng.normal(size=(200, 8))
        out = kcenter_coreset(self._vecs(V), id_col="vec_id",
                              vec_col="embedding", k=5)
        # reference greedy on float32-rounded vectors (engine reads f32)
        Vf = V.astype(np.float32).astype(np.float64)
        picked = [0]
        for _ in range(4):
            d2 = np.min(
                ((Vf[:, None, :] - Vf[None, picked, :]) ** 2).sum(axis=2),
                axis=1,
            )
            j = np.lexsort((np.arange(len(Vf)), -d2))[0]
            picked.append(int(j))
        assert out["id"].tolist() == picked

    def test_radius_nonincreasing_and_deterministic(self, ray_session):
        rng = np.random.default_rng(7)
        V = rng.normal(size=(300, 4))
        a = kcenter_coreset(self._vecs(V), id_col="vec_id",
                            vec_col="embedding", k=6)
        b = kcenter_coreset(self._vecs(V).repartition(13), id_col="vec_id",
                            vec_col="embedding", k=6)
        assert a.equals(b)  # layout-independent
        r = a["radius_before"].to_numpy()[1:]
        assert (np.diff(r) <= 1e-9).all()  # farthest-first -> nonincreasing
        assert a["id"].is_unique

    def test_fewer_distinct_points_than_k(self, ray_session):
        V = [[0.0, 0.0], [1.0, 0.0], [0.0, 0.0]]
        out = kcenter_coreset(self._vecs(V), id_col="vec_id",
                              vec_col="embedding", k=5)
        assert len(out) == 2  # only 2 distinct locations


def test_kcenter_local_and_distributed_paths_agree(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(13)
    V = rng.normal(size=(150, 6))
    ds = rd.from_arrow(
        pa.table(
            {"vec_id": pa.array(range(len(V)), type=pa.int64()),
             "embedding": pa.array([list(map(float, v)) for v in V],
                                   type=pa.list_(pa.float32()))}
        )
    )
    local = kcenter_coreset(ds, id_col="vec_id", vec_col="embedding", k=5)
    dist = kcenter_coreset(ds, id_col="vec_id", vec_col="embedding", k=5,
                           local_cap=0)
    assert local.equals(dist)


def test_association_rules_integer_items(ray_session):
    """Code-review r5: integer item columns must work (the old ''
    sentinel mixed str/int and broke Arrow conversion)."""
    ds = rd.from_arrow(
        pa.table(
            {"user_id": pa.array([1, 1, 2, 2, 3], type=pa.int64()),
             "event_type": pa.array([10, 20, 10, 20, 10], type=pa.int64())}
        )
    )
    out = association_rules(ds, min_support=2)
    assert len(out) == 2
    r = out[(out["antecedent"] == 10) & (out["consequent"] == 20)].iloc[0]
    assert r["support"] == 2
    assert r["confidence"] == pytest.approx(round(2 / 3, 6), abs=1e-9)


def test_truncation_audit_full_dim_requested_once(ray_session):
    """Code-review r5: a requested dim equal to the full dimensionality
    must not double-count n_pairs."""
    from ai_service_ocr_grading_handler_ray.stages.linalg import truncation_audit

    rng = np.random.default_rng(21)
    V = rng.normal(size=(60, 8))
    ds = rd.from_arrow(
        pa.table(
            {"vec_id": pa.array(range(60), type=pa.int64()),
             "embedding": pa.array([list(map(float, v)) for v in V],
                                   type=pa.list_(pa.float32()))}
        )
    )
    out = truncation_audit(ds, id_col="vec_id", vec_col="embedding",
                           dims=(8, 4), stride=1)
    full = out[out["dim"] == 8].iloc[0]
    assert full["n_pairs"] == 59  # NOT doubled
    assert full["mean_abs_delta"] == 0.0


def test_truncation_audit_duplicate_dims(ray_session):
    """Code-review r5b: duplicate values inside dims emit once."""
    from ai_service_ocr_grading_handler_ray.stages.linalg import truncation_audit

    rng = np.random.default_rng(23)
    V = rng.normal(size=(40, 8))
    ds = rd.from_arrow(
        pa.table(
            {"vec_id": pa.array(range(40), type=pa.int64()),
             "embedding": pa.array([list(map(float, v)) for v in V],
                                   type=pa.list_(pa.float32()))}
        )
    )
    out = truncation_audit(ds, id_col="vec_id", vec_col="embedding",
                           dims=(4, 4), stride=1)
    assert out["dim"].tolist() == [8, 4]  # each once
