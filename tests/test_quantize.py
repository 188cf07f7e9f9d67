"""Int8 affine quantization: kernel vs plain-numpy reference, constant
vectors, SQL replay equivalence at full parity granularity."""

import duckdb
import numpy as np
import pyarrow as pa

from ai_service_ocr_grading_handler_ray.stages.quantize import (
    quantize_batch,
    quantize_sql,
)


def _mk_batch(vecs):
    return pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs],
                type=pa.list_(pa.float32()),
            ),
        }
    )


def test_quantize_kernel_reference():
    rng = np.random.default_rng(5)
    vecs = [rng.normal(size=16).astype(np.float32) for _ in range(20)]
    vecs.append(np.full(16, 0.25, dtype=np.float32))  # constant vector
    out = quantize_batch(_mk_batch(vecs))
    for i, v in enumerate(vecs):
        v = v.astype(np.float64)
        mn, mx = v.min(), v.max()
        sc = (mx - mn) / 255 if mx > mn else 1.0
        q = np.floor(np.abs((v - mn) / sc) + 0.5) * np.sign((v - mn) / sc + 1e-300)
        q = np.sign((v - mn) / sc) * np.floor(np.abs((v - mn) / sc) + 0.5)
        recon = mn + q * sc
        assert abs(out["v_min"][i].as_py() - mn) < 1e-12
        assert abs(out["v_max"][i].as_py() - mx) < 1e-12
        assert out["q_sum"][i].as_py() == int(q.sum())
        assert abs(out["mse"][i].as_py() - ((v - recon) ** 2).mean()) < 1e-15
    # constant vector: all codes 0, mse 0
    assert out["q_sum"][20].as_py() == 0 and out["mse"][20].as_py() == 0.0
    # codes bounded to 0..255
    # (q_sum <= 255*16 for every vector)
    assert max(out["q_sum"].to_pylist()) <= 255 * 16


def test_quantize_sql_matches_engine():
    rng = np.random.default_rng(6)
    vecs = [rng.normal(size=8).astype(np.float32) for _ in range(50)]
    vecs.append(np.zeros(8, dtype=np.float32))
    t = _mk_batch(vecs)
    eng = quantize_batch(t).to_pandas()
    eng["v_min"] = np.sign(eng["v_min"]) * np.floor(np.abs(eng["v_min"]) * 1e6 + 0.5) / 1e6
    eng["v_max"] = np.sign(eng["v_max"]) * np.floor(np.abs(eng["v_max"]) * 1e6 + 0.5) / 1e6
    eng["mse"] = np.floor(eng["mse"] * 1e8 + 0.5) / 1e8
    con = duckdb.connect()
    con.register("embeddings", t)
    ref = (
        con.sql(quantize_sql())
        .df()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    for c in ["v_min", "v_max", "mse"]:
        assert np.allclose(eng[c], ref[c], atol=1e-9), c
    assert (eng["q_sum"] == ref["q_sum"]).all()


def test_quantize_ragged_raises():
    import pytest

    t = pa.table(
        {
            "vec_id": pa.array([0, 1], type=pa.int64()),
            "embedding": pa.array(
                [[1.0, 2.0], [1.0, 2.0, 3.0]], type=pa.list_(pa.float32())
            ),
        }
    )
    with pytest.raises(ValueError):
        quantize_batch(t)


def test_quantize_zero_length_raises():
    import pytest

    t = pa.table(
        {
            "vec_id": pa.array([0], type=pa.int64()),
            "embedding": pa.array([[]], type=pa.list_(pa.float32())),
        }
    )
    with pytest.raises(ValueError, match="zero-length"):
        quantize_batch(t)
