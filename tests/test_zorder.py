"""Z-order layout (stages/zorder.py): Morton kernel vs a bit-by-bit
reference, mask semantics, null drop, per-file plan aggregation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.zorder import (
    morton_interleave,
    zorder_layout,
)


def _morton_ref(x: int, y: int) -> int:
    """Bit-by-bit reference: x on even bits, y on odd bits."""
    out = 0
    for i in range(16):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_morton_matches_bitwise_reference():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 65536, size=500).astype(np.int64)
    y = rng.integers(0, 65536, size=500).astype(np.int64)
    got = morton_interleave(x, y)
    want = np.array([_morton_ref(int(a), int(b)) for a, b in zip(x, y)])
    assert (got == want).all()


def test_morton_known_values():
    # interleave(1, 0) = 1 (x bit 0 -> even bit 0)
    # interleave(0, 1) = 2 (y bit 0 -> odd bit 1)
    # interleave(0xFFFF, 0xFFFF) = 0xFFFFFFFF
    x = np.array([1, 0, 0xFFFF], dtype=np.int64)
    y = np.array([0, 1, 0xFFFF], dtype=np.int64)
    assert morton_interleave(x, y).tolist() == [1, 2, 0xFFFFFFFF]


def test_morton_masks_high_bits():
    # values above 16 bits are masked, negatives take their low 16
    # two's-complement bits (SQL x & 65535 semantics)
    x = np.array([0x10001, -1], dtype=np.int64)
    y = np.array([0, 0], dtype=np.int64)
    want = morton_interleave(np.array([1, 0xFFFF], dtype=np.int64), y)
    assert (morton_interleave(x, y) == want).all()


def test_zorder_locality_orders_files():
    # rows with equal (x, y) prefixes land in the same file; the plan's
    # per-file x/y ranges are tight (that's the whole point of z-order)
    x = np.array([0, 1, 0x8000, 0x8001], dtype=np.int64)
    y = np.array([0, 0, 0x8000, 0x8000], dtype=np.int64)
    ds = rd.from_arrow(pa.table({"x": pa.array(x), "y": pa.array(y)}))
    out = zorder_layout(ds, x_col="x", y_col="y", file_shift=16)
    # (0,0)/(1,0) share a file; (0x8000,0x8000) pair shares another
    assert len(out) == 2
    assert out["n_rows"].tolist() == [2, 2]
    lo = out.iloc[0]
    assert lo["x_min"] == 0 and lo["x_max"] == 1
    assert lo["y_min"] == 0 and lo["y_max"] == 0
    hi = out.iloc[1]
    assert hi["x_min"] == 0x8000 and hi["x_max"] == 0x8001


def test_zorder_drops_null_dims(ray_session):
    t = pa.table(
        {"x": pa.array([1, None, 2, 3], type=pa.int64()),
         "y": pa.array([1, 1, None, 4], type=pa.int64())}
    )
    out = zorder_layout(rd.from_arrow(t), x_col="x", y_col="y",
                        file_shift=0)
    assert out["n_rows"].sum() == 2  # only rows with BOTH dims valid


def test_zorder_empty_input(ray_session):
    t = pa.table({"x": pa.array([], type=pa.int64()),
                  "y": pa.array([], type=pa.int64())})
    out = zorder_layout(rd.from_arrow(t), x_col="x", y_col="y")
    assert len(out) == 0
    assert list(out.columns) == ["file_id", "n_rows", "x_min", "x_max",
                                 "y_min", "y_max"]
