"""Perceptual-hash image dedup (stages/phash.py): kernel properties,
scalar/batch equivalence, and the q121 clustering invariants that stand
in for an oracle (DCT bit patterns are not SQL-expressible)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.hashing import popcount64
from ai_service_ocr_grading_handler_ray.stages.phash import (
    PHashActor,
    PHasher,
    _area_resize,
    add_phash,
    phash_clusters,
)
from ai_service_ocr_grading_handler_ray.stages.png import encode_png


def _ham(a: int, b: int) -> int:
    return int(popcount64(np.array([a ^ b], dtype=np.uint64))[0])


@pytest.fixture(scope="module")
def hasher() -> PHasher:
    return PHasher()


def _pattern(fx=5.0, fy=7.0, ph=0.0, h=48, w=64) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    return (128 + 60 * np.sin(x / fx + ph) + 40 * np.cos(y / fy)).clip(0, 255).astype(np.uint8)


def test_brightness_invariant(hasher):
    base = _pattern()
    shifted = (base.astype(int) + 14).clip(0, 255).astype(np.uint8)
    assert _ham(hasher.phash_gray(base), hasher.phash_gray(shifted)) <= 2


def test_rescale_near(hasher):
    base = _pattern()
    up = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    assert _ham(hasher.phash_gray(base), hasher.phash_gray(up)) <= 10


def test_different_patterns_far(hasher):
    a = hasher.phash_gray(_pattern(fx=5.0, fy=7.0))
    b = hasher.phash_gray(_pattern(fx=2.3, fy=3.1, ph=1.0))
    assert _ham(a, b) > 12


def test_png_roundtrip_exact(hasher):
    base = _pattern()
    assert hasher.phash_png(encode_png(base)) == hasher.phash_gray(base)


def test_rgb_channel_mean(hasher):
    base = _pattern()
    rgb = np.stack([base, base, base], axis=2)
    assert hasher.phash_png(encode_png(rgb)) == hasher.phash_gray(base)


def test_area_resize_identity():
    g = np.arange(32 * 32, dtype=np.float64).reshape(32, 32)
    assert np.array_equal(_area_resize(g, 32), g)


def test_area_resize_block_mean():
    g = np.ones((64, 64)) * 4.0
    out = _area_resize(g, 32)
    assert out.shape == (32, 32)
    assert np.allclose(out, 4.0)


def test_small_image_upsample_path(hasher):
    tiny = _pattern(h=16, w=20)
    fp = hasher.phash_gray(tiny)
    assert 0 < fp < (1 << 64)


def test_batch_matches_scalar(hasher):
    payloads = [encode_png(_pattern(fx=3.0 + k, ph=k * 0.3)) for k in range(6)]
    batch = hasher.hash_batch(payloads + [None, b"not a png"])
    for k, p in enumerate(payloads):
        assert int(batch[k]) == hasher.phash_png(p)
    assert batch[6] == 0 and batch[7] == 0  # sentinel for missing/undecodable


def test_actor_stage_appends_column():
    payloads = [encode_png(_pattern(fx=3.0 + k)) for k in range(4)]
    ds = rd.from_arrow(pa.table({"img_id": list(range(4)), "payload": payloads}))
    out = add_phash(ds, concurrency=(1, 2), batch_size=2).to_pandas()
    ref = PHasher()
    for r in out.itertuples():
        assert np.uint64(r.phash) == np.uint64(ref.phash_png(payloads[r.img_id]))


def test_cluster_twins_and_determinism():
    """The q121 invariants at small scale: every re-toned twin joins its
    base image's cluster (cluster_id = min member id), unrelated
    patterns stay apart, and the assignment is deterministic."""
    ids, payloads = [], []
    for i in range(40):
        base = _pattern(fx=3.0 + (i % 11), fy=4.0 + (i % 7), ph=(i % 13) * 0.5)
        ids.append(i)
        payloads.append(encode_png(base))
        if i % 5 == 0:
            twin = (base.astype(np.int64) + 12).clip(0, 255).astype(np.uint8)
            ids.append(i + 1000)
            payloads.append(encode_png(twin))
    tbl = pa.table({"img_id": pa.array(ids, type=pa.int64()),
                    "payload": pa.array(payloads, type=pa.binary())})

    def run():
        return (
            phash_clusters(
                rd.from_arrow(tbl), id_col="img_id", payload_col="payload",
                max_hamming=6, concurrency=(1, 2), batch_size=16,
            )
            .to_pandas()
            .sort_values("img_id")
            .reset_index(drop=True)
        )

    df = run()
    assert len(df) == len(ids)
    lab = dict(zip(df.img_id, df.cluster_id))
    for i in range(0, 40, 5):
        assert lab[i + 1000] == lab[i]  # twin joins base
        assert lab[i] <= i  # representative is the min member id
    # determinism
    df2 = run()
    assert df.equals(df2)
