"""Baseline JPEG codec (stages/jpeg.py): roundtrip fidelity, both
sampling layouts, odd dimensions, grayscale, scope errors, and the
multimodal decoder integration."""

import numpy as np
import pytest

from ai_service_ocr_grading_handler_ray.stages.jpeg import decode_jpeg, encode_jpeg


def _psnr(a, b):
    err = a.astype(float) - b.astype(float)
    return 10 * np.log10(255**2 / (err**2).mean())


def _img(h=64, w=64):
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    g = (np.add.outer(y, x) / 2).astype(np.uint8)
    return np.stack([g, g[::-1], np.full_like(g, 100)], axis=-1)


@pytest.mark.parametrize("subsample", ["444", "420"])
def test_roundtrip_color(subsample):
    rgb = _img()
    data = encode_jpeg(rgb, quality=90, subsample=subsample)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    dec = decode_jpeg(data)
    assert dec.shape == rgb.shape
    assert _psnr(dec, rgb) > 40


def test_roundtrip_gray_and_noise():
    g = _img()[..., 0]
    dg = decode_jpeg(encode_jpeg(g, quality=80))
    assert dg.shape == (64, 64, 3)
    assert _psnr(dg[..., 0], g) > 40
    rng = np.random.default_rng(2)
    noise = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    dn = decode_jpeg(encode_jpeg(noise, quality=95))
    assert _psnr(dn, noise) > 30  # worst-case content


@pytest.mark.parametrize("subsample", ["444", "420"])
@pytest.mark.parametrize("dims", [(37, 45), (8, 8), (17, 16)])
def test_odd_dimensions(subsample, dims):
    h, w = dims
    rgb = _img(h, w)
    dec = decode_jpeg(encode_jpeg(rgb, quality=85, subsample=subsample))
    assert dec.shape == (h, w, 3)
    # tiny dims squeeze the full 0..255 gradient into one MCU — chroma
    # halving legitimately costs fidelity there
    assert _psnr(dec, rgb) > (25 if min(h, w) <= 8 else 35)


def test_quality_tradeoff_monotone():
    rgb = _img()
    sizes = [len(encode_jpeg(rgb, quality=q)) for q in (30, 60, 90)]
    assert sizes == sorted(sizes)
    assert _psnr(decode_jpeg(encode_jpeg(rgb, quality=90)), rgb) > _psnr(
        decode_jpeg(encode_jpeg(rgb, quality=30)), rgb
    )


def test_determinism():
    rgb = _img()
    assert encode_jpeg(rgb, quality=77) == encode_jpeg(rgb, quality=77)


def test_scope_errors():
    with pytest.raises(ValueError, match="no SOI"):
        decode_jpeg(b"not a jpeg")
    data = bytearray(encode_jpeg(_img(), quality=75))
    sof = data.find(b"\xff\xc0")
    data[sof + 1] = 0xC2  # pretend progressive
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(data))
    with pytest.raises(ValueError, match="subsample"):
        encode_jpeg(_img()[..., 0], subsample="420")


def test_multimodal_decoder_integration(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.stages.multimodal import (
        ImageDecodeActor,
    )

    payload = encode_jpeg(_img(32, 48), quality=80, subsample="420")
    t = pa.table({"payload": pa.array([payload, b"garbage"], type=pa.binary())})
    out = (
        rd.from_arrow(t)
        .map_batches(ImageDecodeActor, batch_format="pyarrow", concurrency=1, batch_size=2)
        .to_pandas()
    )
    meta = out.image_meta.iloc[0]
    assert (meta["width"], meta["height"], meta["format"]) == (48, 32, "jpeg")
    assert out.decode_status.tolist() == ["ok", "error"]
