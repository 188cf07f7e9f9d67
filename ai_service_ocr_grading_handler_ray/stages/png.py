"""Stdlib-only PNG codec — REAL image decode without Pillow.

The container ships no imaging library, but PNG needs only ``zlib``
(stdlib) plus the spec's per-row filters, so the engine's image stages
can genuinely decode the web's main lossless format instead of stubbing
it.  Scope (documented, checked, raises beyond it): 8-bit samples,
color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), no interlace.
Palette (3), 16-bit, and interlaced images — plus JPEG/WEBP entirely —
remain behind the optional-dependency seam (``PilImageDecoder``).

``encode_png`` is the inverse (any of the five filter types per row, so
tests exercise every unfilter path) — used for fixtures and by the
resize actor's re-encode.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    # spec: predictor closest to p = a + b - c, ties a > b > c
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc_ = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))
    return out.astype(np.uint8)


def encode_png(arr: np.ndarray, *, filter_type: int = 0) -> bytes:
    """uint8 array (h, w) / (h, w, 2|3|4) → PNG bytes.  ``filter_type``
    0..4 applies that filter to every row (0 is fastest; the others
    exist so tests cover each decoder unfilter path)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    if filter_type in (0, 1, 2):
        # vectorized whole-image filtering (uint8 wrap = mod-256 diff)
        if filter_type == 0:
            filt = arr
        elif filter_type == 1:  # Sub: diff along x per channel
            filt = arr.copy()
            filt[:, 1:] -= arr[:, :-1]
        else:  # Up: diff down rows
            filt = arr.copy()
            filt[1:] -= arr[:-1]
        scan = np.empty((h, stride + 1), dtype=np.uint8)
        scan[:, 0] = filter_type
        scan[:, 1:] = filt.reshape(h, stride)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        return (
            _MAGIC
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(scan.tobytes()))
            + _chunk(b"IEND", b"")
        )
    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.uint8)
    for y in range(h):
        row = arr[y]
        left = np.vstack([np.zeros((1, ch), np.uint8), row[:-1]])
        ul = np.vstack([np.zeros((1, ch), np.uint8), prev[:-1]])
        if filter_type == 0:
            filt = row
        elif filter_type == 1:
            filt = (row.astype(np.int16) - left).astype(np.uint8)
        elif filter_type == 2:
            filt = (row.astype(np.int16) - prev).astype(np.uint8)
        elif filter_type == 3:
            filt = (
                row.astype(np.int16)
                - ((left.astype(np.int16) + prev.astype(np.int16)) // 2)
            ).astype(np.uint8)
        elif filter_type == 4:
            filt = (row.astype(np.int16) - _paeth(left, prev, ul)).astype(np.uint8)
        else:
            raise ValueError(f"filter_type {filter_type} not in 0..4")
        raw.append(filter_type)
        raw.extend(filt.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w) for grayscale, (h, w, c)
    otherwise.  Full inflate + per-row unfilter (all five filter types);
    raises ValueError outside the documented scope."""
    if not data.startswith(_MAGIC):
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    color = bit_depth = interlace = None
    idat = bytearray()
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("no IHDR")
    if bit_depth != 8 or color not in _CHANNELS or interlace:
        raise ValueError(
            f"unsupported PNG (bit_depth={bit_depth}, color={color}, "
            f"interlace={interlace}); use the Pillow seam"
        )
    ch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    fbytes = scan[:, 0]
    body = scan[:, 1:].reshape(h, w, ch)
    # whole-image fast paths for uniform filters (what the encoder and
    # most real encoders emit): filter 0 = raw; filter 2 (Up) = modular
    # cumsum down rows; filter 1 (Sub) = modular cumsum along x per
    # channel.  uint8 accumulation wraps mod 256, which IS the filter's
    # reconstruction arithmetic.  Mixed / Paeth / Average scanlines fall
    # through to the per-row walk.
    if not fbytes.any():
        out = body.copy()
        return out[:, :, 0] if ch == 1 else out
    if (fbytes == 2).all():
        out = np.cumsum(body, axis=0, dtype=np.uint8)
        return out[:, :, 0] if ch == 1 else out
    if (fbytes == 1).all():
        out = np.cumsum(body, axis=1, dtype=np.uint8)
        return out[:, :, 0] if ch == 1 else out
    out = np.zeros((h, w, ch), dtype=np.uint8)
    prev = np.zeros((w, ch), dtype=np.uint8)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).reshape(w, ch)
        if f == 0:
            cur = row.copy()
        elif f == 2:
            cur = (row.astype(np.int16) + prev).astype(np.uint8)
        elif f in (1, 3, 4):
            # left-dependent filters recur along x — walk pixels, vector
            # across channels (rows are short; h×w loop stays in numpy
            # for the common filter 0/2 cases above)
            cur = np.zeros_like(row)
            left = np.zeros(ch, dtype=np.uint8)
            ul = np.zeros(ch, dtype=np.uint8)
            for x in range(w):
                up = prev[x]
                if f == 1:
                    base = left
                elif f == 3:
                    base = ((left.astype(np.int16) + up.astype(np.int16)) // 2).astype(
                        np.uint8
                    )
                else:
                    base = _paeth(left, up, ul)
                cur[x] = (row[x].astype(np.int16) + base).astype(np.uint8)
                left = cur[x]
                ul = up
        else:
            raise ValueError(f"bad filter byte {f}")
        out[y] = cur
        prev = cur
    return out[:, :, 0] if ch == 1 else out


def png_dims(data: bytes) -> tuple[int, int]:
    """(width, height) from the IHDR without inflating the image."""
    if not data.startswith(_MAGIC) or data[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    w, h = struct.unpack(">II", data[16:24])
    return w, h


def resize_nearest(arr: np.ndarray, max_dim: int) -> np.ndarray:
    """Nearest-neighbor downscale so max(h, w) <= max_dim (no-op if
    already within bounds) — index-gather, no interpolation deps."""
    h, w = arr.shape[:2]
    scale = max(h, w) / max_dim
    if scale <= 1:
        return arr
    nh, nw = max(1, int(h / scale)), max(1, int(w / scale))
    yi = (np.arange(nh) * (h / nh)).astype(np.int64)
    xi = (np.arange(nw) * (w / nw)).astype(np.int64)
    return arr[yi][:, xi]
