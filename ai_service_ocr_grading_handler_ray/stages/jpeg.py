"""Baseline JPEG codec — stdlib + numpy, no Pillow/libjpeg.

Closes the compressed-image seam of the multimodal battery (VERDICT r3
"missing #1"): with PNG (stages/png.py), WAV and Y4M already decoded
natively, JPEG — the dominant web image format — was the last
documented NotImplementedError.  Scope (documented, checked loudly):

- decode: baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
  sampling factors 1×1 (4:4:4) or Y 2×2 + chroma 1×1 (4:2:0), restart
  intervals; progressive (SOF2) / arithmetic / 12-bit raise
  NotImplementedError with the marker found.
- encode: 4:4:4 (or grayscale) baseline with the Annex-K quantization
  and Huffman tables, libjpeg quality scaling — deterministic, used by
  the test fixtures and the resize re-encode path.

Hot loops are per-Huffman-symbol Python (a codec, not a batch kernel);
the decode actor amortizes table construction per worker, and payloads
stream through ``map_batches`` actor pools like every other media
decoder here.  Reference anchor: the reference decodes exam-page
images via cv2.imdecode (engine/core/llm_number_prediction.py:46-48);
this is the from-scratch equivalent for the jpeg case.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg", "decode_jpeg"]

# ---------------------------------------------------------------------------
# tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
_UNZIG = np.argsort(ZIGZAG)

QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# (bits-per-length[1..16], values) — Annex K.3
HUFF_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))
HUFF_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                 list(range(12)))
HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
HUFF_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8)
    c[0] *= 1 / np.sqrt(2)
    return c  # orthonormal: blocks' DCT = C @ B @ C.T


_C = _dct_matrix()


def _canonical_codes(bits, values):
    """(value → (code, length)) from the canonical BITS/HUFFVAL spec."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, values):
    """((length, code) → value) lookup for the decoder."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = max(1, min(100, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    qts = []
    for base in (QT_LUM, QT_CHROM):
        t = (base * scale + 50) // 100
        qts.append(np.clip(t, 1, 255).astype(np.int64))
    return qts[0], qts[1]


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) — negatives in ones' complement."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_blocks(bw, blocks, qt, dc_codes, ac_codes, pred: int) -> int:
    qt = np.asarray(qt, dtype=np.float64).reshape(8, 8)
    for blk in blocks:
        coef = _C @ blk @ _C.T
        q = np.sign(coef / qt) * np.floor(np.abs(coef / qt) + 0.5)
        zz = q.reshape(64)[ZIGZAG].astype(np.int64)
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        size, bits = _magnitude(diff)
        code, length = dc_codes[size]
        bw.write(code, length)
        bw.write(bits, size)
        run = 0
        nz = np.flatnonzero(zz[1:])
        pos = 0
        for idx in nz:
            run = int(idx) - pos
            while run >= 16:
                c, ln = ac_codes[0xF0]  # ZRL
                bw.write(c, ln)
                run -= 16
            size, bits = _magnitude(int(zz[idx + 1]))
            c, ln = ac_codes[(run << 4) | size]
            bw.write(c, ln)
            bw.write(bits, size)
            pos = int(idx) + 1
        if pos < 63:
            c, ln = ac_codes[0x00]  # EOB
            bw.write(c, ln)
    return pred


def _component_blocks(plane: np.ndarray):
    h, w = plane.shape
    H = (h + 7) // 8 * 8
    W = (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")
    out = []
    for by in range(0, H, 8):
        for bx in range(0, W, 8):
            out.append(padded[by:by + 8, bx:bx + 8].astype(np.float64) - 128.0)
    return out


def _block_at(plane: np.ndarray, by: int, bx: int) -> np.ndarray:
    """8×8 block at block coords (by, bx), edge-replicated past bounds."""
    h, w = plane.shape
    ys = np.minimum(np.arange(by * 8, by * 8 + 8), h - 1)
    xs = np.minimum(np.arange(bx * 8, bx * 8 + 8), w - 1)
    return plane[np.ix_(ys, xs)].astype(np.float64) - 128.0


def encode_jpeg(
    arr: np.ndarray, *, quality: int = 75, subsample: str = "444"
) -> bytes:
    """(H, W, 3) uint8 RGB or (H, W) grayscale → baseline JPEG.
    ``subsample``: '444' (one block per component per MCU) or '420'
    (Y 2×2 + averaged chroma — the dominant real-web layout, also the
    decode path's test vector)."""
    arr = np.asarray(arr)
    gray = arr.ndim == 2
    if subsample not in ("444", "420") or (gray and subsample == "420"):
        raise ValueError("subsample must be '444' or '420' (color only)")
    h, w = arr.shape[:2]
    qt_l, qt_c = _quality_tables(quality)
    if gray:
        planes = [arr.astype(np.float64)]
    else:
        r = arr[..., 0].astype(np.float64)
        g = arr[..., 1].astype(np.float64)
        b = arr[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample == "420":
            H2, W2 = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cbp = np.pad(cb, ((0, H2 - h), (0, W2 - w)), mode="edge")
            crp = np.pad(cr, ((0, H2 - h), (0, W2 - w)), mode="edge")
            cb = cbp.reshape(H2 // 2, 2, W2 // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(H2 // 2, 2, W2 // 2, 2).mean(axis=(1, 3))
        planes = [y, cb, cr]
    y_hv = 0x22 if subsample == "420" else 0x11

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid, qt in ((0, qt_l),) + (() if gray else ((1, qt_c),)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(v) for v in qt.reshape(64)[ZIGZAG])
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for cid in range(1, ncomp + 1):
        out += struct.pack(
            "BBB", cid, y_hv if cid == 1 else 0x11, 0 if cid == 1 else 1
        )
    tables = [(0x00, HUFF_DC_LUM), (0x10, HUFF_AC_LUM)] + (
        [] if gray else [(0x01, HUFF_DC_CHROM), (0x11, HUFF_AC_CHROM)]
    )
    for tc, (bits, values) in tables:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), tc)
        out += bytes(bits) + bytes(values)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for cid in range(1, ncomp + 1):
        out += struct.pack("BB", cid, 0x00 if cid == 1 else 0x11)
    out += b"\x00\x3f\x00"

    dc_l = _canonical_codes(*HUFF_DC_LUM)
    ac_l = _canonical_codes(*HUFF_AC_LUM)
    dc_c = _canonical_codes(*HUFF_DC_CHROM)
    ac_c = _canonical_codes(*HUFF_AC_CHROM)
    bw = _BitWriter()
    preds = [0] * len(planes)
    if subsample == "444" or gray:
        comp_blocks = [_component_blocks(p) for p in planes]
        for m in range(len(comp_blocks[0])):
            for ci in range(len(planes)):
                preds[ci] = _encode_blocks(
                    bw, [comp_blocks[ci][m]],
                    qt_l if ci == 0 else qt_c,
                    dc_l if ci == 0 else dc_c,
                    ac_l if ci == 0 else ac_c,
                    preds[ci],
                )
    else:  # 4:2:0 — MCU = 4 Y blocks (2×2, row-major) + Cb + Cr
        mcux = (w + 15) // 16
        mcuy = (h + 15) // 16
        for my in range(mcuy):
            for mx in range(mcux):
                yb = [
                    _block_at(planes[0], my * 2 + dy, mx * 2 + dx)
                    for dy in (0, 1) for dx in (0, 1)
                ]
                preds[0] = _encode_blocks(bw, yb, qt_l, dc_l, ac_l, preds[0])
                for ci in (1, 2):
                    preds[ci] = _encode_blocks(
                        bw, [_block_at(planes[ci], my, mx)],
                        qt_c, dc_c, ac_c, preds[ci],
                    )
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0xFF  # pad past end
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
                # a real marker: stop feeding (caller handles RST/EOI)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if not self.nbits:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_to_marker(self) -> None:
        """Drop partial byte and skip an RSTn marker if present."""
        self.acc = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data) and not (
            self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        if self.pos + 1 < len(self.data):
            self.pos += 2


def _read_huff_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (H, W, 3) uint8 RGB (grayscale replicates).
    Raises ValueError on malformed input, NotImplementedError on
    progressive/arithmetic/12-bit streams."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[int, dict] = {}
    comps = []  # (id, h, v, tq)
    hv_max = (1, 1)
    h = w = 0
    restart = 0
    scan_comps = []
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2: pos + seg_len]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(seg[p + 1:p + 65], dtype=np.uint8).astype(np.int64)
                t = np.zeros(64, dtype=np.int64)
                t[ZIGZAG] = zz
                qts[tq] = t.reshape(8, 8)
                p += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"unsupported SOF marker 0xFF{marker:02X}"
                                      " (baseline sequential only)")
        elif marker == 0xC0:
            if seg[0] != 8:
                raise NotImplementedError("only 8-bit precision")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i: 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            hv_max = (max(c[1] for c in comps), max(c[2] for c in comps))
            for _, ch, cv, _ in comps:
                if (ch, cv) not in ((1, 1), hv_max):
                    raise NotImplementedError("unsupported sampling layout")
        elif marker == 0xC4:
            p = 0
            while p < len(seg):
                tc = seg[p]
                bits = list(seg[p + 1:p + 17])
                nvals = sum(bits)
                values = list(seg[p + 17:p + 17 + nvals])
                huff[tc] = _decode_table(bits, values)
                p += 17 + nvals
        elif marker == 0xDD:
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append((cs, tt >> 4, tt & 0xF))
            pos += seg_len
            break
        pos += seg_len

    if not comps or not scan_comps:
        raise ValueError("missing SOF/SOS")
    hmax, vmax = hv_max
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for cid, ch, cv, tq in comps:
        planes.append(np.zeros((mcuy * cv * 8, mcux * ch * 8), dtype=np.float64))

    br = _BitReader(data[pos:])
    preds = {c[0]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                br.align_to_marker()
                preds = {c[0]: 0 for c in comps}
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                td, ta = next(
                    (sc[1], sc[2]) for sc in scan_comps if sc[0] == cid
                )
                dct = huff[0x00 | td]
                act = huff[0x10 | ta]
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, dtype=np.int64)
                        s = _read_huff_symbol(br, dct)
                        diff = _extend(br.read_bits(s), s)
                        preds[cid] += diff
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = _read_huff_symbol(br, act)
                            r, s = rs >> 4, rs & 0xF
                            if rs == 0x00:
                                break
                            if rs == 0xF0:
                                k += 16
                                continue
                            k += r
                            if k > 63:
                                raise ValueError("AC run overflow")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz
                        blk = coef.reshape(8, 8) * qts[tq]
                        pix = _C.T @ blk @ _C + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
            mcu_count += 1

    outs = []
    for (cid, ch, cv, tq), plane in zip(comps, planes):
        if (ch, cv) != (hmax, vmax):
            plane = np.repeat(
                np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1
            )
        outs.append(plane[:h, :w])
    if len(outs) == 1:
        g = np.clip(outs[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = outs
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
