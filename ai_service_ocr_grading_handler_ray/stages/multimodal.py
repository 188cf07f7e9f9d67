"""Multimodal column stages: image decode / resize, audio features, video
frame sampling — actor-pool ``map_batches`` stages over opaque binary
columns with typed metadata.

Decode coverage without any media library (none is installed here):

- images: REAL PNG (full inflate + unfilter, ``stages/png.py``);
- audio: REAL RIFF/WAVE PCM (stdlib ``wave``);
- video: REAL YUV4MPEG2 (plain-header 4:2:0 planes);
- plus deterministic synthetic fixture formats for each modality.

Compressed codecs (jpeg/webp, mp3/ogg, h264/vp9) remain clearly-marked
NotImplementedError seams — swapping in PIL/ffmpeg is an ``__init__``
change in each actor (see ``PilImageDecoder``), never a plumbing change.

Batch-size guidance: media payloads are MBs per row — callers should use
small ``batch_size`` (8-32) and let blocks split (large_binary columns),
per SURVEY.md §4 memory notes.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

from ..payloads import OCR_MARKER, PNG_MAGIC, decode_image_text, encode_image_text

IMAGE_META_TYPE = pa.struct(
    [
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("format", pa.string()),
    ]
)


class ImageDecodeActor:
    """payload(binary) → (decoded ok flag, width, height, format).

    Real path (PIL) loads once per actor in __init__; synthetic payloads
    decode deterministically; real PNG/WEBP without PIL → status 'error'
    rows (poison-pill policy), never a raised batch.

    ``decoder_factory`` injects a real decoder (or a test fake) without
    changing the actor-pool plumbing: it is constructed ONCE per actor
    and must expose ``decode(payload) -> (width, height, format)``."""

    def __init__(self, decoder_factory=None) -> None:
        self._decoder = decoder_factory() if decoder_factory is not None else None
        try:  # pragma: no cover - not installed here
            from PIL import Image  # type: ignore

            self._pil = Image
        except ImportError:
            self._pil = None

    def _decode_one(self, payload: bytes) -> tuple[int, int, str, str]:
        from .compose import image_dims

        if payload.startswith(PNG_MAGIC) and payload[8:16] == OCR_MARKER:
            text = decode_image_text(payload)
            w, h = image_dims(text)
            return w, h, "synthetic", "ok"
        if self._decoder is not None:
            w, h, f = self._decoder.decode(payload)
            return w, h, f, "ok"
        if self._pil is not None:  # pragma: no cover
            import io

            img = self._pil.open(io.BytesIO(payload))
            return img.width, img.height, img.format or "", "ok"
        if payload.startswith(PNG_MAGIC):
            # REAL decode, stdlib-only (stages/png.py): full inflate +
            # unfilter, not just a header sniff — corrupt data → 'error'
            from .png import decode_png

            arr = decode_png(payload)
            return arr.shape[1], arr.shape[0], "png", "ok"
        if payload[:3] == b"\xff\xd8\xff":
            # REAL baseline-JPEG decode (stages/jpeg.py): full Huffman +
            # IDCT, 4:4:4 and 4:2:0 — the dominant web image format
            from .jpeg import decode_jpeg

            arr = decode_jpeg(payload)
            return arr.shape[1], arr.shape[0], "jpeg", "ok"
        return 0, 0, "", "error"

    def __call__(self, batch: pa.Table, column: str = "payload") -> pa.Table:
        col = column if column in batch.column_names else batch.column_names[-1]
        widths, heights, fmts, statuses = [], [], [], []
        for i in range(len(batch)):
            payload = batch[col][i].as_py() or b""
            try:
                w, h, f, s = self._decode_one(payload)
            except Exception:
                w, h, f, s = 0, 0, "", "error"
            widths.append(w)
            heights.append(h)
            fmts.append(f)
            statuses.append(s)
        meta = pa.array(
            [{"width": w, "height": h, "format": f} for w, h, f in zip(widths, heights, fmts)],
            type=IMAGE_META_TYPE,
        )
        return batch.append_column("image_meta", meta).append_column(
            "decode_status", pa.array(statuses, type=pa.string())
        )


class PilImageDecoder:
    """Pillow-backed REAL-image engine for ``ImageDecodeActor``'s
    ``decoder_factory`` seam: pass ``decoder_factory=PilImageDecoder`` to
    ``map_batches(ImageDecodeActor, fn_constructor_kwargs=...)`` and the
    engine loads once per actor.  Optional dependency: raises ImportError
    at construction when Pillow is absent (this container), so the
    synthetic codec stays the default."""

    def __init__(self) -> None:
        from PIL import Image  # raises ImportError without Pillow

        self._Image = Image

    def decode(self, payload: bytes) -> tuple[int, int, str]:
        import io

        img = self._Image.open(io.BytesIO(payload))
        return img.width, img.height, (img.format or "").lower()


class ImageResizeActor:
    """Resize-to-max-dimension stage.  Synthetic images 'resize' by
    truncating lines/columns proportionally (deterministic); real PNGs
    resize for real via the stdlib codec (decode → nearest-neighbor →
    re-encode, stages/png.py); other real formats go through Pillow when
    importable (optional — absent in this container, where such bytes
    raise a clearly-marked NotImplementedError instead)."""

    def __init__(self, max_dim: int = 64) -> None:
        self.max_dim = max_dim
        try:  # pragma: no cover - Pillow not installed here
            from PIL import Image  # type: ignore

            self._pil = Image
        except ImportError:
            self._pil = None

    def _resize_real(self, payload: bytes) -> bytes:  # pragma: no cover
        import io

        img = self._pil.open(io.BytesIO(payload))
        img.thumbnail((self.max_dim, self.max_dim))
        buf = io.BytesIO()
        img.save(buf, format=img.format or "PNG")
        return buf.getvalue()

    def __call__(self, batch: pa.Table, column: str = "payload") -> pa.Table:
        from .compose import CHAR_H, CHAR_W

        col = column if column in batch.column_names else batch.column_names[-1]
        out: list[bytes] = []
        for i in range(len(batch)):
            payload = batch[col][i].as_py() or b""
            try:
                text = decode_image_text(payload)
            except ValueError:
                if payload.startswith(PNG_MAGIC):
                    from .png import decode_png, encode_png, resize_nearest

                    out.append(
                        encode_png(resize_nearest(decode_png(payload), self.max_dim))
                    )
                    continue
                if self._pil is not None:  # pragma: no cover
                    out.append(self._resize_real(payload))
                    continue
                raise NotImplementedError(
                    "real non-PNG image resize requires PIL (absent in container)"
                )
            max_cols = self.max_dim // CHAR_W
            max_rows = self.max_dim // CHAR_H
            lines = [ln[:max_cols] for ln in text.split("\n")[:max_rows]]
            out.append(encode_image_text("\n".join(lines)))
        return batch.set_column(
            batch.column_names.index(col), col, pa.array(out, type=pa.binary())
        )


# --- audio ------------------------------------------------------------------
#
# REAL format: RIFF/WAVE PCM, decoded with the stdlib ``wave`` module —
# no ffmpeg needed for the format crawls actually embed uncompressed.
# Synthetic format (fixtures): b"GRAFTAUD" + rate + zlib'd i16 samples.
# Compressed codecs (mp3/ogg/aac) remain a documented ffmpeg seam.

AUDIO_MAGIC = b"GRAFTAUD"
WAV_MAGIC = b"RIFF"


def encode_audio_pcm(samples: np.ndarray, rate: int = 16000) -> bytes:
    body = samples.astype("<i2").tobytes()
    return AUDIO_MAGIC + struct.pack("<I", rate) + zlib.compress(body, 1)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Mono 16-bit PCM RIFF/WAVE bytes (stdlib ``wave`` writer) — the
    real-format fixture generator for the WAV decode path."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples).astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM bytes → (float64 mono samples, sample rate).
    Stdlib ``wave``: 8/16/32-bit integer PCM; channels average to mono.
    Compressed WAVE sub-formats raise (``wave`` rejects them)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 1:  # 8-bit WAV is unsigned, offset-128
        s = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    elif width == 2:
        s = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    elif width == 4:
        s = np.frombuffer(raw, dtype="<i4").astype(np.float64)
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if nch > 1:
        s = s[: len(s) - (len(s) % nch)].reshape(-1, nch).mean(axis=1)
    return s, rate


def _spectral_centroid(samples: np.ndarray, rate: int) -> float:
    """Magnitude-weighted mean frequency (Hz) over one rfft of the
    (DC-removed) signal — the cheap spectral summary audio curation
    filters sort on."""
    if len(samples) < 2:
        return 0.0
    x = samples - samples.mean()
    # Hann window: without it, tones whose cycle count is non-integer
    # leak across the whole spectrum and drag the weighted mean far off
    # the true pitch (measured 240 Hz → 723 Hz unwindowed)
    x = x * np.hanning(len(x))
    mag = np.abs(np.fft.rfft(x))
    tot = mag.sum()
    if tot <= 0.0:
        return 0.0
    freqs = np.fft.rfftfreq(len(x), d=1.0 / rate)
    return float((freqs * mag).sum() / tot)


class AudioFeatureActor:
    """payload(binary) → (n_samples, rms, zero_crossings, duration_s,
    spectral_centroid) — numpy per payload.  Decodes REAL RIFF/WAVE PCM
    (stdlib) and the synthetic fixture format; compressed codecs
    (mp3/ogg) raise the documented ffmpeg-seam NotImplementedError."""

    def __call__(self, batch: pa.Table, column: str = "payload") -> pa.Table:
        col = column if column in batch.column_names else batch.column_names[-1]
        n_samples, rms, zc = [], [], []
        dur, cent = [], []
        for i in range(len(batch)):
            payload = batch[col][i].as_py() or b""
            if payload.startswith(AUDIO_MAGIC):
                (rate,) = struct.unpack("<I", payload[8:12])
                body = zlib.decompress(payload[12:])
                samples = np.frombuffer(body, dtype="<i2").astype(np.float64)
            elif payload.startswith(WAV_MAGIC):
                samples, rate = decode_wav(payload)
            else:
                raise NotImplementedError(
                    "compressed audio (mp3/ogg) requires ffmpeg (absent in container); "
                    "PCM WAV and the synthetic format decode natively"
                )
            n_samples.append(len(samples))
            rms.append(float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0)
            zc.append(int(np.sum(np.abs(np.diff(np.signbit(samples))))) if len(samples) > 1 else 0)
            dur.append(len(samples) / rate if rate else 0.0)
            cent.append(_spectral_centroid(samples, rate))
        return (
            batch.append_column("n_samples", pa.array(n_samples, type=pa.int64()))
            .append_column("rms", pa.array(rms, type=pa.float64()))
            .append_column("zero_crossings", pa.array(zc, type=pa.int64()))
            .append_column("duration_s", pa.array(dur, type=pa.float64()))
            .append_column("spectral_centroid", pa.array(cent, type=pa.float64()))
        )


# --- video ------------------------------------------------------------------
#
# REAL format: YUV4MPEG2 (y4m) — the uncompressed interchange container
# every video toolchain emits; plain-text header + raw 4:2:0 planes, so
# it parses with slicing alone.  Synthetic format (fixtures):
# frame-count header + per-frame image payloads.  Compressed codecs
# (h264/vp9) remain a documented ffmpeg seam.

VIDEO_MAGIC = b"GRAFTVID"
Y4M_MAGIC = b"YUV4MPEG2"


def encode_video_frames(frames: list[str]) -> bytes:
    parts = [encode_image_text(f) for f in frames]
    head = VIDEO_MAGIC + struct.pack("<I", len(parts))
    return head + b"".join(struct.pack("<I", len(p)) + p for p in parts)


def encode_y4m(frames: list[np.ndarray], fps: str = "25:1") -> bytes:
    """Grayscale (h, w) uint8 frames → YUV4MPEG2 bytes (C420: Y plane =
    the frame, chroma planes neutral 128) — the real-format fixture
    generator for the y4m decode path."""
    if not frames:
        raise ValueError("encode_y4m: no frames")
    h, w = frames[0].shape
    if h % 2 or w % 2:
        raise ValueError("encode_y4m: 4:2:0 needs even dimensions")
    chroma = np.full((h // 2, w // 2), 128, dtype=np.uint8).tobytes()
    out = [f"YUV4MPEG2 W{w} H{h} F{fps} Ip A1:1 C420\n".encode()]
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("encode_y4m: frame dims must match")
        out.append(b"FRAME\n")
        out.append(np.ascontiguousarray(f, dtype=np.uint8).tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[list[np.ndarray], int, int]:
    """YUV4MPEG2 bytes → (list of Y-plane (h, w) uint8 arrays, w, h).
    Supports C420 (default when the C tag is absent); luma only — the
    frame content downstream feature stages consume."""
    nl = payload.index(b"\n")
    header = payload[:nl].decode("ascii", "replace").split(" ")
    if header[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    chroma = "420"
    for tag in header[1:]:
        if tag.startswith("W"):
            w = int(tag[1:])
        elif tag.startswith("H"):
            h = int(tag[1:])
        elif tag.startswith("C"):
            chroma = tag[1:]
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    if not chroma.startswith("420"):
        raise ValueError(f"y4m chroma C{chroma} unsupported (C420 only)")
    frame_len = w * h + 2 * ((w // 2) * (h // 2))
    frames: list[np.ndarray] = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        fnl = payload.index(b"\n", pos)
        if not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("y4m: expected FRAME marker")
        y_start = fnl + 1
        frames.append(
            np.frombuffer(payload[y_start : y_start + w * h], dtype=np.uint8)
            .reshape(h, w)
            .copy()
        )
        pos = y_start + frame_len
    return frames, w, h


class VideoFrameSampleActor:
    """payload → every-k-th frame as an image-payload list column (the
    frame-sampling stage of a video curation pipeline).  REAL YUV4MPEG2
    streams decode natively (luma planes re-encoded as PNG via the
    stdlib codec); the synthetic fixture format passes its image
    payloads through; compressed codecs (h264/vp9) raise the documented
    ffmpeg-seam NotImplementedError."""

    def __init__(self, stride: int = 2) -> None:
        self.stride = stride

    def __call__(self, batch: pa.Table, column: str = "payload") -> pa.Table:
        col = column if column in batch.column_names else batch.column_names[-1]
        sampled: list[list[bytes]] = []
        counts: list[int] = []
        for i in range(len(batch)):
            payload = batch[col][i].as_py() or b""
            if payload.startswith(Y4M_MAGIC):
                from .png import encode_png

                y_frames, _w, _h = decode_y4m(payload)
                sampled.append(
                    [encode_png(f) for f in y_frames[:: self.stride]]
                )
                counts.append(len(y_frames))
                continue
            if not payload.startswith(VIDEO_MAGIC):
                raise NotImplementedError(
                    "compressed video (h264/vp9) requires ffmpeg (absent in "
                    "container); YUV4MPEG2 and the synthetic format decode natively"
                )
            (n,) = struct.unpack("<I", payload[8:12])
            off = 12
            frames: list[bytes] = []
            for _ in range(n):
                (ln,) = struct.unpack("<I", payload[off : off + 4])
                frames.append(payload[off + 4 : off + 4 + ln])
                off += 4 + ln
            sampled.append(frames[:: self.stride])
            counts.append(n)
        return batch.append_column(
            "frames", pa.array(sampled, type=pa.list_(pa.binary()))
        ).append_column("n_frames", pa.array(counts, type=pa.int64()))


def content_digest(payload: bytes) -> str:
    return hashlib.sha256(payload).hexdigest()
