"""Multimodal column stages: image decode / resize, audio features, video
frame sampling — actor-pool ``map_batches`` stages over opaque binary
columns with typed metadata.

The container has no image/audio/video libraries, so the *decode kernels*
are stubbed (clearly-marked NotImplementedError for real media;
deterministic fakes for the synthetic formats), while the Ray-side
plumbing — schemas, batch sizing, actor signatures, output layout — is
real and tested, per the task brief. Swapping in PIL/ffmpeg is an
``__init__`` change in each actor.

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


# --- audio: synthetic format = b"GRAFTAUD" + i16 PCM samples ---------------

AUDIO_MAGIC = b"GRAFTAUD"


def encode_audio_pcm(samples: np.ndarray, rate: int = 16000) -> bytes:
    body = samples.astype("<i2").tobytes()
    return AUDIO_MAGIC + struct.pack("<I", rate) + zlib.compress(body, 1)


class AudioFeatureActor:
    """payload(binary) → (n_samples, rms, zero_crossings) — vectorized
    numpy per payload; real codecs (mp3/ogg) would need ffmpeg (stub)."""

    def __call__(self, batch: pa.Table, column: str = "payload") -> pa.Table:
        col = column if column in batch.column_names else batch.column_names[-1]
        n_samples, rms, zc = [], [], []
        for i in range(len(batch)):
            payload = batch[col][i].as_py() or b""
            if not payload.startswith(AUDIO_MAGIC):
                raise NotImplementedError(
                    "real audio decode requires ffmpeg (absent in container)"
                )
            body = zlib.decompress(payload[12:])
            samples = np.frombuffer(body, dtype="<i2").astype(np.float64)
            n_samples.append(len(samples))
            rms.append(float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0)
            zc.append(int(np.sum(np.abs(np.diff(np.signbit(samples))))) if len(samples) > 1 else 0)
        return (
            batch.append_column("n_samples", pa.array(n_samples, type=pa.int64()))
            .append_column("rms", pa.array(rms, type=pa.float64()))
            .append_column("zero_crossings", pa.array(zc, type=pa.int64()))
        )


# --- video: synthetic format = frame-count header + per-frame images -------

VIDEO_MAGIC = b"GRAFTVID"


def encode_video_frames(frames: list[str]) -> bytes:
    parts = [encode_image_text(f) for f in frames]
    head = VIDEO_MAGIC + struct.pack("<I", len(parts))
    return head + b"".join(struct.pack("<I", len(p)) + p for p in parts)


class VideoFrameSampleActor:
    """payload → every-k-th frame as an image-payload list column
    (frame-sampling shape of a real ffmpeg stage)."""

    def __init__(self, stride: int = 2) -> None:
        self.stride = stride

    def __call__(self, batch: pa.Table, column: str = "payload") -> pa.Table:
        col = column if column in batch.column_names else batch.column_names[-1]
        sampled: list[list[bytes]] = []
        counts: list[int] = []
        for i in range(len(batch)):
            payload = batch[col][i].as_py() or b""
            if not payload.startswith(VIDEO_MAGIC):
                raise NotImplementedError(
                    "real video decode requires ffmpeg (absent in container)"
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
