"""WARC-lite source: Common-Crawl-style web archives → pages Dataset.

Real Common-Crawl data ships as WARC files (ISO 28500): concatenated
records, each a ``WARC/1.0`` header block (``WARC-Target-URI``,
``WARC-Date``, ``Content-Length``) + CRLF CRLF + exactly
``Content-Length`` payload bytes + CRLF CRLF, the whole file usually
gzipped (one gzip member per record — a valid multi-member stream).

This module implements that framing with the stdlib only (the container
has no warcio): ``read_warc`` is ``ray.data.read_binary_files`` → one
``map_batches`` parse — each WARC file is one row of bytes, so the parse
is embarrassingly parallel and streams file-by-file with the normal
block backpressure.  Per-record metadata maps onto the engine's page
schema (url, warc_ts, html); ``text``/``lang`` are absent in real
archives, so the reader emits the 3-column core and callers derive the
rest (the extraction pipeline never needed them).

``pages_to_warc_bytes`` is the inverse (used by tests and fixture
generation): pages table → spec-shaped bytes, optionally gzipped
member-per-record like real crawls.
"""

from __future__ import annotations

import gzip
from datetime import datetime, timezone

import pyarrow as pa
import ray.data as rd

_ISO = "%Y-%m-%dT%H:%M:%SZ"


def _record_bytes(url: str, ts_us: int, payload: bytes) -> bytes:
    dt = datetime.fromtimestamp(ts_us / 1_000_000, tz=timezone.utc)
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {dt.strftime(_ISO)}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return head + payload + b"\r\n\r\n"


def pages_to_warc_bytes(
    pages: pa.Table,
    *,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    compress: bool = True,
) -> bytes:
    """pages rows → one WARC-lite file body (gzip member per record when
    ``compress``, byte-concatenated records otherwise)."""
    urls = pages[url_col].to_pylist()
    ts = (
        pages[ts_col]
        .to_numpy(zero_copy_only=False)
        .astype("datetime64[us]")
        .astype("int64")
    )
    payloads = pages[payload_col].to_pylist()
    out = []
    for u, t, p in zip(urls, ts, payloads):
        rec = _record_bytes(u, int(t), p or b"")
        out.append(gzip.compress(rec) if compress else rec)
    return b"".join(out)


def parse_warc_records(blob: bytes) -> tuple[list[str], list[int], list[bytes]]:
    """One WARC(-lite) file body → (urls, ts_us, payloads).  Handles the
    gzipped form transparently (multi-member streams decompress as one
    concatenation).  Content-Length framing — payloads may contain
    anything, including 'WARC/1.0' literals."""
    if blob[:2] == b"\x1f\x8b":
        blob = gzip.decompress(blob)
    urls: list[str] = []
    ts_us: list[int] = []
    payloads: list[bytes] = []
    pos = 0
    n = len(blob)
    while pos < n:
        end = blob.find(b"\r\n\r\n", pos)
        if end < 0:
            break
        header = blob[pos:end].decode("utf-8", errors="replace")
        fields = {}
        for line in header.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        length = int(fields.get("content-length", "0"))
        body_start = end + 4
        payloads.append(blob[body_start : body_start + length])
        urls.append(fields.get("warc-target-uri", ""))
        date = fields.get("warc-date", "1970-01-01T00:00:00Z")
        dt = datetime.strptime(date, _ISO).replace(tzinfo=timezone.utc)
        ts_us.append(int(dt.timestamp() * 1_000_000))
        pos = body_start + length + 4  # skip payload + record CRLFCRLF
    return urls, ts_us, payloads


def read_warc(paths: str | list[str], **read_kwargs) -> rd.Dataset:
    """WARC(-lite) files → pages Dataset (url, warc_ts, html).  One
    binary-file row per archive; the parse runs inside map_batches, so N
    archive files parse with N-way parallelism and stream under
    backpressure — no driver-side file handling."""
    raw = rd.read_binary_files(paths, **read_kwargs)

    def parse(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        ts: list[int] = []
        payloads: list[bytes] = []
        for blob in t["bytes"].to_pylist():
            u, s, p = parse_warc_records(blob)
            urls.extend(u)
            ts.extend(s)
            payloads.extend(p)
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "warc_ts": pa.array(ts, type=pa.timestamp("us")),
                "html": pa.array(payloads, type=pa.binary()),
            }
        )

    return raw.map_batches(parse, batch_format="pyarrow")
