"""Webtext cleaning operators: PII redaction, URL canonicalization,
intra-document repetition signals.

Standard training-data curation steps (C4/Gopher-style) as vectorized
``map_batches`` stages; deterministic, regex patterns RE2-compatible so
the redaction oracle can run the same patterns in DuckDB.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

# RE2-compatible (no backrefs/lookarounds) so DuckDB regexp_replace agrees
EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
PHONE_RE = re.compile(r"\+?[0-9][0-9()\-\s]{7,}[0-9]")
IPV4_RE = re.compile(r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b")

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IP_TOKEN = "<IP>"


def redact_pii(text: str) -> str:
    """Emails → phones → IPs, in that fixed order (order matters: a phone
    pattern could otherwise eat digits inside an already-redacted span)."""
    text = EMAIL_RE.sub(EMAIL_TOKEN, text)
    text = PHONE_RE.sub(PHONE_TOKEN, text)
    text = IPV4_RE.sub(IP_TOKEN, text)
    return text


def add_redacted(batch: pa.Table, text_col: str = "text", out: str = "redacted") -> pa.Table:
    vals = [redact_pii(t or "") for t in batch[text_col].to_pylist()]
    return batch.append_column(out, pa.array(vals, type=pa.string()))


# --- URL canonicalization ---------------------------------------------------

_TRACKING_PARAMS = frozenset(
    "utm_source utm_medium utm_campaign utm_term utm_content gclid fbclid ref".split()
)


def normalize_url(url: str) -> str:
    """Deterministic canonical form: lowercase scheme+host, default ports
    dropped, tracking params removed, params sorted, trailing slash
    stripped (except root), fragment dropped."""
    from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = parts.scheme.lower()
    host = parts.netloc.lower()
    for port, sch in ((":80", "http"), (":443", "https")):
        if host.endswith(port) and scheme == sch:
            host = host[: -len(port)]
    path = parts.path or "/"
    if path != "/" and path.endswith("/"):
        path = path.rstrip("/") or "/"  # '//' collapses to root, not empty
    params = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if k.lower() not in _TRACKING_PARAMS
    ]
    query = urlencode(sorted(params))
    return urlunsplit((scheme, host, path, query, ""))


def add_canonical_url(batch: pa.Table, url_col: str = "url", out: str = "canonical_url") -> pa.Table:
    vals = [normalize_url(u or "") for u in batch[url_col].to_pylist()]
    return batch.append_column(out, pa.array(vals, type=pa.string()))


# --- intra-document repetition (Gopher-style) -------------------------------


def repetition_ratio(text: str, ngram: int = 3) -> float:
    """Fraction of word n-gram occurrences that are repeats of an earlier
    n-gram (0 = no repetition; high values indicate boilerplate loops)."""
    words = text.lower().split()
    if len(words) < ngram:
        return 0.0
    total = len(words) - ngram + 1
    distinct = len({tuple(words[i : i + ngram]) for i in range(total)})
    return (total - distinct) / total


def add_repetition_ratio(batch: pa.Table, text_col: str = "text") -> pa.Table:
    vals = np.array(
        [repetition_ratio(t or "") for t in batch[text_col].to_pylist()], dtype=np.float64
    )
    return batch.append_column("repetition_ratio", pa.array(vals))
