"""Text-analysis operators for training-data curation: language ID,
quality scoring, token counting, document fingerprinting.

All are stateless vectorized ``map_batches`` stages over the documents /
pages text column.  Heuristics are deterministic and integer/ratio-based
(no models — the container has none; the class shapes match what a
fasttext-style model stage would need: compile/load in ``__init__`` of an
actor, score per batch).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

# --- language ID (n-gram / marker-word heuristic) ---------------------------

_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is you that it for was with are".split()),
    "de": frozenset("der die das und ist nicht ein mit für von sich auf".split()),
    "fr": frozenset("le la les et est pas une pour dans que vous avec".split()),
    "es": frozenset("el la los las y es no una por para con su del".split()),
}
_CJK = re.compile(r"[一-鿿]")


def language_id(text: str) -> str:
    """Deterministic language guess: CJK chars → zh; else the language with
    the most marker-word hits; ties → lexicographically first; no hits →
    'und'."""
    if not text:
        return "und"
    if _CJK.search(text):
        return "zh"
    words = text.lower().split()
    best_lang, best_hits = "und", 0
    for lang in sorted(_LANG_MARKERS):
        hits = sum(1 for w in words if w in _LANG_MARKERS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang


def add_language_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    langs = [language_id(t or "") for t in batch[text_col].to_pylist()]
    return batch.append_column("lang_pred", pa.array(langs, type=pa.string()))


# --- token counting ---------------------------------------------------------

# BPE-ish pre-tokenizer: word pieces, numbers, punctuation runs
_BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")


def add_token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """ws_tokens = whitespace split count; bpe_tokens = regex pre-tokenizer
    count (a deterministic stand-in for a BPE tokenizer)."""
    texts = batch[text_col].to_pylist()
    ws = np.array([len((t or "").split()) for t in texts], dtype=np.int64)
    bpe = np.array([len(_BPE_RE.findall(t or "")) for t in texts], dtype=np.int64)
    return batch.append_column("ws_tokens", pa.array(ws)).append_column(
        "bpe_tokens", pa.array(bpe)
    )


# --- quality scoring --------------------------------------------------------

_STOPWORDS = _LANG_MARKERS["en"]
_PUNCT = re.compile(r"[^\w\s]")


def add_quality_metrics(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / punctuation / stopword / word-length signals and a
    composite [0,1] quality score (C4/Gopher-style rule features)."""
    texts = [t or "" for t in batch[text_col].to_pylist()]
    n = len(texts)
    n_chars = np.empty(n, dtype=np.int64)
    n_words = np.empty(n, dtype=np.int64)
    punct_ratio = np.empty(n, dtype=np.float64)
    stop_ratio = np.empty(n, dtype=np.float64)
    mean_word_len = np.empty(n, dtype=np.float64)
    for i, t in enumerate(texts):
        words = t.split()
        n_chars[i] = len(t)
        n_words[i] = len(words)
        punct_ratio[i] = len(_PUNCT.findall(t)) / len(t) if t else 0.0
        stop_ratio[i] = (
            sum(1 for w in words if w.lower() in _STOPWORDS) / len(words) if words else 0.0
        )
        mean_word_len[i] = (sum(len(w) for w in words) / len(words)) if words else 0.0
    # composite: in-range word length, some length, low punct noise
    score = (
        np.clip(n_words / 50.0, 0, 1) * 0.4
        + np.clip(1.0 - punct_ratio * 4.0, 0, 1) * 0.3
        + np.clip((mean_word_len - 1.0) / 5.0, 0, 1) * 0.3
    )
    out = batch
    for name, arr in (
        ("q_n_chars", n_chars),
        ("q_n_words", n_words),
        ("punct_ratio", punct_ratio),
        ("stop_ratio", stop_ratio),
        ("mean_word_len", mean_word_len),
        ("quality_score", score),
    ):
        out = out.append_column(name, pa.array(arr))
    return out


# --- document fingerprinting (rolling hash + winnowing) ---------------------

_BASE = 257
_MOD = (1 << 61) - 1


def winnow_fingerprints(text: str, k: int = 8, window: int = 16) -> list[int]:
    """Rabin-Karp rolling k-gram hashes + winnowing: keep the minimum hash
    in each window (rightmost minimum), deduplicated in order."""
    s = text.lower()
    if len(s) < k:
        return [_h(s)] if s else []
    hashes = []
    h = 0
    power = pow(_BASE, k - 1, _MOD)
    for i, ch in enumerate(s):
        h = (h * _BASE + ord(ch)) % _MOD
        if i >= k:
            h = (h - ord(s[i - k]) * power * _BASE) % _MOD
        if i >= k - 1:
            hashes.append(h)
    fps: list[int] = []
    prev = -1
    for w in range(len(hashes) - window + 1) if len(hashes) >= window else range(1):
        win = hashes[w : w + window] if len(hashes) >= window else hashes
        m = min(win)
        idx = w + max(i for i, v in enumerate(win) if v == m)
        if idx != prev:
            fps.append(m)
            prev = idx
    return fps


def _h(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")


def add_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-hex fingerprint digest of the winnowed hash set (order-insensitive)."""
    digests = []
    for t in batch[text_col].to_pylist():
        fps = sorted(set(winnow_fingerprints(t or "")))
        digests.append(
            hashlib.sha256(b"".join(v.to_bytes(8, "big") for v in fps)).hexdigest()
        )
    return batch.append_column("fingerprint", pa.array(digests, type=pa.string()))
