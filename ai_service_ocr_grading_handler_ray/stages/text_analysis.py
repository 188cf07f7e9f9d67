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
from .collect import collect_tables

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


def add_char_entropy(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Character-distribution signals per document: Shannon entropy in
    bits over the text's codepoints plus the distinct-codepoint count —
    the low-entropy tail is repetitive junk (keyboard mash, padded
    boilerplate) and the high-entropy tail is binary/garbled payload,
    both standard prune signals in web-corpus curation.

    Fully vectorized, shuffle-free: the batch's texts concatenate into
    ONE utf-32 codepoint tape; per-(doc, codepoint) counts come from a
    single ``np.unique`` over a packed ``doc << 21 | codepoint`` key
    (codepoints < 2**21, so the pack is collision-free), and entropies
    accumulate with ``np.add.at`` in key-sorted order (deterministic
    float addition order).  No per-row Python beyond the one join."""
    texts = [t or "" for t in batch[text_col].to_pylist()]
    n = len(texts)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    ent = np.zeros(n, dtype=np.float64)
    uniq = np.zeros(n, dtype=np.int64)
    if n and int(lens.sum()):
        tape = np.frombuffer(
            "".join(texts).encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        doc = np.repeat(np.arange(n, dtype=np.int64), lens)
        key = (doc << 21) | tape
        uk, cnt = np.unique(key, return_counts=True)
        ud = uk >> 21
        p = cnt / lens[ud].astype(np.float64)
        np.add.at(ent, ud, -p * np.log2(p))
        uniq += np.bincount(ud, minlength=n)
        ent += 0.0  # fold any -0.0 (single-codepoint docs) to +0.0
    out = batch
    for name, arr in (
        ("n_chars_exact", lens),
        ("n_unique_chars", uniq),
        ("char_entropy", ent),
    ):
        out = out.append_column(name, pa.array(arr))
    return out


def add_compression_ratio(
    batch: pa.Table, text_col: str = "text", level: int = 6
) -> pa.Table:
    """DEFLATE compression ratio per document: ``zlib_bytes / n_bytes``
    over the utf-8 encoding — the long-range repetitiveness signal
    (template farms, keyboard mash, crawler loops compress far below
    prose; binary garble compresses above it).  Complements
    ``add_char_entropy``: entropy sees only the codepoint DISTRIBUTION,
    the LZ77 window sees REPEATED STRUCTURE at any offset ≤ 32 KiB, so a
    page of shuffled boilerplate sentences scores normal entropy but
    very low ratio.  Used by Gopher/RefinedWeb-style quality cascades.

    One shuffle-free scan; per-row work is a single C call into zlib
    (the same per-row-C-call budget as the md5 split rule).  Not
    SQL-expressible (DuckDB has no deflate) — rows-only driver entry;
    semantics pinned by tests/test_text_analysis.py range and
    monotonicity checks.  Empty text → ratio 0.0 (nothing to judge)."""
    import zlib

    texts = batch[text_col].to_pylist()
    raw = [(t or "").encode("utf-8") for t in texts]
    n = np.fromiter((len(b) for b in raw), dtype=np.int64, count=len(raw))
    z = np.fromiter(
        (len(zlib.compress(b, level)) if b else 0 for b in raw),
        dtype=np.int64,
        count=len(raw),
    )
    ratio = np.divide(z, n, out=np.zeros(len(raw)), where=n > 0)
    out = batch
    for name, arr in (
        ("n_bytes", pa.array(n)),
        ("zlib_bytes", pa.array(z)),
        ("compression_ratio", pa.array(ratio)),
    ):
        out = out.append_column(name, arr)
    return out


# --- Unicode script mix ------------------------------------------------------

# Codepoint ranges per script class (inclusive), priority order below.
# Deliberately coarse — curation needs "which writing system dominates",
# not full UAX#24; ranges must stay SQL-CASE replayable (script_mix_sql
# generates the oracle from THIS table — single-generator policy).
SCRIPT_RANGES: dict[str, tuple[tuple[int, int], ...]] = {
    "latin": ((0x41, 0x5A), (0x61, 0x7A), (0xC0, 0x24F)),
    "cyrillic": ((0x400, 0x4FF),),
    "greek": ((0x370, 0x3FF),),
    "arabic": ((0x600, 0x6FF),),
    "cjk": ((0x3040, 0x30FF), (0x4E00, 0x9FFF), (0xAC00, 0xD7AF)),
    "digit": ((0x30, 0x39),),
}
SCRIPT_ORDER = ("latin", "cyrillic", "greek", "arabic", "cjk", "digit", "other")
_WS_CODEPOINTS = (9, 10, 11, 12, 13, 32)


def _script_bounds() -> tuple[np.ndarray, np.ndarray]:
    rows = [
        (a, b, ci)
        for ci, name in enumerate(SCRIPT_ORDER[:-1])
        for (a, b) in SCRIPT_RANGES[name]
    ]
    rows.sort()
    bounds = np.array([x for a, b, _ in rows for x in (a, b + 1)], dtype=np.int64)
    cls = np.array([c for _, _, c in rows], dtype=np.int64)
    return bounds, cls


def add_script_mix(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Writing-system mix per document: per-script codepoint counts
    (latin/cyrillic/greek/arabic/cjk/digit/other, whitespace excluded),
    the dominant script (first-max in SCRIPT_ORDER — the same tie-break
    the SQL CASE replays) and the latin fraction — the script-based
    filtering axis multilingual corpus curation runs before language ID
    (q35's trigram heuristic assumes an alphabetic script).

    One shuffle-free scan; the kernel classifies the batch's utf-32
    tape with ONE ``np.searchsorted`` over the flattened range bounds
    and folds per-(doc, class) counts with one bincount.  Empty /
    all-whitespace docs → dominant 'none', latin_frac 0.0."""
    texts = [t or "" for t in batch[text_col].to_pylist()]
    n = len(texts)
    c = len(SCRIPT_ORDER)
    counts = np.zeros((n, c), dtype=np.int64)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    if n and int(lens.sum()):
        tape = np.frombuffer(
            "".join(texts).encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        doc = np.repeat(np.arange(n, dtype=np.int64), lens)
        keep = ~np.isin(tape, _WS_CODEPOINTS)
        tape, doc = tape[keep], doc[keep]
        bounds, cls = _script_bounds()
        idx = np.searchsorted(bounds, tape, side="right")
        inside = idx % 2 == 1
        klass = np.full(len(tape), c - 1, dtype=np.int64)  # other
        klass[inside] = cls[idx[inside] // 2]
        counts = np.bincount(doc * c + klass, minlength=n * c).reshape(n, c)
    tot = counts.sum(axis=1)
    dominant = np.asarray(SCRIPT_ORDER, dtype=object)[np.argmax(counts, axis=1)]
    dominant[tot == 0] = "none"
    latin_frac = np.divide(
        counts[:, 0], tot, out=np.zeros(n, dtype=np.float64), where=tot > 0
    )
    out = batch
    for ci, name in enumerate(SCRIPT_ORDER):
        out = out.append_column(f"n_{name}", pa.array(counts[:, ci]))
    out = out.append_column("dominant_script", pa.array(dominant, type=pa.string()))
    return out.append_column("latin_frac", pa.array(latin_frac))


def script_mix_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 4,
) -> str:
    """DuckDB replay of :func:`add_script_mix`, generated from
    SCRIPT_RANGES / SCRIPT_ORDER (single-generator policy): identical
    ranges, identical whitespace set, identical first-max dominance
    tie-break (the CASE tests classes in SCRIPT_ORDER)."""
    def in_ranges(name: str) -> str:
        return " OR ".join(
            f"u BETWEEN {a} AND {b}" for a, b in SCRIPT_RANGES[name]
        )

    klass = "CASE"
    for name in SCRIPT_ORDER[:-1]:
        klass += f" WHEN {in_ranges(name)} THEN '{name}'"
    klass += " ELSE 'other' END"
    counts = ",\n".join(
        f"          CAST(count(*) FILTER (k = '{name}') AS BIGINT)"
        f" AS n_{name}"
        for name in SCRIPT_ORDER
    )
    dom = "CASE"
    for name in SCRIPT_ORDER:
        others = [o for o in SCRIPT_ORDER if o != name]
        geq = " AND ".join(f"n_{name} >= n_{o}" for o in others)
        dom += f" WHEN {geq} THEN '{name}'"
        # first-max: later classes must be strictly greater to win, which
        # the ORDER of these WHEN arms encodes exactly like np.argmax
    dom += " END"
    ws = ", ".join(str(w) for w in _WS_CODEPOINTS)
    return f"""
        WITH chars AS (
          SELECT {id_col},
                 unicode(unnest(regexp_extract_all({text_col}, '[\\s\\S]')))
                   AS u
          FROM {table}
        ),
        klassed AS (
          SELECT {id_col}, {klass} AS k FROM chars WHERE u NOT IN ({ws})
        ),
        counts AS (
          SELECT {id_col},
{counts}
          FROM klassed GROUP BY {id_col}
        ),
        withdom AS (
          SELECT *,
                 {" + ".join("n_" + s for s in SCRIPT_ORDER)} AS tot
          FROM counts
        )
        SELECT d.{id_col},
               {", ".join(f"COALESCE(w.n_{s}, 0) AS n_{s}" for s in SCRIPT_ORDER)},
               CASE WHEN w.tot IS NULL OR w.tot = 0 THEN 'none'
                    ELSE {dom} END AS dominant_script,
               round(COALESCE(w.n_latin / CAST(w.tot AS DOUBLE), 0), {round_to})
                 AS latin_frac
        FROM {table} d LEFT JOIN withdom w USING ({id_col})
    """

# The LM vocabulary broadcasts to every scoring task: words, not
# documents — a 10M-type web vocabulary is ~300 MB of hashes+logprobs,
# fine for ray.put; beyond the cap the counts should stay a Dataset and
# the probe become a bucketed join.
_VOCAB_BROADCAST_CAP = 20_000_000


def batch_words(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """Single-space tokenize a whole batch in one pass: one join + one
    split (C-speed) instead of a per-text split loop.  Returns
    (words, lens) where ``lens[i]`` is text i's token count and ``words``
    is the concatenation (``np.add.reduceat`` over cumsum(lens) recovers
    per-text segments).  Matches SQL ``string_split(text, ' ')`` exactly,
    including the empty-text case ('' → one empty token, so lens >= 1
    always — reduceat never sees a zero-width segment)."""
    if not texts:
        return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
    lens = np.array([(t or "").count(" ") + 1 for t in texts], dtype=np.int64)
    words = np.array(" ".join(t or "" for t in texts).split(" "), dtype=object)
    return words, lens


# --- unigram LM scoring (CCNet-style perplexity proxy) ----------------------


def unigram_counts(
    ds,
    *,
    text_col: str = "text",
    num_parts: int = 32,
    mask_col: str | None = None,
):
    """Corpus unigram counts as a Dataset of (token, n): per-batch
    ``np.unique`` partial counts (batch-sized → vocab-sized rows leave
    each task), then ONE coarse token-hash shuffle with a vectorized
    pandas sum per partition — the shuffled volume is bounded by
    vocab × blocks, never corpus tokens.

    ``mask_col`` (a boolean column) adds a second count column
    ``n_masked`` — token occurrences coming from masked rows — in the
    SAME single pass over the text; at corpus scale that halves the
    tokenize+count cost for two-LM consumers (DSIR) vs two passes."""
    import pandas as pd

    from .dedup import add_key_partition

    count_cols = ["n"] + (["n_masked"] if mask_col else [])

    def partial(t: pa.Table) -> pa.Table:
        words, lens = batch_words(t[text_col].to_pylist())
        # pd.factorize is the hash-based O(n) unique — np.unique on an
        # object-string tape is a lexicographic sort, measured 21× slower
        # on a dup-heavy 900k-word batch (downstream only needs the
        # multiset, so first-occurrence order is fine)
        inverse, toks = pd.factorize(words, sort=False)
        counts = np.bincount(inverse, minlength=len(toks))
        out = {
            "token": pa.array(toks, type=pa.string()),
            "n": pa.array(counts.astype(np.int64)),
        }
        if mask_col:
            m = t[mask_col].to_numpy(zero_copy_only=False).astype(bool)
            tok_masked = np.repeat(m, lens)
            nm = np.bincount(
                inverse[tok_masked], minlength=len(toks)
            ).astype(np.int64)
            out["n_masked"] = pa.array(nm)
        return pa.table(out)

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("token", sort=False)[count_cols].sum().reset_index()
        for c in count_cols:
            r[c] = r[c].astype("int64")
        return r

    return (
        # batch_size: the per-batch np.unique is the map-side combiner —
        # bigger batches shrink the shuffled (token, n) partial volume
        # (same 1.8× measurement as duplicate_gram_set at 2M docs)
        ds.map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .map_batches(
            lambda t: add_key_partition(t, "token", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(agg, batch_format="pandas")
    )


def _collect_counts(
    counts, count_cols: tuple[str, ...] = ("n",)
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Collect a counts Dataset into (tokens, [count arrays]).  The
    collection is vocab-sized by construction (``unigram_counts`` already
    reduced corpus tokens → types); the broadcast cap guards the driver."""
    import ray

    blocks = [b for b in collect_tables(counts, drop_empty=False) if b.num_rows]
    if blocks:
        toks = np.concatenate(
            [b.column("token").to_pandas().to_numpy(dtype=object) for b in blocks]
        )
        cols = [
            np.concatenate(
                [b.column(c).to_numpy(zero_copy_only=False) for b in blocks]
            ).astype(np.float64)
            for c in count_cols
        ]
    else:
        toks = np.empty(0, dtype=object)
        cols = [np.empty(0, dtype=np.float64) for _ in count_cols]
    if len(toks) > _VOCAB_BROADCAST_CAP:
        raise ValueError(
            f"vocabulary ({len(toks)} types) exceeds broadcast cap "
            f"{_VOCAB_BROADCAST_CAP}; probe via bucketed join instead"
        )
    return toks, cols


def _build_lm(
    toks: np.ndarray, ns: np.ndarray
) -> tuple[np.ndarray, np.ndarray, float]:
    """(tokens, counts) → broadcast-ready (sorted token hashes, matching
    log-probabilities, total tokens)."""
    from .hashing import hash_u64

    total = float(ns.sum())
    h = hash_u64(toks)
    order = np.argsort(h, kind="stable")
    h_sorted = h[order]
    logp_sorted = np.log(ns[order] / total) if total else np.empty(0)
    return h_sorted, logp_sorted, total


def _lm_arrays(counts) -> tuple[np.ndarray, np.ndarray, float]:
    toks, (ns,) = _collect_counts(counts)
    return _build_lm(toks, ns)


def _lm_probe(
    hs: np.ndarray, lps: np.ndarray, wh: np.ndarray, oov: float
) -> np.ndarray:
    """Per-token log-probabilities for hashed words ``wh`` against a
    sorted-hash LM: binary-search probe, OOV fill for misses."""
    if not len(hs):
        return np.full(len(wh), oov, dtype=np.float64)
    idx = np.clip(np.searchsorted(hs, wh), 0, len(hs) - 1)
    hit = hs[idx] == wh
    return np.where(hit, lps[idx], oov)


def score_unigram_logprob(
    ds,
    counts=None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "avg_logprob",
    oov_logprob: float | None = None,
    num_parts: int = 32,
    method: str = "broadcast",
    keep_cols: tuple[str, ...] = (),
):
    """Per-document mean unigram log-probability — the KenLM-free
    perplexity proxy CCNet-style pipelines bucket quality by.  The LM is
    the corpus' own unigram distribution unless ``counts`` (a Dataset of
    (token, n), e.g. trained on a reference corpus) is supplied.

    ``method="broadcast"`` (default): the vocabulary collects ONCE to
    the driver (vocab-sized, capped at ``_VOCAB_BROADCAST_CAP``) and
    broadcasts via ``ray.put`` as a sorted hash→logprob table; scoring
    is a single shuffle-free ``map_batches`` scan — hash the batch's
    words (cython siphash), ``searchsorted`` probe, ``reduceat`` per-doc
    mean.

    ``method="join"``: the cap-free path for vocabularies too large to
    broadcast — the LM stays a Dataset; per-doc distinct (token-hash,
    occurrence-count) pairs cogroup with LM rows by token hash
    (vectorized pandas merge per partition), then partial per-doc sums
    reduce in a doc-hash shuffle.  Two bounded shuffles; the corpus text
    is still read once.

    Tokens absent from the LM score ``oov_logprob`` (default
    ln(0.5 / total), an add-half floor); self-trained scoring never hits
    it.  A 64-bit hash collision between two distinct vocab tokens would
    conflate their probabilities (~1e-6 at 10M types) — accepted for a
    scoring signal.

    Output: (id_col, n_tokens, out_col) plus any ``keep_cols``
    (passthrough columns carried alongside the score — e.g. ``lang`` for
    per-language tiering; broadcast method only).
    """
    import ray

    if method not in ("broadcast", "join"):
        raise ValueError(f"unknown method {method!r}")
    if keep_cols and method == "join":
        raise ValueError("keep_cols requires method='broadcast' (the join "
                         "path regroups rows and drops passthrough columns)")
    if counts is None:
        counts = unigram_counts(ds, text_col=text_col, num_parts=num_parts)
    if method == "join":
        return _score_unigram_logprob_join(
            ds,
            counts,
            text_col=text_col,
            id_col=id_col,
            out_col=out_col,
            oov_logprob=oov_logprob,
            num_parts=num_parts,
        )
    h_sorted, logp_sorted, total = _lm_arrays(counts)
    oov = (
        float(oov_logprob)
        if oov_logprob is not None
        else float(np.log(0.5 / max(total, 1.0)))
    )
    lm_ref = ray.put((h_sorted, logp_sorted))

    def score(t: pa.Table) -> pa.Table:
        import pandas as pd

        from .hashing import hash_u64

        hs, lps = ray.get(lm_ref)
        words, lens = batch_words(t[text_col].to_pylist())
        if len(words):
            # factorize once, hash + probe only the batch vocabulary,
            # gather per-word logprobs through the codes — on dup-heavy
            # corpora the siphash+searchsorted work drops from
            # words-sized to vocab-sized
            codes, uniq = pd.factorize(words, sort=False)
            lp = _lm_probe(hs, lps, hash_u64(np.asarray(uniq, dtype=object)), oov)[codes]
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            avg = np.add.reduceat(lp, starts) / lens
        else:
            avg = np.empty(0, dtype=np.float64)
        cols = {
            id_col: t[id_col],
            "n_tokens": pa.array(lens),
            out_col: pa.array(avg, type=pa.float64()),
        }
        for c in keep_cols:
            cols[c] = t[c]
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")


def dsir_importance_weights(
    ds,
    target,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "dsir_weight",
    raw_counts=None,
    target_counts=None,
    num_parts: int = 32,
):
    """DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): per document the
    mean over tokens of ``ln p_target(tok) - ln p_raw(tok)``, where both
    LMs are unigram distributions — ``p_raw`` trained on ``ds`` itself,
    ``p_target`` on the ``target`` Dataset (the high-quality reference
    corpus).  Downstream selection is a sort / threshold on the weight.

    ``target`` is either a Dataset (the reference corpus — may be
    disjoint from ``ds``) or the NAME of a boolean column on ``ds``
    marking in-target rows: the column form fuses both LM count
    reductions into ONE pass over the corpus text (``unigram_counts``
    with ``mask_col``), halving the dominant tokenize+count cost.

    Scale shape: vocab-sized count reduction(s), ONE ``ray.put``
    broadcast carrying both LMs, then a single shuffle-free scoring scan
    (two searchsorted probes per token, one reduceat per doc).  Tokens
    absent from the target LM take its add-half floor
    ``ln(0.5 / target_total)``; raw-LM misses cannot happen when
    ``raw_counts`` is self-trained (supplying external ``raw_counts``
    gets the same floor).

    Output: (id_col, n_tokens, out_col).
    """
    import ray

    from .hashing import hash_u64

    if isinstance(target, str) and raw_counts is None and target_counts is None:
        dual = unigram_counts(
            ds, text_col=text_col, num_parts=num_parts, mask_col=target
        )
        toks, (ns, nm) = _collect_counts(dual, ("n", "n_masked"))
        raw_hs, raw_lps, raw_total = _build_lm(toks, ns)
        in_tgt = nm > 0
        tgt_hs, tgt_lps, tgt_total = _build_lm(toks[in_tgt], nm[in_tgt])
    else:
        if isinstance(target, str):
            raise ValueError(
                "column-name target cannot be combined with explicit counts"
            )
        if raw_counts is None:
            raw_counts = unigram_counts(
                ds, text_col=text_col, num_parts=num_parts
            )
        if target_counts is None:
            target_counts = unigram_counts(
                target, text_col=text_col, num_parts=num_parts
            )
        raw_hs, raw_lps, raw_total = _lm_arrays(raw_counts)
        tgt_hs, tgt_lps, tgt_total = _lm_arrays(target_counts)
    raw_oov = float(np.log(0.5 / max(raw_total, 1.0)))
    tgt_oov = float(np.log(0.5 / max(tgt_total, 1.0)))
    lm_ref = ray.put((raw_hs, raw_lps, tgt_hs, tgt_lps))

    def score(t: pa.Table) -> pa.Table:
        rhs, rlps, ths, tlps = ray.get(lm_ref)
        words, lens = batch_words(t[text_col].to_pylist())
        if len(words):
            wh = hash_u64(words)
            diff = _lm_probe(ths, tlps, wh, tgt_oov) - _lm_probe(
                rhs, rlps, wh, raw_oov
            )
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            avg = np.add.reduceat(diff, starts) / lens
        else:
            avg = np.empty(0, dtype=np.float64)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pa.array(lens),
                out_col: pa.array(avg, type=pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def _score_unigram_logprob_join(
    ds,
    counts,
    *,
    text_col: str,
    id_col: str,
    out_col: str,
    oov_logprob: float | None,
    num_parts: int,
):
    """Join-path scoring (see ``score_unigram_logprob(method="join")``).
    The LM Dataset never collects; ``total`` is a distributed Sum."""
    import pandas as pd
    import ray  # noqa: F401  (parity with broadcast path; no driver refs here)

    from .dedup import add_key_partition
    from .hashing import hash_u64

    counts = counts.materialize()
    total = float(counts.sum("n") or 0)
    oov = (
        float(oov_logprob)
        if oov_logprob is not None
        else float(np.log(0.5 / max(total, 1.0)))
    )

    def lm_rows(t: pa.Table) -> pa.Table:
        toks = t.column("token").to_pandas().to_numpy(dtype=object)
        ns = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        th = hash_u64(toks).view(np.int64)
        logp = np.log(ns / total) if total else np.zeros(len(ns))
        n_rows = len(th)
        return pa.table(
            {
                id_col: pa.array([None] * n_rows, type=pa.int64()),
                "th": pa.array(th, type=pa.int64()),
                "k": pa.array([None] * n_rows, type=pa.int64()),
                "logp": pa.array(logp, type=pa.float64()),
            }
        )

    def doc_rows(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        words, lens = batch_words(texts)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(words):
            wh = hash_u64(words).view(np.int64)
            doc_pos = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
            gdoc, gkey, gcnt = _per_doc_group_counts(doc_pos, wh)
            out_ids, th, k = ids[gdoc], gkey, gcnt
        else:
            out_ids = th = k = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(out_ids, type=pa.int64()),
                "th": pa.array(th, type=pa.int64()),
                "k": pa.array(k.astype(np.int64), type=pa.int64()),
                "logp": pa.array([None] * len(th), type=pa.float64()),
            }
        )

    def probe(g: pd.DataFrame) -> pd.DataFrame:
        occ = g[g["logp"].isna()][[id_col, "th", "k"]]
        lm = g[g["logp"].notna()][["th", "logp"]]
        m = occ.merge(lm, on="th", how="left")
        lp = m["logp"].fillna(oov).to_numpy(np.float64)
        k = m["k"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                id_col: m[id_col].astype("int64"),
                "s_lp": lp * k,
                "k": k,
            }
        )

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby(id_col, sort=False)[["s_lp", "k"]].sum().reset_index()
        return pd.DataFrame(
            {
                id_col: r[id_col].astype("int64"),
                "n_tokens": r["k"].astype("int64"),
                out_col: r["s_lp"] / r["k"],
            }
        )

    partials = (
        ds.map_batches(doc_rows, batch_format="pyarrow")
        .union(counts.map_batches(lm_rows, batch_format="pyarrow"))
        .map_batches(
            lambda t: add_key_partition(t, "th", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(probe, batch_format="pandas")
    )
    return (
        partials.map_batches(
            lambda t: add_key_partition(t, id_col, num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(finish, batch_format="pandas")
    )


# --- within-document repetition signals (Gopher / MassiveText rules) --------


def _per_doc_group_counts(
    doc_idx: np.ndarray, keys: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Group the (doc, key) pairs of a whole batch in one lexsort:
    returns (group_doc, group_key, group_count) — for every distinct key
    within every doc, which doc it belongs to, the key itself, and how
    often it occurs.  No per-doc Python loop; cost is one O(n log n)
    sort per batch."""
    order = np.lexsort((keys, doc_idx))
    d, k = doc_idx[order], keys[order]
    new = np.empty(len(d), dtype=bool)
    new[0] = True
    new[1:] = (d[1:] != d[:-1]) | (k[1:] != k[:-1])
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, len(d)))
    return d[starts], k[starts], counts


def repetition_signals(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Gopher-style within-document repetition quality signals
    (Rae et al. 2021 §A1.1, adapted to single-line docs): per document,

    - ``frac_top_word``    — occurrences of the most frequent word type
      / total tokens (Gopher's "fraction of chars in top n-gram" family)
    - ``frac_dup_words``   — tokens whose word type occurs >1 time
      / total tokens (the duplicate-line fraction analogue)
    - ``frac_dup_2grams``  — 2-gram occurrences whose 2-gram occurs >1
      time / total 2-grams (0.0 for single-token docs)

    Entirely shuffle-free: one vectorized ``map_batches`` scan; per-doc
    type counting is a batch-wide lexsort + run-length pass over token
    hashes (a 64-bit in-doc collision would perturb a fraction;
    ~1e-13 per web doc — accepted for a quality signal).  Filtering is
    the caller's threshold on the emitted fractions.

    Output: (id_col, n_tokens, frac_top_word, frac_dup_words,
    frac_dup_2grams).
    """
    from .hashing import hash_u64, splitmix64

    def signals(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        n_docs = len(texts)
        words, lens = batch_words(texts)
        if not n_docs:
            return pa.table(
                {
                    id_col: t[id_col],
                    "n_tokens": pa.array([], type=pa.int64()),
                    "frac_top_word": pa.array([], type=pa.float64()),
                    "frac_dup_words": pa.array([], type=pa.float64()),
                    "frac_dup_2grams": pa.array([], type=pa.float64()),
                }
            )
        wh = hash_u64(words)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)

        # word-type counts per doc (every doc has >= 1 token: '' -> [''])
        gdoc, _, gcnt = _per_doc_group_counts(doc_idx, wh)
        top = np.zeros(n_docs, dtype=np.int64)
        np.maximum.at(top, gdoc, gcnt)
        dup = np.zeros(n_docs, dtype=np.int64)
        dupsel = gcnt > 1
        np.add.at(dup, gdoc[dupsel], gcnt[dupsel])

        # 2-grams: consecutive word-hash pairs within a doc, combined by
        # the same odd-multiplier + splitmix64 finish the shingle kernel
        # uses (a bijection per position, so distinct grams stay distinct
        # up to 64-bit collision)
        n2 = np.zeros(n_docs, dtype=np.int64)
        dup2 = np.zeros(n_docs, dtype=np.int64)
        if len(wh) > 1:
            same_doc = doc_idx[1:] == doc_idx[:-1]
            if same_doc.any():
                with np.errstate(over="ignore"):
                    gh = splitmix64(
                        wh[:-1] * np.uint64(0x9E3779B97F4A7C15) + wh[1:]
                    )
                g_doc = doc_idx[:-1][same_doc]
                g2doc, _, g2cnt = _per_doc_group_counts(g_doc, gh[same_doc])
                np.add.at(n2, g2doc, g2cnt)
                d2sel = g2cnt > 1
                np.add.at(dup2, g2doc[d2sel], g2cnt[d2sel])

        lens_f = lens.astype(np.float64)
        return pa.table(
            {
                id_col: t[id_col],
                "n_tokens": pa.array(lens),
                "frac_top_word": pa.array(top / lens_f),
                "frac_dup_words": pa.array(dup / lens_f),
                "frac_dup_2grams": pa.array(
                    np.divide(
                        dup2,
                        n2,
                        out=np.zeros(n_docs, dtype=np.float64),
                        where=n2 > 0,
                    )
                ),
            }
        )

    return ds.map_batches(signals, batch_format="pyarrow")


def fused_quality_filter(
    ds,
    *,
    counts=None,
    min_tokens: int = 1,
    max_tokens: int = 1 << 62,
    max_frac_dup_words: float = 1.0,
    min_avg_logprob: float = float("-inf"),
    text_col: str = "text",
    id_col: str = "doc_id",
    num_parts: int = 32,
    passthrough_cols: tuple = (),
):
    """FineWeb-style rule cascade fused into ONE scan: token count
    bounds + duplicate-word fraction (Gopher repetition) + unigram-LM
    mean log-probability (CCNet quality), each a column plus a 0/1
    ``keep`` verdict.  The corpus text is tokenized ONCE and the token
    hashes are shared by the repetition grouping and the LM probe — at
    100 TB the tokenize+hash pass dominates these signals, so fusing n
    rules costs ~1 pass, not n.  The LM is self-trained unless
    ``counts`` is given (one vocab-sized reduction + one broadcast,
    as in ``score_unigram_logprob``).

    Output: (id_col, n_tokens, frac_top_word, frac_dup_words,
    avg_logprob, keep) — ``keep`` int64 0/1; filtering/selection is a
    downstream ``filter`` on it (kept here as a column so rejected rows
    remain auditable).
    """
    import ray

    from .hashing import hash_u64

    if counts is None:
        counts = unigram_counts(ds, text_col=text_col, num_parts=num_parts)
    h_sorted, logp_sorted, total = _lm_arrays(counts)
    oov = float(np.log(0.5 / max(total, 1.0)))
    lm_ref = ray.put((h_sorted, logp_sorted))

    def scan(t: pa.Table) -> pa.Table:
        hs, lps = ray.get(lm_ref)
        texts = t[text_col].to_pylist()
        n_docs = len(texts)
        words, lens = batch_words(texts)
        top = np.zeros(n_docs, dtype=np.int64)
        dup = np.zeros(n_docs, dtype=np.int64)
        avg = np.empty(0, dtype=np.float64)
        if len(words):
            wh = hash_u64(words)
            doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
            gdoc, _, gcnt = _per_doc_group_counts(doc_idx, wh)
            np.maximum.at(top, gdoc, gcnt)
            dupsel = gcnt > 1
            np.add.at(dup, gdoc[dupsel], gcnt[dupsel])
            lp = _lm_probe(hs, lps, wh, oov)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            avg = np.add.reduceat(lp, starts) / lens
        lens_f = lens.astype(np.float64) if n_docs else lens.astype(np.float64)
        frac_top = top / lens_f if n_docs else np.empty(0)
        frac_dup = dup / lens_f if n_docs else np.empty(0)
        keep = (
            (lens >= min_tokens)
            & (lens <= max_tokens)
            & (frac_dup <= max_frac_dup_words)
            & (avg >= min_avg_logprob)
        ).astype(np.int64) if n_docs else np.empty(0, dtype=np.int64)
        cols = {id_col: t[id_col]}
        for c in passthrough_cols:
            cols[c] = t[c]
        cols.update(
            {
                "n_tokens": pa.array(lens),
                "frac_top_word": pa.array(frac_top, type=pa.float64()),
                "frac_dup_words": pa.array(frac_dup, type=pa.float64()),
                "avg_logprob": pa.array(avg, type=pa.float64()),
                "keep": pa.array(keep, type=pa.int64()),
            }
        )
        return pa.table(cols)

    return ds.map_batches(scan, batch_format="pyarrow")


# --- bigram LM scoring (round 4) ---------------------------------------------

_PAIR_P = np.uint64(1099511628211)  # FNV prime: positional pair combine


def _pair_hashes(w1, w2) -> np.ndarray:
    """Order-sensitive 64-bit hash of word pairs — one combine of the
    per-word siphashes (``hash_u64``), so LM build and probe agree
    without materializing joined 'w1 w2' strings on the probe side."""
    from .hashing import hash_u64, splitmix64

    with np.errstate(over="ignore"):
        return splitmix64(hash_u64(w1) * _PAIR_P + hash_u64(w2))


def _batch_bigrams(texts: list) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(w1 tape, w2 tape, per-text bigram counts) for a batch — adjacent
    word pairs WITHIN each text (never across boundaries); texts with
    < 2 tokens contribute zero bigrams."""
    words, lens = batch_words(texts)
    off = np.cumsum(lens)
    keep = np.ones(len(words), dtype=bool)
    keep[off - 1] = False  # last word of each text starts no bigram
    i1 = np.flatnonzero(keep)
    return words[i1], words[i1 + 1], np.maximum(lens - 1, 0)


def bigram_counts(ds, *, text_col: str = "text", num_parts: int = 32):
    """Corpus bigram counts as a Dataset of (w1, w2, n) — the unigram
    recipe one order up: per-batch hash-factorized partial counts
    (batch-sized → pair-vocab-sized rows leave each task), then ONE
    coarse w1-hash shuffle with a vectorized pandas sum per partition."""
    import pandas as pd

    from .dedup import add_key_partition

    def partial(t: pa.Table) -> pa.Table:
        w1, w2, _ = _batch_bigrams(t[text_col].to_pylist())
        inverse, uniq = pd.factorize(_pair_hashes(w1, w2), sort=False)
        counts = np.bincount(inverse, minlength=len(uniq)).astype(np.int64)
        # first-occurrence index per unique pair recovers the strings
        first = np.zeros(len(uniq), dtype=np.int64)
        first[inverse[::-1]] = np.arange(len(inverse) - 1, -1, -1)
        return pa.table(
            {
                "w1": pa.array(w1[first], type=pa.string()),
                "w2": pa.array(w2[first], type=pa.string()),
                "n": pa.array(counts),
            }
        )

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby(["w1", "w2"], sort=False)["n"].sum().reset_index()
        r["n"] = r["n"].astype("int64")
        return r

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .map_batches(
            lambda t: add_key_partition(t, "w1", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(agg, batch_format="pandas")
    )


def score_bigram_logprob(
    ds,
    counts=None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "avg_logprob2",
    oov_logprob: float | None = None,
    keep_cols: tuple[str, ...] = (),
    num_parts: int = 32,
):
    """Per-document mean bigram log-probability — one Markov order above
    ``score_unigram_logprob``: avg over positions i≥2 of
    ``ln(c(w_{i-1} w_i) / c(w_{i-1} ·))`` where the denominator is the
    prefix total (sum of bigram counts sharing w1).  The LM is the
    corpus' own bigram distribution unless ``counts`` (a (w1, w2, n)
    Dataset, e.g. from a reference corpus) is supplied; out-of-LM pairs
    fill with ``oov_logprob`` (default ln(1/total)).  Documents with
    fewer than 2 tokens are dropped (they have no bigrams).

    Shape: count pass = per-batch factorize partials + one pair-vocab-
    sized shuffle; LM collects once (pair-vocab-sized, broadcast cap) to
    a sorted hash→logprob table shipped via ``ray.put``; score pass is a
    shuffle-free searchsorted + reduceat scan per batch."""
    import ray

    if counts is None:
        counts = bigram_counts(ds, text_col=text_col, num_parts=num_parts)

    blocks = [b for b in collect_tables(counts, drop_empty=False) if b.num_rows]
    if blocks:
        w1 = np.concatenate(
            [b.column("w1").to_pandas().to_numpy(dtype=object) for b in blocks]
        )
        w2 = np.concatenate(
            [b.column("w2").to_pandas().to_numpy(dtype=object) for b in blocks]
        )
        ns = np.concatenate(
            [b.column("n").to_numpy(zero_copy_only=False) for b in blocks]
        ).astype(np.float64)
    else:
        w1 = w2 = np.empty(0, dtype=object)
        ns = np.empty(0, dtype=np.float64)
    if len(w1) > _VOCAB_BROADCAST_CAP:
        raise ValueError(
            f"bigram vocabulary ({len(w1)} pairs) exceeds broadcast cap "
            f"{_VOCAB_BROADCAST_CAP}"
        )
    import pandas as pd

    prefix_tot = pd.Series(ns).groupby(pd.Series(w1), sort=False).transform("sum")
    keys = _pair_hashes(w1, w2)
    order = np.argsort(keys, kind="stable")
    keys_sorted = keys[order]
    # division INSIDE the log: matches the SQL oracle's ln(n / cp) to the
    # last ulp (ln(n) - ln(cp) can differ in the final bit)
    logp_sorted = (
        np.log(ns[order] / prefix_tot.to_numpy()[order])
        if len(ns)
        else np.empty(0)
    )
    total = float(ns.sum())
    oov = float(oov_logprob) if oov_logprob is not None else (
        -np.log(total) if total else 0.0
    )
    lm_ref = ray.put((keys_sorted, logp_sorted))

    def score(t: pa.Table) -> pa.Table:
        hs, lps = ray.get(lm_ref)
        w1b, w2b, nb = _batch_bigrams(t[text_col].to_pylist())
        lp = _lm_probe(hs, lps, _pair_hashes(w1b, w2b), oov)
        has = nb > 0
        starts = np.concatenate([[0], np.cumsum(nb)[:-1]])
        sums = (
            np.add.reduceat(lp, starts[has]) if has.any() else np.empty(0)
        )
        avg = sums / nb[has] if has.any() else np.empty(0)
        base = t.filter(pa.array(has))
        cols = {id_col: base[id_col]}
        for c in keep_cols:
            cols[c] = base[c]
        cols["n_bigrams"] = pa.array(nb[has].astype(np.int64))
        cols[out_col] = pa.array(avg, type=pa.float64())
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")


# --- Gopher quality rules (round 4) ------------------------------------------

_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_rules(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_frac_alpha_words: float = 0.8,
    min_stop_words: int = 2,
    keep_cols: tuple[str, ...] = (),
):
    """Gopher quality heuristics (Rae et al. 2021 §A1.1) as ONE fused
    vectorized scan — the word-level rule battery complementing the
    repetition signals (``repetition_signals``): word-count bounds, mean
    word length in [3, 10], symbol-to-word ratio ('#' and '...'), the
    fraction of words containing an alphabetic character, and the
    distinct-stop-word floor.  Emits the per-doc signals AND the fused
    ``keep`` verdict so downstream mixes can re-threshold without a
    second scan.  Shuffle-free."""
    import pandas as pd

    def scan(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        words, lens = batch_words(texts)
        n_docs = len(texts)
        starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        ws = pd.Series(words, dtype=object)
        char_lens = ws.str.len().to_numpy(dtype=np.float64)
        alpha = ws.str.contains("[A-Za-z]", regex=True).to_numpy(dtype=np.float64)
        mean_len = np.add.reduceat(char_lens, starts) / lens if n_docs else np.empty(0)
        frac_alpha = np.add.reduceat(alpha, starts) / lens if n_docs else np.empty(0)
        n_stop = np.zeros(n_docs, dtype=np.int64)
        for sw in _GOPHER_STOPWORDS:
            hit = (words == sw).astype(np.float64)
            if n_docs:
                n_stop += (np.add.reduceat(hit, starts) > 0).astype(np.int64)
        ts = pd.Series(texts, dtype=object).fillna("")
        symbols = (
            ts.str.count("#") + ts.str.count(r"\.\.\.")
        ).to_numpy(dtype=np.float64)
        sym_ratio = symbols / lens
        keep = (
            (lens >= min_words)
            & (lens <= max_words)
            & (mean_len >= min_mean_word_len)
            & (mean_len <= max_mean_word_len)
            & (sym_ratio < max_symbol_word_ratio)
            & (frac_alpha > min_frac_alpha_words)
            & (n_stop >= min_stop_words)
        ).astype(np.int64)
        cols = {id_col: t[id_col]}
        for c in keep_cols:
            cols[c] = t[c]
        cols.update(
            {
                "n_words": pa.array(lens),
                "mean_word_len": pa.array(mean_len, type=pa.float64()),
                "frac_alpha_words": pa.array(frac_alpha, type=pa.float64()),
                "symbol_word_ratio": pa.array(sym_ratio, type=pa.float64()),
                "n_stop_words": pa.array(n_stop),
                "keep": pa.array(keep),
            }
        )
        return pa.table(cols)

    return ds.map_batches(scan, batch_format="pyarrow")


# --- n-gram novelty vs a reference corpus -----------------------------------


def _batch_ngrams(texts: list, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(gram strings, per-text gram counts) for a batch: space-joined
    runs of ``n`` consecutive words WITHIN each text (texts with < n
    tokens contribute zero grams).  Gram strings (not hashes) so the
    membership set is collision-free and SQL-replayable
    (``array_to_string(list_slice(ws, i, i+n-1), ' ')``)."""
    words, lens = batch_words(texts)
    gcounts = np.maximum(lens - n + 1, 0)
    starts = np.cumsum(lens) - lens
    tot = int(gcounts.sum())
    if tot == 0:
        return np.empty(0, dtype=object), gcounts
    within = np.arange(tot) - np.repeat(np.cumsum(gcounts) - gcounts, gcounts)
    gidx = np.repeat(starts, gcounts) + within
    grams = words[gidx]
    for k in range(1, n):
        grams = grams + " "
        grams = grams + words[gidx + k]
    return grams, gcounts


def novelty_scores(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref_col: str = "is_ref",
    n: int = 3,
    ref_gram_cap: int = 4_000_000,
):
    """Per-document n-gram novelty against a reference corpus: the
    fraction of each document's DISTINCT word n-grams that appear in no
    reference document (``ref_col`` true) — the "how much new text does
    this shard add" curation signal dual to contamination (q110 removes
    overlap; this SCORES it), cf. the novelty/duplication analyses of
    RefinedWeb and Gopher.

    Output columns: (``id_col``, n_grams, n_novel, novelty), documents
    with at least one gram only (so the ratio is never 0/0); reference
    documents are scored too (novelty 0 by construction).

    Scale shape: pass 1 folds per-batch DISTINCT reference grams on the
    driver (amortized sorted merges, loud ``ref_gram_cap`` — reference
    sets are eval/seed-corpus sized; for corpus-sized references use the
    Bloom path of ``dedup.subtract_corpus`` instead), broadcasts the
    sorted gram array ONCE via ``ray.put``; pass 2 is a shuffle-free
    scan — per-batch gram tape → ``pd.factorize`` batch vocabulary →
    ONE ``searchsorted`` probe per batch, per-doc distinct via a
    (doc, code) dedup, counts via ``np.bincount``."""
    import pandas as pd
    import ray

    refs = ds.map_batches(
        lambda t: _ref_gram_partial(t, text_col, ref_col, n),
        batch_format="pyarrow",
        batch_size=16384,
    )
    acc = np.empty(0, dtype=object)
    buf: list[np.ndarray] = []
    buffered = 0
    for b in refs.iter_batches(batch_size=None, batch_format="pyarrow"):
        if not b.num_rows:
            continue
        buf.append(b["gram"].to_pandas().to_numpy(dtype=object))
        buffered += len(buf[-1])
        if buffered >= max(len(acc), 1_048_576):
            acc = np.unique(np.concatenate([acc, *buf]))
            buf, buffered = [], 0
        if len(acc) + buffered > ref_gram_cap:
            raise ValueError(
                f"reference gram set exceeds ref_gram_cap={ref_gram_cap}; "
                "use dedup.subtract_corpus's Bloom path for corpus-sized "
                "references"
            )
    if buf:
        acc = np.unique(np.concatenate([acc, *buf]))
    ref_ref = ray.put(acc)

    def score(t: pa.Table, _ref=ref_ref) -> pa.Table:
        uni = _cached_ref(_ref)
        texts = t[text_col].to_pylist()
        grams, gcounts = _batch_ngrams(texts, n)
        gdoc = np.repeat(np.arange(len(gcounts)), gcounts)
        codes, vocab = pd.factorize(grams, sort=False)
        # distinct (doc, gram) pairs only
        pair = pd.DataFrame({"d": gdoc, "c": codes}).drop_duplicates()
        if len(vocab):
            pos = np.searchsorted(uni, vocab)
            pos[pos >= len(uni)] = max(len(uni) - 1, 0)
            known = uni[pos] == vocab if len(uni) else np.zeros(len(vocab), bool)
        else:
            known = np.zeros(0, dtype=bool)
        novel = ~known[pair["c"].to_numpy()]
        n_grams = np.bincount(pair["d"].to_numpy(), minlength=len(gcounts))
        n_novel = np.bincount(
            pair["d"].to_numpy(), weights=novel.astype(np.float64),
            minlength=len(gcounts),
        ).astype(np.int64)
        keep = n_grams > 0
        ids = t[id_col].to_numpy(zero_copy_only=False)[keep]
        ng = n_grams[keep].astype(np.int64)
        nv = n_novel[keep]
        from .selection import round_half_away

        return pa.table(
            {
                id_col: pa.array(ids),
                "n_grams": pa.array(ng),
                "n_novel": pa.array(nv),
                "novelty": pa.array(
                    round_half_away(nv / ng.astype(np.float64), 6)
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=4096)


from .collect import cached_ref as _cached_ref  # shared per-worker cache


def _ref_gram_partial(
    t: pa.Table, text_col: str, ref_col: str, n: int
) -> pa.Table:
    mask = t[ref_col].to_numpy(zero_copy_only=False).astype(bool)
    texts = [
        x for x, m in zip(t[text_col].to_pylist(), mask) if m
    ]
    grams, _ = _batch_ngrams(texts, n)
    return pa.table({"gram": pa.array(np.unique(grams), type=pa.string())})


def novelty_sql(
    docs_cte: str,
    *,
    id_col: str = "doc_id",
    n: int = 3,
) -> str:
    """DuckDB replay of :func:`novelty_scores` (single-generator
    policy).  ``docs_cte`` must define a CTE ``docs`` with columns
    (``id_col``, text VARCHAR, is_ref BOOLEAN); single-space text."""
    return f"""
        WITH {docs_cte},
        w AS (
          SELECT {id_col}, is_ref,
                 string_split(coalesce(text, ''), ' ') AS ws
          FROM docs
        ),
        g AS (
          SELECT {id_col}, is_ref,
                 array_to_string(list_slice(ws, i, i + {n - 1}), ' ') AS gram
          FROM (
            SELECT {id_col}, is_ref, ws,
                   unnest(generate_series(1, len(ws) - {n - 1})) AS i
            FROM w WHERE len(ws) >= {n}
          )
        ),
        dg AS (SELECT DISTINCT {id_col}, is_ref, gram FROM g),
        ref AS (SELECT DISTINCT gram FROM dg WHERE is_ref),
        sc AS (
          SELECT d.{id_col}, count(*) AS n_grams,
                 sum(CASE WHEN r.gram IS NULL THEN 1 ELSE 0 END) AS n_novel
          FROM dg d LEFT JOIN ref r USING (gram)
          GROUP BY d.{id_col}
        )
        SELECT {id_col}, CAST(n_grams AS BIGINT) AS n_grams,
               CAST(n_novel AS BIGINT) AS n_novel,
               round(n_novel / CAST(n_grams AS DOUBLE), 6) AS novelty
        FROM sc
    """


# --- readability statistics --------------------------------------------------

_SENT_RE = re.compile(r"[.!?]+")
_READABILITY_LONG = 7  # chars; long-word fraction proxies syllable load


def add_readability(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc readability statistics (Flesch-style proxy): word count
    (the ``string_split(text, ' ')`` convention), sentence count (runs
    of terminal punctuation, clamped to >= 1), long-word fraction
    (>= 7 chars — the syllable-load proxy that needs no dictionary) and
    ``flesch_proxy = 206.835 − 1.015·words/sentence − 84.6·long_frac``
    — the readability axis of the quality battery (q96/q139/q144).

    One shuffle-free pass, fully vectorized on the utf-32 codepoint
    tape of the space-joined batch (the q139/q145 kernel pattern —
    callers should pin ``batch_size=4096``): word lengths come from
    space-boundary diffs, sentence runs from a shifted punctuation
    mask, both attributed to documents by ONE searchsorted.  A first
    cut used a pandas ``str.len`` over the word tape + a per-text
    ``findall`` loop — 65 s for 2M docs; this kernel measured ~6×
    faster at identical output.  Each output float is the same
    left-associated expression the SQL replay computes."""
    texts = [t or "" for t in batch[text_col].to_pylist()]
    n = len(texts)
    if n == 0:
        empty_i = pa.array(np.empty(0, np.int64))
        return (
            batch.append_column("n_words", empty_i)
            .append_column("n_sentences", empty_i)
            .append_column("n_long_words", empty_i)
            .append_column(
                "flesch_proxy", pa.array(np.empty(0, np.float64))
            )
        )
    joined = " ".join(texts)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    tlens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    starts = np.concatenate(([0], np.cumsum(tlens + 1)[:-1]))
    space = cp == 32
    cs = np.concatenate(([0], np.cumsum(space)))
    n_words = (cs[starts + tlens] - cs[starts]) + 1  # count(' ') + 1
    # word segments: boundaries at EVERY space (joiner spaces double as
    # text separators, exactly like batch_words' joined-split)
    bounds = np.flatnonzero(space)
    seg_start = np.concatenate(([0], bounds + 1))
    seg_end = np.concatenate((bounds, [len(cp)]))
    wlen = seg_end - seg_start
    wdoc = np.searchsorted(starts, seg_start, side="right") - 1
    n_long = np.bincount(
        wdoc[wlen >= _READABILITY_LONG], minlength=n
    ).astype(np.int64)
    punct = (cp == 46) | (cp == 33) | (cp == 63)  # . ! ?
    run_start = punct.copy()
    run_start[1:] &= ~punct[:-1]
    pos = np.flatnonzero(run_start)
    n_sent = np.bincount(
        np.searchsorted(starts, pos, side="right") - 1, minlength=n
    ).astype(np.int64)
    ws = n_words / np.maximum(n_sent, 1).astype(np.float64)
    lf = n_long / n_words.astype(np.float64)
    from .selection import round_half_away

    score = 206.835 - 1.015 * ws - 84.6 * lf
    return (
        batch.append_column("n_words", pa.array(n_words))
        .append_column("n_sentences", pa.array(n_sent))
        .append_column("n_long_words", pa.array(n_long))
        .append_column(
            "flesch_proxy",
            pa.array(round_half_away(score, 4), type=pa.float64()),
        )
    )


def readability_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB replay of :func:`add_readability` (single-generator
    policy): identical tokenizer, identical sentence regex, identical
    left-associated score expression."""
    return f"""
        WITH w AS (
          SELECT {id_col},
                 string_split(coalesce({text_col}, ''), ' ') AS ws,
                 greatest(len(regexp_extract_all(
                   coalesce({text_col}, ''), '[.!?]+')), 1) AS ns,
                 len(regexp_extract_all(coalesce({text_col}, ''), '[.!?]+'))
                   AS n_sent_raw
          FROM {table}
        )
        SELECT {id_col},
               CAST(len(ws) AS BIGINT) AS n_words,
               CAST(n_sent_raw AS BIGINT) AS n_sentences,
               CAST(len(list_filter(ws,
                 x -> length(x) >= {_READABILITY_LONG})) AS BIGINT)
                 AS n_long_words,
               round(206.835
                     - 1.015 * (len(ws) / CAST(ns AS DOUBLE))
                     - 84.6 * (len(list_filter(ws,
                         x -> length(x) >= {_READABILITY_LONG}))
                       / CAST(len(ws) AS DOUBLE)), 4) AS flesch_proxy
        FROM w
    """


def keyness_by_group(
    ds,
    *,
    text_col: str = "text",
    group_col: str = "lang",
    top_k: int = 10,
    min_count: int = 5,
    num_parts: int = 32,
    round_to: int = 6,
) -> pd.DataFrame:
    """Distinctive terms per group by log-likelihood keyness (Dunning
    1993 G² / Rayson-Garside): for each (group, term), compare the
    term's rate inside the group against the rest of the corpus,
        G² = 2·(a·ln(a/E_a) + b·ln(b/E_b)),
        E_a = n_g·(c_w/N),  E_b = (N-n_g)·(c_w/N),
    keep only OVERREPRESENTED terms (a/n_g > c_w/N) with a >= min_count,
    and report each group's top_k by (G² desc, term asc) — the "what
    characterizes this source/language slice" screen corpus curation
    runs before mixing.  Tokenization is the repo-wide string_split
    convention (batch_words == SQL ``string_split(text, ' ')``).

    Scale shape: per-batch factorized (group, token) partial counts
    (vocab-sized rows leave each task, never corpus tokens), ONE coarse
    TOKEN-hash shuffle — a token's counts across all groups co-locate,
    so c_w and every group's score for that token are partition-local
    — plus a groups-sized totals broadcast; each partition emits its
    per-group top_k candidates and the driver folds
    parts × groups × top_k rows.  Per-group totals come from ONE tiny
    groupby over the same partials.  Output: (group, term, n_in:int64,
    n_out:int64, g2:f64 rounded).  SQL replay: single-generator
    :func:`keyness_sql` (identical float order: E via cw/N first)."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from .collect import cached_ref
    from .dedup import add_key_partition
    from .selection import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[group_col]))  # null groups excluded
        texts = t[text_col].to_pylist()
        words, lens = batch_words(texts)
        if not len(words):
            return pa.table(
                {"g": pa.array([], type=t[group_col].type),
                 "token": pa.array([], type=pa.string()),
                 "a": pa.array([], type=pa.int64())}
            )
        grows = np.repeat(t[group_col].to_numpy(zero_copy_only=False), lens)
        tcode, toks = pd.factorize(words, sort=False)
        gcode, grps = pd.factorize(grows, sort=False)
        comb = gcode.astype(np.int64) * len(toks) + tcode
        ccode, uniq = pd.factorize(comb, sort=False)
        cnt = np.bincount(ccode, minlength=len(uniq))
        return pa.table(
            {
                "g": pa.array(grps[uniq // len(toks)]),
                "token": pa.array(toks[uniq % len(toks)], type=pa.string()),
                "a": pa.array(cnt.astype(np.int64)),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=4096
    )
    # the partials feed TWO consumers (group totals + the token shuffle)
    # — checkpoint once so the tokenize pass runs once
    parts = parts.materialize()

    def gt_partial(t: pa.Table) -> pa.Table:
        return t.group_by("g").aggregate([("a", "sum")])

    gt = (
        parts.map_batches(gt_partial, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("a_sum", alias_name="ng"))
        .to_pandas()
    )
    ng_of = dict(zip(gt["g"], gt["ng"].astype(np.int64)))
    n_total = int(gt["ng"].sum())
    ref = ray.put((ng_of, n_total))

    def per_partition(g: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "g": pd.Series([], dtype=object),
                "token": pd.Series([], dtype=object),
                "a": pd.Series([], dtype=np.int64),
                "b": pd.Series([], dtype=np.int64),
                "_g2": pd.Series([], dtype=np.float64),
            }
        )
        if not len(g):
            return empty
        ng_map, n = cached_ref(_ref)
        c = g.groupby(["g", "token"], sort=False)["a"].sum().reset_index()
        cw = c.groupby("token", sort=False)["a"].transform("sum").to_numpy()
        a = c["a"].to_numpy().astype(np.int64)
        b = cw - a
        ngv = c["g"].map(ng_map).to_numpy().astype(np.float64)
        nf = float(n)
        rate = cw.astype(np.float64) / nf
        keep = (a >= min_count) & (a / ngv > rate)
        if not keep.any():
            return empty
        c, a, b, ngv, rate = c[keep], a[keep], b[keep], ngv[keep], rate[keep]
        ea = ngv * rate
        eb = (nf - ngv) * rate
        bf = b.astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            g2 = 2.0 * (
                a * np.log(a / ea)
                + np.where(b > 0, bf * np.log(bf / eb), 0.0)
            )
        out = pd.DataFrame(
            {"g": c["g"].to_numpy(), "token": c["token"].to_numpy(),
             "a": a, "b": b.astype(np.int64), "_g2": g2}
        )
        out = out.sort_values(
            ["g", "_g2", "token"], ascending=[True, False, True],
            kind="mergesort",
        )
        return out.groupby("g", sort=False).head(top_k).reset_index(drop=True)

    cands = (
        parts.map_batches(
            lambda t: add_key_partition(t, "token", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(per_partition, batch_format="pandas")
        .to_pandas()
    )
    if not len(cands):
        return pd.DataFrame(
            {group_col: pd.Series([], dtype=object),
             "term": pd.Series([], dtype=object),
             "n_in": pd.Series([], dtype=np.int64),
             "n_out": pd.Series([], dtype=np.int64),
             "g2": pd.Series([], dtype=np.float64)}
        )
    cands = cands.sort_values(
        ["g", "_g2", "token"], ascending=[True, False, True], kind="mergesort"
    )
    out = cands.groupby("g", sort=False).head(top_k).reset_index(drop=True)
    return pd.DataFrame(
        {
            group_col: out["g"],
            "term": out["token"],
            "n_in": out["a"].astype(np.int64),
            "n_out": out["b"].astype(np.int64),
            "g2": round_half_away(out["_g2"].to_numpy(), round_to),
        }
    )


def keyness_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    group_col: str = "lang",
    top_k: int = 10,
    min_count: int = 5,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`keyness_by_group` (single-generator).
    Float order mirrors the engine exactly: rate = cw / N first, then
    E_a = ng * rate; ordering for the top-k uses the UNROUNDED g2."""
    return f"""
        WITH toks AS (
            SELECT {group_col} AS g,
                   unnest(string_split({text_col}, ' ')) AS w
            FROM {table} WHERE {group_col} IS NOT NULL
        ), c AS (
            SELECT g, w, count(*) AS a FROM toks GROUP BY g, w
        ), gt AS (
            SELECT g, sum(a) AS ng FROM c GROUP BY g
        ), wt AS (
            SELECT w, sum(a) AS cw FROM c GROUP BY w
        ), tot AS (
            SELECT sum(a) AS n FROM c
        ), scored AS (
            SELECT c.g, c.w, c.a, wt.cw - c.a AS b,
                   2 * (c.a * ln(c.a / (gt.ng * (wt.cw / CAST(tot.n AS DOUBLE))))
                        + CASE WHEN wt.cw - c.a > 0
                               THEN (wt.cw - c.a)
                                    * ln((wt.cw - c.a)
                                         / ((tot.n - gt.ng)
                                            * (wt.cw / CAST(tot.n AS DOUBLE))))
                               ELSE 0 END) AS g2
            FROM c
            JOIN gt USING (g)
            JOIN wt USING (w)
            CROSS JOIN tot
            WHERE c.a >= {min_count}
              AND c.a / CAST(gt.ng AS DOUBLE)
                  > wt.cw / CAST(tot.n AS DOUBLE)
        ), ranked AS (
            SELECT *, row_number() OVER (PARTITION BY g
                                         ORDER BY g2 DESC, w) AS rn
            FROM scored
        )
        SELECT g AS {group_col}, w AS term,
               CAST(a AS BIGINT) AS n_in, CAST(b AS BIGINT) AS n_out,
               round(g2, {round_to}) AS g2
        FROM ranked WHERE rn <= {top_k}
    """


def group_token_counts(ds, *, text_col: str = "text",
                       group_col: str = "source"):
    """(group, token, n) term frequencies per group as a lazy Dataset —
    the shared first stage of :func:`lexical_diversity`,
    :func:`zipf_slope_by_group` and :func:`vocab_overlap`.  Per-batch
    factorized partials (vocab-sized rows leave each task, never corpus
    tokens) + ONE token-hash groupby.  Tokenization is the repo-wide
    string_split convention (:func:`batch_words`); null groups drop."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[group_col]))
        texts = t[text_col].to_pylist()
        words, lens = batch_words(texts)
        if not len(words):
            return pa.table(
                {"g": pa.array([], type=t.schema.field(group_col).type),
                 "token": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64())}
            )
        grows = np.repeat(t[group_col].to_numpy(zero_copy_only=False), lens)
        tcode, toks = pd.factorize(words, sort=False)
        gcode, grps = pd.factorize(grows, sort=False)
        comb = gcode.astype(np.int64) * len(toks) + tcode
        ccode, uniq = pd.factorize(comb, sort=False)
        cnt = np.bincount(ccode, minlength=len(uniq))
        return pa.table(
            {
                "g": pa.array(grps[uniq // len(toks)]),
                "token": pa.array(toks[uniq % len(toks)], type=pa.string()),
                "n": pa.array(cnt.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .groupby(["g", "token"])
        .aggregate(Sum("n", alias_name="n"))
    )


def lexical_diversity(
    ds,
    *,
    text_col: str = "text",
    group_col: str = "source",
    round_to: int = 6,
) -> "pd.DataFrame":
    """Per-group lexical diversity: total tokens, distinct types, hapax
    legomena (frequency-1 types), type-token ratio and hapax share —
    the vocabulary-health screen corpus curation runs per source/slice
    (a boilerplate-heavy or template-generated source shows a crashed
    TTR; OCR noise and spam show an inflated hapax share).  Pairs with
    :func:`keyness_by_group` (WHICH terms differ) by measuring HOW MUCH
    vocabulary each slice carries.

        ttr         = n_types / n_tokens
        hapax_ratio = n_hapax / n_types

    Tokenization is the repo-wide string_split convention
    (:func:`batch_words` == SQL ``string_split(coalesce(text,''), ' ')``
    — null text is '', '' is one empty token).  Null groups drop.

    Scale shape: per-batch factorized (group, token) count partials
    (vocab-sized rows leave each task, never corpus tokens), ONE
    token-hash groupby — each (group, token) row is then globally
    unique, so a shuffle-free second partial scan folds them to
    per-group (types, hapax, tokens) triples and ONE groups-sized
    groupby finishes; the driver holds |groups| rows.  SQL replay is
    GENERATED by :func:`lexical_diversity_sql` (single-generator)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from .selection import round_half_away

    counts = group_token_counts(ds, text_col=text_col, group_col=group_col)

    def fold(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        tt = pa.table(
            {"g": t["g"], "n_tokens": pa.array(n),
             "one": pa.array(np.ones(len(n), dtype=np.int64)),
             "hapax": pa.array((n == 1).astype(np.int64))}
        )
        return tt.group_by("g").aggregate(
            [("n_tokens", "sum"), ("one", "sum"), ("hapax", "sum")]
        )

    out = (
        counts.map_batches(fold, batch_format="pyarrow")
        .groupby("g")
        .aggregate(
            Sum("n_tokens_sum", alias_name="n_tokens"),
            Sum("one_sum", alias_name="n_types"),
            Sum("hapax_sum", alias_name="n_hapax"),
        )
        .to_pandas()
        .sort_values("g", kind="mergesort")
        .reset_index(drop=True)
    )
    ttr = out["n_types"].to_numpy(dtype=np.float64) / out[
        "n_tokens"
    ].to_numpy(dtype=np.float64)
    hr = out["n_hapax"].to_numpy(dtype=np.float64) / out[
        "n_types"
    ].to_numpy(dtype=np.float64)
    return pd.DataFrame(
        {
            group_col: out["g"],
            "n_tokens": out["n_tokens"].astype(np.int64),
            "n_types": out["n_types"].astype(np.int64),
            "n_hapax": out["n_hapax"].astype(np.int64),
            "ttr": round_half_away(ttr, round_to),
            "hapax_ratio": round_half_away(hr, round_to),
        }
    )


def lexical_diversity_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    group_col: str = "source",
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`lexical_diversity` (single-generator):
    identical tokenizer (string_split on ' '), identical ratios."""
    return f"""
        WITH w AS (
            SELECT {group_col} AS g,
                   unnest(string_split(coalesce({text_col}, ''), ' '))
                       AS tok
            FROM {table} WHERE {group_col} IS NOT NULL
        ), c AS (
            SELECT g, tok, count(*) AS n FROM w GROUP BY g, tok
        )
        SELECT g AS {group_col},
               CAST(sum(n) AS BIGINT) AS n_tokens,
               CAST(count(*) AS BIGINT) AS n_types,
               CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_hapax,
               round(count(*) / CAST(sum(n) AS DOUBLE), {round_to}) AS ttr,
               round(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), {round_to})
                   AS hapax_ratio
        FROM c GROUP BY g
    """


def zipf_slope_by_group(
    ds,
    *,
    text_col: str = "text",
    group_col: str = "source",
    top_k: int = 512,
    round_to: int = 6,
) -> "pd.DataFrame":
    """Zipf rank-frequency fit per group: OLS slope/intercept of
    log(freq) on log(rank) over each group's TOP-K tokens — the
    power-law health check corpus curation runs per source (natural
    text sits near slope −1; template/boilerplate-generated sources
    flatten, spam/OCR noise steepens).  Pairs with
    :func:`lexical_diversity` (vocabulary SIZE) by measuring vocabulary
    SHAPE.

    Fit convention (shared with the SQL replay): ranks are
    ``row_number() OVER (PARTITION BY group ORDER BY n DESC, token)``
    (deterministic tie-break), x = ln(rank), y = ln(n), slope =
    (k·Σxy − Σx·Σy) / (k·Σx² − (Σx)²), intercept = (Σy − slope·Σx)/k.
    Fitting on the top-K head is the standard estimator shape (the
    tail's rank plateau biases a full-vocab fit anyway) and what makes
    it scale: after :func:`group_token_counts`' ONE token-hash shuffle,
    every count block emits its own per-group top-K inside
    ``map_batches``, so at most groups × K × blocks slim rows exist
    anywhere and the driver merge + fold is groups × K.

    Output: (group, k_fit:int64, slope, intercept) sorted by group.
    SQL replay GENERATED by :func:`zipf_sql` (single-generator)."""
    import pandas as pd

    from .selection import round_half_away

    counts = group_token_counts(ds, text_col=text_col, group_col=group_col)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        return (
            df.sort_values(["g", "n", "token"],
                           ascending=[True, False, True], kind="mergesort")
            .groupby("g", sort=False)
            .head(top_k)
        )

    head = (
        counts.map_batches(part, batch_format="pandas")
        .to_pandas()
        .sort_values(["g", "n", "token"],
                     ascending=[True, False, True], kind="mergesort")
        .groupby("g", sort=False)
        .head(top_k)
    )
    if head.empty:
        return pd.DataFrame(
            {group_col: pd.Series([], dtype=object),
             "k_fit": pd.Series([], dtype=np.int64),
             "slope": pd.Series([], dtype=np.float64),
             "intercept": pd.Series([], dtype=np.float64)}
        )
    head["rank"] = head.groupby("g", sort=False).cumcount() + 1
    x = np.log(head["rank"].to_numpy(dtype=np.float64))
    y = np.log(head["n"].to_numpy(dtype=np.float64))
    head = head.assign(x=x, y=y, xy=x * y, xx=x * x)
    agg = head.groupby("g", as_index=False).agg(
        k_fit=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
        sxy=("xy", "sum"), sxx=("xx", "sum"),
    )
    k = agg["k_fit"].to_numpy(dtype=np.float64)
    denom = k * agg["sxx"].to_numpy() - agg["sx"].to_numpy() ** 2
    with np.errstate(divide="ignore", invalid="ignore"):
        slope = (k * agg["sxy"].to_numpy()
                 - agg["sx"].to_numpy() * agg["sy"].to_numpy()) / denom
        intercept = (agg["sy"].to_numpy() - slope * agg["sx"].to_numpy()) / k
    return pd.DataFrame(
        {
            group_col: agg["g"],
            "k_fit": agg["k_fit"].astype(np.int64),
            "slope": round_half_away(slope, round_to),
            "intercept": round_half_away(intercept, round_to),
        }
    ).sort_values(group_col, kind="mergesort").reset_index(drop=True)


def zipf_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    group_col: str = "source",
    top_k: int = 512,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`zipf_slope_by_group` (single-generator):
    identical tokenizer, rank tie-break and closed-form OLS."""
    return f"""
        WITH w AS (
            SELECT {group_col} AS g,
                   unnest(string_split(coalesce({text_col}, ''), ' '))
                       AS tok
            FROM {table} WHERE {group_col} IS NOT NULL
        ), c AS (
            SELECT g, tok, count(*) AS n FROM w GROUP BY g, tok
        ), r AS (
            SELECT g, n,
                   row_number() OVER (PARTITION BY g
                                      ORDER BY n DESC, tok) AS rn
            FROM c QUALIFY rn <= {top_k}
        ), p AS (
            SELECT g, ln(rn) AS x, ln(n) AS y FROM r
        ), s AS (
            SELECT g, count(*) AS k, sum(x) AS sx, sum(y) AS sy,
                   sum(x * y) AS sxy, sum(x * x) AS sxx
            FROM p GROUP BY g
        )
        SELECT g AS {group_col}, CAST(k AS BIGINT) AS k_fit,
               round((k * sxy - sx * sy) / (k * sxx - sx * sx),
                     {round_to}) AS slope,
               round((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx)
                     / k, {round_to}) AS intercept
        FROM s
    """


def vocab_overlap(
    ds,
    *,
    text_col: str = "text",
    group_col: str = "source",
    round_to: int = 6,
) -> "pd.DataFrame":
    """Pairwise vocabulary Jaccard between groups: for every group pair
    (a < b), |V_a ∩ V_b| / |V_a ∪ V_b| over the groups' distinct token
    sets — the cross-corpus similarity screen that says WHICH sources
    are near-clones of each other (mirror feeds, shared templates)
    before any per-document dedup runs.  Complements q110's
    subtraction (removes known overlap) by MEASURING overlap first.

    Scale shape: :func:`group_token_counts`' ONE token-hash shuffle
    makes (group, token) rows globally unique, so each count block is
    already a distinct-set fragment: a shuffle-free scan emits
    per-group vocab-size partials, and ONE token groupby cogroups each
    token's group set (≤ |groups| rows per token) to emit group-pair
    partials — the driver folds |groups|² pair rows and |groups| size
    rows, never vocab-sized state.

    Output: (group_a, group_b, n_common, n_a, n_b, jaccard) for a < b,
    sorted.  SQL replay GENERATED by :func:`vocab_overlap_sql`."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from .selection import round_half_away

    counts = group_token_counts(
        ds, text_col=text_col, group_col=group_col
    ).materialize()

    # per-group vocab sizes: rows of counts are distinct (g, token)
    def size_part(t: pa.Table) -> pa.Table:
        return (
            pa.table({"g": t["g"],
                      "one": pa.array(np.ones(len(t), dtype=np.int64))})
            .group_by("g").aggregate([("one", "sum")])
        )

    sizes: dict = {}
    for t in collect_tables(
        counts.map_batches(size_part, batch_format="pyarrow"),
        drop_empty=True,
    ):
        for g, n in zip(t["g"].to_pylist(), t["one_sum"].to_pylist()):
            sizes[g] = sizes.get(g, 0) + int(n)

    from .dedup import add_key_partition

    def pair_part(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized per-token pair emission: self-merge on token
        # (each token carries ≤ |groups| rows, so the merge blow-up is
        # ≤ |groups| × partition rows), keep the a < b triangle.
        empty = pd.DataFrame(
            {"a": pd.Series([], dtype=object),
             "b": pd.Series([], dtype=object),
             "n_common": pd.Series([], dtype=np.int64)}
        )
        if df.empty:
            return empty
        slim = df[["token", "g"]]
        m = slim.merge(slim, on="token")
        m = m[m["g_x"] < m["g_y"]]
        if m.empty:
            return empty
        out = (
            m.groupby(["g_x", "g_y"], sort=False).size()
            .rename("n_common").reset_index()
            .rename(columns={"g_x": "a", "g_y": "b"})
        )
        out["n_common"] = out["n_common"].astype(np.int64)
        return out

    pairs = (
        counts.map_batches(
            lambda t: add_key_partition(t, "token"),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(pair_part, batch_format="pandas")
        .groupby(["a", "b"])
        .aggregate(Sum("n_common", alias_name="n_common"))
        .to_pandas()
    )
    if pairs.empty:
        return pd.DataFrame(
            {"group_a": pd.Series([], dtype=object),
             "group_b": pd.Series([], dtype=object),
             "n_common": pd.Series([], dtype=np.int64),
             "n_a": pd.Series([], dtype=np.int64),
             "n_b": pd.Series([], dtype=np.int64),
             "jaccard": pd.Series([], dtype=np.float64)}
        )
    na = pairs["a"].map(sizes).to_numpy(dtype=np.int64)
    nb = pairs["b"].map(sizes).to_numpy(dtype=np.int64)
    inter = pairs["n_common"].to_numpy(dtype=np.int64)
    jac = inter.astype(np.float64) / (na + nb - inter)
    out = pd.DataFrame(
        {
            "group_a": pairs["a"],
            "group_b": pairs["b"],
            "n_common": inter,
            "n_a": na,
            "n_b": nb,
            "jaccard": round_half_away(jac, round_to),
        }
    )
    return out.sort_values(["group_a", "group_b"],
                           kind="mergesort").reset_index(drop=True)


def vocab_overlap_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    group_col: str = "source",
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`vocab_overlap` (single-generator):
    distinct token sets, self-join on token with a < b."""
    return f"""
        WITH d AS (
            SELECT DISTINCT {group_col} AS g,
                   unnest(string_split(coalesce({text_col}, ''), ' '))
                       AS tok
            FROM {table} WHERE {group_col} IS NOT NULL
        ), v AS (
            SELECT g, count(*) AS n FROM d GROUP BY g
        ), p AS (
            SELECT a.g AS ga, b.g AS gb, count(*) AS n_common
            FROM d a JOIN d b ON a.tok = b.tok AND a.g < b.g
            GROUP BY a.g, b.g
        )
        SELECT p.ga AS group_a, p.gb AS group_b,
               CAST(p.n_common AS BIGINT) AS n_common,
               CAST(va.n AS BIGINT) AS n_a, CAST(vb.n AS BIGINT) AS n_b,
               round(p.n_common
                     / CAST(va.n + vb.n - p.n_common AS DOUBLE),
                     {round_to}) AS jaccard
        FROM p JOIN v va ON p.ga = va.g JOIN v vb ON p.gb = vb.g
    """


def jsd_by_group(
    ds,
    *,
    text_col: str = "text",
    group_col: str = "source",
    round_to: int = 6,
) -> "pd.DataFrame":
    """Pairwise Jensen-Shannon divergence between the groups' unigram
    DISTRIBUTIONS: for every group pair (a < b),

        JSD(P, Q) = 0.5·KL(P‖M) + 0.5·KL(Q‖M),  M = (P + Q) / 2

    in nats (0 = identical distributions, ln 2 = disjoint supports) —
    the distributional complement of :func:`vocab_overlap`'s set-based
    Jaccard (two sources can share every token yet weight them very
    differently: Jaccard 1, JSD ≫ 0).  This is the standard corpus-
    similarity screen for mixture design ("is src3 just src7 with
    different traffic?") before any per-document dedup runs.

    Decomposition that makes it one-pass: tokens absent from the other
    side contribute 0.5·p·ln 2, and Σ_t p_t = 1 per group, so

        JSD(a, b) = 0.5·ln 2 · (2 − Σ_common p_t − Σ_common q_t)
                    + Σ_common [0.5p·ln(2p/(p+q)) + 0.5q·ln(2q/(p+q))]

    — only tokens present in BOTH groups ever pair up; pairs sharing
    no token come out exactly ln 2 (via empty sums), with no special
    case on either engine.

    Scale shape: :func:`group_token_counts`' ONE token-hash shuffle
    (rows globally unique), a groups-sized total fold, then ONE token
    groupby whose partitions self-merge on token (≤ |groups| rows per
    token) and emit per-pair partial sums — the driver folds |groups|²
    rows, never vocab-sized state.  Output: (group_a, group_b,
    n_common:int64, jsd) for a < b, sorted.  SQL replay GENERATED by
    :func:`jsd_sql` (single-generator)."""
    import pandas as pd
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    from .dedup import add_key_partition
    from .selection import round_half_away

    counts = group_token_counts(
        ds, text_col=text_col, group_col=group_col
    ).materialize()

    # per-group token totals: groups-sized driver fold
    def tot_part(t: pa.Table) -> pa.Table:
        return pa.table({"g": t["g"], "n": t["n"]}).group_by("g").aggregate(
            [("n", "sum")]
        )

    totals: dict = {}
    for t in collect_tables(
        counts.map_batches(tot_part, batch_format="pyarrow"), drop_empty=True
    ):
        for g, n in zip(t["g"].to_pylist(), t["n_sum"].to_pylist()):
            totals[g] = totals.get(g, 0) + int(n)

    def pair_part(df: "pd.DataFrame", _tot=totals) -> "pd.DataFrame":
        empty = pd.DataFrame(
            {"a": pd.Series([], dtype=object),
             "b": pd.Series([], dtype=object),
             "n_common": pd.Series([], dtype=np.int64),
             "sp": pd.Series([], dtype=np.float64),
             "sq": pd.Series([], dtype=np.float64),
             "sterm": pd.Series([], dtype=np.float64)}
        )
        if df.empty:
            return empty
        slim = df[["token", "g", "n"]]
        m = slim.merge(slim, on="token")
        m = m[m["g_x"] < m["g_y"]]
        if m.empty:
            return empty
        p = (m["n_x"].to_numpy(dtype=np.float64)
             / m["g_x"].map(_tot).to_numpy(dtype=np.float64))
        q = (m["n_y"].to_numpy(dtype=np.float64)
             / m["g_y"].map(_tot).to_numpy(dtype=np.float64))
        s = p + q
        term = 0.5 * p * np.log(2.0 * p / s) + 0.5 * q * np.log(2.0 * q / s)
        out = pd.DataFrame(
            {"a": m["g_x"].to_numpy(dtype=object),
             "b": m["g_y"].to_numpy(dtype=object),
             "n_common": np.ones(len(m), dtype=np.int64),
             "sp": p, "sq": q, "sterm": term}
        )
        return out.groupby(["a", "b"], as_index=False).agg(
            n_common=("n_common", "sum"), sp=("sp", "sum"),
            sq=("sq", "sum"), sterm=("sterm", "sum"),
        )

    pairs = (
        counts.map_batches(
            lambda t: add_key_partition(t, "token"), batch_format="pyarrow"
        )
        .groupby("_part")
        .map_groups(pair_part, batch_format="pandas")
        .to_pandas()
    )
    if len(pairs):
        pairs = pairs.groupby(["a", "b"], as_index=False).agg(
            n_common=("n_common", "sum"), sp=("sp", "sum"),
            sq=("sq", "sum"), sterm=("sterm", "sum"),
        )
    # full pair universe: pairs with no common token are exactly ln 2
    gs = sorted(totals)
    uni = pd.DataFrame(
        [(a, b) for i, a in enumerate(gs) for b in gs[i + 1:]],
        columns=["a", "b"],
    )
    if uni.empty:
        return pd.DataFrame(
            {"group_a": pd.Series([], dtype=object),
             "group_b": pd.Series([], dtype=object),
             "n_common": pd.Series([], dtype=np.int64),
             "jsd": pd.Series([], dtype=np.float64)}
        )
    out = uni.merge(pairs, on=["a", "b"], how="left") if len(pairs) else (
        uni.assign(n_common=0, sp=0.0, sq=0.0, sterm=0.0)
    )
    for c, fill in (("n_common", 0), ("sp", 0.0), ("sq", 0.0), ("sterm", 0.0)):
        out[c] = out[c].fillna(fill)
    jsd = (0.5 * np.log(2.0)
           * (2.0 - out["sp"].to_numpy(dtype=np.float64)
              - out["sq"].to_numpy(dtype=np.float64))
           + out["sterm"].to_numpy(dtype=np.float64))
    return pd.DataFrame(
        {
            "group_a": out["a"],
            "group_b": out["b"],
            "n_common": out["n_common"].astype(np.int64),
            "jsd": round_half_away(jsd, round_to),
        }
    ).sort_values(["group_a", "group_b"], kind="mergesort").reset_index(
        drop=True
    )


def jsd_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    group_col: str = "source",
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`jsd_by_group` (single-generator):
    identical tokenizer, identical common-token decomposition (absent-
    side mass enters through 0.5·ln2·(2 − Σp − Σq))."""
    return f"""
        WITH w AS (
            SELECT {group_col} AS g,
                   unnest(string_split(coalesce({text_col}, ''), ' '))
                       AS tok
            FROM {table} WHERE {group_col} IS NOT NULL
        ), c AS (
            SELECT g, tok, count(*) AS n FROM w GROUP BY g, tok
        ), tot AS (
            SELECT g, sum(n) AS t FROM c GROUP BY g
        ), m AS (
            SELECT a.g AS ga, b.g AS gb,
                   a.n / CAST(ta.t AS DOUBLE) AS p,
                   b.n / CAST(tb.t AS DOUBLE) AS q
            FROM c a
            JOIN c b ON a.tok = b.tok AND a.g < b.g
            JOIN tot ta ON ta.g = a.g
            JOIN tot tb ON tb.g = b.g
        ), s AS (
            SELECT ga, gb, count(*) AS n_common,
                   sum(p) AS sp, sum(q) AS sq,
                   sum(0.5 * p * ln(2 * p / (p + q))
                       + 0.5 * q * ln(2 * q / (p + q))) AS sterm
            FROM m GROUP BY ga, gb
        ), uni AS (
            SELECT va.g AS ga, vb.g AS gb
            FROM tot va JOIN tot vb ON va.g < vb.g
        )
        SELECT uni.ga AS group_a, uni.gb AS group_b,
               CAST(coalesce(s.n_common, 0) AS BIGINT) AS n_common,
               round(0.5 * ln(2) * (2 - coalesce(s.sp, 0)
                                      - coalesce(s.sq, 0))
                     + coalesce(s.sterm, 0), {round_to}) AS jsd
        FROM uni LEFT JOIN s ON uni.ga = s.ga AND uni.gb = s.gb
    """


def heaps_fit(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_exp: int = 3,
    round_to: int = 6,
) -> "pd.DataFrame":
    """Heaps'-law fit of vocabulary growth: OLS of ln V on ln N over
    power-of-two document checkpoints, where V(n) = distinct tokens
    seen in docs with id < n and N(n) = docs with id < n — the
    vocabulary-GROWTH health check next to Zipf's frequency SHAPE
    (q238): natural corpora grow V ≈ K·N^β with β ≈ 0.4–0.6;
    template/boilerplate corpora flatten (β → 0), id-spam inflates
    (β → 1).  Directly sizes tokenizer vocab budgets as a corpus
    scales.

    The curve needs NO sequential scan: V(n) is a threshold count over
    each token's FIRST document (one min-fold), so the whole curve
    costs one token-hash shuffle + two tiny threshold-count scans —
    checkpoint thresholds are 2^j for j ≥ min_exp up to max id, plus
    the full corpus (max id + 1).

    Scale shape: per-batch (token, min doc) partials, ONE token
    groupby; threshold counts fold as |checkpoints| integers; the OLS
    runs on ≤ ~40 points on the driver.  Output: one row
    (n_points:int64, beta, logk) — the fit needs ≥ 2 points with
    V > 0, else NaN.  SQL replay GENERATED by :func:`heaps_sql`."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    from .collect import collect_tables
    from .selection import round_half_away

    def fd_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[id_col]))
        texts = t[text_col].to_pylist()
        words, lens = batch_words(texts)
        if not len(words):
            return pa.table(
                {"token": pa.array([], type=pa.string()),
                 "fd": pa.array([], type=pa.int64())}
            )
        drows = np.repeat(
            t[id_col].to_numpy(zero_copy_only=False).astype(np.int64), lens
        )
        code, toks = pd.factorize(words, sort=False)
        first = np.full(len(toks), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(first, code, drows)
        return pa.table(
            {"token": pa.array(toks, type=pa.string()),
             "fd": pa.array(first)}
        )

    fd = (
        ds.map_batches(fd_partial, batch_format="pyarrow", batch_size=4096)
        .groupby("token")
        .aggregate(Min("fd", alias_name="fd"))
        .materialize()
    )

    # max doc id: slim per-batch max partials
    def max_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[id_col]))
        v = t[id_col].to_numpy(zero_copy_only=False)
        if not len(v):
            return pa.table({"m": pa.array([], type=pa.int64())})
        return pa.table({"m": pa.array([int(np.max(v))])})

    mx = None
    for t in collect_tables(
        ds.map_batches(max_partial, batch_format="pyarrow"), drop_empty=True
    ):
        for v in t["m"].to_pylist():
            mx = v if mx is None else max(mx, v)
    empty = pd.DataFrame(
        {"n_points": pd.Series([0], dtype=np.int64),
         "beta": pd.Series([np.nan], dtype=np.float64),
         "logk": pd.Series([np.nan], dtype=np.float64)}
    )
    if mx is None:
        return empty
    th = [1 << j for j in range(min_exp, 64) if (1 << j) <= mx + 1]
    if mx + 1 not in th:
        th.append(mx + 1)
    th_arr = np.array(sorted(th), dtype=np.int64)

    def count_below(source, col) -> np.ndarray:
        def part(t: pa.Table, _th=th_arr) -> pa.Table:
            t = t.filter(pc.is_valid(t[col]))
            v = np.sort(
                t[col].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            c = np.searchsorted(v, _th, side="left")  # strictly <
            return pa.table(
                {"j": pa.array(np.arange(len(_th), dtype=np.int64)),
                 "c": pa.array(c.astype(np.int64))}
            )

        acc = np.zeros(len(th_arr), dtype=np.int64)
        for t in collect_tables(
            source.map_batches(part, batch_format="pyarrow"),
            drop_empty=True,
        ):
            # np.add.at, not buffered fancy '+=': a coalesced block
            # carrying the same threshold index twice would drop counts
            np.add.at(
                acc,
                np.asarray(t["j"].to_pylist(), dtype=np.int64),
                np.asarray(t["c"].to_pylist(), dtype=np.int64),
            )
        return acc

    n_docs = count_below(ds, id_col)
    v_toks = count_below(fd, "fd")
    keep = (n_docs > 0) & (v_toks > 0)
    x = np.log(n_docs[keep].astype(np.float64))
    y = np.log(v_toks[keep].astype(np.float64))
    k = len(x)
    if k < 2:
        return empty
    sx, sy, sxy, sxx = x.sum(), y.sum(), (x * y).sum(), (x * x).sum()
    denom = k * sxx - sx * sx
    if denom == 0:
        return empty
    beta = (k * sxy - sx * sy) / denom
    logk = (sy - beta * sx) / k
    return pd.DataFrame(
        {"n_points": pd.Series([k], dtype=np.int64),
         "beta": pd.Series(round_half_away(np.array([beta]), round_to)),
         "logk": pd.Series(round_half_away(np.array([logk]), round_to))}
    )


def heaps_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_exp: int = 3,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`heaps_fit` (single-generator): identical
    tokenizer, first-doc folds, power-of-two thresholds, OLS."""
    return f"""
        WITH w AS (
            SELECT {id_col} AS d,
                   unnest(string_split(coalesce({text_col}, ''), ' '))
                       AS tok
            FROM {table} WHERE {id_col} IS NOT NULL
        ), fd AS (
            SELECT tok, min(d) AS fd FROM w GROUP BY tok
        ), mx AS (
            SELECT max({id_col}) AS m FROM {table}
        ), th AS (
            SELECT DISTINCT t FROM (
                SELECT (CAST(1 AS BIGINT) << j) AS t
                FROM generate_series({min_exp}, 62) g(j), mx
                WHERE (CAST(1 AS BIGINT) << j) <= m + 1
                UNION ALL
                SELECT m + 1 FROM mx
            )
        ), pts AS (
            SELECT th.t,
                   (SELECT count(*) FROM {table} dd
                    WHERE dd.{id_col} < th.t) AS nd,
                   (SELECT count(*) FROM fd WHERE fd.fd < th.t) AS v
            FROM th
        ), p AS (
            SELECT ln(CAST(nd AS DOUBLE)) AS x, ln(CAST(v AS DOUBLE)) AS y
            FROM pts WHERE nd > 0 AND v > 0
        ), s AS (
            SELECT count(*) AS k, sum(x) AS sx, sum(y) AS sy,
                   sum(x * y) AS sxy, sum(x * x) AS sxx
            FROM p
        )
        SELECT CAST(k AS BIGINT) AS n_points,
               round((k * sxy - sx * sy) / (k * sxx - sx * sx),
                     {round_to}) AS beta,
               round((sy - (k * sxy - sx * sy) / (k * sxx - sx * sx) * sx)
                     / k, {round_to}) AS logk
        FROM s
    """


def vocab_coverage(
    ds,
    *,
    text_col: str = "text",
    share_pct: int = 95,
) -> "pd.DataFrame":
    """Smallest head vocabulary covering ``share_pct`` % of the token
    MASS: rank tokens by frequency (desc) and count how many are
    needed before the running mass first reaches the target — the
    vocab-budget sizing number for tokenizer/embedding tables ("how
    big a lexicon covers 95% of what the model will read"), exact in
    integers end-to-end (target = ceil(total·pct/100); ties within a
    frequency class are interchangeable, so the count is unique).

    Scale shape: per-batch factorized token-count partials, ONE
    token-hash shuffle, then a shuffle-free frequency-OF-frequency
    fold (vocab rows → |distinct counts| rows — thousands at any
    corpus size); the head walk runs on the driver over that tiny
    histogram.  Output: one row (total_tokens, vocab_size, k_cover,
    boundary_freq, covered_tokens — all int64).  SQL replay GENERATED
    by :func:`vocab_coverage_sql` (window cumsum over the same
    histogram)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from .collect import collect_tables

    def partial(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        words, _ = batch_words(texts)
        if not len(words):
            return pa.table(
                {"token": pa.array([], type=pa.string()),
                 "n": pa.array([], type=pa.int64())}
            )
        code, toks = pd.factorize(words, sort=False)
        cnt = np.bincount(code, minlength=len(toks))
        return pa.table(
            {"token": pa.array(toks, type=pa.string()),
             "n": pa.array(cnt.astype(np.int64))}
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )

    def ff_partial(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return (
            pa.table({"c": pa.array(n),
                      "one": pa.array(np.ones(len(n), dtype=np.int64))})
            .group_by("c").aggregate([("one", "sum")])
        )

    ff: dict = {}
    for t in collect_tables(
        counts.map_batches(ff_partial, batch_format="pyarrow"),
        drop_empty=True,
    ):
        for c, n in zip(t["c"].to_pylist(), t["one_sum"].to_pylist()):
            ff[int(c)] = ff.get(int(c), 0) + int(n)
    cols = ["total_tokens", "vocab_size", "k_cover", "boundary_freq",
            "covered_tokens"]
    if not ff:
        return pd.DataFrame({c: pd.Series([0], dtype=np.int64)
                             for c in cols})
    total = sum(c * n for c, n in ff.items())
    vocab = sum(ff.values())
    target = (total * share_pct + 99) // 100  # ceil, nonneg ints
    cum_mass = 0
    cum_tokens = 0
    k_cover = boundary = covered = 0
    for c in sorted(ff, reverse=True):
        n = ff[c]
        if cum_mass + c * n >= target:
            need = target - cum_mass
            extra = (need + c - 1) // c  # ceil, nonneg ints
            k_cover = cum_tokens + extra
            boundary = c
            covered = cum_mass + extra * c
            break
        cum_mass += c * n
        cum_tokens += n
    return pd.DataFrame(
        {
            "total_tokens": pd.Series([total], dtype=np.int64),
            "vocab_size": pd.Series([vocab], dtype=np.int64),
            "k_cover": pd.Series([k_cover], dtype=np.int64),
            "boundary_freq": pd.Series([boundary], dtype=np.int64),
            "covered_tokens": pd.Series([covered], dtype=np.int64),
        }
    )


def vocab_coverage_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    share_pct: int = 95,
) -> str:
    """DuckDB replay of :func:`vocab_coverage` (single-generator):
    identical tokenizer, frequency histogram, ceil walk."""
    return f"""
        WITH w AS (
            SELECT unnest(string_split(coalesce({text_col}, ''), ' '))
                       AS tok
            FROM {table}
        ), c AS (
            SELECT tok, count(*) AS n FROM w GROUP BY tok
        ), ff AS (
            SELECT n AS c, count(*) AS nt FROM c GROUP BY n
        ), tot AS (
            SELECT sum(c * nt) AS total, sum(nt) AS vocab FROM ff
        ), cum AS (
            SELECT c, nt,
                   coalesce(sum(c * nt) OVER (
                       ORDER BY c DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS mass_before,
                   coalesce(sum(nt) OVER (
                       ORDER BY c DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS toks_before
            FROM ff
        ), tgt AS (
            -- ceil via nonneg ints: DuckDB // truncates toward zero
            SELECT (total * {share_pct} + 99) // 100 AS target FROM tot
        ), hit AS (
            SELECT c, mass_before, toks_before,
                   toks_before + (target - mass_before + c - 1) // c
                       AS k_cover,
                   mass_before
                   + ((target - mass_before + c - 1) // c) * c AS covered
            FROM cum, tgt
            WHERE mass_before + c * nt >= target
            ORDER BY c DESC LIMIT 1
        )
        SELECT CAST(tot.total AS BIGINT) AS total_tokens,
               CAST(tot.vocab AS BIGINT) AS vocab_size,
               CAST(hit.k_cover AS BIGINT) AS k_cover,
               CAST(hit.c AS BIGINT) AS boundary_freq,
               CAST(hit.covered AS BIGINT) AS covered_tokens
        FROM tot, hit
    """


def lang_script_audit(
    ds,
    *,
    text_col: str = "text",
    lang_col: str = "lang",
    expected: "dict[str, str] | None" = None,
    round_to: int = 6,
) -> "pd.DataFrame":
    """Declared-language vs dominant-SCRIPT cross-audit: count docs per
    (lang, dominant_script) cell and flag whether the script is the
    one the language is written in — the cheapest language-ID QA gate
    (a page tagged ``en`` whose codepoints are CJK is a mislabeled or
    mis-decoded page; a tagged-``zh`` page in Latin is pinyin/spam).
    Runs BEFORE the trigram language-ID (q35), which assumes an
    alphabetic script and silently misfires exactly where this audit
    flags.

    ``expected`` maps lang → script class (defaults cover the corpus
    languages: en/de/fr/es → latin, zh → cjk, ru → cyrillic, ar →
    arabic, el → greek); unknown langs get is_expected = 0 for every
    script (no claim, surfaced rather than guessed).  Null lang rows
    drop on both engines.

    Scale shape: the :func:`add_script_mix` single-scan kernel feeds
    per-batch (lang, dominant) count partials, ONE langs×scripts-sized
    groupby; shares compute per lang on the driver over that tiny
    grid.  Output: (lang, dominant_script, n_docs:int64, share,
    is_expected:int64) sorted.  SQL replay composes the GENERATED
    :func:`script_mix_sql` (single-generator for the ranges/tie-break)
    via :func:`lang_script_audit_sql`."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .selection import round_half_away

    exp = expected or {"en": "latin", "de": "latin", "fr": "latin",
                       "es": "latin", "it": "latin", "pt": "latin",
                       "zh": "cjk", "ja": "cjk", "ru": "cyrillic",
                       "ar": "arabic", "el": "greek"}

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[lang_col]))
        sm = add_script_mix(t, text_col=text_col)
        return (
            pa.table(
                {"lang": t[lang_col],
                 "dominant_script": sm["dominant_script"],
                 "one": pa.array(np.ones(t.num_rows, dtype=np.int64))}
            )
            .group_by(["lang", "dominant_script"])
            .aggregate([("one", "sum")])
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "dominant_script"])
        .aggregate(Sum("one_sum", alias_name="n_docs"))
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {"lang": pd.Series([], dtype=object),
             "dominant_script": pd.Series([], dtype=object),
             "n_docs": pd.Series([], dtype=np.int64),
             "share": pd.Series([], dtype=np.float64),
             "is_expected": pd.Series([], dtype=np.int64)}
        )
    out["n_docs"] = out["n_docs"].astype(np.int64)
    tot = out.groupby("lang")["n_docs"].transform("sum")
    share = out["n_docs"].to_numpy(dtype=np.float64) / tot.to_numpy(
        dtype=np.float64
    )
    is_exp = np.fromiter(
        (1 if exp.get(lg) == sc else 0
         for lg, sc in zip(out["lang"], out["dominant_script"])),
        dtype=np.int64, count=len(out),
    )
    res = pd.DataFrame(
        {
            "lang": out["lang"],
            "dominant_script": out["dominant_script"],
            "n_docs": out["n_docs"],
            "share": round_half_away(share, round_to),
            "is_expected": is_exp,
        }
    )
    return res.sort_values(["lang", "dominant_script"],
                           kind="mergesort").reset_index(drop=True)


def lang_script_audit_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    lang_col: str = "lang",
    id_col: str = "doc_id",
    expected: "dict[str, str] | None" = None,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`lang_script_audit` — wraps the GENERATED
    :func:`script_mix_sql` (single-generator for ranges / whitespace /
    tie-break) with the same grouping, share, expected map."""
    exp = expected or {"en": "latin", "de": "latin", "fr": "latin",
                       "es": "latin", "it": "latin", "pt": "latin",
                       "zh": "cjk", "ja": "cjk", "ru": "cyrillic",
                       "ar": "arabic", "el": "greek"}
    inner = script_mix_sql(table=table, text_col=text_col, id_col=id_col)
    exp_case = "CASE " + " ".join(
        f"WHEN g.{lang_col} = '{lg.replace(chr(39), chr(39) * 2)}' "
        f"AND g.dominant_script = '{sc.replace(chr(39), chr(39) * 2)}' "
        f"THEN 1"
        for lg, sc in sorted(exp.items())
    ) + " ELSE 0 END"
    return f"""
        WITH sm AS ({inner}),
        g AS (
            SELECT d.{lang_col}, sm.dominant_script,
                   count(*) AS n_docs
            FROM sm JOIN {table} d USING ({id_col})
            WHERE d.{lang_col} IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT g.{lang_col} AS lang, g.dominant_script,
               CAST(g.n_docs AS BIGINT) AS n_docs,
               round(g.n_docs / CAST(sum(g.n_docs) OVER (
                   PARTITION BY g.{lang_col}) AS DOUBLE),
                   {round_to}) AS share,
               CAST({exp_case} AS BIGINT) AS is_expected
        FROM g
    """
