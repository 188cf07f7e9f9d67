"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units").

Reference parity note: the reference repo counts tokens only via a
remote LLM API; a training-data engine needs a REAL subword tokenizer
for token budgeting, packing, and quota mixing — this is part of the
"operations a large-scale training-data pipeline would need" mandate
(the token-count consumers are stages/packing.py and sampling.py).

Scale shape — the classic two-level trick that makes BPE training
corpus-size-independent:

1. ONE distributed pass reduces the corpus to a WORD-FREQUENCY table
   (``text_analysis.unigram_counts``: per-batch factorize partials →
   one vocab-bounded token-hash shuffle), capped to ``top_words`` by
   ``selection.global_top_k`` (per-block partial top-k, no global
   sort).  Everything after this step works on the capped table —
   vocabulary-sized, NOT corpus-sized — which is the standard
   fast-BPE formulation (merge counts weighted by word frequency are
   exactly the corpus pair counts, restricted to the kept words).
2. The merge loop runs single-process on the capped table (driver or
   one worker).  Each round re-counts weighted symbol pairs and merges
   the (count DESC, pair ASC)-best pair — deterministic tie-break, so
   training is bit-reproducible regardless of block layout.
3. ENCODING streams: the merge ranks broadcast ONCE via ``ray.put``
   (``bpe_encode``), applied inside ``map_batches`` by a callable-class
   actor pool whose per-word memo cache persists across batches (the
   same warm-state pattern as the OCR actors) — web text is Zipfian,
   so the cache hit rate approaches 1 after a few batches.

Determinism: merges depend only on the word-frequency multiset;
encoding depends only on (merges, word).  Both are pinned by
equivalence tests against a brute-force reference in tests/test_bpe.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

END = "</w>"  # end-of-word sentinel symbol (Sennrich convention)


# --------------------------------------------------------------------------
# training (on the capped word-frequency table)
# --------------------------------------------------------------------------

def word_frequencies(
    ds: rd.Dataset, *, text_col: str = "text", top_words: int = 50_000
) -> pd.DataFrame:
    """Distributed word-count pass → capped (token, n) table.  Cap is
    deterministic: top by (n DESC, token ASC)."""
    from .selection import global_top_k
    from .text_analysis import unigram_counts

    counts = unigram_counts(ds, text_col=text_col)
    return global_top_k(
        counts, k=top_words, by=["n", "token"], descending=[True, False]
    )


def bpe_train_on_counts(
    word_freqs: "dict[str, int] | pd.DataFrame",
    *,
    n_merges: int,
) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a word-frequency dict.  Per round:
    weighted pair counts over the CURRENT symbolization of each word,
    best pair = (count DESC, pair lexicographic ASC).  Stops early when
    no pair occurs twice."""
    if isinstance(word_freqs, pd.DataFrame):
        word_freqs = dict(zip(word_freqs["token"], word_freqs["n"]))
    # word → current symbol list; chars + end-of-word sentinel
    words = [w for w in word_freqs if w]
    freqs = [int(word_freqs[w]) for w in words]
    syms: list[list[str]] = [list(w) + [END] for w in words]

    # initial weighted pair counts + inverted index pair → word ids
    # (delta-updated after each merge: only words CONTAINING the merged
    # pair are rewritten — the standard fast-BPE trick that keeps each
    # round O(affected words), not O(vocab))
    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for wi, s in enumerate(syms):
        n = freqs[wi]
        for p in zip(s, s[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + n
            where.setdefault(p, set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best_pair, best_n = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if best_n < 2:
            break
        merges.append(best_pair)
        a, b = best_pair
        merged = a + b
        for wi in sorted(where.get(best_pair, ())):
            s = syms[wi]
            n = freqs[wi]
            # remove this word's old pair contributions
            for p in zip(s, s[1:]):
                pair_counts[p] -= n
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                ws = where.get(p)
                if ws is not None:
                    ws.discard(wi)
                    if not ws:
                        del where[p]
            # rewrite the word
            out: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[wi] = out
            # add back the new contributions
            for p in zip(out, out[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + n
                where.setdefault(p, set()).add(wi)
    return merges


def bpe_train(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    n_merges: int = 200,
    top_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Distributed word-count pass + single-process merge loop (see
    module docstring for why the loop input is vocab-sized)."""
    wf = word_frequencies(ds, text_col=text_col, top_words=top_words)
    return bpe_train_on_counts(wf, n_merges=n_merges)


# --------------------------------------------------------------------------
# encoding (streams; merges broadcast once; per-actor word memo)
# --------------------------------------------------------------------------

def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE word by applying merges in rank order (lowest rank
    first) until no mergeable pair remains — the standard BPE encode."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeEncoder:
    """Actor-pool ``map_batches`` stage: merges table fetched ONCE in
    ``__init__`` (broadcast ref), per-word memo cache warm across
    batches.  Adds ``n_bpe_tokens`` (int64) per row; with
    ``emit_tokens=True`` also a ``bpe_tokens`` list<string> column."""

    def __init__(self, merges_ref, *, text_col: str = "text",
                 emit_tokens: bool = False):
        merges = ray.get(merges_ref) if not isinstance(merges_ref, list) else merges_ref
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.text_col = text_col
        self.emit_tokens = emit_tokens
        self.memo: dict[str, list[str]] = {"": [END]}

    def _word(self, w: str) -> list[str]:
        got = self.memo.get(w)
        if got is None:
            got = self.memo[w] = encode_word(w, self.ranks)
        return got

    def __call__(self, t: pa.Table) -> pa.Table:
        from .text_analysis import batch_words

        words, lens = batch_words(t[self.text_col].to_pylist())
        # Zipf: encode each DISTINCT word once per batch, then gather
        inverse, uniq = pd.factorize(words, sort=False)
        enc = [self._word(w) for w in uniq]
        per_word = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(enc))
        tok_per_word = per_word[inverse]
        ends = np.cumsum(lens)
        starts = ends - lens
        n_tokens = np.add.reduceat(tok_per_word, starts) if len(lens) else np.empty(0, np.int64)
        out = t.append_column("n_bpe_tokens", pa.array(n_tokens.astype(np.int64)))
        if self.emit_tokens:
            flat: list[list[str]] = []
            for s, e in zip(starts, ends):
                row: list[str] = []
                for wi in inverse[s:e]:
                    row.extend(enc[wi])
                flat.append(row)
            out = out.append_column(
                "bpe_tokens", pa.array(flat, type=pa.list_(pa.string()))
            )
        return out


def bpe_encode(
    ds: rd.Dataset,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    emit_tokens: bool = False,
    concurrency: "int | tuple[int, int] | None" = None,
) -> rd.Dataset:
    """Streaming encode: the merge list ships ONCE per actor (inline in
    the constructor for small tables; via ``ray.put`` above 10k merges
    so the object store holds the single copy), actor-pool
    ``map_batches`` with a warm per-actor word memo."""
    table = list(map(tuple, merges))
    ref = table if len(table) < 10_000 else ray.put(table)
    if concurrency is None:
        # an actor pool sized == total CPUs starves the read/write task
        # operators and stalls the pipeline (verify-skill gotcha): leave
        # >= 2 CPUs of headroom, autoscale down to 1
        avail = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (1, max(1, min(8, avail - 2)))
    return ds.map_batches(
        BpeEncoder,
        fn_constructor_kwargs={
            "merges_ref": ref, "text_col": text_col, "emit_tokens": emit_tokens
        },
        batch_format="pyarrow",
        concurrency=concurrency,
    )
