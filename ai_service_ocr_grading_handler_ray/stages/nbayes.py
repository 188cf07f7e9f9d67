"""Multinomial Naive Bayes text classifier, distributed.

The classic CCNet/fastText-adjacent *generative* quality/topic model
next to the discriminative logistic classifier (stages/classifier.py):
training is ONE token-class shuffle (per-batch factorize partials →
vocab×classes rows, never corpus tokens), the fitted model is a
broadcast-ready (sorted token hashes, V×C count matrix, class totals,
priors) bundle, and scoring is a shuffle-free `map_batches` scan
(binary-search probe + one `np.add.reduceat` per class).

Reference anchor: the reference routes each record through a per-class
prompt/model table (gen_ai_calling.py:140-167 alias → modelClass
dispatch); this stage is the learned counterpart — class-conditional
token statistics instead of a hand-written alias table.

Laplace smoothing (alpha=1) over the training vocabulary V:
    ln P(w|c) = ln((n_cw + 1) / (n_c + V))
    score(d, c) = ln(N_c / N) + sum_{w in d} ln P(w|c)
which is exactly SQL-replayable (see the q158 oracle): counts, totals
and V are integers, so engine and oracle divide identical doubles.

Tokenization is the package-wide `batch_words` convention
(single-space split, '' → one empty token) — identical to SQL
``string_split(text, ' ')``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .collect import collect_tables
from .hashing import hash_u64
from .text_analysis import _VOCAB_BROADCAST_CAP, batch_words

__all__ = [
    "NBModel",
    "nb_token_class_counts",
    "nb_train",
    "nb_score",
    "nb_reference",
]


@dataclass
class NBModel:
    """Broadcast-ready fitted model.  Sizes: V×(C+1) floats + C priors —
    vocabulary-scale, never corpus-scale (guarded by the package vocab
    broadcast cap)."""

    hashes: np.ndarray  # (V,) uint64, sorted — token identity
    counts: np.ndarray  # (V, C) float64 — n_cw
    totals: np.ndarray  # (C,) float64 — n_c (token occurrences per class)
    log_priors: np.ndarray  # (C,) float64 — ln(N_c / N)
    labels: list  # (C,) class names, sorted ascending
    vocab_size: int  # V (distinct training tokens, all classes pooled)


def nb_token_class_counts(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    label_col: str = "label",
    num_parts: int = 32,
) -> rd.Dataset:
    """Corpus (label, token, n) counts as a Dataset: per-batch factorize
    partials (batch tokens → type×class rows leave each task), then ONE
    coarse token-hash shuffle with a vectorized pandas sum per
    partition.  Shuffled volume is bounded by vocab × classes × blocks,
    never corpus tokens — the unigram_counts shape with a class axis."""
    from .dedup import add_key_partition

    def partial(t: pa.Table) -> pa.Table:
        words, lens = batch_words(t[text_col].to_pylist())
        labels = np.repeat(
            t[label_col].to_pandas().to_numpy(dtype=object), lens
        )
        tok_inv, toks = pd.factorize(words, sort=False)
        lab_inv, labs = pd.factorize(labels, sort=False)
        code = tok_inv.astype(np.int64) * len(labs) + lab_inv
        n = np.bincount(code, minlength=len(toks) * len(labs))
        nz = np.flatnonzero(n)
        return pa.table(
            {
                "token": pa.array(toks[nz // len(labs)], type=pa.string()),
                "label": pa.array(labs[nz % len(labs)]),
                "n": pa.array(n[nz].astype(np.int64)),
            }
        )

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        r = (
            g.groupby(["token", "label"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        r["n"] = r["n"].astype("int64")
        return r

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=16384)
        .map_batches(
            lambda t: add_key_partition(t, "token", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(agg, batch_format="pandas")
    )


def nb_train(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    label_col: str = "label",
    num_parts: int = 32,
) -> NBModel:
    """Fit the model: one token-class count shuffle + one tiny per-label
    doc-count groupby; the driver folds vocab×classes rows (cap-guarded)
    into the broadcast bundle."""
    counts_ds = nb_token_class_counts(
        ds, text_col=text_col, label_col=label_col, num_parts=num_parts
    )
    blocks = [b for b in collect_tables(counts_ds) if b.num_rows]
    if blocks:
        toks = np.concatenate(
            [b.column("token").to_pandas().to_numpy(dtype=object) for b in blocks]
        )
        labs = np.concatenate(
            [b.column("label").to_pandas().to_numpy(dtype=object) for b in blocks]
        )
        ns = np.concatenate(
            [b.column("n").to_numpy(zero_copy_only=False) for b in blocks]
        ).astype(np.float64)
    else:
        toks = np.empty(0, dtype=object)
        labs = np.empty(0, dtype=object)
        ns = np.empty(0, dtype=np.float64)
    if len(toks) > _VOCAB_BROADCAST_CAP:
        raise ValueError(
            f"token-class table ({len(toks)} rows) exceeds broadcast cap "
            f"{_VOCAB_BROADCAST_CAP}"
        )

    # per-label document counts (priors) — label cardinality is tiny
    prior_rows = [
        b
        for b in collect_tables(
            ds.groupby(label_col).count(), drop_empty=True
        )
        if b.num_rows
    ]
    pr = (
        pa.concat_tables(prior_rows).to_pandas()
        if prior_rows
        else pd.DataFrame({label_col: [], "count()": []})
    )
    labels = sorted(pr[label_col].tolist())
    lab_pos = {v: i for i, v in enumerate(labels)}
    nd = pr.set_index(label_col)["count()"].astype(np.float64)
    n_total = float(nd.sum())
    log_priors = np.array(
        [np.log(nd[v] / n_total) for v in labels], dtype=np.float64
    )

    # dedupe tokens, pivot to the (V, C) matrix in sorted-hash order
    tok_inv, utoks = pd.factorize(toks, sort=False)
    h = hash_u64(utoks)
    order = np.argsort(h, kind="stable")
    rank = np.empty(len(order), dtype=np.int64)
    rank[order] = np.arange(len(order))
    mat = np.zeros((len(utoks), len(labels)), dtype=np.float64)
    if len(toks):
        cols = np.array([lab_pos[v] for v in labs], dtype=np.int64)
        np.add.at(mat, (rank[tok_inv], cols), ns)
    return NBModel(
        hashes=h[order],
        counts=mat,
        totals=mat.sum(axis=0),
        log_priors=log_priors,
        labels=labels,
        vocab_size=len(utoks),
    )


def nb_score(
    ds: rd.Dataset,
    model: NBModel,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Score every document against every class: shuffle-free
    `map_batches` with the model broadcast ONCE via ``ray.put``
    (vocabulary-scale, cap-guarded; workers read it zero-copy from the
    object store).  Emits (id, label, nb_logprob) — C rows per document,
    prediction = per-id argmax downstream.  OOV tokens smooth to
    ln(1 / (n_c + V))."""
    import ray

    V = float(model.vocab_size)
    # (V+1, C): last row is the OOV count row (0), so probing can gather
    # unconditionally with the miss index parked on it
    model_ref = ray.put(
        (
            model.hashes,
            np.vstack([model.counts, np.zeros((1, len(model.labels)))]),
            model.totals + V,
            model.log_priors,
        )
    )
    labels_arr = np.array(model.labels, dtype=object)
    C = len(model.labels)

    def score(t: pa.Table) -> pa.Table:
        hs, cnt, denom, log_priors = ray.get(model_ref)
        texts = t[text_col].to_pylist()
        words, lens = batch_words(texts)
        wh = hash_u64(words)
        if len(hs):
            idx = np.clip(np.searchsorted(hs, wh), 0, len(hs) - 1)
            idx = np.where(hs[idx] == wh, idx, len(hs))
        else:
            idx = np.full(len(wh), 0, dtype=np.int64)
        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        tok_lp = np.log((cnt[idx] + 1.0) / denom)  # (T, C)
        doc_lp = np.add.reduceat(tok_lp, starts, axis=0) if len(lens) else (
            np.zeros((0, C))
        )
        ids = t[id_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, C)),
                "label": pa.array(
                    np.tile(labels_arr, len(lens)), type=pa.string()
                ),
                "nb_logprob": pa.array(
                    (doc_lp + log_priors).ravel(), type=pa.float64()
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", batch_size=8192)


def nb_reference(
    texts: list, labels: list, score_texts: list
) -> dict[tuple[int, object], float]:
    """Plain-Python single-process reference (tests): {(i, label): score}
    for score_texts[i] under the model fit on (texts, labels)."""
    from collections import Counter, defaultdict

    toks = [(t or "").split(" ") for t in texts]
    vocab = set()
    cw: dict[object, Counter] = defaultdict(Counter)
    nd: Counter = Counter()
    for ws, lab in zip(toks, labels):
        cw[lab].update(ws)
        vocab.update(ws)
        nd[lab] += 1
    V = len(vocab)
    n_total = len(texts)
    out: dict[tuple[int, object], float] = {}
    for i, t in enumerate(score_texts):
        ws = (t or "").split(" ")
        for lab in sorted(nd):
            tot = sum(cw[lab].values())
            s = float(np.log(nd[lab] / n_total))
            for w in ws:
                s += float(np.log((cw[lab][w] + 1.0) / (tot + V)))
            out[(i, lab)] = s
    return out
