"""Trained document-quality classifier: distributed logistic regression
over hashed bag-of-words features (the fastText-style linear model
FineWeb-Edu / CCNet-style curation uses to score web pages, trained on
weak labels from rule-based filters).

Reference parity note: the reference repo scores answers with a remote
LLM; a training-data engine needs a LOCAL trainable scorer — part of
the "operations a large-scale training-data pipeline would need"
mandate.  The weak-label source in q120 is the blocked-word rule
(stages/clean.filter_blocked_words' semantics), the standard
bootstrap: train a cheap model on rule verdicts, then score
everything — on real corpora swap in any rule battery or a
human-labeled seed set via ``label_col``.

Scale shape (the same broadcast-partials pattern as stages/clustering
k-means and stages/graph pagerank):

- features are HASHED (``hashing.hash_u64 % dim``): no vocabulary
  shuffle, no dictionary state — every task featurizes independently;
- per GD iteration: ONE ``ray.put`` broadcast of the weight vector
  (dim-sized float64, default 2^16 = 512 KB), ONE shuffle-free
  ``map_batches`` scan emitting sparse per-batch gradient partials
  (``np.bincount`` over the flat token tape — no per-row loop), and a
  dim-sized driver fold.  Corpus rows never leave their tasks;
- scoring streams: one broadcast + one scan adding a ``prob`` column.

Model: p = sigmoid(b + sum_f w[f] * x[f]) with x either L1-normalized
term frequencies (``mode="tf"``) or distinct-word presence indicators
(``mode="presence"``, the fastText-classification convention);
full-batch gradient descent with L2 regularization —
deterministic (no sampling, no row-order dependence beyond float
addition order across blocks; equivalence vs a single-process numpy
reference is pinned by tests/test_classifier.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .hashing import hash_u64
from .text_analysis import batch_words


def _featurize(texts: list, dim: int, mode: str = "tf"):
    """Flat hashed-token tape for one batch: returns (fidx, val, doc,
    n_docs) where ``fidx`` is each entry's feature index, ``val`` its
    feature value, and ``doc`` the owning row.

    ``mode="tf"``: one entry per token, value = 1/doc_len (L1 term
    frequency).  ``mode="presence"``: one entry per DISTINCT (doc,
    feature) pair, value = 1 — the fastText-classification convention;
    learns presence rules (badword / topic markers) in few iterations
    because each feature contributes O(1), not O(1/len)."""
    words, lens = batch_words(texts)
    n = len(lens)
    fidx = (hash_u64(words) % np.uint64(dim)).astype(np.int64)
    doc = np.repeat(np.arange(n, dtype=np.int64), lens)
    if mode == "presence":
        key = np.unique(doc * np.int64(dim) + fidx)
        return (key % dim).astype(np.int64), np.ones(len(key)), (key // dim).astype(np.int64), n
    if mode != "tf":
        raise ValueError(f"unknown feature mode {mode!r}")
    return fidx, np.repeat(1.0 / lens, lens), doc, n


def _sigmoid(x: np.ndarray) -> np.ndarray:
    out = np.empty_like(x)
    pos = x >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-x[pos]))
    e = np.exp(x[~pos])
    out[~pos] = e / (1.0 + e)
    return out


def logreg_train(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    label_col: str,
    dim: int = 1 << 16,
    n_iter: int = 30,
    lr: float = 2.0,
    l2: float = 1e-6,
    mode: str = "tf",
) -> tuple[np.ndarray, float]:
    """Full-batch GD; returns (w: float64[dim], bias).  Each iteration
    is one broadcast + one scan + a dim-sized driver fold."""
    w = np.zeros(dim, dtype=np.float64)
    b = 0.0

    # GD re-scans the input n_iter times: pin the (text, label) blocks in
    # the object store (spillable) so each iteration re-reads blocks
    # instead of re-running the upstream labeling pipeline — the same
    # iterate-over-materialized-reduction shape as pagerank's edge table.
    ds = ds.select_columns([text_col, label_col]).materialize()
    m_total = ds.count()
    if not m_total:
        raise ValueError("logreg_train: empty dataset")

    for _ in range(n_iter):
        ref = ray.put(w)

        def grad_partial(t: pa.Table, _ref=ref, _b=b) -> pa.Table:
            wi = ray.get(_ref)
            texts = t[text_col].to_pylist()
            y = t[label_col].to_numpy(zero_copy_only=False).astype(np.float64)
            fidx, val, doc, n = _featurize(texts, len(wi), mode)
            s = np.bincount(doc, weights=wi[fidx] * val, minlength=n)
            resid = _sigmoid(s + _b) - y
            acc = np.bincount(fidx, weights=resid[doc] * val, minlength=len(wi))
            present = np.flatnonzero(acc)
            # sparse gradient partial + one scalar row (idx=dim) for bias
            idx = np.concatenate([present, [len(wi)]])
            val = np.concatenate([acc[present], [resid.sum()]])
            return pa.table({"i": pa.array(idx.astype(np.int64)),
                             "v": pa.array(val.astype(np.float64))})

        from .linalg import fold_sparse_partials

        g = fold_sparse_partials(
            ds.map_batches(grad_partial, batch_format="pyarrow"),
            np.zeros(dim + 1, dtype=np.float64),
        )
        w = w - lr * (g[:dim] / m_total + l2 * w)
        b = b - lr * (g[dim] / m_total)
    return w, float(b)


def logreg_score(
    ds: rd.Dataset,
    w: np.ndarray,
    bias: float,
    *,
    text_col: str = "text",
    out_col: str = "prob",
    mode: str = "tf",
) -> rd.Dataset:
    """Streaming scorer: weights broadcast once, one scan appends the
    predicted probability column."""
    ref = ray.put(np.asarray(w, dtype=np.float64))

    def score(t: pa.Table, _ref=ref) -> pa.Table:
        wi = ray.get(_ref)
        texts = t[text_col].to_pylist()
        fidx, val, doc, n = _featurize(texts, len(wi), mode)
        s = np.bincount(doc, weights=wi[fidx] * val, minlength=n)
        return t.append_column(out_col, pa.array(_sigmoid(s + bias)))

    return ds.map_batches(score, batch_format="pyarrow")


def logreg_train_reference(
    texts: list, labels: np.ndarray, *, dim: int, n_iter: int,
    lr: float = 2.0, l2: float = 1e-6, mode: str = "tf",
) -> tuple[np.ndarray, float]:
    """Single-process numpy reference performing the IDENTICAL update —
    the equivalence target for tests (same hashing, same feature
    values, same full-batch GD)."""
    y = np.asarray(labels, dtype=np.float64)
    fidx, val, doc, n = _featurize(list(texts), dim, mode)
    w = np.zeros(dim, dtype=np.float64)
    b = 0.0
    for _ in range(n_iter):
        s = np.bincount(doc, weights=w[fidx] * val, minlength=n)
        resid = _sigmoid(s + b) - y
        g = np.bincount(fidx, weights=resid[doc] * val, minlength=dim)
        w = w - lr * (g / n + l2 * w)
        b = b - lr * (resid.sum() / n)
    return w, float(b)
