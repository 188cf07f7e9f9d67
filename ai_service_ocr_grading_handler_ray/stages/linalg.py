"""Distributed dense linear algebra over an embedding column: moment
(covariance/Gram) accumulation and PCA projection.

The whitening/decorrelation step embedding-curation pipelines run before
cosine comparisons (SemDeDup-style near-dup sweeps, IVF residuals).  The
scale shape mirrors k-means (stages/clustering.py): one shuffle-free
``map_batches`` scan emits ONE (n, sum, X'X) moment row per batch —
d + d² floats, dimension-sized, never row-count-sized — and the driver
folds blocks-many moment rows in sorted order (bit-stable).  The
eigendecomposition runs on the driver over the (d, d) covariance — d is
an embedding width (64–4096), never data-sized.  Projection broadcasts
the (d, k) component matrix once and is a shuffle-free matmul per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .similarity import _as_matrix
from .collect import collect_tables


def fold_sparse_partials(ds: rd.Dataset, out: np.ndarray,
                         *, idx_col: str = "i", val_col: str = "v") -> np.ndarray:
    """Fold a Dataset of sparse (idx, val) partial rows into the dense
    ``out`` vector IN CANONICAL ORDER: all partials are concatenated and
    sorted by (idx, val) before accumulation, so the float addition
    order is a pure function of the partial multiset — immune to block
    arrival order and to run-to-run jitter in materialized block
    composition (the same sorted-fold convention as k-means).  The
    driver holds <= nnz-per-batch x blocks rows, never corpus rows."""
    tbls = [t for t in collect_tables(ds, drop_empty=False) if t.num_rows]
    if not tbls:
        return out
    merged = pa.concat_tables(tbls)
    i = merged[idx_col].to_numpy(zero_copy_only=False)
    v = merged[val_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((v, i))
    np.add.at(out, i[order], v[order])
    return out


def moments(ds: rd.Dataset, *, vec_col: str = "embedding") -> tuple[int, np.ndarray, np.ndarray]:
    """(n, sum_vector (d,), raw second moment X'X (d, d)) over the whole
    dataset — one shuffle-free scan, one moment row per batch."""

    def partial(t: pa.Table) -> pa.Table:
        V = _as_matrix(t[vec_col])
        s = V.sum(axis=0)
        g = V.T @ V
        return pa.table(
            {
                "n": pa.array([len(V)], type=pa.int64()),
                "s": pa.array([s.tolist()], type=pa.list_(pa.float64())),
                "g": pa.array([g.reshape(-1).tolist()], type=pa.list_(pa.float64())),
            }
        )

    tbls = [
        t for t in collect_tables(
            ds.map_batches(partial, batch_format="pyarrow"), drop_empty=False)
        if t.num_rows
    ]
    if not tbls:
        raise ValueError("empty dataset: no moments")
    merged = pa.concat_tables(tbls)
    ns = merged["n"].to_numpy(zero_copy_only=False)
    S = _as_matrix(merged["s"])
    G = _as_matrix(merged["g"])
    d = S.shape[1]
    # fold in a fixed order (block order is deterministic per input)
    n = int(ns.sum())
    return n, S.sum(axis=0), G.sum(axis=0).reshape(d, d)


def covariance(ds: rd.Dataset, *, vec_col: str = "embedding") -> tuple[np.ndarray, np.ndarray]:
    """(mean (d,), population covariance (d, d)): cov = X'X/n − μμ'."""
    n, s, g = moments(ds, vec_col=vec_col)
    mu = s / n
    return mu, g / n - np.outer(mu, mu)


def pca_fit(
    ds: rd.Dataset, k: int, *, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray]:
    """(mean (d,), components (d, k)) — top-k eigenvectors of the
    population covariance, eigenvalue-descending, sign-normalized so the
    largest-|coefficient| entry of each component is positive (the
    deterministic convention; eigenvectors are otherwise sign-ambiguous)."""
    mu, cov = covariance(ds, vec_col=vec_col)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order]
    for j in range(comps.shape[1]):
        i = int(np.argmax(np.abs(comps[:, j])))
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    return mu, comps


def pca_project(
    ds: rd.Dataset,
    mean: np.ndarray,
    components: np.ndarray,
    *,
    vec_col: str = "embedding",
    out_col: str = "pca",
    keep_cols: list[str] | None = None,
) -> rd.Dataset:
    """Append the centered projection (V − μ) @ components as a
    ``list<double>`` column — one (d, k) broadcast, shuffle-free."""
    ref = ray.put((np.asarray(mean, dtype=np.float64),
                   np.asarray(components, dtype=np.float64)))

    def fn(t: pa.Table) -> pa.Table:
        mu, W = ray.get(ref)
        P = (_as_matrix(t[vec_col]) - mu) @ W
        if keep_cols is not None:
            t = t.select(keep_cols)
        return t.append_column(
            out_col, pa.array(list(P), type=pa.list_(pa.float64()))
        )

    return ds.map_batches(fn, batch_format="pyarrow")
