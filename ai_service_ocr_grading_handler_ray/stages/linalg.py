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
import pandas as pd
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


def label_centroid_cosines(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 6,
) -> "pd.DataFrame":
    """Pairwise cosine similarity between per-label embedding
    CENTROIDS: the semantic-space complement of the token-level
    distribution screens (q243 JSD, q242 vocab Jaccard) — two classes
    whose centroids sit at cosine ≈ 1 are candidates for merging (or
    evidence of label noise), and a mixture designer reads the matrix
    before weighting sources.  Centroid quality is the k-means-free
    first look (q104 buys the full clustering).

    Scale shape: ONE shuffle-free moment scan — each batch emits per-
    label (count, Σvec) rows (labels × d floats, never row-count
    state); the driver folds labels × blocks rows, forms centroids,
    and the pairwise cosines are a labels² dense matmul at
    driver-trivial size.  Null label/vector rows drop.  Output:
    (label_a:int64, label_b:int64, n_a:int64, n_b:int64, cosine) for
    a < b, sorted.  SQL replay GENERATED by
    :func:`centroid_cosines_sql` (the q111 generate_subscripts
    pattern)."""
    import pandas as pd
    import pyarrow.compute as pc

    from .selection import round_half_away

    def partial(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t[label_col]), pc.is_valid(t[vec_col]))
        t = t.filter(keep)
        if not t.num_rows:
            return pa.table(
                {"label": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64()),
                 "s": pa.array([], type=pa.list_(pa.float64()))}
            )
        V = _as_matrix(t[vec_col]).astype(np.float64)
        lab = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, code = np.unique(lab, return_inverse=True)
        n = np.bincount(code, minlength=len(uniq))
        S = np.zeros((len(uniq), V.shape[1]), dtype=np.float64)
        np.add.at(S, code, V)
        return pa.table(
            {"label": pa.array(uniq.astype(np.int64)),
             "n": pa.array(n.astype(np.int64)),
             "s": pa.array(list(S), type=pa.list_(pa.float64()))}
        )

    acc_n: dict = {}
    acc_s: dict = {}
    for t in collect_tables(
        ds.map_batches(partial, batch_format="pyarrow"), drop_empty=True
    ):
        labs = t["label"].to_pylist()
        ns = t["n"].to_pylist()
        S = _as_matrix(t["s"])
        for i, (lb, nn) in enumerate(zip(labs, ns)):
            acc_n[lb] = acc_n.get(lb, 0) + int(nn)
            if lb in acc_s:
                acc_s[lb] = acc_s[lb] + S[i]
            else:
                acc_s[lb] = S[i].copy()
    labels = sorted(acc_n)
    if len(labels) < 2:
        return pd.DataFrame(
            {"label_a": pd.Series([], dtype=np.int64),
             "label_b": pd.Series([], dtype=np.int64),
             "n_a": pd.Series([], dtype=np.int64),
             "n_b": pd.Series([], dtype=np.int64),
             "cosine": pd.Series([], dtype=np.float64)}
        )
    C = np.stack([acc_s[lb] / acc_n[lb] for lb in labels])
    norms = np.sqrt((C * C).sum(axis=1))
    rows = []
    for i, la in enumerate(labels):
        for j in range(i + 1, len(labels)):
            lb = labels[j]
            denom = norms[i] * norms[j]
            cos = float(C[i] @ C[j] / denom) if denom > 0 else np.nan
            rows.append((la, lb, acc_n[la], acc_n[lb], cos))
    out = pd.DataFrame(
        rows, columns=["label_a", "label_b", "n_a", "n_b", "cosine"]
    )
    for c in ("label_a", "label_b", "n_a", "n_b"):
        out[c] = out[c].astype(np.int64)
    out["cosine"] = round_half_away(
        out["cosine"].to_numpy(dtype=np.float64), round_to
    )
    return out


def centroid_cosines_sql(
    *,
    table: str = "embeddings",
    vec_col: str = "embedding",
    label_col: str = "label",
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`label_centroid_cosines`
    (single-generator): per-dimension centroid means via
    generate_subscripts (the q111 pattern), a < b cosine join."""
    return f"""
        WITH e AS (
            SELECT {label_col} AS label,
                   generate_subscripts({vec_col}, 1) AS i,
                   unnest(CAST({vec_col} AS DOUBLE[])) AS v
            FROM {table}
            WHERE {label_col} IS NOT NULL AND {vec_col} IS NOT NULL
        ), m AS (
            SELECT label, i, sum(v) / count(*) AS mu
            FROM e GROUP BY label, i
        ), norms AS (
            SELECT label, sqrt(sum(mu * mu)) AS nrm FROM m GROUP BY label
        ), counts AS (
            SELECT {label_col} AS label, count(*) AS n
            FROM {table}
            WHERE {label_col} IS NOT NULL AND {vec_col} IS NOT NULL
            GROUP BY {label_col}
        ), p AS (
            SELECT a.label AS la, b.label AS lb,
                   sum(a.mu * b.mu) AS dot
            FROM m a JOIN m b ON a.i = b.i AND a.label < b.label
            GROUP BY 1, 2
        )
        SELECT CAST(p.la AS BIGINT) AS label_a,
               CAST(p.lb AS BIGINT) AS label_b,
               CAST(ca.n AS BIGINT) AS n_a,
               CAST(cb.n AS BIGINT) AS n_b,
               round(p.dot / (na.nrm * nb.nrm), {round_to}) AS cosine
        FROM p
        JOIN counts ca ON ca.label = p.la
        JOIN counts cb ON cb.label = p.lb
        JOIN norms na ON na.label = p.la
        JOIN norms nb ON nb.label = p.lb
    """


def truncation_audit(
    ds: rd.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: tuple = (16, 8, 4),
    stride: int = 7,
    num_parts: int = 32,
    round_to: int = 6,
) -> pd.DataFrame:
    """Matryoshka-style truncation-quality audit: how much does cosine
    similarity move when vectors are cut to their first ``d``
    coordinates?  Evaluated over the deterministic pair set
    (id, id + stride) — a fixed, layout-independent probe sample — per
    requested prefix dim: mean |cos_full − cos_d| and mean cos_d.  The
    "can we store/search at d/4?" screen run before committing to a
    truncated index.

    Scale shape: ONE id-hash cogroup pairs each vector with its
    id+stride partner (slim (key, side, vec) rows); cosines and the
    per-dim partials fold vectorized inside each partition; the driver
    sees |dims|-sized sums.  Zero-norm prefixes contribute cosine 0
    (both engines).  Output: (dim:int64, n_pairs:int64,
    mean_abs_delta:f64, mean_cos:f64) dim-descending, full dim first.
    SQL replay GENERATED by :func:`truncation_audit_sql` (list_slice +
    explicit double dot/norm arithmetic, identical zero-norm rule)."""
    from .collect import collect_tables
    from .selection import round_half_away
    from .similarity import _as_matrix

    def tag(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        out = pa.table(
            {
                "k": pa.array(np.concatenate([ids, ids - stride])),
                "side": pa.array(
                    np.concatenate(
                        [np.zeros(len(ids), np.int8), np.ones(len(ids), np.int8)]
                    )
                ),
                "v": pa.concat_arrays(
                    [t[vec_col].combine_chunks()] * 2
                ),
            }
        )
        from .dedup import add_key_partition

        return add_key_partition(out, "k", num_parts=num_parts)

    def fold(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        a = g.filter(pa.array(side == 0))
        b = g.filter(pa.array(side == 1))
        if not a.num_rows or not b.num_rows:
            return pa.table(
                {"dim": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64()),
                 "sum_abs_delta": pa.array([], type=pa.float64()),
                 "sum_cos": pa.array([], type=pa.float64())}
            )
        ka = a["k"].to_numpy(zero_copy_only=False)
        kb = b["k"].to_numpy(zero_copy_only=False)
        common, ia, ib = np.intersect1d(ka, kb, return_indices=True)
        if not len(common):
            return pa.table(
                {"dim": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64()),
                 "sum_abs_delta": pa.array([], type=pa.float64()),
                 "sum_cos": pa.array([], type=pa.float64())}
            )
        Va = _as_matrix(a["v"].take(pa.array(ia, type=pa.int64())))
        Vb = _as_matrix(b["v"].take(pa.array(ib, type=pa.int64())))

        def cos_at(d: int) -> np.ndarray:
            Pa, Pb = Va[:, :d], Vb[:, :d]
            dot = (Pa * Pb).sum(axis=1)
            na = np.sqrt((Pa * Pa).sum(axis=1))
            nb = np.sqrt((Pb * Pb).sum(axis=1))
            denom = na * nb
            out = np.zeros(len(dot), dtype=np.float64)
            nz = denom > 0
            out[nz] = dot[nz] / denom[nz]
            return out

        full = cos_at(Va.shape[1])
        rows_d, rows_n, rows_sd, rows_sc = [], [], [], []
        # dedupe the WHOLE dim tuple (full dim included): any repeated
        # value would double-emit rows; SQL uses list_distinct
        use_dims = tuple(
            dict.fromkeys((Va.shape[1],) + tuple(int(d) for d in dims))
        )
        for d in use_dims:
            c = cos_at(int(d))
            rows_d.append(int(d))
            rows_n.append(len(c))
            rows_sd.append(float(np.abs(full - c).sum()))
            rows_sc.append(float(c.sum()))
        return pa.table(
            {"dim": pa.array(rows_d, type=pa.int64()),
             "n": pa.array(rows_n, type=pa.int64()),
             "sum_abs_delta": pa.array(rows_sd),
             "sum_cos": pa.array(rows_sc)}
        )

    folded = (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(fold, batch_format="pyarrow")
    )
    acc: dict = {}
    for t in collect_tables(folded, drop_empty=True):
        for d, n, sd, sc in zip(
            t["dim"].to_pylist(), t["n"].to_pylist(),
            t["sum_abs_delta"].to_pylist(), t["sum_cos"].to_pylist(),
        ):
            cur = acc.setdefault(d, [0, 0.0, 0.0])
            cur[0] += n
            cur[1] += sd
            cur[2] += sc
    if not acc:
        return pd.DataFrame(
            {"dim": pd.Series([], dtype=np.int64),
             "n_pairs": pd.Series([], dtype=np.int64),
             "mean_abs_delta": pd.Series([], dtype=np.float64),
             "mean_cos": pd.Series([], dtype=np.float64)}
        )
    rows = [
        (d, n, sd / n, sc / n) for d, (n, sd, sc) in sorted(
            acc.items(), reverse=True
        )
    ]
    out = pd.DataFrame(
        rows, columns=["dim", "n_pairs", "mean_abs_delta", "mean_cos"]
    )
    out["dim"] = out["dim"].astype(np.int64)
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    out["mean_abs_delta"] = round_half_away(
        out["mean_abs_delta"].to_numpy(np.float64), round_to
    )
    out["mean_cos"] = round_half_away(
        out["mean_cos"].to_numpy(np.float64), round_to
    )
    return out


def truncation_audit_sql(
    *,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: tuple = (16, 8, 4),
    stride: int = 7,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`truncation_audit` (single-generator):
    identical pair set, double arithmetic, zero-norm rule."""

    def cos_expr(d_expr: str) -> str:
        return f"""(
            CASE WHEN sqrt(list_sum(list_transform(list_slice(a.v, 1, {d_expr}),
                                    x -> CAST(x AS DOUBLE) * x)))
                      * sqrt(list_sum(list_transform(list_slice(b.v, 1, {d_expr}),
                                    x -> CAST(x AS DOUBLE) * x))) > 0
                 THEN list_sum(list_transform(
                          list_zip(list_slice(a.v, 1, {d_expr}),
                                   list_slice(b.v, 1, {d_expr})),
                          p -> CAST(p[1] AS DOUBLE) * p[2]))
                      / (sqrt(list_sum(list_transform(list_slice(a.v, 1, {d_expr}),
                                    x -> CAST(x AS DOUBLE) * x)))
                         * sqrt(list_sum(list_transform(list_slice(b.v, 1, {d_expr}),
                                    x -> CAST(x AS DOUBLE) * x))))
                 ELSE 0.0 END)"""

    dim_rows = ", ".join(["(len(a.v))"] + [f"({int(d)})" for d in dims])
    return f"""
        WITH pairs AS (
            SELECT a.{vec_col} AS v, b.{vec_col} AS bv
            FROM {table} a JOIN {table} b
              ON b.{id_col} = a.{id_col} + {stride}
        ),
        expanded AS (
            SELECT a.v, a.bv, d.dim
            FROM (SELECT v, bv, len(v) AS full_d FROM pairs) a,
                 LATERAL (SELECT unnest(list_distinct([a.full_d, {", ".join(str(int(d)) for d in dims)}])) AS dim) d
        ),
        scored AS (
            SELECT dim,
                   {cos_expr("dim").replace("a.v", "v").replace("b.v", "bv")} AS c,
                   {cos_expr("len(v)").replace("a.v", "v").replace("b.v", "bv")} AS cf
            FROM expanded
        )
        SELECT CAST(dim AS BIGINT) AS dim,
               CAST(count(*) AS BIGINT) AS n_pairs,
               round(sum(abs(cf - c)) / count(*), {round_to}) AS mean_abs_delta,
               round(sum(c) / count(*), {round_to}) AS mean_cos
        FROM scored
        GROUP BY dim
        ORDER BY dim DESC
    """
