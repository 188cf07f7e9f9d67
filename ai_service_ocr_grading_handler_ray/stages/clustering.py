"""Distributed k-means (Lloyd's algorithm) over an embedding column.

The iterative clustering primitive large-scale curation pipelines need
(SemDeDup cluster assignment, IVF coarse quantizer training, cluster-
balanced sampling).  Reference parity note: the reference repo has no
clustering surface — this is part of the "operations a large-scale
training-data pipeline would need" mandate, built on the same embedding
tables as stages/similarity.py.

Scale shape — per Lloyd iteration:

- centroids broadcast ONCE via ``ray.put`` ((k, d) float64 — dimension-
  sized), never re-shipped per batch;
- ONE shuffle-free ``map_batches`` scan assigns each vector to its
  nearest centroid (vectorized ``argmin`` over a matmul Gram term) and
  emits ONE partial row per (batch, cluster): the per-cluster vector sum
  (stable-sort + ``add.reduceat``, no per-row loop) and count;
- the driver folds k × n_blocks partial rows (bounded by block count,
  never by corpus size) into new centroids — the same bounded-merge
  pattern as the brute-force kNN top-k finish.

Empty clusters keep their previous centroid (the deterministic
convention DuckDB's relational replay can coalesce).

Determinism: seeding is by smallest-id rows (order-independent), each
scan's partials are summed in cluster order per batch, and the driver
folds partials in sorted (block, cluster) order — bit-stable across runs
of the same input regardless of block layout, up to float addition
order across blocks (pinned by sorting partial rows before the fold).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .similarity import _as_matrix
from .collect import collect_tables


def smallest_k_vectors(
    ds: rd.Dataset, *, id_col: str, vec_col: str, k: int
) -> np.ndarray:
    """(k, d) float64 matrix of the vectors with the k SMALLEST ids —
    the deterministic, order-independent k-means seed.  Per-batch
    partial top-k (k smallest ids leave each task), driver merge sees
    k × n_blocks rows."""

    def partial(t: pa.Table) -> pa.Table:
        t = t.select([id_col, vec_col])
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if len(ids) > k:
            keep = np.argsort(ids, kind="stable")[:k]
            t = t.take(pa.array(np.sort(keep)))
        return t

    tbls = collect_tables(ds.map_batches(partial, batch_format="pyarrow"))
    if not tbls:
        raise ValueError("empty dataset: cannot seed centroids")
    merged = pa.concat_tables(tbls)
    ids = merged[id_col].to_numpy(zero_copy_only=False)
    if len(ids) < k:
        raise ValueError(f"only {len(ids)} rows for k={k} seed centroids")
    keep = np.argsort(ids, kind="stable")[:k]
    return _as_matrix(merged[vec_col])[keep]


def _assign(V: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Nearest-centroid index per row of V (squared L2, ties → lowest
    cluster index via argmin's first-minimum rule)."""
    # ||v-c||² = ||v||² - 2 v·c + ||c||²; the ||v||² term is constant
    # per row, so argmin over (||c||² - 2 v·c) matches exactly.
    d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (V @ C.T)
    return np.argmin(d2, axis=1)


def _partial_sums(V: np.ndarray, a: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-cluster vector sums + counts for one batch — stable sort by
    assignment then ``add.reduceat`` (vectorized; no per-row loop)."""
    counts = np.bincount(a, minlength=k).astype(np.int64)
    sums = np.zeros((k, V.shape[1]), dtype=np.float64)
    if len(a):
        order = np.argsort(a, kind="stable")
        present = np.flatnonzero(counts)
        starts = np.concatenate([[0], np.cumsum(counts[present])[:-1]])
        sums[present] = np.add.reduceat(V[order], starts, axis=0)
    return sums, counts


def kmeans_iterate(
    ds: rd.Dataset,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    n_iter: int = 1,
) -> np.ndarray:
    """Run ``n_iter`` Lloyd iterations from ``centroids``; returns the
    updated (k, d) float64 centroid matrix.  Each iteration is one
    broadcast + one shuffle-free scan + a bounded driver fold."""
    C = np.asarray(centroids, dtype=np.float64)
    k, d = C.shape
    for _ in range(n_iter):
        ref = ray.put(C)

        def partial(t: pa.Table, _ref=ref) -> pa.Table:
            Ci = ray.get(_ref)
            V = _as_matrix(t[vec_col])
            sums, counts = _partial_sums(V, _assign(V, Ci), k)
            # sparse partials: only clusters PRESENT in this batch leave
            # the task (at SemDeDup-scale k most clusters are absent
            # from any one batch; emitting all k rows per batch would
            # make the fold k × blocks dense)
            present = np.flatnonzero(counts)
            return pa.table(
                {
                    "cluster": pa.array(present.astype(np.int64)),
                    "n": pa.array(counts[present]),
                    "s": pa.array(list(sums[present]), type=pa.list_(pa.float64())),
                }
            )

        tbls = collect_tables(ds.map_batches(partial, batch_format="pyarrow"))
        if not tbls:  # empty input: no iteration can change C — stop
            break
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        # fold in sorted order so cross-block float addition order is
        # pinned (bit-stable across runs / block layouts)
        rows = pa.concat_tables(tbls)
        cl = rows["cluster"].to_numpy(zero_copy_only=False)
        n = rows["n"].to_numpy(zero_copy_only=False)
        S = _as_matrix(rows["s"])
        order = np.argsort(cl, kind="stable")
        cl_s = cl[order]
        present, first = np.unique(cl_s, return_index=True)
        sums[present] = np.add.reduceat(S[order], first, axis=0)
        counts[present] = np.add.reduceat(n[order], first)
        nonempty = counts > 0
        C = C.copy()
        C[nonempty] = sums[nonempty] / counts[nonempty, None]
    return C


def kmeans_fit(
    ds: rd.Dataset,
    *,
    k: int,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Seed by smallest-id rows, then ``n_iter`` Lloyd iterations."""
    seeds = smallest_k_vectors(ds, id_col=id_col, vec_col=vec_col, k=k)
    return kmeans_iterate(ds, seeds, vec_col=vec_col, n_iter=n_iter)


def assign_clusters(
    ds: rd.Dataset,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    out_col: str = "cluster",
    keep_cols: list[str] | None = None,
    dist_col: str | None = None,
) -> rd.Dataset:
    """Add the nearest-centroid index per row — one broadcast + one
    shuffle-free scan.  ``keep_cols`` prunes the output (e.g. drop the
    vector column once assigned); ``dist_col`` additionally emits the
    full squared L2 distance to the assigned centroid
    (|v|² + |c|² − 2 v·c — the expansion a SQL replay over
    ``list_inner_product`` computes term-for-term)."""
    C = np.asarray(centroids, dtype=np.float64)
    ref = ray.put(C)

    def fn(t: pa.Table) -> pa.Table:
        Ci = ray.get(ref)
        V = _as_matrix(t[vec_col])
        d2p = (Ci * Ci).sum(axis=1)[None, :] - 2.0 * (V @ Ci.T)
        a = np.argmin(d2p, axis=1)
        if keep_cols is not None:
            t = t.select(keep_cols)
        t = t.append_column(out_col, pa.array(a, type=pa.int64()))
        if dist_col is not None:
            d2 = (V * V).sum(axis=1) + d2p[np.arange(len(a)), a]
            t = t.append_column(dist_col, pa.array(d2, type=pa.float64()))
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


def cluster_prune(
    ds: rd.Dataset,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_frac=None,
    out_col: str = "cluster",
    bins: int = 1024,
    collect_cap: int = 100_000,
) -> rd.Dataset:
    """Cluster-based density pruning (the SemDeDup / SSL-prototypes
    selection shape, Sorscher et al. 2022 / Abbas et al. 2023): assign
    every vector to its nearest centroid, then KEEP only the rows whose
    squared distance is ≤ the cluster's exact ``ceil(keep_frac · n)``-th
    smallest distance — the most prototypical ``keep_frac`` of every
    cluster, ties at the threshold value all kept (a multiset property,
    deterministic under any block layout).

    Plan: one assignment scan (centroid broadcast; the slim
    (id, cluster, d²) projection materializes ONCE — the quantile
    refinement scans re-read it, not the embedding table), per-cluster
    thresholds via the distributed histogram-refinement quickselect
    (``stages.selection.exact_group_quantiles`` — no sort, driver holds
    bins-sized counts), then a shuffle-free broadcast-threshold filter.

    Returns (id_col, out_col) for the kept rows."""
    from fractions import Fraction

    from .selection import exact_group_quantiles

    if keep_frac is None:
        keep_frac = Fraction(1, 2)
    slim = assign_clusters(
        ds, centroids, vec_col=vec_col, out_col=out_col,
        keep_cols=[id_col], dist_col="_d2",
    ).materialize()
    thr = exact_group_quantiles(
        slim, "_d2", out_col, [keep_frac], bins=bins, collect_cap=collect_cap
    )
    ks = np.array(sorted(thr), dtype=np.int64)
    vs = np.array([thr[g][0] for g in ks], dtype=np.float64)

    def filt(t: pa.Table) -> pa.Table:
        cl = t[out_col].to_numpy(zero_copy_only=False)
        d2 = t["_d2"].to_numpy(zero_copy_only=False)
        keep = d2 <= vs[np.searchsorted(ks, cl)]
        return t.filter(pa.array(keep)).drop_columns(["_d2"])

    return slim.map_batches(filt, batch_format="pyarrow")


def kcenter_coreset(
    ds: rd.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    local_cap: int = 50_000_000,
) -> pd.DataFrame:
    """Greedy k-center coreset (Gonzalez's 2-approximation of the
    k-center cover): pick the min-id vector, then k−1 times the point
    FARTHEST from its nearest already-picked center — the
    maximally-diverse deterministic sample a curation pipeline uses to
    seed clustering or to spot-check corpus coverage.  The final
    ``radius`` is the corpus' covering radius under the selection (every
    point lies within ``radius`` of some center — at most 2× the
    optimal k-center radius).

    Scale shape: the centers matrix (k × d) lives on the driver and is
    broadcast per round via ``ray.put``; each of the k rounds is ONE
    shuffle-free scan of per-batch argmax partials (one row per batch
    leaves each task).  Euclidean on raw vectors.  Ties (equal max
    distance) break to the smaller id, so the selection is layout- and
    cluster-size-independent.  Iterative → no SQL oracle (driver
    records the rows-only check); invariants are pytest-verified.

    Output: one row per center in pick order — (rank:int64, id,
    radius_before:f64 — distance of this pick from the previous
    centers; the NEXT round's covering radius) with radius_before = 0
    for the seed.

    Adaptive execution (the broadcast-vs-shuffle trade): when the slim
    (id, vec) matrix fits ``local_cap`` float64 cells, collect it once
    and run the k greedy rounds driver-local — identical output, and
    the k per-round Dataset executions (a fixed ~0.4 s scheduling floor
    each) collapse into one scan.  Above the cap, the distributed
    per-round path keeps every task bounded."""
    import ray as _ray

    # k rounds each re-scan the source: pin the slim (id, vec)
    # projection once so rounds read materialized blocks
    ds = ds.select_columns([id_col, vec_col]).materialize()

    first = ds.take_batch(1, batch_format="pyarrow") if ds.count() else None
    if first is not None:
        dim = len(first[vec_col][0])
        if ds.count() * dim <= local_cap:
            tbls = collect_tables(ds, drop_empty=True)
            merged = pa.concat_tables([t.cast(tbls[0].schema) for t in tbls])
            ids = merged[id_col].to_numpy(zero_copy_only=False)
            V = _as_matrix(merged[vec_col])
            j = int(np.argmin(ids))
            picked = [(0, ids[j], 0.0)]
            # same gram-trick float ops as the distributed path, so
            # both paths pick identical centers
            vv = (V * V).sum(axis=1)

            def d2_to(c: np.ndarray) -> np.ndarray:
                return vv - 2.0 * (V @ c) + (c * c).sum()

            d2 = d2_to(V[j])
            for r in range(1, k):
                order = np.lexsort((ids, -d2))
                jj = order[0]
                if d2[jj] <= 0.0:
                    break
                picked.append((r, ids[jj], float(np.sqrt(d2[jj]))))
                d2 = np.minimum(d2, d2_to(V[jj]))
            out = pd.DataFrame(
                picked, columns=["rank", "id", "radius_before"]
            )
            out["rank"] = out["rank"].astype(np.int64)
            return out

    def seed_partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if not len(ids):
            return pa.table({id_col: pa.array([], type=t[id_col].type),
                             vec_col: t[vec_col].slice(0, 0)})
        j = int(np.argmin(ids))
        return t.select([id_col, vec_col]).take(pa.array([j]))

    tbls = collect_tables(
        ds.map_batches(seed_partial, batch_format="pyarrow"), drop_empty=True
    )
    if not tbls:
        return pd.DataFrame(
            {"rank": pd.Series([], dtype=np.int64),
             "id": pd.Series([], dtype=object),
             "radius_before": pd.Series([], dtype=np.float64)}
        )
    merged = pa.concat_tables([t.cast(tbls[0].schema) for t in tbls])
    ids0 = merged[id_col].to_numpy(zero_copy_only=False)
    j0 = int(np.argmin(ids0))
    centers = [_as_matrix(merged[vec_col])[j0]]
    picked = [(0, ids0[j0], 0.0)]

    for r in range(1, k):
        C = np.asarray(centers, dtype=np.float64)
        ref = _ray.put(C)

        def far_partial(t: pa.Table, _ref=ref) -> pa.Table:
            from .collect import cached_ref

            Cm = cached_ref(_ref)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            if not len(ids):
                return pa.table(
                    {"id": pa.array([], type=t[id_col].type),
                     "d": pa.array([], type=pa.float64())}
                )
            V = _as_matrix(t[vec_col])
            # ||v-c||^2 via the gram trick, min over centers
            d2 = (
                (V * V).sum(axis=1)[:, None]
                - 2.0 * (V @ Cm.T)
                + (Cm * Cm).sum(axis=1)[None, :]
            ).min(axis=1)
            # farthest point, tie -> smaller id (stable selection);
            # the winning VECTOR rides along so the round needs no
            # second fetch scan
            order = np.lexsort((ids, -d2))
            j = order[0]
            return pa.table(
                {"id": pa.array([ids[j]], type=t[id_col].type),
                 "d": pa.array([float(d2[j])]),
                 "v": t[vec_col].take(pa.array([int(j)], type=pa.int64()))}
            )

        best_id, best_d, best_vec = None, -1.0, None
        for t in collect_tables(
            ds.map_batches(far_partial, batch_format="pyarrow"),
            drop_empty=True,
        ):
            vs = _as_matrix(t["v"])
            for i_, (i2, d_) in enumerate(
                zip(t["id"].to_pylist(), t["d"].to_pylist())
            ):
                if d_ > best_d or (
                    d_ == best_d and (best_id is None or i2 < best_id)
                ):
                    best_id, best_d, best_vec = i2, d_, vs[i_]
        if best_id is None or best_d <= 0.0:
            break  # fewer distinct points than k
        centers.append(best_vec)
        picked.append((r, best_id, float(np.sqrt(best_d))))

    out = pd.DataFrame(picked, columns=["rank", "id", "radius_before"])
    out["rank"] = out["rank"].astype(np.int64)
    return out
