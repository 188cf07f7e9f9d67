"""Similarity search over an embedding column (list<float>).

Two paths (SURVEY.md / task brief "similarity search"):

- brute-force cosine top-k: the exact baseline.  The query matrix is
  broadcast once (``ray.put``); each ``map_batches`` task computes a numpy
  matmul against its batch and emits only its local top-k rows per query
  (partial top-k combiner), so the shuffle/merge step sees k × n_batches
  rows instead of the full table.
- LSH-bucketed (hyperplane signs): the approximate scale path — probe only
  buckets within ``probe_hamming`` of the query's code.

Determinism: ties on score broken by ascending id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from .dedup import _hyperplanes
from .collect import collect_tables


def _as_matrix(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix via the Arrow values
    buffer (zero-copy reshape; ~90× faster than to_pylist)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
        offs = np.asarray(col.offsets)
        if len(col) and np.all(np.diff(offs) == offs[1] - offs[0]):
            vals = np.asarray(col.values, dtype=np.float64)
            return vals[offs[0] : offs[-1]].reshape(len(col), offs[1] - offs[0])
    if pa.types.is_fixed_size_list(col.type):
        return np.asarray(col.values, dtype=np.float64).reshape(
            len(col), col.type.list_size
        )
    return np.array(col.to_pylist(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """Actor-pool/`map_batches` stage: local cosine top-k per query.

    The query matrix arrives as an object-store ref — fetched once per
    actor in ``__init__``, not re-shipped per batch."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str) -> None:
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.q = _normalize(np.asarray(q, dtype=np.float64))  # (nq, d)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(_as_matrix(batch[self.vec_col]))  # (n, d)
        ids = np.asarray(batch[self.id_col].to_pylist())
        sims = self.q @ vecs.T  # (nq, n)
        out_q: list[int] = []
        out_id: list = []
        out_score: list[float] = []
        k = min(self.k, sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            # deterministic partial top-k: sort by (-score, id)
            order = np.lexsort((ids, -row))[:k]
            out_q.extend([qi] * len(order))
            out_id.extend(ids[order].tolist())
            out_score.extend(row[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int32()),
                self.id_col: pa.array(out_id),
                "score": pa.array(out_score, type=pa.float64()),
            }
        )


def knn_brute_force(
    ds: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Exact cosine top-k for each query row → (query_id, id, score).

    Partial top-k inside map_batches; the global merge handles only
    nq × k × n_blocks candidate rows on the driver (tiny).  Runs as
    stateless tasks: query-matrix "state" is one plasma ref fetched
    per batch (shared-memory, effectively free), and tasks avoid the
    autoscaling-pool spin-up that dominated short jobs (BASELINE.md)."""
    queries_ref = ray.put(np.asarray(queries, dtype=np.float64))

    def partial_fn(batch: pa.Table) -> pa.Table:
        worker = BruteForceTopK(queries_ref, k, id_col, vec_col)
        return worker(batch)

    partial = ds.map_batches(partial_fn, batch_format="pyarrow")
    cand = pa.concat_tables(collect_tables(partial, drop_empty=False))
    # global merge: per query, exact top-k with (-score, id) order
    import pandas as pd

    df = cand.to_pandas()
    df = df.sort_values(["query_id", "score", id_col], ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def lsh_code(vectors: np.ndarray, n_planes: int = 12) -> np.ndarray:
    unit = _normalize(np.asarray(vectors, dtype=np.float64))
    planes = _hyperplanes(unit.shape[1], n_planes)
    signs = (unit @ planes.T) > 0
    return (signs * (1 << np.arange(n_planes))).sum(axis=1).astype(np.int64)


def knn_lsh(
    ds: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    probe_hamming: int = 1,
) -> pa.Table:
    """Approximate top-k: probe only LSH buckets whose hyperplane code is
    within ``probe_hamming`` bits of the query's code.  Same output shape
    as knn_brute_force; recall measured in tests."""
    queries = np.asarray(queries, dtype=np.float64)
    q_codes = lsh_code(queries, n_planes)
    probe_sets: list[set[int]] = []
    for code in q_codes:
        codes = {int(code)}
        if probe_hamming >= 1:
            codes |= {int(code) ^ (1 << b) for b in range(n_planes)}
        if probe_hamming >= 2:
            codes |= {
                int(code) ^ (1 << b1) ^ (1 << b2)
                for b1 in range(n_planes)
                for b2 in range(b1 + 1, n_planes)
            }
        probe_sets.append(codes)
    all_probe = set().union(*probe_sets) if probe_sets else set()

    q_unit = _normalize(queries)
    probe_ref = ray.put((q_unit, [np.array(sorted(s)) for s in probe_sets],
                         np.array(sorted(all_probe))))

    def partial_topk(batch: pa.Table) -> pa.Table:
        """Filter to probed buckets and emit each query's LOCAL top-k —
        the driver merge sees only k × n_batches rows, never the probed
        rows themselves (scale fix: round-1 collected every probed row)."""
        qm, psets, probe_all = ray.get(probe_ref)
        vecs = _as_matrix(batch[vec_col])
        codes = lsh_code(vecs, n_planes)
        mask = np.isin(codes, probe_all)
        if not mask.any():
            return pa.table(
                {"query_id": pa.array([], type=pa.int32()),
                 id_col: pa.array([], type=batch[id_col].type),
                 "score": pa.array([], type=pa.float64())}
            )
        vecs = _normalize(vecs[mask])
        ids = np.asarray(batch[id_col].to_pylist())[mask]
        codes = codes[mask]
        out_q: list[int] = []
        out_id: list = []
        out_s: list[float] = []
        for qi in range(qm.shape[0]):
            qmask = np.isin(codes, psets[qi])
            if not qmask.any():
                continue
            sims = vecs[qmask] @ qm[qi]
            sub_ids = ids[qmask]
            order = np.lexsort((sub_ids, -sims))[: min(k, sims.size)]
            out_q.extend([qi] * len(order))
            out_id.extend(sub_ids[order].tolist())
            out_s.extend(sims[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int32()),
                id_col: pa.array(out_id, type=batch[id_col].type),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    cand_blocks = [
        b
        for b in collect_tables(
            ds.map_batches(partial_topk, batch_format="pyarrow"), drop_empty=False)
        if b.num_rows
    ]
    if not cand_blocks:
        return pa.table(
            {"query_id": pa.array([], type=pa.int32()),
             id_col: pa.array([], type=pa.int64()),
             "score": pa.array([], type=pa.float64())}
        )
    cand = pa.concat_tables([b.cast(cand_blocks[0].schema) for b in cand_blocks])
    import pandas as pd

    df = cand.to_pandas()
    df = df.sort_values(["query_id", "score", id_col], ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


# --- IVF (inverted-file) approximate search ---------------------------------


def kmeans_centroids(
    vectors: np.ndarray, k: int, iters: int = 10, seed: int = 20240101
) -> np.ndarray:
    """Deterministic Lloyd's k-means on unit vectors (fixed seed/iters;
    empty clusters re-seeded deterministically)."""
    unit = _normalize(np.asarray(vectors, dtype=np.float64))
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(unit), size=min(k, len(unit)), replace=False)
    cents = unit[np.sort(idx)].copy()
    for _ in range(iters):
        assign = (unit @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = unit[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
            else:  # re-seed an empty cluster with the worst-assigned vector
                worst = (unit @ cents.T).max(axis=1).argmin()
                cents[c] = unit[worst]
        cents = _normalize(cents)
    return cents


def build_ivf_assignments(
    ds: rd.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    train_sample: int = 2048,
) -> tuple[np.ndarray, rd.Dataset]:
    """Train centroids on a deterministic seeded hash-sample of the rows
    (a head sample would bias the lists on sorted inputs), then assign
    every row to its nearest list inside map_batches.  Returns
    (centroids, ds+ivf_list)."""
    from .sampling import hash_bucket_filter

    n = ds.count()  # parquet metadata — no scan
    # md5-window width sized from the row count (with headroom so the
    # sample can't come up short); membership depends only on the id,
    # never on input order — a sorted input cannot bias the lists
    width = max(1, -(-65536 * train_sample * 12 // (max(n, 1) * 10)))
    if n <= train_sample or width >= 65536:
        # window covers the whole 4-hex space — take everything (a capped
        # 5-char "10000" hi would lexicographically admit only ~1/16 of
        # 32-char digests)
        sampled = ds
    else:
        sampled = ds.map_batches(
            lambda t: hash_bucket_filter(t, id_col, "0", format(width, "04x")),
            batch_format="pyarrow",
        )
    # sort the sample by id so the training matrix (and therefore k-means
    # seeding) is identical no matter how the input rows were ordered
    tbl = pa.concat_tables(
        [
            b.select([id_col, vec_col])
            for b in collect_tables(sampled, drop_empty=False)
            if b.num_rows
        ]
    )
    tbl = tbl.take(pa.compute.sort_indices(tbl[id_col]))
    train = _as_matrix(tbl[vec_col])[:train_sample]
    cents = kmeans_centroids(train, n_lists)
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        unit = _normalize(_as_matrix(batch[vec_col]))
        lists = (unit @ c.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("ivf_list", pa.array(lists))

    return cents, ds.map_batches(assign, batch_format="pyarrow")


def knn_ivf(
    ds: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 4,
) -> pa.Table:
    """IVF approximate top-k: probe only the ``n_probe`` nearest inverted
    lists per query.  Same output shape as knn_brute_force."""
    queries = np.asarray(queries, dtype=np.float64)
    cents, assigned = build_ivf_assignments(
        ds, id_col=id_col, vec_col=vec_col, n_lists=n_lists
    )
    q_unit = _normalize(queries)
    probe_lists = np.argsort(-(q_unit @ cents.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    probe_ref = ray.put((q_unit, probe_lists, np.unique(probe_lists)))

    def partial_topk(batch: pa.Table) -> pa.Table:
        """Per-batch local top-k over probed lists — only k × n_batches
        candidate rows reach the driver merge (scale fix: round-1
        collected every probed-list row)."""
        qm, plists, wanted = ray.get(probe_ref)
        lists = np.asarray(batch["ivf_list"].to_pylist())
        mask = np.isin(lists, wanted)
        if not mask.any():
            return pa.table(
                {"query_id": pa.array([], type=pa.int32()),
                 id_col: pa.array([], type=batch[id_col].type),
                 "score": pa.array([], type=pa.float64())}
            )
        vecs = _normalize(_as_matrix(batch[vec_col])[mask])
        ids = np.asarray(batch[id_col].to_pylist())[mask]
        lists = lists[mask]
        out_q: list[int] = []
        out_id: list = []
        out_s: list[float] = []
        for qi in range(qm.shape[0]):
            qmask = np.isin(lists, plists[qi])
            if not qmask.any():
                continue
            sims = vecs[qmask] @ qm[qi]
            sub = ids[qmask]
            order = np.lexsort((sub, -sims))[: min(k, sims.size)]
            out_q.extend([qi] * len(order))
            out_id.extend(sub[order].tolist())
            out_s.extend(sims[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int32()),
                id_col: pa.array(out_id, type=batch[id_col].type),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )

    cand_blocks = [
        b
        for b in collect_tables(
            assigned.map_batches(partial_topk, batch_format="pyarrow"), drop_empty=False)
        if b.num_rows
    ]
    if not cand_blocks:
        return pa.table(
            {"query_id": pa.array([], type=pa.int32()),
             id_col: pa.array([], type=pa.int64()),
             "score": pa.array([], type=pa.float64())}
        )
    cand = pa.concat_tables([b.cast(cand_blocks[0].schema) for b in cand_blocks])
    import pandas as pd

    df = cand.to_pandas()
    df = df.sort_values(["query_id", "score", id_col], ascending=[True, False, True])
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)
