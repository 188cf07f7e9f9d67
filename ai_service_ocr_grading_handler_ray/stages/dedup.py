"""Deduplication operators for large-scale training-data pipelines.

The reference assumes records unique by (studentId, scanId, queId)
(``utils.py:123``); the north rule adds exact dedup by url, and a 100 TB
webtext engine needs the standard near-dup family.  All operators are
expressed Ray-Data-first:

- exact dedup      : hash column in map_batches → groupby(key) → first
- MinHash + LSH    : shingle→signature per batch → explode (band, bucket)
                     rows → groupby band bucket → candidate pairs →
                     Jaccard verify → connected components
- SimHash          : 64-bit fingerprint per batch → band buckets →
                     Hamming verify
- n-gram Jaccard   : exact pairwise verifier (used by both LSH paths)
- embedding cosine : hyperplane-LSH buckets → pairwise cosine verify

Scale notes (SURVEY.md §4): signatures/fingerprints are computed inside
``map_batches`` (vectorized numpy, no driver work); only the *candidate
pairs* — a tiny fraction of rows — are collected for union-find.  At
10^12 rows replace the driver union-find with iterative min-label
propagation over a pairs Dataset (same bucketing stages unchanged).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# --- deterministic 64-bit hashing ------------------------------------------


def _h64(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")


def _token_hashes(text: str, ngram: int = 3) -> np.ndarray:
    """Unique 64-bit hashes of word n-gram shingles (lowercased)."""
    words = text.lower().split()
    if not words:
        return np.empty(0, dtype=np.uint64)
    if len(words) < ngram:
        shingles = [" ".join(words)]
    else:
        shingles = [" ".join(words[i : i + ngram]) for i in range(len(words) - ngram + 1)]
    return np.unique(
        np.fromiter((_h64(s.encode()) for s in shingles), dtype=np.uint64, count=len(shingles))
    )


# --- exact dedup ------------------------------------------------------------


def add_content_hash(batch: pa.Table, col: str = "text", out: str = "content_hash") -> pa.Table:
    vals = batch[col].to_pylist()
    hashes = [hashlib.sha256((v or "").encode()).hexdigest() for v in vals]
    return batch.append_column(out, pa.array(hashes, type=pa.string()))


def exact_dedup(ds: rd.Dataset, key: str, order_by: str) -> rd.Dataset:
    """Keep the first row per ``key`` ordered by ``order_by`` (deterministic
    winner).  groupby = hash shuffle on key; per-group work is O(group)."""
    import pandas as pd

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order_by, kind="mergesort").head(1)

    return ds.groupby(key).map_groups(first, batch_format="pandas")


# --- MinHash ----------------------------------------------------------------

_MINHASH_K = 64
# multiply-shift permutation family on Z/2^64: x -> a*x + b (odd a),
# deterministic parameters derived from blake2b of the index
_A = np.array([_h64(f"minhash-a-{i}".encode()) | 1 for i in range(_MINHASH_K)], dtype=np.uint64)
_B = np.array([_h64(f"minhash-b-{i}".encode()) for i in range(_MINHASH_K)], dtype=np.uint64)


def minhash_signature(text: str, ngram: int = 3) -> np.ndarray:
    """k=64 MinHash signature (uint64) — fully vectorized numpy."""
    h = _token_hashes(text, ngram)
    if h.size == 0:
        return np.zeros(_MINHASH_K, dtype=np.uint64)
    with np.errstate(over="ignore"):
        m = _A[:, None] * h[None, :] + _B[:, None]  # wraps mod 2^64
    return m.min(axis=1)


def band_keys(sig: np.ndarray, bands: int = 16) -> list[int]:
    """Split the signature into ``bands`` bands; hash each band."""
    r = len(sig) // bands
    return [_h64(sig[j * r : (j + 1) * r].tobytes()) for j in range(bands)]


def minhash_band_rows(
    batch: pa.Table, id_col: str, text_col: str, ngram: int = 3, bands: int = 16
) -> pa.Table:
    """Explode each row into ``bands`` (band_id, bucket, id) rows — the
    shuffle-ready LSH table."""
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    out_ids: list = []
    out_band: list[int] = []
    out_bucket: list[int] = []
    for i, text in zip(ids, texts):
        sig = minhash_signature(text or "", ngram)
        for j, bk in enumerate(band_keys(sig, bands)):
            out_ids.append(i)
            out_band.append(j)
            out_bucket.append(bk)
    return pa.table(
        {
            "band_id": pa.array(out_band, type=pa.int32()),
            "bucket": pa.array(np.array(out_bucket, dtype=np.uint64).astype(np.int64)),
            id_col: pa.array(out_ids),
        }
    )


def ngram_jaccard(a: str, b: str, ngram: int = 3) -> float:
    """Exact word-n-gram Jaccard similarity (the LSH verifier)."""
    ha, hb = _token_hashes(a, ngram), _token_hashes(b, ngram)
    if ha.size == 0 and hb.size == 0:
        return 1.0
    inter = np.intersect1d(ha, hb, assume_unique=True).size
    union = ha.size + hb.size - inter
    return inter / union if union else 0.0


class _UnionFind:
    def __init__(self) -> None:
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x, p = p, self.parent[p]
        return x

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # smaller id wins → deterministic cluster representative
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            self.parent[hi] = lo


def candidate_pairs_from_buckets(bucket_table: pa.Table, id_col: str) -> set[tuple]:
    """(band_id, bucket) groups → unordered candidate id pairs.
    Buckets are capped at 256 ids (a degenerate bucket of near-identical
    boilerplate would otherwise produce O(n²) pairs — cap + log, SURVEY.md
    'no silent caps')."""
    import collections

    groups: dict = collections.defaultdict(list)
    for band, bucket, i in zip(
        bucket_table["band_id"].to_pylist(),
        bucket_table["bucket"].to_pylist(),
        bucket_table[id_col].to_pylist(),
    ):
        groups[(band, bucket)].append(i)
    pairs: set[tuple] = set()
    for ids in groups.values():
        ids = sorted(set(ids))[:256]
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                pairs.add((ids[x], ids[y]))
    return pairs


def minhash_lsh_clusters(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    bands: int = 16,
    threshold: float = 0.7,
) -> pa.Table:
    """Full MinHash-LSH near-dup pipeline → (id, cluster_id) table.

    Stages: per-batch signatures+banding (map_batches, distributed) →
    groupby-equivalent bucket collection → pair verify (exact Jaccard,
    distributed-ready; here driver-side over the small candidate set) →
    union-find.  cluster_id = min id in the cluster (deterministic)."""
    import ray

    def band_stage(batch: pa.Table) -> pa.Table:
        return minhash_band_rows(batch, id_col, text_col, ngram, bands)

    # band table is tiny relative to input (bands × ids, ints only)
    band_tbl = pa.concat_tables(
        ray.get(ds.map_batches(band_stage, batch_format="pyarrow").to_arrow_refs())
    )
    pairs = candidate_pairs_from_buckets(band_tbl, id_col)

    # fetch texts for verification (only ids appearing in candidate pairs)
    texts_by_id: dict = {}
    need = {i for p in pairs for i in p}
    all_ids: list = []
    for blk in ray.get(ds.select_columns([id_col, text_col]).to_arrow_refs()):
        blk_ids = blk[id_col].to_pylist()
        all_ids.extend(blk_ids)
        if need:
            for i, t in zip(blk_ids, blk[text_col].to_pylist()):
                if i in need:
                    texts_by_id[i] = t or ""

    uf = _UnionFind()
    for i in all_ids:
        uf.find(i)
    for a, b in sorted(pairs):
        if ngram_jaccard(texts_by_id[a], texts_by_id[b], ngram) >= threshold:
            uf.union(a, b)

    clusters = [uf.find(i) for i in all_ids]
    return pa.table({id_col: pa.array(all_ids), "cluster_id": pa.array(clusters)})


# --- SimHash ----------------------------------------------------------------


def simhash64(text: str, ngram: int = 2) -> int:
    """64-bit SimHash over word n-grams, unit weights."""
    h = _token_hashes(text, ngram)
    if h.size == 0:
        return 0
    bits = np.unpackbits(h.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    votes = bits.sum(axis=0) * 2 - h.size  # (+1/-1 sums per bit)
    fp_bits = (votes > 0).astype(np.uint8)
    return int.from_bytes(np.packbits(fp_bits, bitorder="little").tobytes(), "little")


def add_simhash(batch: pa.Table, text_col: str = "text", out: str = "simhash") -> pa.Table:
    fps = [simhash64(t or "") for t in batch[text_col].to_pylist()]
    return batch.append_column(out, pa.array(np.array(fps, dtype=np.uint64).astype(np.int64)))


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def simhash_clusters(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> pa.Table:
    """SimHash near-dup: fingerprint per batch → 4×16-bit band buckets →
    Hamming-verify candidates → union-find → (id, cluster_id)."""
    import ray

    fp_tbl = pa.concat_tables(
        ray.get(
            ds.map_batches(
                lambda b: add_simhash(b, text_col), batch_format="pyarrow"
            )
            .select_columns([id_col, "simhash"])
            .to_arrow_refs()
        )
    )
    ids = fp_tbl[id_col].to_pylist()
    fps = [f & 0xFFFFFFFFFFFFFFFF for f in fp_tbl["simhash"].to_pylist()]

    import collections

    buckets: dict = collections.defaultdict(list)
    for i, fp in zip(ids, fps):
        for band in range(4):
            key = (band, (fp >> (band * 16)) & 0xFFFF)
            buckets[key].append(i)
    fp_by_id = dict(zip(ids, fps))
    uf = _UnionFind()
    for i in ids:
        uf.find(i)
    pairs: set[tuple] = set()
    for members in buckets.values():
        members = sorted(set(members))[:256]
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                pairs.add((members[x], members[y]))
    for a, b in sorted(pairs):
        if hamming64(fp_by_id[a], fp_by_id[b]) <= max_hamming:
            uf.union(a, b)
    return pa.table({id_col: pa.array(ids), "cluster_id": pa.array([uf.find(i) for i in ids])})


# --- embedding cosine near-dup ----------------------------------------------

_HYPERPLANES_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _hyperplanes(dim: int, n: int = 16) -> np.ndarray:
    """Deterministic random hyperplanes (seeded; cached per shape)."""
    key = (dim, n)
    if key not in _HYPERPLANES_CACHE:
        rng = np.random.default_rng(20240101)
        _HYPERPLANES_CACHE[key] = rng.standard_normal((n, dim))
    return _HYPERPLANES_CACHE[key]


def embedding_cosine_clusters(
    ds: rd.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 12,
) -> pa.Table:
    """Embedding near-dup: sign-of-projection LSH buckets (map_batches) →
    pairwise cosine verify within buckets → union-find."""
    import collections

    import ray

    def bucket_stage(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        planes = _hyperplanes(unit.shape[1], n_planes)
        signs = (unit @ planes.T) > 0  # (n, planes)
        codes = (signs * (1 << np.arange(n_planes))).sum(axis=1)
        return pa.table(
            {
                id_col: batch[id_col],
                "bucket": pa.array(codes.astype(np.int64)),
                "_unit": pa.array(list(unit)),
            }
        )

    tbl = pa.concat_tables(
        ray.get(ds.map_batches(bucket_stage, batch_format="pyarrow").to_arrow_refs())
    )
    ids = tbl[id_col].to_pylist()
    units = {i: np.array(u) for i, u in zip(ids, tbl["_unit"].to_pylist())}
    buckets: dict = collections.defaultdict(list)
    for i, bk in zip(ids, tbl["bucket"].to_pylist()):
        buckets[bk].append(i)
    uf = _UnionFind()
    for i in ids:
        uf.find(i)
    for members in buckets.values():
        members = sorted(set(members))[:256]
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                a, b = members[x], members[y]
                if float(units[a] @ units[b]) >= threshold:
                    uf.union(a, b)
    return pa.table({id_col: pa.array(ids), "cluster_id": pa.array([uf.find(i) for i in ids])})


# --- distributed connected components (scale path) --------------------------


def propagate_min_labels(
    edges: pa.Table, ids: list, *, max_rounds: int = 20, num_partitions: int = 4
) -> pa.Table:
    """Iterative min-label propagation over an edge Dataset — the
    distributed replacement for driver union-find at 10^12-row scale
    (SURVEY.md §2.5 / ray_guide dedup notes).

    Each round: every edge sends each endpoint the other endpoint's
    current label; groupby(id).min merges.  Converges in O(component
    diameter) rounds; convergence detected via the (tiny) sum-of-labels
    aggregate.  ``edges`` has columns (a, b); ids is the full id universe.
    """
    import ray as _ray
    from ray.data.aggregate import Min as _Min

    if edges.num_rows == 0:
        return pa.table({"id": pa.array(ids), "cluster_id": pa.array(ids)})
    labels_tbl = pa.table({"id": pa.array(ids), "label": pa.array(ids)})

    empty = pa.table(
        {"id": pa.array([], type=labels_tbl["id"].type),
         "label": pa.array([], type=labels_tbl["label"].type)}
    )

    def _collect(ds: rd.Dataset) -> pa.Table:
        blocks = [b for b in _ray.get(ds.to_arrow_refs()) if b.num_rows]
        if not blocks:
            return empty
        return pa.concat_tables(
            [b.select(["id", "label"]).cast(empty.schema) for b in blocks]
        )

    prev_sig = None
    for _ in range(max_rounds):
        # one join per endpoint, each its own execution (a shared lazy
        # input feeding two hash-join operators trips Ray 2.49's join op)
        msgs: list[pa.Table] = [labels_tbl]
        for key, other in (("a", "b"), ("b", "a")):
            joined = rd.from_arrow(edges).join(
                rd.from_arrow(labels_tbl),
                join_type="inner",
                num_partitions=num_partitions,
                on=(key,),
                right_on=("id",),
            )
            sent = joined.map_batches(
                lambda t, other=other: pa.table({"id": t[other], "label": t["label"]}),
                batch_format="pyarrow",
            )
            msgs.append(_collect(sent))
        merged = (
            rd.from_arrow(pa.concat_tables(msgs))
            .groupby("id")
            .aggregate(_Min("label", alias_name="label"))
        )
        labels_tbl = _collect(merged)
        sig = pc.sum(labels_tbl["label"]).as_py()
        if sig == prev_sig:
            break
        prev_sig = sig
    return pa.table({"id": labels_tbl["id"], "cluster_id": labels_tbl["label"]})


def minhash_lsh_clusters_distributed(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    bands: int = 16,
    threshold: float = 0.7,
) -> pa.Table:
    """MinHash-LSH near-dup with the *distributed* connected-components
    finish (propagate_min_labels) instead of driver union-find.  Identical
    output to minhash_lsh_clusters; the shuffle-heavy verify step stays
    pairwise over the candidate set."""
    import ray as _ray

    def band_stage(batch: pa.Table) -> pa.Table:
        return minhash_band_rows(batch, id_col, text_col, ngram, bands)

    band_tbl = pa.concat_tables(
        _ray.get(ds.map_batches(band_stage, batch_format="pyarrow").to_arrow_refs())
    )
    pairs = candidate_pairs_from_buckets(band_tbl, id_col)

    texts_by_id: dict = {}
    need = {i for p in pairs for i in p}
    all_ids: list = []
    for blk in _ray.get(ds.select_columns([id_col, text_col]).to_arrow_refs()):
        blk_ids = blk[id_col].to_pylist()
        all_ids.extend(blk_ids)
        for i, t in zip(blk_ids, blk[text_col].to_pylist()):
            if i in need:
                texts_by_id[i] = t or ""

    verified = [
        (a, b)
        for a, b in sorted(pairs)
        if ngram_jaccard(texts_by_id[a], texts_by_id[b], ngram) >= threshold
    ]
    edges = pa.table(
        {
            "a": pa.array([p[0] for p in verified]),
            "b": pa.array([p[1] for p in verified]),
        }
    )
    out = propagate_min_labels(edges, all_ids)
    return pa.table({id_col: out["id"], "cluster_id": out["cluster_id"]})
