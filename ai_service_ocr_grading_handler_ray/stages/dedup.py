"""Deduplication operators for large-scale training-data pipelines.

The reference assumes records unique by (studentId, scanId, queId)
(``utils.py:123``); the north rule adds exact dedup by url, and a 100 TB
webtext engine needs the standard near-dup family.  All operators are
expressed Ray-Data-first:

- exact dedup      : hash column in map_batches → groupby(key) → first
- MinHash + LSH    : shingle→signature per batch → explode (band, bucket)
                     rows → groupby(band, bucket).map_groups → candidate
                     pair Dataset → Jaccard verify by joining texts onto
                     pairs → connected components
- SimHash          : 64-bit fingerprint per batch → band-bucket groupby →
                     Hamming verify inside the group (fingerprints travel
                     with the rows — no second pass over the data)
- n-gram Jaccard   : exact pairwise verifier (used by the MinHash path)
- embedding cosine : hyperplane-LSH bucket groupby → pairwise cosine
                     verify inside the group (unit vectors travel with
                     the rows)

Scale shape (SURVEY.md §4): every stage up to the final edge list is a
``map_batches`` / ``groupby.map_groups`` / ``join`` over Datasets — the
driver only ever holds (a) the verified edge list, a tiny fraction of
rows, and (b) the final (id, cluster_id) assignment, which is the output
itself.  Degenerate buckets (near-identical boilerplate) are capped at
``PAIR_CAP`` ids before pair expansion to bound the O(n²) blowup; hits
are logged, not silent.  The connected-components finish is driver
union-find over the tiny edge list by default, or distributed min-label
propagation (``propagate_min_labels``) on the ``_distributed`` path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
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


def add_key_partition(
    batch: pa.Table, key: str, *, num_parts: int = 32, out: str = "_part"
) -> pa.Table:
    """Append hash(key) % num_parts — the coarse co-location column used
    by every high-cardinality groupby here (one Ray group per partition,
    vectorized pandas inside, instead of millions of tiny Ray groups)."""
    col = batch[key]
    if pa.types.is_integer(col.type):
        part = (
            np.abs(col.to_numpy(zero_copy_only=False).astype(np.int64)) % num_parts
        ).astype(np.int32)
        arr = pa.array(part)
    else:
        arr = pa.array(
            [
                int.from_bytes(
                    hashlib.blake2b(str(v).encode(), digest_size=2).digest(), "big"
                )
                % num_parts
                for v in col.to_pylist()
            ],
            type=pa.int32(),
        )
    return batch.append_column(out, arr)


def exact_dedup(
    ds: rd.Dataset, key: str, order_by: str | list[str], *, num_parts: int = 32
) -> rd.Dataset:
    """Keep the first row per ``key`` ordered by ``order_by`` (one column
    or a tie-break list; deterministic winner).  One hash shuffle on a
    salted partition of ``key``; inside each partition a stable sort +
    ``drop_duplicates(keep='first')`` handles every key vectorized (no
    per-key group overhead)."""
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(order_cols, kind="mergesort")
            .drop_duplicates(subset=[key], keep="first")
            .drop(columns=["_part"])
        )

    return (
        ds.map_batches(
            lambda t: add_key_partition(t, key, num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(first, batch_format="pandas")
    )


# --- MinHash ----------------------------------------------------------------

_MINHASH_K = 64
# multiply-shift permutation family on Z/2^64: x -> a*x + b (odd a),
# deterministic parameters derived from blake2b of the index
_A = np.array([_h64(f"minhash-a-{i}".encode()) | 1 for i in range(_MINHASH_K)], dtype=np.uint64)
_B = np.array([_h64(f"minhash-b-{i}".encode()) for i in range(_MINHASH_K)], dtype=np.uint64)

# degenerate-bucket cap before pair expansion (see module docstring)
PAIR_CAP = 256


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


# --- distributed LSH plumbing (shared by MinHash / SimHash / embedding) -----


def _pairs_from_sorted_ids(ids: list) -> tuple[list, list]:
    out_a: list = []
    out_b: list = []
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            out_a.append(ids[x])
            out_b.append(ids[y])
    return out_a, out_b


# The per-bucket work is tiny, so one Ray group per LSH bucket would pay
# Ray's per-group slicing overhead millions of times.  Instead buckets are
# salted into NUM_GROUP_PARTS coarse partitions (one Ray group each, still
# a hash shuffle → distributed + memory-bounded) and a vectorized pandas
# groupby walks the buckets inside each partition.
NUM_GROUP_PARTS = 32


def raw_candidate_pairs(
    band_ds: rd.Dataset, id_col: str, *, cap: int = PAIR_CAP,
    num_parts: int = NUM_GROUP_PARTS,
) -> rd.Dataset:
    """(band_id, bucket, id) Dataset → candidate-pair Dataset (a, b),
    a < b, possibly with cross-band duplicates.  Pair generation runs
    inside a groupby over salted bucket partitions — the band table never
    touches the driver."""

    def add_part(t: pa.Table) -> pa.Table:
        return add_key_partition(t, "bucket", num_parts=num_parts)

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a: list = []
        out_b: list = []
        for _, sub in g.groupby(["band_id", "bucket"], sort=False):
            ids = sorted(sub[id_col].unique().tolist())
            if len(ids) < 2:
                continue
            if len(ids) > cap:
                print(
                    f"[dedup] bucket cap: {len(ids)} ids in one LSH bucket, "
                    f"keeping first {cap} (sorted) before pair expansion"
                )
                ids = ids[:cap]
            a, b = _pairs_from_sorted_ids(ids)
            out_a.extend(a)
            out_b.extend(b)
        dtype = g[id_col].dtype
        return pd.DataFrame(
            {"a": pd.Series(out_a, dtype=dtype), "b": pd.Series(out_b, dtype=dtype)}
        )

    return (
        band_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(emit_pairs, batch_format="pandas")
    )


def dedupe_pairs(pairs: rd.Dataset, *, num_parts: int = NUM_GROUP_PARTS) -> rd.Dataset:
    """One copy per (a, b) — the same pair surfaces once per agreeing
    band.  Salted-partition dedup: all copies of a pair share ``a``, so
    one shuffle on hash(a) co-locates them and a vectorized
    ``drop_duplicates`` handles every pair (a two-column Ray
    sort-aggregate measured ~30× slower at 500k pair rows)."""

    def dd(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"]).drop(columns=["_part"])

    return (
        pairs.map_batches(
            lambda t: add_key_partition(t, "a", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(dd, batch_format="pandas")
    )


def candidate_pairs_dataset(
    band_ds: rd.Dataset, id_col: str, *, cap: int = PAIR_CAP,
    num_parts: int = NUM_GROUP_PARTS,
) -> rd.Dataset:
    """Deduplicated candidate-pair Dataset (a, b) from a band table."""
    return dedupe_pairs(
        raw_candidate_pairs(band_ds, id_col, cap=cap, num_parts=num_parts)
    )


def verify_pairs_jaccard(
    pairs: rd.Dataset,
    ds: rd.Dataset,
    *,
    id_col: str,
    text_col: str,
    ngram: int = 3,
    threshold: float = 0.7,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Attach both texts to each candidate pair via two hash joins, then
    Jaccard-verify inside map_batches → verified edge Dataset (a, b).

    The joins ship each text only to the pairs that need it — no
    driver-side texts_by_id dict.  The first join is materialized before
    the second is built: Ray 2.49's join operator fails when one lazy
    dataset feeds two joins in a single DAG."""
    if num_partitions is None:
        import ray

        try:
            cpus = int(ray.cluster_resources().get("CPU", 8))
        except Exception:
            cpus = 8
        num_partitions = max(2, min(8, cpus // 4))
    texts = ds.select_columns([id_col, text_col])
    ta = texts.map_batches(
        lambda t: pa.table({"_ida": t[id_col], "_ta": t[text_col]}),
        batch_format="pyarrow",
    )
    j1 = pairs.join(
        ta, join_type="inner", num_partitions=num_partitions, on=("a",), right_on=("_ida",)
    ).materialize()
    tb = texts.map_batches(
        lambda t: pa.table({"_idb": t[id_col], "_tb": t[text_col]}),
        batch_format="pyarrow",
    )
    j2 = j1.join(
        tb, join_type="inner", num_partitions=num_partitions, on=("b",), right_on=("_idb",)
    )

    def verify(t: pa.Table) -> pa.Table:
        keep = [
            ngram_jaccard(x or "", y or "", ngram) >= threshold
            for x, y in zip(t["_ta"].to_pylist(), t["_tb"].to_pylist())
        ]
        return t.select(["a", "b"]).filter(pa.array(keep, type=pa.bool_()))

    return j2.map_batches(verify, batch_format="pyarrow")


def _collect_ids(ds: rd.Dataset, id_col: str) -> list:
    """Pull only the id column (the id universe is the same size as the
    final (id, cluster) output, so this is not a data materialization)."""
    import ray

    blocks = ray.get(ds.select_columns([id_col]).to_arrow_refs())
    out: list = []
    for blk in blocks:
        out.extend(blk[id_col].to_pylist())
    return out


def _clusters_from_edges(edges: pa.Table, ids: list, id_col: str) -> pa.Table:
    uf = _UnionFind()
    for i in ids:
        uf.find(i)
    for a, b in sorted(zip(edges["a"].to_pylist(), edges["b"].to_pylist())):
        uf.union(a, b)
    return pa.table(
        {id_col: pa.array(ids), "cluster_id": pa.array([uf.find(i) for i in ids])}
    )


# below this many candidate pairs the broadcast-verify branch wins (its
# driver memory is bounded by the PAIR count, never the dataset size);
# above it the shuffled join-verify branch keeps every task bounded
SMALL_PAIR_LIMIT = 100_000


def minhash_lsh_edges(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    bands: int = 16,
    threshold: float = 0.7,
) -> pa.Table:
    """Distributed MinHash-LSH: signatures+banding (map_batches) → pair
    generation (groupby over salted bucket partitions) → Jaccard verify →
    the verified edge table (the only driver pull).

    Verify strategy is adaptive, like a broadcast-vs-shuffle join: with
    few candidate pairs, the needed texts (≤ 2×pairs rows) are fetched by
    a distributed filter and verified on the driver; with many, texts are
    joined onto pairs and verified inside map_batches.  Both branches keep
    driver memory bounded by the pair count."""
    import ray

    def band_stage(batch: pa.Table) -> pa.Table:
        return minhash_band_rows(batch, id_col, text_col, ngram, bands)

    id_type = pa.int64()
    for f in ds.schema().base_schema:
        if f.name == id_col:
            id_type = f.type
    empty = pa.table({"a": pa.array([], type=id_type), "b": pa.array([], type=id_type)})

    band_ds = ds.map_batches(band_stage, batch_format="pyarrow")
    pairs_raw = raw_candidate_pairs(band_ds, id_col).materialize()
    n_raw = pairs_raw.count()
    if n_raw == 0:
        return empty

    if n_raw <= SMALL_PAIR_LIMIT:
        # broadcast branch: dedupe the (tiny) pair table on the driver,
        # pull only the texts those pairs reference via a distributed
        # filter, verify locally
        ptbl = pa.concat_tables(
            [b for b in ray.get(pairs_raw.to_arrow_refs()) if b.num_rows]
        )
        pair_list = sorted(set(zip(ptbl["a"].to_pylist(), ptbl["b"].to_pylist())))
        need = {i for p in pair_list for i in p}
        need_ref = ray.put(need)

        def filt(t: pa.Table) -> pa.Table:
            ns = ray.get(need_ref)
            mask = pa.array([v in ns for v in t[id_col].to_pylist()])
            return pa.table({id_col: t[id_col], text_col: t[text_col]}).filter(mask)

        texts_by_id: dict = {}
        for blk in ray.get(ds.map_batches(filt, batch_format="pyarrow").to_arrow_refs()):
            for i, t in zip(blk[id_col].to_pylist(), blk[text_col].to_pylist()):
                texts_by_id[i] = t or ""
        kept = [
            (a, b)
            for a, b in pair_list
            if ngram_jaccard(texts_by_id[a], texts_by_id[b], ngram) >= threshold
        ]
        return pa.table(
            {
                "a": pa.array([p[0] for p in kept], type=id_type),
                "b": pa.array([p[1] for p in kept], type=id_type),
            }
        )

    # scale branch: dedupe via count-agg groupby, verify via joins
    deduped = dedupe_pairs(pairs_raw)
    verified = verify_pairs_jaccard(
        deduped, ds, id_col=id_col, text_col=text_col, ngram=ngram, threshold=threshold
    )
    blocks = [b for b in ray.get(verified.to_arrow_refs()) if b.num_rows]
    if not blocks:
        return empty
    return pa.concat_tables([b.cast(blocks[0].schema) for b in blocks])


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
    cluster_id = min id in the cluster (deterministic).  All heavy stages
    distributed (see minhash_lsh_edges); the connected-components finish
    is driver union-find over the tiny verified edge list."""
    ds = ds.materialize()  # read once: band stage + verify joins + id pull
    edges = minhash_lsh_edges(
        ds, id_col=id_col, text_col=text_col, ngram=ngram, bands=bands, threshold=threshold
    )
    ids = _collect_ids(ds, id_col)
    return _clusters_from_edges(edges, ids, id_col)


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
    """SimHash near-dup: fingerprint per batch → explode 4×16-bit band
    rows → groupby(band, bucket).map_groups Hamming-verify (fingerprints
    travel with the rows, so verification needs no second data pass) →
    union-find over the edge list → (id, cluster_id)."""
    import ray

    ds = ds.materialize()
    fp_ds = ds.map_batches(
        lambda b: add_simhash(b, text_col), batch_format="pyarrow"
    ).select_columns([id_col, "simhash"])

    def explode(t: pa.Table) -> pa.Table:
        n = len(t)
        fps = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bands_out, buckets_out = [], []
        for band in range(4):
            bands_out.append(np.full(n, band, dtype=np.int32))
            buckets_out.append(((fps >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(np.int32))
        idx = np.tile(np.arange(n), 4)
        bucket = np.concatenate(buckets_out)
        return pa.table(
            {
                "band_id": pa.array(np.concatenate(bands_out)),
                "bucket": pa.array(bucket),
                "_part": pa.array((bucket % NUM_GROUP_PARTS).astype(np.int32)),
                id_col: t[id_col].take(pa.array(idx)),
                "simhash": t["simhash"].take(pa.array(idx)),
            }
        )

    band_ds = fp_ds.map_batches(explode, batch_format="pyarrow")

    def emit_edges(g: pd.DataFrame) -> pd.DataFrame:
        out_a: list = []
        out_b: list = []
        for _, grp in g.groupby(["band_id", "bucket"], sort=False):
            sub = grp.drop_duplicates(subset=[id_col]).sort_values(id_col)
            if len(sub) < 2:
                continue
            if len(sub) > PAIR_CAP:
                print(f"[dedup] simhash bucket cap: {len(sub)} ids -> {PAIR_CAP}")
                sub = sub.head(PAIR_CAP)
            ids = sub[id_col].tolist()
            fps = [int(f) & 0xFFFFFFFFFFFFFFFF for f in sub["simhash"].tolist()]
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    if hamming64(fps[x], fps[y]) <= max_hamming:
                        out_a.append(ids[x])
                        out_b.append(ids[y])
        dtype = g[id_col].dtype
        return pd.DataFrame(
            {"a": pd.Series(out_a, dtype=dtype), "b": pd.Series(out_b, dtype=dtype)}
        )

    edge_ds = band_ds.groupby("_part").map_groups(emit_edges, batch_format="pandas")
    blocks = [b for b in ray.get(edge_ds.to_arrow_refs()) if b.num_rows]
    ids = _collect_ids(ds, id_col)
    if not blocks:
        edges = pa.table({"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())})
    else:
        edges = pa.concat_tables([b.cast(blocks[0].schema) for b in blocks])
        # same edge may arrive from several bands — tiny table, dedupe here
        edges = pa.Table.from_pandas(
            edges.to_pandas().drop_duplicates(), preserve_index=False
        )
    return _clusters_from_edges(edges, ids, id_col)


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
    groupby(bucket).map_groups pairwise-cosine verify (unit vectors travel
    with the rows — no driver-side vector dict) → union-find over the
    edge list."""
    import ray

    ds = ds.materialize()

    def bucket_stage(batch: pa.Table) -> pa.Table:
        from .similarity import _as_matrix  # lazy: avoids module cycle

        vecs = _as_matrix(batch[vec_col])
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
                "_part": pa.array((codes % NUM_GROUP_PARTS).astype(np.int32)),
                "_unit": pa.array(list(unit)),
            }
        )

    def emit_edges(g: pd.DataFrame) -> pd.DataFrame:
        out_a: list = []
        out_b: list = []
        for _, grp in g.groupby("bucket", sort=False):
            sub = grp.sort_values(id_col)
            if len(sub) < 2:
                continue
            if len(sub) > PAIR_CAP:
                print(f"[dedup] embedding bucket cap: {len(sub)} ids -> {PAIR_CAP}")
                sub = sub.head(PAIR_CAP)
            ids = sub[id_col].tolist()
            units = np.array([np.asarray(u) for u in sub["_unit"]], dtype=np.float64)
            sims = units @ units.T
            xs, ys = np.where(np.triu(sims >= threshold, k=1))
            out_a.extend(ids[x] for x in xs)
            out_b.extend(ids[y] for y in ys)
        dtype = g[id_col].dtype
        return pd.DataFrame(
            {"a": pd.Series(out_a, dtype=dtype), "b": pd.Series(out_b, dtype=dtype)}
        )

    edge_ds = (
        ds.map_batches(bucket_stage, batch_format="pyarrow")
        .groupby("_part")
        .map_groups(emit_edges, batch_format="pandas")
    )
    blocks = [b for b in ray.get(edge_ds.to_arrow_refs()) if b.num_rows]
    ids = _collect_ids(ds, id_col)
    if not blocks:
        edges = pa.table({"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())})
    else:
        edges = pa.concat_tables([b.cast(blocks[0].schema) for b in blocks])
    return _clusters_from_edges(edges, ids, id_col)


# --- distributed connected components (scale path) --------------------------


def propagate_min_labels(
    edges: pa.Table, ids: list, *, max_rounds: int = 20, num_partitions: int = 32
) -> pa.Table:
    """Iterative min-label propagation over an edge Dataset — the
    distributed replacement for driver union-find at 10^12-row scale
    (SURVEY.md §2.5 / ray_guide dedup notes).

    Each round: every edge sends each endpoint the other endpoint's
    current label; groupby(id).min merges.  Label lookup co-locates each
    node's label row with its half-edges via ONE salted groupby (hash of
    the node id) and a vectorized pandas merge inside the group — round 1
    used two Dataset.join ops per round, which paid aggregator-actor
    startup every round and tripled wall time.  Converges in O(component
    diameter) rounds; convergence detected via the (tiny) sum-of-labels
    aggregate.  ``edges`` has columns (a, b); ids is the full id universe.
    """
    import ray as _ray
    from ray.data.aggregate import Min as _Min

    if edges.num_rows == 0:
        return pa.table({"id": pa.array(ids), "cluster_id": pa.array(ids)})
    labels_tbl = pa.table({"id": pa.array(ids), "label": pa.array(ids)})
    id_type = labels_tbl["id"].type
    if not pa.types.is_integer(id_type):
        # min-label semantics + the sum-of-labels convergence probe are
        # integer-only; hash non-integer ids to int64 upstream
        raise TypeError(
            f"propagate_min_labels requires integer ids, got {id_type}"
        )

    empty = pa.table(
        {"id": pa.array([], type=id_type), "label": pa.array([], type=id_type)}
    )

    def _collect(ds: rd.Dataset) -> pa.Table:
        blocks = [b for b in _ray.get(ds.to_arrow_refs()) if b.num_rows]
        if not blocks:
            return empty
        return pa.concat_tables(
            [b.select(["id", "label"]).cast(empty.schema) for b in blocks]
        )

    def _salt(arr: pa.ChunkedArray | pa.Array) -> pa.Array:
        v = np.abs(arr.to_numpy(zero_copy_only=False).astype(np.int64)) % num_partitions
        return pa.array(v.astype(np.int32))

    # half-edges (key, other) never change between rounds: key carries the
    # salt; built once, reused as an Arrow table
    half = pa.table(
        {
            "key": pa.concat_arrays(
                [edges["a"].combine_chunks(), edges["b"].combine_chunks()]
            ),
            "other": pa.concat_arrays(
                [edges["b"].combine_chunks(), edges["a"].combine_chunks()]
            ),
        }
    )
    half = half.append_column("_part", _salt(half["key"]))

    def send(g: pa.Table) -> pa.Table:
        # pyarrow group + null-free side tables: the label/other columns
        # carry nulls in the union, and a pandas conversion of the WHOLE
        # group would promote int64 → float64, corrupting ids above 2^53
        is_lab = pc.is_null(g["other"])
        lab = g.filter(is_lab)
        ed = g.filter(pc.invert(is_lab))
        lab_df = pa.table({"key": lab["key"], "label": lab["label"]}).to_pandas()
        ed_df = pa.table({"key": ed["key"], "other": ed["other"]}).to_pandas()
        m = ed_df.merge(lab_df, on="key", how="inner")
        out_id = pd.concat([lab_df["key"], m["other"]], ignore_index=True)
        out_label = pd.concat([lab_df["label"], m["label"]], ignore_index=True)
        return pa.table(
            {
                "id": pa.array(out_id.to_numpy(), type=id_type),
                "label": pa.array(out_label.to_numpy(), type=id_type),
            }
        )

    prev_sig = None
    for _ in range(max_rounds):
        lab_part = pa.table(
            {
                "key": labels_tbl["id"],
                "other": pa.nulls(labels_tbl.num_rows, type=id_type),
                "label": labels_tbl["label"],
                "_part": _salt(labels_tbl["id"]),
            }
        )
        ed_part = pa.table(
            {
                "key": half["key"],
                "other": half["other"],
                "label": pa.nulls(half.num_rows, type=id_type),
                "_part": half["_part"],
            }
        )
        msgs = (
            rd.from_arrow([lab_part, ed_part])
            .groupby("_part")
            .map_groups(send, batch_format="pyarrow")
        )
        merged = msgs.groupby("id").aggregate(_Min("label", alias_name="label"))
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
    output to minhash_lsh_clusters.  End-to-end the driver holds only the
    verified edge list and the final (id, cluster_id) table."""
    ds = ds.materialize()
    edges = minhash_lsh_edges(
        ds, id_col=id_col, text_col=text_col, ngram=ngram, bands=bands, threshold=threshold
    )
    ids = _collect_ids(ds, id_col)
    out = propagate_min_labels(edges, ids)
    return pa.table({id_col: out["id"], "cluster_id": out["cluster_id"]})
