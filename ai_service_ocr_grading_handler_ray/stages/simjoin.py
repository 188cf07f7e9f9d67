"""Exact n-gram-Jaccard set-similarity SELF-JOIN with prefix filtering
(PPJoin-style; Chaudhuri et al. 2006 prefix filter, Vernica et al.
VLDB 2010 MapReduce kernel) — the EXACT counterpart of the MinHash-LSH
sweep in stages/dedup.py: every pair of documents whose distinct
word-``ngram`` shingle sets have Jaccard >= threshold, with the exact
intersection/union sizes, no probabilistic recall loss.

Shingle semantics are the package's established convention
(``dedup.batch_shingle_hashes``: lowercase, whitespace split, word
``ngram``-grams, texts with 1..ngram-1 words collapse to ONE all-words
shingle, empty texts drop out), uniquified per document.  Similarity
compares HASHED shingle sets (64-bit) — the standard hashed-set
approximation; a cross-doc hash collision inflates an intersection
with probability ~n²/2^64 (negligible at any corpus size that fits an
int64 row count).  The threshold is a RATIONAL (num, den) and every
filter is integer arithmetic (``den*inter >= num*union``), so there is
no float boundary to drift from the oracle.

Prefix filter: order the shingle universe by (document frequency,
hash) ascending — rarest first.  If J(A, B) >= t then the first
``|A| - ceil(t*|A|) + 1`` shingles of A (in that global order) and the
corresponding prefix of B share at least one shingle, so emitting only
prefix shingles to the candidate shuffle is COMPLETE (no false
negatives) and concentrates candidates in the small buckets of RARE
shingles (a stopword shingle shared by every template page almost
never enters a prefix).

Scale shape:
- one shuffle-free profile scan: text → sorted unique shingle-hash
  array + size (the text never outlives its task);
- ONE vocab-sized ``groupby(h)`` df-count shuffle, folded to a sorted
  (hash → df) probe table broadcast once via ``ray.put`` (the unigram-
  LM broadcast assumption; ``vocab_cap`` fails loudly);
- ONE prefix-shingle shuffle: each doc ships (prefix shingle, id, n,
  its full sorted hash set) — prefix-length × doc-set duplication, the
  Vernica kernel trade (candidates verify IN-BUCKET with no second
  join);
- in-bucket verify: length filter then one sorted searchsorted
  intersection per surviving pair (``bucket_pair_cap`` fails loudly on
  a degenerate bucket — a hot PREFIX shingle means the frequency table
  disagrees with the data);
- verified pairs are result-sized; ONE final (a, b) dedup shuffle
  keeps each pair once (a pair can qualify through several shared
  prefix shingles).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ray.data.aggregate import Count

# vocab-sized driver/broadcast state guard (same assumption class as
# the unigram-LM scorer's broadcast path)
VOCAB_CAP = 50_000_000


def similarity_join(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: tuple[int, int] = (1, 2),
    ngram: int = 3,
    vocab_cap: int = VOCAB_CAP,
    bucket_pair_cap: int = 200_000,
    num_parts: int = 64,
    checkpoint=True,
    checkpoint_dir: str | None = None,
) -> rd.Dataset:
    """All document pairs (a < b) with shingle-set Jaccard >=
    threshold[0]/threshold[1].  Output: (a, b — id_col's type,
    inter:int64, uni:int64, jaccard:float64 rounded to 6).  See module
    docstring for semantics and the scale shape.

    The (id, shingle-set, n) profile is consumed by the df shuffle,
    the prefix stage and the in-bucket verify; ``checkpoint=True``
    (default) pins it in the object store (it is the corpus' hashed
    representation — re-sharding the text per consumer costs more
    CPU), ``"parquet"`` + ``checkpoint_dir`` is the durable 100-TB
    mode (consumers re-read from disk, object store never holds the
    corpus, rerun resumes), ``None`` streams (re-profiles per
    consumer)."""
    from .collect import collect_tables
    from .dedup import batch_shingle_hashes

    num, den = threshold
    if not (0 < num <= den):
        raise ValueError("threshold must be a rational in (0, 1]")

    def profile(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        flat, off = batch_shingle_hashes(texts, ngram)
        sets: list[np.ndarray] = []
        ids_keep: list[int] = []
        for i in range(len(texts)):
            seg = np.unique(flat[off[i] : off[i + 1]])
            if len(seg):
                sets.append(seg)
                ids_keep.append(i)
        if not sets:
            return pa.table(
                {
                    "id": pa.array([], type=t[id_col].type),
                    "sh": pa.array([], type=pa.list_(pa.uint64())),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        lens = np.array([len(s) for s in sets], dtype=np.int64)
        values = np.concatenate(sets)
        offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        return pa.table(
            {
                "id": t[id_col].take(pa.array(ids_keep, type=pa.int64())),
                "sh": pa.ListArray.from_arrays(
                    pa.array(offsets), pa.array(values, type=pa.uint64())
                ),
                "n": pa.array(lens),
            }
        )

    from ..state.checkpoint import stage_checkpoint

    prof = stage_checkpoint(
        ds.map_batches(profile, batch_format="pyarrow"), checkpoint,
        checkpoint_dir, "simjoin_prof",
        # the profile depends only on these — a threshold-only rerun
        # must REUSE the committed checkpoint, not discard it
        {"id_col": id_col, "text_col": text_col, "ngram": ngram},
    )

    # --- document frequency per shingle: one vocab shuffle -----------------
    # (shuffle keys travel as the int64 VIEW of the uint64 hash — Ray's
    # reduce rebuilds key columns through Python ints, which overflow
    # above 2^63; grouping only needs equality, not order)
    def explode(t: pa.Table) -> pa.Table:
        flat = (
            t["sh"].combine_chunks().flatten()
            .to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        return pa.table({"h": pa.array(flat.view(np.int64))})

    df_ds = (
        prof.map_batches(explode, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Count(alias_name="df"))
    )
    parts = [t for t in collect_tables(df_ds, drop_empty=True)]
    if parts:
        merged = pa.concat_tables(parts)
        hs = (
            merged["h"].to_numpy(zero_copy_only=False)
            .astype(np.int64).view(np.uint64)
        )
        dfs = merged["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(hs)
        hs, dfs = np.ascontiguousarray(hs[order]), dfs[order]
    else:
        hs = np.empty(0, dtype=np.uint64)
        dfs = np.empty(0, dtype=np.int64)
    if len(hs) > vocab_cap:
        raise ValueError(
            f"similarity_join: shingle vocabulary {len(hs)} exceeds "
            f"vocab_cap={vocab_cap}; raise the cap if the driver and "
            "workers have the memory for the frequency broadcast"
        )
    df_ref = ray.put((hs, dfs))

    # --- prefix emission ----------------------------------------------------
    def prefixes(t: pa.Table, _ref=df_ref) -> pa.Table:
        hs_b, dfs_b = ray.get(_ref)
        sh = t["sh"].combine_chunks()
        flat = sh.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
        off = sh.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]  # sliced arrays carry a nonzero offset base
        n = t["n"].to_numpy(zero_copy_only=False)
        if not len(flat):
            return pa.table(
                {
                    "h": pa.array([], type=pa.int64()),
                    "id": pa.array([], type=t["id"].type),
                    "n": pa.array([], type=pa.int64()),
                    "sh": pa.array([], type=pa.list_(pa.uint64())),
                }
            )
        dfv = dfs_b[np.searchsorted(hs_b, flat)]
        seg = np.repeat(np.arange(len(n)), n)
        # within-doc order by (df, hash): global rarest-first prefix
        # order.  seg is the lexsort's PRIMARY key and both the input
        # and the sorted sequence are segment-contiguous with the same
        # offsets, so sorted index k sits at within-doc rank
        # k - off[doc], and order[k] is the doc's k-th rarest shingle.
        order = np.lexsort((flat, dfv, seg))
        pos = np.arange(len(flat)) - np.repeat(off[:-1], n)
        p = n - ((num * n + den - 1) // den) + 1  # n - ceil(t*n) + 1
        take = order[pos < np.repeat(p, n)]
        doc_of = seg[take]
        return pa.table(
            {
                "h": pa.array(flat[take].view(np.int64)),
                "id": t["id"].take(pa.array(doc_of, type=pa.int64())),
                "n": pa.array(n[doc_of].astype(np.int64)),
                "sh": sh.take(pa.array(doc_of, type=pa.int64())),
            }
        )

    pref = prof.map_batches(prefixes, batch_format="pyarrow")

    # --- in-bucket candidate generation + verification ----------------------
    # shingle buckets co-locate COARSELY (hash(h) % num_parts — one Ray
    # group per partition, a pandas groupby inside, instead of millions
    # of tiny Ray groups; the add_key_partition convention)
    from .dedup import add_key_partition

    def verify_partition(g: pd.DataFrame) -> pd.DataFrame:
        def empty() -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype=g["id"].dtype),
                    "b": pd.Series([], dtype=g["id"].dtype),
                    "inter": pd.Series([], dtype=np.int64),
                    "uni": pd.Series([], dtype=np.int64),
                }
            )

        out_a, out_b, out_i, out_u = [], [], [], []
        for _, grp in g.groupby("h", sort=False):
            k = len(grp)
            if k < 2:
                continue
            if k * (k - 1) // 2 > bucket_pair_cap:
                raise ValueError(
                    f"similarity_join: prefix bucket with {k} docs exceeds "
                    f"bucket_pair_cap={bucket_pair_cap} pairs — a shingle "
                    "this hot should not be in any prefix; check the corpus "
                    "for degenerate near-constant documents or raise the cap"
                )
            order = np.argsort(grp["id"].to_numpy(), kind="stable")
            ids = grp["id"].to_numpy()[order]
            ns = grp["n"].to_numpy()[order]
            sets = [
                np.asarray(s, dtype=np.uint64) for s in grp["sh"].to_numpy()[order]
            ]
            for i in range(k):
                for j in range(i + 1, k):
                    na, nb = int(ns[i]), int(ns[j])
                    if den * min(na, nb) < num * max(na, nb):
                        continue  # length filter
                    A, B = sets[i], sets[j]
                    if len(A) > len(B):
                        A, B = B, A
                    pos = np.searchsorted(B, A)
                    pos[pos == len(B)] = len(B) - 1
                    inter = int((B[pos] == A).sum())
                    uni = na + nb - inter
                    if den * inter >= num * uni:
                        out_a.append(ids[i])
                        out_b.append(ids[j])
                        out_i.append(inter)
                        out_u.append(uni)
        if not out_a:
            return empty()
        return pd.DataFrame(
            {
                "a": pd.Series(out_a, dtype=g["id"].dtype),
                "b": pd.Series(out_b, dtype=g["id"].dtype),
                "inter": pd.Series(out_i, dtype=np.int64),
                "uni": pd.Series(out_u, dtype=np.int64),
            }
        )

    cand = (
        pref.map_batches(
            lambda t: add_key_partition(t, "h", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(verify_partition, batch_format="pandas")
    )

    # --- pair dedup (a pair can verify in several shared prefix buckets) ----
    # coarse co-location on hash(a); (a, b) dedup is a vectorized
    # drop_duplicates inside each partition (both copies of a pair share
    # the same a, so they always meet)
    def dedup_partition(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["a", "b"], kind="mergesort").drop_duplicates(
            ["a", "b"]
        )

    deduped = (
        cand.map_batches(
            lambda t: add_key_partition(t, "a", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(dedup_partition, batch_format="pandas")
    )

    def finish(t: pa.Table) -> pa.Table:
        inter = t["inter"].to_numpy(zero_copy_only=False).astype(np.int64)
        uni = t["uni"].to_numpy(zero_copy_only=False).astype(np.int64)
        j = inter / uni
        j = np.sign(j) * np.floor(np.abs(j) * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                "a": t["a"],
                "b": t["b"],
                "inter": pa.array(inter),
                "uni": pa.array(uni),
                "jaccard": pa.array(j),
            }
        )

    return deduped.map_batches(finish, batch_format="pyarrow")


def similarity_join_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: tuple[int, int] = (1, 2),
    ngram: int = 3,
) -> str:
    """DuckDB replay of :func:`similarity_join`, generated from the SAME
    parameters (single-generator policy): the brute-force token-equijoin
    over distinct shingle STRINGS (the engine intersects their 64-bit
    hashes — equal up to 64-bit collisions), with the identical
    lowercase/whitespace/short-text shingle convention and the identical
    integer threshold test."""
    num, den = threshold
    gram = " || ' ' || ".join(f"wl[i+{j}]" if j else "wl[i]" for j in range(ngram))
    return f"""
        WITH w AS (
          SELECT {id_col} AS id,
                 list_filter(string_split_regex(lower({text_col}), '\\s+'),
                             x -> x <> '') AS wl
          FROM {table}
        ),
        sh AS (
          SELECT id, unnest(list_distinct(
            CASE WHEN len(wl) >= {ngram} THEN
                   list_transform(range(1, len(wl) - {ngram} + 2),
                                  i -> {gram})
                 WHEN len(wl) >= 1 THEN [array_to_string(wl, ' ')]
                 ELSE [] END)) AS s
          FROM w
        ),
        n AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
        i AS (
          SELECT a.id AS a, b.id AS b, count(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
          GROUP BY 1, 2
        )
        SELECT a, b, CAST(inter AS BIGINT) AS inter,
               CAST(na.n + nb.n - inter AS BIGINT) AS uni,
               round(inter * 1.0 / (na.n + nb.n - inter), 6) AS jaccard
        FROM i
        JOIN n na ON na.id = i.a
        JOIN n nb ON nb.id = i.b
        WHERE {den} * inter >= {num} * (na.n + nb.n - inter)
    """



def containment_join(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: tuple[int, int] = (4, 5),
    ngram: int = 3,
    vocab_cap: int = VOCAB_CAP,
    bucket_pair_cap: int = 200_000,
    num_parts: int = 64,
    small_pair_limit: int = 250_000,
    a_set_cap: int = 50_000_000,
    checkpoint=True,
    checkpoint_dir: str | None = None,
) -> rd.Dataset:
    """ASYMMETRIC shingle containment self-join: all ordered pairs
    (a, b), a != b, with |S(a) ∩ S(b)| >= (num/den)·|S(a)| — "document
    a is (mostly) contained in document b".  The quote / excerpt /
    truncated-mirror detector that Jaccard (:func:`similarity_join`)
    misses: a 50-word quote inside a 5000-word page has J ~ 0.01 but
    containment 1.0.  Same shingle convention, same integer threshold
    arithmetic (``den·inter >= num·na`` — no float boundary).

    Prefix filter (asymmetric): if C(a→b) >= t then among a's first
    ``|a| - ceil(t·|a|) + 1`` shingles in the global rarest-first order
    at least one is in S(b) — so candidate generation pairs A-side
    PREFIX rows against B-side FULL posting rows (the indexed side of
    an R-S containment join must post everything; a hot shingle almost
    never enters any prefix, so hot postings meet near-empty prefix
    sides and buckets stay small — ``bucket_pair_cap`` fails loudly).

    Scale shape (all candidate traffic is SLIM — unlike
    :func:`similarity_join`, whose in-bucket verify needs sets in the
    bucket, containment verifies against b's profile anyway, so sets
    are attached by cogroup at the END and never ride the wide
    shuffles):
    - one shuffle-free profile scan (text never outlives its task);
    - ONE vocab df shuffle → sorted (hash, df) broadcast (vocab_cap);
    - ONE candidate shuffle of slim (h, side, id, n) rows — prefix rows
      + full posting rows, coarse-partitioned on hash(h); in-partition
      pairing is a fully VECTORIZED group-expansion (no per-shingle
      Python loop);
    - candidate generation applies the PPJoin+ length + positional
      filters (Xiao et al. WWW 2008) on numpy before any Arrow
      materialization: inter <= min(na, nb) kills pairs with
      den·nb < num·na, and at the pair's first shared shingle
      inter <= 1 + min(na-pos_a-1, nb-pos_b-1) (valid because no
      earlier overlap exists there; completeness: the first common
      shingle is always in a's prefix, so that meeting survives);
    - ONE (a)-hash slim pair dedup (a pair can meet in several shared
      prefix shingles) — the TRUE pair count then picks the finish:
    - ADAPTIVE finish (the minhash_lsh_edges broadcast-vs-shuffle
      trade): pairs <= ``small_pair_limit`` AND a-side profile volume
      <= ``a_set_cap`` → dedupe on the driver and verify via two
      column-pruned scans of the materialized profile (gather a-sets
      by distributed filter, then a map-side verify against the
      broadcast pair table — zero further shuffles; this was ~2/3 of
      q204's wall as cogroups).  Above either cap → the original
      shuffled path: ONE attach cogroup on hash(a), ONE verify
      cogroup on hash(b); every task stays bounded.
    Output: (a, b, inter:int64, na:int64, containment:float64/6).
    """
    from .collect import collect_tables
    from .dedup import add_key_partition, batch_shingle_hashes

    num, den = threshold
    if not (0 < num <= den):
        raise ValueError("threshold must be a rational in (0, 1]")

    def profile(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        flat, off = batch_shingle_hashes(texts, ngram)
        sets: list[np.ndarray] = []
        ids_keep: list[int] = []
        for i in range(len(texts)):
            seg = np.unique(flat[off[i] : off[i + 1]])
            if len(seg):
                sets.append(seg)
                ids_keep.append(i)
        if not sets:
            return pa.table(
                {
                    "id": pa.array([], type=t[id_col].type),
                    "sh": pa.array([], type=pa.list_(pa.uint64())),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        lens = np.array([len(s) for s in sets], dtype=np.int64)
        values = np.concatenate(sets)
        offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        return pa.table(
            {
                "id": t[id_col].take(pa.array(ids_keep, type=pa.int64())),
                "sh": pa.ListArray.from_arrays(
                    pa.array(offsets), pa.array(values, type=pa.uint64())
                ),
                "n": pa.array(lens),
            }
        )

    from ..state.checkpoint import stage_checkpoint

    prof = stage_checkpoint(
        ds.map_batches(profile, batch_format="pyarrow"), checkpoint,
        checkpoint_dir, "containment_prof",
        # the profile depends only on these — a threshold-only rerun
        # must REUSE the committed checkpoint, not discard it
        {"id_col": id_col, "text_col": text_col, "ngram": ngram},
    )

    def explode(t: pa.Table) -> pa.Table:
        flat = (
            t["sh"].combine_chunks().flatten()
            .to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        return pa.table({"h": pa.array(flat.view(np.int64))})

    df_ds = (
        prof.map_batches(explode, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Count(alias_name="df"))
    )
    parts = [t for t in collect_tables(df_ds, drop_empty=True)]
    if parts:
        merged = pa.concat_tables(parts)
        hs = (
            merged["h"].to_numpy(zero_copy_only=False)
            .astype(np.int64).view(np.uint64)
        )
        dfs = merged["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(hs)
        hs, dfs = np.ascontiguousarray(hs[order]), dfs[order]
    else:
        hs = np.empty(0, dtype=np.uint64)
        dfs = np.empty(0, dtype=np.int64)
    if len(hs) > vocab_cap:
        raise ValueError(
            f"containment_join: shingle vocabulary {len(hs)} exceeds "
            f"vocab_cap={vocab_cap}"
        )
    df_ref = ray.put((hs, dfs))
    from .dedup import _column_type

    id_type = _column_type(prof, "id", pa.int64())

    # --- candidate stream: SLIM A-prefix rows + SLIM B-posting rows --------
    # Both sides carry (n, pos) — the set size and the shingle's rank in
    # the doc's global rarest-first (df, hash) order — so candidate
    # generation can run the PPJoin+ length + positional filters
    # (Xiao et al. WWW 2008) BEFORE the pair ever enters the dedup /
    # attach / verify shuffles.
    def _rank_rows(t: pa.Table, _ref, prefix_only: bool) -> pa.Table:
        hs_b, dfs_b = ray.get(_ref)
        sh = t["sh"].combine_chunks()
        flat = sh.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
        off = sh.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        off = off - off[0]
        n = t["n"].to_numpy(zero_copy_only=False)
        if not len(flat):
            return pa.table(
                {
                    "h": pa.array([], type=pa.int64()),
                    "side": pa.array([], type=pa.int8()),
                    "id": pa.array([], type=t["id"].type),
                    "n": pa.array([], type=pa.int64()),
                    "pos": pa.array([], type=pa.int32()),
                }
            )
        dfv = dfs_b[np.searchsorted(hs_b, flat)]
        seg = np.repeat(np.arange(len(n)), n)
        order = np.lexsort((flat, dfv, seg))
        pos = np.arange(len(flat)) - np.repeat(off[:-1], n)
        if prefix_only:
            p = n - ((num * n + den - 1) // den) + 1  # n - ceil(t*n) + 1
            keep = pos < np.repeat(p, n)
            take, pos_of = order[keep], pos[keep]
            side_val = 0
        else:
            take, pos_of = order, pos
            side_val = 1
        doc_of = seg[take]
        return pa.table(
            {
                "h": pa.array(flat[take].view(np.int64)),
                "side": pa.array(np.full(len(take), side_val, dtype=np.int8)),
                "id": t["id"].take(pa.array(doc_of, type=pa.int64())),
                "n": pa.array(n[doc_of].astype(np.int64)),
                "pos": pa.array(pos_of.astype(np.int32)),
            }
        )

    def prefix_rows(t: pa.Table, _ref=df_ref) -> pa.Table:
        return _rank_rows(t, _ref, prefix_only=True)

    def posting_rows(t: pa.Table, _ref=df_ref) -> pa.Table:
        return _rank_rows(t, _ref, prefix_only=False)

    stream = prof.map_batches(prefix_rows, batch_format="pyarrow").union(
        prof.map_batches(posting_rows, batch_format="pyarrow")
    )

    # fully vectorized pairing: sort by (h, side) so each shingle group
    # is [prefix rows | posting rows]; expand cp×cb index grids for the
    # groups that have both sides with one repeat/arange pass
    def gen_partition(g: pa.Table) -> pa.Table:
        def empty() -> pa.Table:
            return pa.table(
                {
                    "a": pa.array([], type=id_type),
                    "b": pa.array([], type=id_type),
                    "na": pa.array([], type=pa.int64()),
                }
            )

        if g.num_rows == 0:
            return empty()
        h = g["h"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, h))
        h, side = h[order], side[order]
        ids = g["id"].combine_chunks().take(pa.array(order, type=pa.int64()))
        ns = g["n"].to_numpy(zero_copy_only=False)[order]
        poss = (
            g["pos"].to_numpy(zero_copy_only=False)[order].astype(np.int64)
        )
        new = np.empty(len(h), dtype=bool)
        new[0] = True
        new[1:] = h[1:] != h[:-1]
        gid = np.cumsum(new) - 1
        G = int(gid[-1]) + 1
        cp = np.bincount(gid[side == 0], minlength=G)
        cb = np.bincount(gid[side == 1], minlength=G)
        starts = np.flatnonzero(new)
        both = np.flatnonzero((cp > 0) & (cb > 0))
        if not len(both):
            return empty()
        pairs = cp[both] * cb[both]
        if pairs.max() > bucket_pair_cap:
            worst = both[int(np.argmax(pairs))]
            raise ValueError(
                f"containment_join: shingle bucket with {int(cp[worst])} "
                f"prefix x {int(cb[worst])} posting rows exceeds "
                f"bucket_pair_cap={bucket_pair_cap} pairs — a shingle "
                "this hot should not be in any prefix; check for "
                "degenerate near-constant documents or raise the cap"
            )
        offs = np.concatenate([[0], np.cumsum(pairs)[:-1]])
        total = int(pairs.sum())
        grp = np.repeat(np.arange(len(both)), pairs)
        within = np.arange(total, dtype=np.int64) - offs[grp]
        cbg = cb[both][grp]
        ai = starts[both][grp] + within // cbg
        bi = starts[both][grp] + cp[both][grp] + within % cbg
        # PPJoin+ pruning on numpy BEFORE any Arrow take: (1) length —
        # inter <= min(na, nb), so den·nb >= num·na is necessary; (2)
        # positional — at the pair's FIRST shared shingle in the global
        # rarest-first order no earlier overlap exists, so inter <=
        # 1 + min(na-pos_a-1, nb-pos_b-1); a pair pruned here at a
        # NON-first meeting still survives at its first meeting
        # (completeness), and the dedup keeps one copy either way.
        na_v, pa_v = ns[ai], poss[ai]
        nb_v, pb_v = ns[bi], poss[bi]
        ub = 1 + np.minimum(na_v - pa_v - 1, nb_v - pb_v - 1)
        keep_np = (den * nb_v >= num * na_v) & (den * ub >= num * na_v)
        import os

        if os.environ.get("SIMJOIN_DEBUG_COUNTS"):
            print(
                f"[simjoin-debug] grid_pairs={len(keep_np)} "
                f"after_ppjoin_filters={int(keep_np.sum())}"
            )
        ai, bi, na_v = ai[keep_np], bi[keep_np], na_v[keep_np]
        if not len(ai):
            return empty()
        a_ids = ids.take(pa.array(ai, type=pa.int64()))
        b_ids = ids.take(pa.array(bi, type=pa.int64()))
        keep = pc.invert(pc.equal(a_ids, b_ids))
        out = pa.table(
            {
                "a": a_ids,
                "b": b_ids,
                "na": pa.array(na_v.astype(np.int64)),
            }
        ).filter(keep)
        return out if out.num_rows else empty()

    cand_raw = (
        stream.map_batches(
            lambda t: add_key_partition(t, "h", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(gen_partition, batch_format="pyarrow")
    )

    # slim distributed (a, b) pair dedup — a pair meets once per shared
    # prefix shingle, so raw candidate rows overstate the pair count by
    # the meeting multiplicity; the broadcast-vs-shuffle branch below
    # must see TRUE pairs (one cheap hash(a) shuffle of 3 slim columns)
    def dd_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["a", "b"], kind="mergesort").drop_duplicates(
            ["a", "b"]
        ).drop(columns=["_part"])

    cand = (
        cand_raw.map_batches(
            lambda t: add_key_partition(t, "a", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(dd_pairs, batch_format="pandas")
    ).materialize()

    # --- adaptive finish (the minhash_lsh_edges broadcast-vs-shuffle
    # trade): with few candidate rows, dedupe on the driver and verify
    # via TWO column-pruned scans of the materialized profile — gather
    # the a-side sets by distributed filter (pair-bounded driver dict),
    # then verify map-side where b's profile streams past the broadcast
    # pair table.  ZERO further shuffles (the 2 profile-carrying
    # cogroups below were ~2/3 of q204's wall).  Above the limit, the
    # shuffled cogroup path keeps every task bounded.
    n_cand = cand.count()
    if n_cand == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "a": pa.array([], type=id_type),
                    "b": pa.array([], type=id_type),
                    "inter": pa.array([], type=pa.int64()),
                    "na": pa.array([], type=pa.int64()),
                    "containment": pa.array([], type=pa.float64()),
                }
            )
        )
    broadcast_ok = n_cand <= small_pair_limit
    if broadcast_ok:
        blocks = [b for b in collect_tables(cand, drop_empty=True)]
        ptbl = pa.concat_tables([b.cast(blocks[0].schema) for b in blocks])
        pdf = (
            ptbl.select(["a", "b", "na"]).to_pandas()
            .sort_values(["a", "b"], kind="mergesort")
            .drop_duplicates(["a", "b"])
        )
        need_a = pa.array(sorted(set(pdf["a"])), type=id_type)

        def gather_a(t: pa.Table) -> pa.Table:
            mask = pc.fill_null(pc.is_in(t["id"], value_set=need_a), False)
            return t.select(["id", "sh"]).filter(mask)

        a_sets: dict = {}
        total_entries = 0
        for blk in collect_tables(
            prof.map_batches(gather_a, batch_format="pyarrow"),
            drop_empty=True,
        ):
            ids_l = blk["id"].to_pylist()
            sh_c = blk["sh"].combine_chunks()
            for i, did in enumerate(ids_l):
                arr = np.asarray(sh_c[i].values, dtype=np.uint64)
                total_entries += len(arr)
                a_sets[did] = arr
        if total_entries > a_set_cap:
            # the a-side profile broadcast would exceed the cap (very
            # large probe documents) — fall back to the shuffled
            # cogroup path, whose tasks stay bounded
            print(
                f"[simjoin] containment broadcast skipped: {total_entries} "
                f"a-side shingles > a_set_cap={a_set_cap}; using the "
                "shuffled verify path"
            )
            broadcast_ok = False
    if broadcast_ok:
        by_b: dict = {}
        for a_v, b_v, na_v in zip(pdf["a"], pdf["b"], pdf["na"]):
            by_b.setdefault(b_v, []).append((a_v, int(na_v)))
        pair_ref = ray.put((a_sets, by_b))
        need_b = pa.array(sorted(by_b), type=id_type)

        def verify_scan(t: pa.Table, _ref=pair_ref) -> pa.Table:
            from .collect import cached_ref

            # dict-of-arrays broadcast: a bare ray.get re-pickles it per
            # batch (measured ~6 s of the old q204 wall) — cache the
            # deserialized view once per worker process
            a_sets_b, by_b_b = cached_ref(_ref)
            mask = pc.fill_null(pc.is_in(t["id"], value_set=need_b), False)
            rows = t.filter(mask)
            out_a, out_b, out_i, out_n = [], [], [], []
            sh_c = rows["sh"].combine_chunks()
            for i, b_v in enumerate(rows["id"].to_pylist()):
                B = np.asarray(sh_c[i].values, dtype=np.uint64)
                for a_v, na_i in by_b_b[b_v]:
                    A = a_sets_b[a_v]
                    pos = np.searchsorted(B, A)
                    pos[pos == len(B)] = len(B) - 1
                    inter = int((B[pos] == A).sum())
                    if den * inter >= num * na_i:
                        out_a.append(a_v)
                        out_b.append(b_v)
                        out_i.append(inter)
                        out_n.append(na_i)
            c = np.array(out_i, dtype=np.float64) / np.maximum(
                np.array(out_n, dtype=np.float64), 1.0
            )
            c = np.sign(c) * np.floor(np.abs(c) * 1e6 + 0.5) / 1e6
            return pa.table(
                {
                    "a": pa.array(out_a, type=id_type),
                    "b": pa.array(out_b, type=id_type),
                    "inter": pa.array(out_i, type=pa.int64()),
                    "na": pa.array(out_n, type=pa.int64()),
                    "containment": pa.array(c, type=pa.float64()),
                }
            )

        return prof.map_batches(verify_scan, batch_format="pyarrow")

    # --- dedup (a, b) fused with attaching a's set (cogroup on a) ----------
    def cand_tag_a(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["_part"]) if "_part" in t.column_names else t
        return pa.table(
            {
                "k": t["a"].cast(id_type),
                "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "b": t["b"].cast(id_type),
                "na": t["na"],
                "sh": pa.nulls(t.num_rows, type=pa.list_(pa.uint64())),
            }
        )

    def prof_tag_a(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": t["id"],
                "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "b": pa.nulls(t.num_rows, type=id_type),
                "na": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "sh": t["sh"],
            }
        )

    with_a = cand.map_batches(cand_tag_a, batch_format="pyarrow").union(
        prof.map_batches(prof_tag_a, batch_format="pyarrow")
    )

    def attach_partition(g: pa.Table) -> pa.Table:
        def empty() -> pa.Table:
            return pa.table(
                {
                    "a": pa.array([], type=id_type),
                    "b": pa.array([], type=id_type),
                    "na": pa.array([], type=pa.int64()),
                    "sh": pa.array([], type=pa.list_(pa.uint64())),
                }
            )

        side = g["side"].to_numpy(zero_copy_only=False)
        cands = g.filter(pa.array(side == 0))
        profs = g.filter(pa.array(side == 1))
        if cands.num_rows == 0:
            return empty()
        # dedup on pandas over the SLIM key columns only; the uint64
        # shingle lists never leave Arrow (a to_pylist/np.concatenate
        # round trip sends >2^63 values through float64 and shears the
        # low mantissa bits off every hash)
        df = cands.select(["k", "b"]).to_pandas()
        keep = (
            df.assign(_pos=np.arange(len(df)))
            .sort_values(["k", "b"], kind="mergesort")
            .drop_duplicates(["k", "b"])["_pos"]
            .to_numpy()
        )
        kept = cands.take(pa.array(np.sort(keep), type=pa.int64()))
        pos = pd.Index(profs["k"].to_pandas()).get_indexer(
            kept["k"].to_pandas()
        )
        if (pos < 0).any():
            raise RuntimeError(
                "containment_join: candidate id missing its own profile "
                "row in the attach partition — partitioning key mismatch"
            )
        sh = profs["sh"].combine_chunks().take(pa.array(pos, type=pa.int64()))
        return pa.table(
            {
                "a": kept["k"],
                "b": kept["b"],
                "na": kept["na"],
                "sh": sh,
            }
        )

    deduped = (
        with_a.map_batches(
            lambda t: add_key_partition(t, "k", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(attach_partition, batch_format="pyarrow")
    )

    # --- verify against b's profile (cogroup on b) --------------------------
    def cand_tag(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "b": t["b"],
                "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "a": t["a"],
                "na": t["na"],
                "sh": t["sh"],
            }
        )

    def prof_tag(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "b": t["id"],
                "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "a": pa.nulls(t.num_rows, type=id_type),
                "na": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
                "sh": t["sh"],
            }
        )

    both = deduped.map_batches(cand_tag, batch_format="pyarrow").union(
        prof.map_batches(prof_tag, batch_format="pyarrow")
    )

    # verify in ARROW batch format: the union pads a/na with nulls on
    # profile rows, and a pandas cogroup would coerce an int64 id column
    # to float64 (silent precision loss above 2^53)
    def verify_partition(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        cands = g.filter(pa.array(side == 0))
        profs = g.filter(pa.array(side == 1))
        if cands.num_rows == 0:
            return pa.table(
                {
                    "a": pa.array([], type=id_type),
                    "b": pa.array([], type=id_type),
                    "inter": pa.array([], type=pa.int64()),
                    "na": pa.array([], type=pa.int64()),
                    "containment": pa.array([], type=pa.float64()),
                }
            )
        bsets = dict(zip(profs["b"].to_pylist(), profs["sh"].to_pylist()))
        keep_idx, out_i, out_n = [], [], []
        b_vals = cands["b"].to_pylist()
        na_vals = cands["na"].to_pylist()
        sh_vals = cands["sh"].to_pylist()
        for i, (b, na, sh_a) in enumerate(zip(b_vals, na_vals, sh_vals)):
            B = np.asarray(bsets[b], dtype=np.uint64)
            A = np.asarray(sh_a, dtype=np.uint64)
            pos = np.searchsorted(B, A)
            pos[pos == len(B)] = len(B) - 1
            inter = int((B[pos] == A).sum())
            if den * inter >= num * int(na):
                keep_idx.append(i)
                out_i.append(inter)
                out_n.append(int(na))
        idx = pa.array(keep_idx, type=pa.int64())
        c = np.array(out_i, dtype=np.float64) / np.maximum(
            np.array(out_n, dtype=np.float64), 1.0
        )
        c = np.sign(c) * np.floor(np.abs(c) * 1e6 + 0.5) / 1e6
        return pa.table(
            {
                "a": cands["a"].combine_chunks().take(idx).cast(id_type),
                "b": cands["b"].combine_chunks().take(idx).cast(id_type),
                "inter": pa.array(out_i, type=pa.int64()),
                "na": pa.array(out_n, type=pa.int64()),
                "containment": pa.array(c, type=pa.float64()),
            }
        )

    return (
        both.map_batches(
            lambda t: add_key_partition(t, "b", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(verify_partition, batch_format="pyarrow")
    )



def containment_join_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: tuple[int, int] = (4, 5),
    ngram: int = 3,
) -> str:
    """DuckDB replay of :func:`containment_join` (single-generator
    policy): brute-force distinct-shingle-string equijoin over ORDERED
    pairs a != b with the identical integer threshold test."""
    num, den = threshold
    gram = " || ' ' || ".join(f"wl[i+{j}]" if j else "wl[i]" for j in range(ngram))
    return f"""
        WITH w AS (
          SELECT {id_col} AS id,
                 list_filter(string_split_regex(lower({text_col}), '\\s+'),
                             x -> x <> '') AS wl
          FROM {table}
        ),
        sh AS (
          SELECT id, unnest(list_distinct(
            CASE WHEN len(wl) >= {ngram} THEN
                   list_transform(range(1, len(wl) - {ngram} + 2),
                                  i -> {gram})
                 WHEN len(wl) >= 1 THEN [array_to_string(wl, ' ')]
                 ELSE [] END)) AS s
          FROM w
        ),
        n AS (SELECT id, count(*) AS n FROM sh GROUP BY id),
        i AS (
          SELECT a.id AS a, b.id AS b, count(*) AS inter
          FROM sh a JOIN sh b ON a.s = b.s AND a.id <> b.id
          GROUP BY 1, 2
        )
        SELECT a, b, CAST(inter AS BIGINT) AS inter,
               CAST(na.n AS BIGINT) AS na,
               round(inter * 1.0 / na.n, 6) AS containment
        FROM i
        JOIN n na ON na.id = i.a
        WHERE {den} * inter >= {num} * na.n
    """
