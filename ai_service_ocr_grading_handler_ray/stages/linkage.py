"""Fuzzy record linkage: blocking + exact Levenshtein verification.

The entity-resolution primitive (duplicate customer/author/site names
that differ by typos): candidate pairs come from an equality BLOCK key
(a cheap deterministic projection of the name — prefix here), and each
in-block pair verifies with the exact unit-cost Levenshtein distance.
Blocking is the standard recall trade: pairs whose names differ inside
the block key are not compared (callers pick keys the expected noise
cannot touch); everything inside a block is EXACT — no similarity
estimate, the true edit distance.

Scale shape: ONE block-key-hash shuffle (add_key_partition coarse
groups), per-partition pandas block grouping, in-block pairwise verify
with a length pre-filter (|len(a) − len(b)| > max_dist can never pass)
and a loud pair cap per block (a degenerate block means the key is too
coarse).  The DP is the numpy row-vector kernel with the
running-minimum insertion trick — O(len_a) vector ops per pair, no
Python-level O(len²) loop.

Distance semantics: unit-cost insert/delete/substitute over Unicode
CODEPOINTS (the standard definition; what Python-level editdistance
libraries compute).  DuckDB's ``levenshtein`` counts UTF-8 BYTES, so
SQL parity holds exactly on ASCII names (the q167 oracle's domain) and
diverges on multi-byte codepoints — tests pin both facts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

__all__ = ["levenshtein", "fuzzy_name_join"]


def _codes(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)


def levenshtein(a: str, b: str) -> int:
    """Exact unit-cost edit distance over codepoints (numpy row DP)."""
    if a == b:
        return 0
    ca, cb = _codes(a), _codes(b)
    if not len(ca):
        return len(cb)
    if not len(cb):
        return len(ca)
    n = len(cb)
    idx = np.arange(n + 1, dtype=np.int64)
    prev = idx.copy()
    base = np.empty(n + 1, dtype=np.int64)
    for i in range(1, len(ca) + 1):
        base[0] = i
        np.minimum(prev[1:] + 1, prev[:-1] + (cb != ca[i - 1]), out=base[1:])
        # insertion chain cur[j] = min_k<=j (base[k] + (j-k)): running min
        prev = np.minimum.accumulate(base - idx) + idx
        base = np.empty(n + 1, dtype=np.int64)
    return int(prev[-1])


def fuzzy_name_join(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    name_col: str = "name",
    block_len: int = 4,
    max_dist: int = 1,
    bucket_pair_cap: int = 200_000,
    num_parts: int = 32,
) -> rd.Dataset:
    """All id pairs (a < b) whose names share the first ``block_len``
    characters (the block key) and have Levenshtein distance ≤
    ``max_dist``.  Output: (a, b, dist:int64)."""
    from .dedup import add_key_partition

    def prep(t: pa.Table) -> pa.Table:
        names = pd.Series(t[name_col].to_pylist(), dtype=object).fillna("")
        return pa.table(
            {
                "id": t[id_col],
                "name": pa.array(names, type=pa.string()),
                "_blk": pa.array(
                    names.str.slice(0, block_len), type=pa.string()
                ),
            }
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_d = [], [], []

        def emit(ia, ib, ids, dists):
            # canonical a < b by id
            x, y = ids[ia], ids[ib]
            lo = np.minimum(x, y) if x.dtype.kind in "iu" else np.where(
                x < y, x, y
            )
            hi = np.maximum(x, y) if x.dtype.kind in "iu" else np.where(
                x < y, y, x
            )
            out_a.append(lo)
            out_b.append(hi)
            out_d.append(dists)

        for _, grp in g.groupby("_blk", sort=False):
            k = len(grp)
            if k < 2:
                continue
            if k * (k - 1) // 2 > bucket_pair_cap:
                raise ValueError(
                    f"fuzzy_name_join: block with {k} names exceeds "
                    f"bucket_pair_cap={bucket_pair_cap} pairs — use a "
                    "longer block_len or raise the cap"
                )
            ids = grp["id"].to_numpy()
            names = grp["name"].to_numpy()
            lens = np.array([len(s) for s in names], dtype=np.int64)
            if max_dist == 1:
                # exact vectorized characterization of lev <= 1:
                # same length  -> hamming <= 1 (only substitution keeps
                #                 length);
                # length diff 1 -> one deletion aligns: common prefix +
                #                 common suffix >= short length
                by_len: dict[int, np.ndarray] = {
                    int(L): np.flatnonzero(lens == L)
                    for L in np.unique(lens)
                }
                mats = {
                    L: np.stack([_codes(names[i]) for i in idxs])
                    if L
                    else np.zeros((len(idxs), 0), dtype=np.uint32)
                    for L, idxs in by_len.items()
                }
                for L, idxs in by_len.items():
                    m = mats[L]
                    if len(idxs) >= 2:
                        diff = (m[:, None, :] != m[None, :, :]).sum(-1)
                        ii, jj = np.nonzero(np.triu(diff <= 1, k=1))
                        if len(ii):
                            emit(
                                idxs[ii], idxs[jj], ids,
                                diff[ii, jj].astype(np.int64),
                            )
                    if L + 1 in by_len:
                        s, t = m, mats[L + 1]
                        jdx = by_len[L + 1]
                        if len(idxs) and len(jdx) and L:
                            eqp = s[:, None, :] == t[None, :, :L]
                            pref = np.where(
                                eqp.all(-1), L, (~eqp).argmax(-1)
                            )
                            eqs = s[:, None, :] == t[None, :, 1:]
                            rev = ~eqs[:, :, ::-1]
                            suf = np.where(eqs.all(-1), L, rev.argmax(-1))
                            ii, jj = np.nonzero(pref + suf >= L)
                            if len(ii):
                                emit(
                                    idxs[ii], jdx[jj], ids,
                                    np.ones(len(ii), dtype=np.int64),
                                )
                        elif len(idxs) and len(jdx) and L == 0:
                            # '' vs any 1-char name: always distance 1
                            ii, jj = np.meshgrid(
                                np.arange(len(idxs)), np.arange(len(jdx)),
                                indexing="ij",
                            )
                            emit(
                                idxs[ii.ravel()], jdx[jj.ravel()], ids,
                                np.ones(ii.size, dtype=np.int64),
                            )
            else:
                order = np.argsort(ids, kind="stable")
                ids_o, names_o, lens_o = ids[order], names[order], lens[order]
                for i in range(k):
                    for j in range(i + 1, k):
                        if abs(int(lens_o[i]) - int(lens_o[j])) > max_dist:
                            continue
                        d = levenshtein(names_o[i], names_o[j])
                        if d <= max_dist:
                            out_a.append(np.array([ids_o[i]]))
                            out_b.append(np.array([ids_o[j]]))
                            out_d.append(np.array([d], dtype=np.int64))
        if not out_a:
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype=g["id"].dtype),
                    "b": pd.Series([], dtype=g["id"].dtype),
                    "dist": pd.Series([], dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                "a": pd.Series(np.concatenate(out_a), dtype=g["id"].dtype),
                "b": pd.Series(np.concatenate(out_b), dtype=g["id"].dtype),
                "dist": pd.Series(
                    np.concatenate(out_d), dtype=np.int64
                ),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .map_batches(
            lambda t: add_key_partition(t, "_blk", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(verify, batch_format="pandas")
    )
