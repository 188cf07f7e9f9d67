"""Winnowing document fingerprints + cross-doc overlap detection
(Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the MOSS algorithm).

Robust fingerprint SELECTION: hash every word ``ngram``-gram, slide a
window of ``window`` consecutive gram hashes over each document, and in
every window pick the minimum hash (ties → the RIGHTMOST minimum, the
"robust winnowing" rule that makes picks stable under local edits).
Consecutive windows usually pick the same gram, so the fingerprint set
is ~2/(window+1) of the grams — and the guarantee holds that any shared
substring of at least ``window + ngram − 1`` words produces at least
one SHARED fingerprint.  Cross-doc fingerprint overlap is therefore a
sub-quadratic detector for shared passages (plagiarism, mirrored
boilerplate, syndicated articles) with a tunable guarantee — the
fingerprint-selection counterpart of the full-postings containment
join (stages/simjoin.py).

Gram hashes are ``splitmix64(polyhash64(gram string))`` — the package's
SQL-REPLAYABLE hash pair — so the whole pipeline (picks included) has
an exact DuckDB oracle (:func:`winnow_overlap_sql`, single-generator:
the replay reproduces the rightmost-min picks via
``row_number() OVER (ORDER BY h ASC, pos DESC)``).

Scale shape: the fingerprint scan is shuffle-free (text never outlives
its task; the sliding-window min is a vectorized stride trick, no
per-window Python); the overlap join ships slim (fingerprint, id) rows
through ONE coarse hash cogroup with in-partition vectorized pair
expansion (bucket cap loud), then ONE slim (a, b) pair-count groupby.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

# a fingerprint shared by this many docs is template noise for the
# pair expansion (quadratic); fail loudly like the simjoin caps
BUCKET_DOC_CAP = 2_000


def _winnow_hashes(h: np.ndarray, window: int) -> np.ndarray:
    """Fingerprint values (unique) from one doc's gram-hash sequence:
    rightmost-min per sliding window, consecutive-pick dedupe."""
    n = len(h)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n <= window:
        # single window over everything: rightmost min
        m = h.min()
        pos = np.flatnonzero(h == m)[-1]
        return np.unique(h[pos : pos + 1])
    win = np.lib.stride_tricks.sliding_window_view(h, window)
    rev_arg = np.argmin(win[:, ::-1], axis=1)
    idx = window - 1 - rev_arg  # rightmost min per window
    pos = np.arange(len(win)) + idx
    keep = np.empty(len(pos), dtype=bool)
    keep[0] = True
    keep[1:] = pos[1:] != pos[:-1]  # winnowing dedupe: same pick once
    return np.unique(h[pos[keep]])


def winnow_doc(words: list, *, ngram: int, window: int) -> np.ndarray:
    """Fingerprint hash values (unique, sorted) for one document's word
    list — reference implementation used by the batch kernel's tests."""
    from .hashing import polyhash64, splitmix64

    if len(words) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(words) < ngram:
        grams = [" ".join(words)]
    else:
        grams = [
            " ".join(words[i : i + ngram])
            for i in range(len(words) - ngram + 1)
        ]
    with np.errstate(over="ignore"):
        h = splitmix64(polyhash64(pa.array(grams, type=pa.string())))
    return _winnow_hashes(h, window)


def add_winnow_fingerprints(
    batch: pa.Table,
    *,
    id_col: str,
    text_col: str,
    ngram: int = 3,
    window: int = 4,
) -> pa.Table:
    """(id, fp:int64) exploded fingerprint rows for a batch — the slim
    representation the overlap join shuffles.  Empty texts drop.

    All the batch's gram strings hash in ONE polyhash64/splitmix64 call
    (a per-doc hash call was 10× the whole pipeline's cost); only the
    per-doc sliding-window pick runs per segment."""
    from .hashing import polyhash64, splitmix64

    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    all_grams: list = []
    counts = np.zeros(len(ids), dtype=np.int64)
    for di, t in enumerate(texts):
        words = (t or "").lower().split()
        if not words:
            continue
        if len(words) < ngram:
            all_grams.append(" ".join(words))
            counts[di] = 1
        else:
            c = len(words) - ngram + 1
            all_grams.extend(
                " ".join(words[i : i + ngram]) for i in range(c)
            )
            counts[di] = c
    if not all_grams:
        return pa.table(
            {"id": pa.array([], type=batch[id_col].type),
             "fp": pa.array([], type=pa.int64())}
        )
    with np.errstate(over="ignore"):
        h_all = splitmix64(
            polyhash64(pa.array(all_grams, type=pa.string()))
        )
    offs = np.concatenate([[0], np.cumsum(counts)])
    ids_out: list = []
    fps_out: list = []
    for di in range(len(ids)):
        if not counts[di]:
            continue
        fps = _winnow_hashes(h_all[offs[di] : offs[di + 1]], window)
        if len(fps):
            ids_out.extend([ids[di]] * len(fps))
            fps_out.extend(fps.view(np.int64).tolist())
    return pa.table(
        {
            "id": pa.array(ids_out, type=batch[id_col].type),
            "fp": pa.array(fps_out, type=pa.int64()),
        }
    )


def winnow_overlap(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    window: int = 4,
    min_shared: int = 2,
    num_parts: int = 32,
) -> rd.Dataset:
    """All document pairs (a < b) sharing >= ``min_shared`` winnowing
    fingerprints → (a, b, shared:int64).  Any common passage of at
    least ``window + ngram − 1`` words guarantees one shared
    fingerprint; raise ``min_shared`` to require longer/repeated
    overlap.  See module docstring for the scale shape."""
    from .dedup import _column_type, add_key_partition

    id_type = _column_type(ds, id_col, pa.int64())

    fp_rows = ds.map_batches(
        lambda t: add_winnow_fingerprints(
            t, id_col=id_col, text_col=text_col, ngram=ngram, window=window
        ),
        batch_format="pyarrow",
    )

    def pairs_partition(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {"a": pd.Series([], dtype=g["id"].dtype),
                 "b": pd.Series([], dtype=g["id"].dtype),
                 "n": pd.Series([], dtype=np.int64)}
            )
        # dedupe (fp, id): duplicate doc ids in the input (or the same
        # id re-emitting a fingerprint) would otherwise produce a == b
        # self-pairs and double counts, diverging from the oracle's
        # DISTINCT picks + a < b join
        sg = (
            g.sort_values(["fp", "id"], kind="mergesort")
            .drop_duplicates(["fp", "id"])
        )
        fps = sg["fp"].to_numpy()
        ids = sg["id"].to_numpy()
        new = np.empty(len(fps), dtype=bool)
        new[0] = True
        new[1:] = fps[1:] != fps[:-1]
        seg = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, len(fps)))
        if sizes.max() > BUCKET_DOC_CAP:
            raise ValueError(
                f"winnow_overlap: a fingerprint shared by "
                f"{int(sizes.max())} docs exceeds BUCKET_DOC_CAP="
                f"{BUCKET_DOC_CAP} — template noise; raise ngram/window "
                "or pre-filter boilerplate"
            )
        pos = np.arange(len(fps)) - starts[seg]
        lead = sizes[seg] - 1 - pos
        total = int(lead.sum())
        if not total:
            return pd.DataFrame(
                {"a": pd.Series([], dtype=g["id"].dtype),
                 "b": pd.Series([], dtype=g["id"].dtype),
                 "n": pd.Series([], dtype=np.int64)}
            )
        run_start = np.cumsum(lead) - lead
        run_id = np.repeat(np.arange(len(lead)), lead)
        off = np.arange(total, dtype=np.int64) - run_start[run_id]
        a_idx = run_id
        b_idx = run_id + 1 + off
        out = (
            pd.DataFrame({"a": ids[a_idx], "b": ids[b_idx]})
            .groupby(["a", "b"], sort=False).size().reset_index(name="n")
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    # the (a, b) count-fold uses the salted-partition pattern, NOT a
    # two-column Ray groupby (dedupe_pairs measured that sort-aggregate
    # ~30× slower at 500k pair rows): all copies of a pair share ``a``,
    # so one hash(a) shuffle co-locates them and a vectorized pandas
    # groupby-sum finishes in-partition
    def fold_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["a", "b"], sort=False)["n"].sum().reset_index()
            .rename(columns={"n": "shared"})
        )
        out = out[out["shared"] >= min_shared]
        out["shared"] = out["shared"].astype(np.int64)
        return out.drop(columns=["_part"], errors="ignore")

    pair_counts = (
        fp_rows.map_batches(
            lambda t: add_key_partition(t, "fp", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(pairs_partition, batch_format="pandas")
        .map_batches(
            lambda t: add_key_partition(t, "a", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(fold_pairs, batch_format="pandas")
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": t["a"].cast(id_type),
                "b": t["b"].cast(id_type),
                "shared": t["shared"].cast(pa.int64()),
            }
        )

    return pair_counts.map_batches(finish, batch_format="pyarrow")


def winnow_overlap_sql(
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram: int = 3,
    window: int = 4,
    min_shared: int = 2,
) -> str:
    """DuckDB replay of :func:`winnow_overlap` (single-generator):
    identical gram strings, polyhash64+splitmix64 hashes (GENERATED by
    the shared ``shuffle`` generators), rightmost-min picks, pair
    counting."""
    from .shuffle import polyhash64_sql, splitmix64_sql

    gram = " || ' ' || ".join(
        f"wl[i+{j}]" if j else "wl[i]" for j in range(ngram)
    )
    ph_cte = polyhash64_sql("g", "gram", out_rel="__ph", out_col="ph")
    sm = splitmix64_sql("__ph.ph")
    return f"""
        WITH RECURSIVE
        w AS (
          SELECT {id_col} AS id,
                 list_filter(string_split_regex(lower({text_col}), '\\s+'),
                             x -> x <> '') AS wl
          FROM {table}
        ),
        g AS (
          SELECT id, u.i AS pos,
                 CASE WHEN len(wl) >= {ngram} THEN {gram}
                      ELSE array_to_string(wl, ' ') END AS gram
          FROM w, LATERAL (
            SELECT unnest(generate_series(
                1, CASE WHEN len(wl) >= {ngram}
                        THEN len(wl) - {ngram} + 1
                        WHEN len(wl) >= 1 THEN 1 ELSE 0 END)) AS i) u
        ),
        {ph_cte},
        gh AS (
          SELECT g.id, g.pos, {sm} AS h
          FROM g JOIN __ph ON __ph.gram = g.gram
        ),
        n AS (SELECT id, count(*) AS ng FROM gh GROUP BY id),
        win AS (
          SELECT n.id, u.s
          FROM n, LATERAL (
            SELECT unnest(generate_series(
                1, greatest(1, ng - {window} + 1))) AS s) u
        ),
        cand AS (
          SELECT win.id, win.s, gh.pos, gh.h,
                 row_number() OVER (
                     PARTITION BY win.id, win.s
                     ORDER BY gh.h ASC, gh.pos DESC) AS rn
          FROM win JOIN gh ON gh.id = win.id
                          AND gh.pos BETWEEN win.s AND win.s + {window} - 1
        ),
        picks AS (SELECT DISTINCT id, h FROM cand WHERE rn = 1)
        SELECT a.id AS a, b.id AS b,
               CAST(count(*) AS BIGINT) AS shared
        FROM picks a JOIN picks b ON a.h = b.h AND a.id < b.id
        GROUP BY 1, 2
        HAVING count(*) >= {min_shared}
    """
