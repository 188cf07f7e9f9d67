"""Windowed term co-occurrence counts + pointwise mutual information.

The phrase-mining / word2vec-prep statistic: for ordered token pairs
(a, b) with b within ``window`` positions after a in the same document,
``pmi = ln( (n_ab / N_pairs) / ((n_a / N_tok) * (n_b / N_tok)) )`` —
high-PMI pairs are collocations ("san francisco"), low-PMI high-count
pairs are boilerplate glue.  Tokenization is the q90 convention
(``string_split(text, ' ')``) with empty tokens dropped and positions
renumbered over the FILTERED stream, so the whole computation is
SQL-replayable and the oracle is GENERATED from the same parameters
(:func:`pmi_sql`, single-generator policy).

Scale design (10^12 docs):

- **Pair extraction is the map-side combiner**: per batch, one
  factorize + shifted-array doc-equality masks produce packed
  ``a*V + b`` keys for every window offset, and ONE ``np.unique``
  reduces batch pairs → batch pair TYPES before anything is shuffled.
  No per-row Python; text never outlives its task.
- **One pair shuffle, vocab²-bounded**: partial (a, b, n) rows route by
  hash(a) (all rows of a pair share its ``a``), summed with one
  vectorized pandas groupby per partition — shuffled volume is
  pair-vocab × blocks, never corpus windows.
- **Unigram side reuses** :func:`text_analysis.unigram_counts` (its own
  vocab-bounded shuffle) and broadcasts the vocab once via ``ray.put``
  with the sorted-searchsorted probe the LM scorer uses.
- The aggregated pair table is checkpointed (``materialize``) because
  the N_pairs total fold and the PMI scan both consume it; it is three
  slim columns bounded by the pair vocabulary — the same
  double-consumption tradeoff bm25's profile checkpoint documents.

Reference scope: no counterpart in the reference repo (LLM grading
handler); PMI belongs to the engine's LLM-curation battery (collocation
mining for tokenizer vocab audits, boilerplate-glue detection).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .text_analysis import batch_words


def pair_counts_partial(
    t: pa.Table,
    *,
    text_col: str = "text",
    window: int = 2,
    with_unigrams: bool = False,
) -> pa.Table:
    """Batch kernel: windowed ordered-pair type counts (a, b, n).
    Empty tokens are dropped BEFORE pairing (positions renumber over the
    filtered stream, matching the SQL row_number replay).

    ``with_unigrams`` additionally emits the batch's unigram type
    counts as rows with ``b == ""`` — a value no real token can take
    after the empty-drop — so PMI's unigram side rides the SAME
    tokenize pass and the same shuffle instead of re-reading the
    corpus (the one-pass two-output trick unigram_counts uses for
    mask_col)."""
    texts = t[text_col].to_pylist()
    words, lens = batch_words(texts)
    empty = pa.table(
        {
            "a": pa.array([], type=pa.string()),
            "b": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
        }
    )
    if not len(words):
        return empty
    doc = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    m = words != ""
    w, d = words[m], doc[m]
    if not len(w):
        return empty
    codes, uniq = pd.factorize(w)
    v = len(uniq)
    terms = np.asarray(uniq, dtype=object)
    keys = []
    for off in range(1, window + 1):
        if len(w) > off:
            same = d[:-off] == d[off:]
            keys.append(codes[:-off][same].astype(np.int64) * v + codes[off:][same])
    a_parts, b_parts, n_parts = [], [], []
    if keys:
        uk, c = np.unique(np.concatenate(keys), return_counts=True)
        a_parts.append(terms[uk // v])
        b_parts.append(terms[uk % v])
        n_parts.append(c.astype(np.int64))
    if with_unigrams:
        a_parts.append(terms)
        b_parts.append(np.full(v, "", dtype=object))
        n_parts.append(np.bincount(codes, minlength=v).astype(np.int64))
    if not a_parts:
        return empty
    return pa.table(
        {
            "a": pa.array(np.concatenate(a_parts), type=pa.string()),
            "b": pa.array(np.concatenate(b_parts), type=pa.string()),
            "n": pa.array(np.concatenate(n_parts)),
        }
    )


def pair_counts(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    window: int = 2,
    num_parts: int = 32,
    with_unigrams: bool = False,
) -> rd.Dataset:
    """Corpus-wide windowed pair counts as a Dataset of (a, b, n): the
    per-batch combiner above, then ONE hash(a) shuffle with a vectorized
    pandas sum per partition.  With ``with_unigrams`` the unigram type
    counts ride along as ``b == ""`` rows (see pair_counts_partial)."""
    from .dedup import add_key_partition

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby(["a", "b"], sort=False)["n"].sum().reset_index()
        r["n"] = r["n"].astype("int64")
        return r

    return (
        ds.map_batches(
            lambda t: pair_counts_partial(
                t, text_col=text_col, window=window,
                with_unigrams=with_unigrams,
            ),
            batch_format="pyarrow",
            batch_size=16384,
        )
        .map_batches(
            lambda t: add_key_partition(t, "a", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(agg, batch_format="pandas")
    )


def pmi_pairs(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    window: int = 2,
    min_count: int = 5,
    num_parts: int = 32,
) -> rd.Dataset:
    """PMI over windowed ordered pairs: Dataset of (a, b, n, pmi) for
    pairs with ``n >= min_count``.  PMI uses the full (unfiltered) pair
    and token totals, so min_count prunes output rows without biasing
    the probabilities.  ONE tokenize pass and ONE shuffle serve both
    sides: the unigram counts ride the pair stream as ``b == ""`` rows
    and split off after the aggregation."""
    import pyarrow.compute as pc

    from .collect import collect_table

    both = pair_counts(
        ds, text_col=text_col, window=window, num_parts=num_parts,
        with_unigrams=True,
    ).materialize()

    def only_pairs(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.equal(t["b"], "")))

    def only_unigrams(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["b"], "")).select(["a", "n"])

    prs = both.map_batches(only_pairs, batch_format="pyarrow")

    def total_partial(t: pa.Table) -> pa.Table:
        return pa.table({"t": pa.array([int(np.sum(t["n"].to_numpy()))])})

    tot = collect_table(prs.map_batches(total_partial, batch_format="pyarrow"))
    np_total = float(sum(tot["t"].to_pylist()))
    uni = collect_table(both.map_batches(only_unigrams, batch_format="pyarrow"))
    toks = uni["a"].to_pandas().to_numpy(dtype=object)
    cnts = uni["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    nw_total = float(cnts.sum())
    order = np.argsort(toks, kind="stable")
    vocab_ref = ray.put((toks[order], cnts[order]))

    def score(t: pa.Table) -> pa.Table:
        vt, vc = ray.get(vocab_ref)
        a = t["a"].to_pandas().to_numpy(dtype=object)
        b = t["b"].to_pandas().to_numpy(dtype=object)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        ca = vc[np.searchsorted(vt, a)]
        cb = vc[np.searchsorted(vt, b)]
        pmi = np.log((n / np_total) / ((ca / nw_total) * (cb / nw_total)))
        out = t.append_column("pmi", pa.array(pmi))
        return out.filter(pa.array(t["n"].to_numpy() >= min_count))

    return prs.map_batches(score, batch_format="pyarrow")


def pmi_sql(
    *,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 2,
    min_count: int = 5,
    round_to: int = 4,
) -> str:
    """DuckDB replay of :func:`pmi_pairs`, generated from the SAME
    parameters (single-generator policy): identical tokenizer, identical
    empty-drop + renumber, identical window join, and the identical
    division/ln ordering so the doubles agree bit-for-bit before
    rounding."""
    return f"""
        WITH toks0 AS (
          SELECT {id_col}, u.i AS pos0,
                 string_split({text_col}, ' ')[u.i] AS w
          FROM {table},
          LATERAL (SELECT unnest(generate_series(
            1, length({text_col}) - length(replace({text_col}, ' ', '')) + 1
          )) AS i) u
        ),
        toks AS (
          SELECT {id_col},
                 row_number() OVER (PARTITION BY {id_col} ORDER BY pos0) AS pos,
                 w
          FROM toks0 WHERE w <> ''
        ),
        uni AS (SELECT w, count(*) AS n FROM toks GROUP BY w),
        nw AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM uni),
        prs AS (
          SELECT x.w AS a, y.w AS b, count(*) AS n
          FROM toks x JOIN toks y
            ON x.{id_col} = y.{id_col}
           AND y.pos BETWEEN x.pos + 1 AND x.pos + {int(window)}
          GROUP BY x.w, y.w
        ),
        npt AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM prs)
        SELECT a, b, prs.n AS n,
               round(ln((prs.n / npt.t) /
                        ((ua.n / nw.t) * (ub.n / nw.t))), {int(round_to)})
                 AS pmi
        FROM prs
        CROSS JOIN npt CROSS JOIN nw
        JOIN uni ua ON prs.a = ua.w
        JOIN uni ub ON prs.b = ub.w
        WHERE prs.n >= {int(min_count)}
    """
