"""Distributed classifier evaluation: exact ROC-AUC + threshold metrics.

The eval step every quality-classifier curation loop needs (cf. the
fastText/logreg quality filters of CCNet/RefinedWeb — this engine's
q120/q158): given per-document (score, label), compute the exact
tie-corrected ROC-AUC (Mann-Whitney rank form) and the confusion /
precision / recall at a decision threshold.

Scale shape: the cluster reduces rows to per-DISTINCT-SCORE
(n_pos, n_neg) counts — per-batch Arrow group_by partials, then ONE
small groupby — so the driver fold is |distinct scores|-sized, never
row-count-sized.  Callers with continuous scores must quantize first
(``decimals``); classifier scores are typically already bucketed (and
quantizing IS the standard large-scale AUC recipe — a 1e-4 grid bounds
the fold at ~1e4 rows for [0,1] scores with < 1e-4 AUC error; with
``decimals=None`` the fold is exact).

All rank arithmetic is INTEGER (2·ranksum form, Python ints on the
driver — no int64 overflow at any corpus size, no FP association
drift), with exactly one float division per output metric, so the SQL
oracle (:func:`binary_eval_sql`) reproduces every value bit-for-bit.

Reference anchor: the reference grades documents and tallies
correct/incorrect per rubric (engine/core/service_handler.py:103-139);
this is the corpus-scale generalization of that accuracy tally.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Sum

from .collect import collect_table
from .selection import round_half_away

__all__ = [
    "binary_eval", "binary_eval_sql", "calibration_bins", "calibration_sql",
]


def binary_eval(
    ds: rd.Dataset,
    *,
    score_col: str = "score",
    label_col: str = "label",
    threshold: float = 0.5,
    decimals: int | None = None,
) -> pd.DataFrame:
    """One-row DataFrame: n_pos, n_neg, auc, tp, fp, fn, tn, accuracy,
    prec, rec.  ``label_col`` must be boolean (or 0/1); predictions are
    positive when ``score >= threshold``.  AUC uses average ranks for
    ties (the exact Mann-Whitney statistic).

    ``decimals`` rounds scores half-away first (bounds the driver fold
    for continuous scores); None keeps scores exact.
    """

    def partial(t: pa.Table) -> pa.Table:
        s = t[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if decimals is not None:
            s = round_half_away(s, decimals)
        lab = t[label_col].to_numpy(zero_copy_only=False).astype(bool)
        g = pa.table(
            {"score": pa.array(s, type=pa.float64()), "label": pa.array(lab)}
        ).group_by(["score", "label"]).aggregate([("label", "count")])
        return g.rename_columns(["score", "label", "n"])

    counts = collect_table(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["score", "label"])
        .aggregate(Sum("n", alias_name="n"))
    ).to_pandas()
    if counts.empty or not counts.loc[counts["label"], "n"].sum() or not counts.loc[
        ~counts["label"], "n"
    ].sum():
        raise ValueError("binary_eval needs at least one positive and one negative")

    # |distinct scores|-sized exact fold, Python-int rank arithmetic.
    piv = (
        counts.pivot_table(index="score", columns="label", values="n", fill_value=0)
        .reindex(columns=[False, True], fill_value=0)
        .sort_index()
    )
    ng = [int(v) for v in piv[False].to_numpy()]
    p = [int(v) for v in piv[True].to_numpy()]
    scores = piv.index.to_numpy()
    P, N = sum(p), sum(ng)
    rs2 = 0  # 2 * rank-sum of positives (average ranks over ties)
    c = 0
    for pi, ni in zip(p, ng):
        t = pi + ni
        rs2 += pi * (2 * c + t + 1)
        c += t
    auc = (rs2 - P * (P + 1)) / (2.0 * P * N)
    pred_pos = scores >= threshold
    tp = sum(pi for pi, m in zip(p, pred_pos) if m)
    fp = sum(ni for ni, m in zip(ng, pred_pos) if m)
    fn, tn = P - tp, N - fp
    out = pd.DataFrame(
        {
            "n_pos": [P],
            "n_neg": [N],
            "auc": [auc],
            "tp": [tp],
            "fp": [fp],
            "fn": [fn],
            "tn": [tn],
            "accuracy": [(tp + tn) / float(P + N)],
            "prec": [tp / float(tp + fp) if tp + fp else float("nan")],
            "rec": [tp / float(P)],
        }
    )
    for col in ("n_pos", "n_neg", "tp", "fp", "fn", "tn"):
        out[col] = out[col].astype(np.int64)
    for col in ("auc", "accuracy", "prec", "rec"):
        out[col] = round_half_away(out[col].to_numpy(dtype=np.float64), 6)
    return out


def binary_eval_sql(scored_cte: str, *, threshold: float = 0.5) -> str:
    """DuckDB replay of :func:`binary_eval` (single-generator policy:
    the oracle is GENERATED from the same formulas the engine runs).
    ``scored_cte`` must define a CTE ``s`` with columns
    (score DOUBLE, label BOOLEAN); scores must already be quantized
    exactly as the engine saw them."""
    return f"""
        WITH {scored_cte},
        g AS (
          SELECT score,
                 sum(CASE WHEN label THEN 1 ELSE 0 END) AS p,
                 sum(CASE WHEN label THEN 0 ELSE 1 END) AS ng,
                 count(*) AS t
          FROM s GROUP BY score
        ),
        w AS (
          SELECT score, p, ng, t,
                 coalesce(sum(t) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
          FROM g
        ),
        tot AS (
          SELECT sum(p) AS pos, sum(ng) AS neg,
                 sum(p * (2*c + t + 1)) AS rs2,
                 sum(CASE WHEN score >= {threshold!r} THEN p ELSE 0 END) AS tp,
                 sum(CASE WHEN score >= {threshold!r} THEN ng ELSE 0 END) AS fp
          FROM w
        )
        SELECT CAST(pos AS BIGINT) AS n_pos, CAST(neg AS BIGINT) AS n_neg,
               round((rs2 - pos * (pos + 1)) / (2.0 * pos * neg), 6) AS auc,
               CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
               CAST(pos - tp AS BIGINT) AS fn, CAST(neg - fp AS BIGINT) AS tn,
               round((tp + neg - fp) / CAST(pos + neg AS DOUBLE), 6) AS accuracy,
               round(tp / CAST(tp + fp AS DOUBLE), 6) AS prec,
               round(tp / CAST(pos AS DOUBLE), 6) AS rec
        FROM tot
    """


def calibration_bins(
    ds: rd.Dataset,
    *,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
    round_to: int = 6,
) -> pd.DataFrame:
    """Reliability table + Expected Calibration Error — the companion
    readout to :func:`binary_eval`: AUC says whether the score RANKS
    documents correctly; calibration says whether score 0.8 actually
    means "80% positive", which is what a token-budgeted curation
    pipeline needs before using scores as sampling WEIGHTS (q131-style)
    rather than a threshold.

        bin    = min(floor(score·k), k-1)     (equal-width on [0, 1])
        conf_b = Σ_b score / n_b              (mean predicted)
        acc_b  = Σ_b label / n_b              (observed rate)
        ece    = Σ_b (n_b / N) · |acc_b − conf_b|

    Scale shape: per-batch (bin, n, Σscore, Σlabel) Arrow partials,
    ONE k-row groupby, k-row driver fold.  Scores must be the result
    of the SAME IEEE-double expression on both engines (the caller's
    contract — a single correctly-rounded division keeps bin edges
    bit-identical); labels are 0/1 ints.

    Output: one row per OCCUPIED bin (bin:int64, n:int64, conf, acc,
    gap, ece:f64 rounded; ece repeated on every row — it is the
    n-weighted sum over the same table, kept denormalized so the
    single result stays one relation).  SQL replay is GENERATED by
    :func:`calibration_sql`."""

    def partial(t: pa.Table) -> pa.Table:
        s = t[score_col].to_numpy(zero_copy_only=False).astype(np.float64)
        lab = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = ~(np.isnan(s))
        s, lab = s[ok], lab[ok]
        b = np.minimum(np.floor(s * n_bins), n_bins - 1).astype(np.int64)
        g = pa.table(
            {"bin": pa.array(b), "score": pa.array(s),
             "label": pa.array(lab)}
        ).group_by("bin").aggregate(
            [("score", "sum"), ("label", "sum"), ([], "count_all")]
        )
        return g

    c = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("bin")
        .aggregate(
            Sum("score_sum", alias_name="s"),
            Sum("label_sum", alias_name="l"),
            Sum("count_all", alias_name="n"),
        )
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    if not len(c):
        return pd.DataFrame(
            {"bin": pd.Series([], dtype=np.int64),
             "n": pd.Series([], dtype=np.int64),
             "conf": pd.Series([], dtype=np.float64),
             "acc": pd.Series([], dtype=np.float64),
             "gap": pd.Series([], dtype=np.float64),
             "ece": pd.Series([], dtype=np.float64)}
        )
    n = c["n"].to_numpy(dtype=np.float64)
    conf = c["s"].to_numpy(dtype=np.float64) / n
    acc = c["l"].to_numpy(dtype=np.float64) / n
    gap = np.abs(acc - conf)
    ece = float((n / n.sum() * gap).sum())
    return pd.DataFrame(
        {
            "bin": c["bin"].astype(np.int64),
            "n": c["n"].astype(np.int64),
            "conf": round_half_away(conf, round_to),
            "acc": round_half_away(acc, round_to),
            "gap": round_half_away(gap, round_to),
            "ece": round_half_away(np.full(len(c), ece), round_to),
        }
    )


def calibration_sql(
    scored_cte: str,
    *,
    n_bins: int = 10,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`calibration_bins` (single-generator).
    ``scored_cte`` must define a CTE ``s`` with columns
    (score DOUBLE, label BIGINT 0/1) built from the same IEEE-double
    expression as the engine's input."""
    return f"""
        WITH {scored_cte},
        b AS (
          SELECT CAST(least(floor(score * {n_bins}), {n_bins - 1})
                      AS BIGINT) AS bin,
                 score, label
          FROM s WHERE score IS NOT NULL AND NOT isnan(score)
        ),
        c AS (
          SELECT bin, count(*) AS n,
                 sum(score) AS sc, sum(label) AS l
          FROM b GROUP BY bin
        ),
        f AS (
          SELECT bin, n,
                 sc / CAST(n AS DOUBLE) AS conf,
                 l / CAST(n AS DOUBLE) AS acc
          FROM c
        ),
        e AS (
          SELECT sum(CAST(n AS DOUBLE) / (SELECT sum(n) FROM f)
                     * abs(acc - conf)) AS ece
          FROM f
        )
        SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
               round(conf, {round_to}) AS conf,
               round(acc, {round_to}) AS acc,
               round(abs(acc - conf), {round_to}) AS gap,
               round(e.ece, {round_to}) AS ece
        FROM f CROSS JOIN e
        ORDER BY bin
    """
