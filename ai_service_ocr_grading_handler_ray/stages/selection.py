"""Distributed exact order statistics + CCNet-style perplexity tiering.

``exact_group_quantiles`` finds, for every group, the exact
``ceil(frac * n)``-th smallest value of a column — without a distributed
sort and without ever materializing group values on the driver.  It is
the selection primitive behind ``perplexity_tiers`` (CCNet's
head/middle/tail bucketing by per-language perplexity terciles, Wenzek
et al. 2020) but works for any exact percentile/median need.

Algorithm (histogram refinement, a.k.a. distributed quickselect):

1. one scan computes per-group (count, min, max) — map-side combine via
   ``pyarrow`` ``group_by`` per batch, then a tiny Ray groupby;
2. each refinement round is ONE ``map_batches`` scan that histograms the
   active (group, interval) candidates into ``bins`` buckets, emitting
   sparse (interval, bin, count) partials summed by a hash-partitioned
   groupby (driver receives ≤ intervals × bins rows); the bucket
   containing the target rank becomes the next round's interval;
3. when a candidate interval holds ≤ ``collect_cap`` values, the values
   themselves are collected (bounded) and the rank is answered exactly.

Each scan also reports per-bucket value min/max, so the next interval
snaps to the ACTUAL value range inside the chosen bucket: the target
bucket's population shrinks ≥ ``bins``× per round (values spread) or
collapses to a point (tie run), so ``ceil(log_bins(n / collect_cap))``
rounds suffice — 3 scans for 10^12 rows at the defaults — regardless of
value distribution (a bucket of adjacent floats resolves via one exact
equality count).  Driver state: #groups × #fracs targets + one
bins-sized (count, min, max) triple per active interval.

The reference engine (LearnSenseLabs/ai-service-ocr-grading-handler) has no
quantile/tiering operator; this module is part of the added
LLM-curation surface (SURVEY.md §2.5+).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from fractions import Fraction
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Max, Min, Sum


def round_half_away(x: np.ndarray, nd: int) -> np.ndarray:
    """DuckDB/SQL ROUND semantics (half away from zero) — numpy's .round
    is half-to-even and would drift from a SQL oracle on exact halves."""
    f = 10.0**nd
    return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f


# --------------------------------------------------------------------------
# exact k-th order statistic by histogram refinement
# --------------------------------------------------------------------------

@dataclass
class _Target:
    group: object
    k: int            # 1-based rank within the group (k-th smallest)
    lo: float
    hi: float
    inc: bool         # is `hi` inclusive? (True only while the interval
                      # still ends at the group max)
    before: int = 0   # values of the group strictly below the interval
    state: str = "refine"   # refine | collect | twoval | done
    rank_in: int = 0  # 1-based rank within the current interval
    value: float = math.nan


def _group_stats(ds: rd.Dataset, value_col: str, group_col: str) -> "dict":
    """One scan → {group: (n, vmin, vmax)}; rows with a null group or a
    null/NaN value are ignored (callers needing SQL null-group semantics
    should fill_null first)."""

    def partial(t: pa.Table) -> pa.Table:
        t = t.select([group_col, value_col]).drop_null()
        if pa.types.is_floating(t[value_col].type):
            t = t.filter(pc.invert(pc.is_nan(t[value_col])))
        return t.group_by(group_col).aggregate(
            [(value_col, "min"), (value_col, "max"), (value_col, "count")]
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    agg = (
        parts.groupby(group_col)
        .aggregate(
            Min(f"{value_col}_min", alias_name="vmin"),
            Max(f"{value_col}_max", alias_name="vmax"),
            Sum(f"{value_col}_count", alias_name="n"),
        )
        .to_pandas()
    )
    return {
        row[group_col]: (int(row["n"]), float(row["vmin"]), float(row["vmax"]))
        for _, row in agg.iterrows()
    }


def _interval_mask(v: np.ndarray, gidx: np.ndarray, gi: int,
                   lo: float, hi: float, inc: bool) -> np.ndarray:
    if lo == hi:
        return (gidx == gi) & (v == lo)
    m = (gidx == gi) & (v >= lo)
    return m & ((v < hi) | (v == hi)) if inc else m & (v < hi)


def _interval_counts(
    ds: rd.Dataset,
    value_col: str,
    group_col: str,
    intervals: list[tuple],
    bins: int,
    num_parts: int,
) -> dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """One scan → per-interval (bin counts, bin value-min, bin value-max).
    intervals: (group, lo, hi, inc); a degenerate lo == hi interval counts
    v == lo into bin 0.  Partials are sparse (interval, bin, count, vmin,
    vmax) rows combined per batch, merged in one tiny hash-partitioned
    groupby — the scan's shuffle volume is ≤ batches × intervals ×
    distinct-bins-per-batch rows, and the driver sees ≤ intervals × bins
    rows.  The per-bin min/max let the driver snap the next interval to
    the ACTUAL value range inside the chosen bucket, so tie runs resolve
    in one round instead of bisecting down to 1 ulp."""
    from .skew import partitioned_groupby

    groups = list({iv[0] for iv in intervals})
    gset = pa.array(groups)
    gid_of = {g: i for i, g in enumerate(groups)}
    edges = [
        None if lo == hi else np.linspace(lo, hi, bins + 1)
        for (_, lo, hi, _) in intervals
    ]

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        gidx = pc.fill_null(
            pc.index_in(t[group_col], value_set=gset), -1
        ).to_numpy(zero_copy_only=False)
        ivs, bs, cs, mns, mxs = [], [], [], [], []
        for i, (g, lo, hi, inc) in enumerate(intervals):
            m = _interval_mask(v, gidx, gid_of[g], lo, hi, inc)
            if not m.any():
                continue
            vm = v[m]
            if edges[i] is None:
                ivs.append(np.array([i], dtype=np.int64))
                bs.append(np.array([0], dtype=np.int64))
                cs.append(np.array([len(vm)], dtype=np.int64))
                mns.append(np.array([lo], dtype=np.float64))
                mxs.append(np.array([lo], dtype=np.float64))
                continue
            b = np.searchsorted(edges[i], vm, side="right") - 1
            np.clip(b, 0, bins - 1, out=b)
            cnt = np.bincount(b, minlength=bins)
            nz = np.flatnonzero(cnt)
            bmin = np.full(bins, np.inf)
            bmax = np.full(bins, -np.inf)
            np.minimum.at(bmin, b, vm)
            np.maximum.at(bmax, b, vm)
            ivs.append(np.full(len(nz), i, dtype=np.int64))
            bs.append(nz.astype(np.int64))
            cs.append(cnt[nz].astype(np.int64))
            mns.append(bmin[nz])
            mxs.append(bmax[nz])
        if not ivs:
            return pa.table(
                {"_iv": pa.array([], pa.int64()), "_bin": pa.array([], pa.int64()),
                 "_cnt": pa.array([], pa.int64()),
                 "_vmin": pa.array([], pa.float64()),
                 "_vmax": pa.array([], pa.float64())}
            )
        return pa.table(
            {"_iv": pa.array(np.concatenate(ivs)),
             "_bin": pa.array(np.concatenate(bs)),
             "_cnt": pa.array(np.concatenate(cs)),
             "_vmin": pa.array(np.concatenate(mns)),
             "_vmax": pa.array(np.concatenate(mxs))}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    summed = partitioned_groupby(
        partials,
        ["_iv", "_bin"],
        {"n": ("_cnt", "sum"), "vmin": ("_vmin", "min"), "vmax": ("_vmax", "max")},
        num_parts=num_parts,
    ).to_pandas()
    out = {
        i: (np.zeros(bins, dtype=np.int64), np.full(bins, np.inf),
            np.full(bins, -np.inf))
        for i in range(len(intervals))
    }
    for _, row in summed.iterrows():
        i, b = int(row["_iv"]), int(row["_bin"])
        out[i][0][b] = int(row["n"])
        out[i][1][b] = float(row["vmin"])
        out[i][2][b] = float(row["vmax"])
    return out


def _collect_values(
    ds: rd.Dataset,
    value_col: str,
    group_col: str,
    targets: list[_Target],
) -> list[np.ndarray]:
    """One scan gathering the (≤ collect_cap each) values inside every
    collect-state target's interval; returns per-target sorted arrays."""
    groups = list({t.group for t in targets})
    gset = pa.array(groups)
    gid_of = {g: i for i, g in enumerate(groups)}
    specs = [(gid_of[t.group], t.lo, t.hi, t.inc) for t in targets]

    def grab(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        gidx = pc.fill_null(
            pc.index_in(t[group_col], value_set=gset), -1
        ).to_numpy(zero_copy_only=False)
        tid_out, val_out = [], []
        for i, (gi, lo, hi, inc) in enumerate(specs):
            m = _interval_mask(v, gidx, gi, lo, hi, inc)
            if m.any():
                vals = v[m]
                tid_out.append(np.full(len(vals), i, dtype=np.int64))
                val_out.append(vals)
        if not tid_out:
            return pa.table(
                {"_tid": pa.array([], pa.int64()), "_v": pa.array([], pa.float64())}
            )
        return pa.table(
            {"_tid": pa.array(np.concatenate(tid_out)),
             "_v": pa.array(np.concatenate(val_out))}
        )

    tbl = pa.concat_tables(_gather(ds, grab))
    tid = tbl["_tid"].to_numpy(zero_copy_only=False)
    vv = tbl["_v"].to_numpy(zero_copy_only=False)
    return [np.sort(vv[tid == i]) for i in range(len(targets))]


def _gather(ds: rd.Dataset, fn) -> list[pa.Table]:
    from .collect import collect_tables

    return collect_tables(
        ds.map_batches(fn, batch_format="pyarrow", batch_size=65536),
        drop_empty=False,
    )


def exact_group_quantiles(
    ds: rd.Dataset,
    value_col: str,
    group_col: str,
    fracs: Sequence[float | Fraction] = (Fraction(1, 2),),
    *,
    bins: int = 1024,
    collect_cap: int = 100_000,
    num_parts: int = 16,
    max_rounds: int = 24,
) -> dict:
    """For each group, the EXACT ``ceil(frac * n)``-th smallest value of
    ``value_col`` per frac (n = the group's non-null count) — identical
    to the value at ``row_number() = ceil(frac*n)`` under any SQL
    ``ORDER BY value`` (tiebreak-independent: the value at a rank is a
    property of the multiset).

    Pass ``fractions.Fraction`` fracs when the rank formula must match a
    SQL ``ceil(n/3.0)`` exactly; float fracs are fine away from exact
    multiples.  Returns {group: [v_frac0, v_frac1, ...]}; empty groups
    are absent.  The input is scanned 1 + rounds (+1 collect) times —
    materialize a slim (group, value) projection first when upstream is
    expensive.

    Scale: driver holds #groups × #fracs targets and ≤ intervals × bins
    counts; per-round shuffle is sparse count triples; the final collect
    is ≤ collect_cap values per target.  Values must be finite (floats
    or ints; int |v| > 2^53 loses exactness in the float64 binning).
    """
    stats = _group_stats(ds, value_col, group_col)
    targets: list[_Target] = []
    order: dict[object, list[int]] = {}
    for group, (n, vmin, vmax) in stats.items():
        if not (math.isfinite(vmin) and math.isfinite(vmax)):
            raise ValueError(f"non-finite values in group {group!r}")
        order[group] = []
        for f in fracs:
            k = min(n, max(1, math.ceil(f * n)))
            t = _Target(group, k, vmin, vmax, inc=True)
            if vmin == vmax:
                t.state, t.value = "done", vmin
            elif n <= collect_cap:
                t.state, t.rank_in = "collect", k
            order[group].append(len(targets))
            targets.append(t)

    for _ in range(max_rounds):
        active = [t for t in targets if t.state == "refine"]
        if not active:
            break
        keys = sorted({(t.group, t.lo, t.hi, t.inc) for t in active},
                      key=lambda x: (str(x[0]), x[1], x[2]))
        idx_of = {kk: i for i, kk in enumerate(keys)}
        counts = _interval_counts(ds, value_col, group_col, keys, bins, num_parts)
        for t in active:
            i = idx_of[(t.group, t.lo, t.hi, t.inc)]
            cnt, bmn, bmx = counts[i]
            cum = np.cumsum(cnt)
            r = t.k - t.before
            j = int(np.searchsorted(cum, r, side="left"))
            before_bin = int(cum[j - 1]) if j > 0 else 0
            t.before += before_bin
            t.rank_in = r - before_bin
            # snap to the ACTUAL value range inside the chosen bucket —
            # tie runs collapse to a point in one round
            blo, bhi = float(bmn[j]), float(bmx[j])
            if blo == bhi:
                # every value in the bucket IS blo
                t.state, t.value = "done", blo
            elif np.nextafter(blo, math.inf) >= bhi:
                # adjacent floats: values are exactly {blo, bhi}
                t.state, t.lo, t.hi, t.inc = "twoval", blo, bhi, True
            elif int(cnt[j]) <= collect_cap:
                t.state, t.lo, t.hi, t.inc = "collect", blo, bhi, True
            else:
                t.lo, t.hi, t.inc = blo, bhi, True
    if any(t.state == "refine" for t in targets):
        raise RuntimeError("histogram refinement did not converge "
                           f"in {max_rounds} rounds")

    twovals = [t for t in targets if t.state == "twoval"]
    if twovals:
        keys = [(t.group, t.lo, t.lo, True) for t in twovals]  # count v == lo
        counts = _interval_counts(ds, value_col, group_col, keys, 1, num_parts)
        for i, t in enumerate(twovals):
            n_lo = int(counts[i][0][0])
            t.state, t.value = "done", t.lo if t.rank_in <= n_lo else t.hi

    collects = [t for t in targets if t.state == "collect"]
    if collects:
        sorted_vals = _collect_values(ds, value_col, group_col, collects)
        for t, vals in zip(collects, sorted_vals):
            if not 1 <= t.rank_in <= len(vals):
                raise RuntimeError(
                    f"rank bookkeeping out of range for group {t.group!r}: "
                    f"rank {t.rank_in} of {len(vals)} collected values"
                )
            t.state, t.value = "done", float(vals[t.rank_in - 1])

    return {g: [targets[i].value for i in idxs] for g, idxs in order.items()}


# --------------------------------------------------------------------------
# CCNet head/middle/tail tiering
# --------------------------------------------------------------------------

def perplexity_tiers(
    docs: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "lang",
    fracs: Sequence = (Fraction(1, 3), Fraction(2, 3)),
    labels: Sequence[str] = ("tail", "middle", "head"),
    score_round: int | None = 4,
    counts=None,
    bins: int = 1024,
    collect_cap: int = 100_000,
) -> rd.Dataset:
    """CCNet-style quality tiering (Wenzek et al. 2020): score every
    document with the unigram-LM mean logprob (the KenLM-free perplexity
    proxy, ``score_unigram_logprob``), find each language's exact
    ``ceil(n/3)``/``ceil(2n/3)`` score terciles with
    ``exact_group_quantiles``, and assign head/middle/tail in one final
    shuffle-free scan (thresholds are dimension-sized → closure
    broadcast).  Higher logprob = more fluent, so ``head`` is the top
    tercile.

    The slim scored projection (id, n_tokens, score, group — no text) is
    materialized once: it is consumed by the stats scan, the refinement
    scans and the final assign, and re-tokenizing the corpus per scan
    would dominate.  ``score_round`` rounds scores (SQL half-away
    semantics) before tiering so results are stable under summation-
    order noise; thresholds are then drawn from the same rounded
    multiset a SQL oracle sees.

    Output: (id_col, n_tokens, avg_logprob, group_col, tier).
    """
    from .text_analysis import score_unigram_logprob

    if len(labels) != len(fracs) + 1:
        raise ValueError("need len(fracs) + 1 labels")
    scored = score_unigram_logprob(
        docs, counts, text_col=text_col, id_col=id_col, keep_cols=(group_col,)
    )
    if score_round is not None:
        nd = int(score_round)

        def rnd(t: pa.Table) -> pa.Table:
            v = round_half_away(
                t["avg_logprob"].to_numpy(zero_copy_only=False), nd
            )
            return t.set_column(
                t.schema.get_field_index("avg_logprob"),
                "avg_logprob",
                pa.array(v, type=pa.float64()),
            )

        scored = scored.map_batches(rnd, batch_format="pyarrow")
    scored = scored.materialize()

    th = exact_group_quantiles(
        scored, "avg_logprob", group_col, fracs,
        bins=bins, collect_cap=collect_cap,
    )
    groups = list(th.keys())
    gset = pa.array(groups)
    th_mat = np.array([th[g] for g in groups], dtype=np.float64)  # G × F
    lab = np.asarray(labels, dtype=object)

    def assign(t: pa.Table) -> pa.Table:
        s = t["avg_logprob"].to_numpy(zero_copy_only=False)
        gi = pc.fill_null(
            pc.index_in(t[group_col], value_set=gset), -1
        ).to_numpy(zero_copy_only=False)
        tier_idx = np.zeros(len(s), dtype=np.int64)
        for f in range(th_mat.shape[1]):
            tier_idx += (s > th_mat[gi, f]).astype(np.int64)
        return t.append_column("tier", pa.array(lab[tier_idx].tolist(),
                                                type=pa.string()))

    return scored.map_batches(assign, batch_format="pyarrow")


def global_top_k(
    ds: "rd.Dataset",
    *,
    k: int,
    by: list[str],
    descending: list[bool],
) -> pd.DataFrame:
    """Total-order top-k WITHOUT a global sort: every block emits its own
    top-k inside ``map_batches`` (so at most k × blocks rows exist
    anywhere), and the driver merge is one k×blocks-sized sort — the
    q77/q29 partial pattern generalized (VERDICT r3 #2 replaced
    ``ds.sort(...).limit(k)``, an all-to-all shuffle for k rows).
    Ties must be broken by the trailing ``by`` columns for a
    deterministic result."""
    asc = [not d for d in descending]

    def part(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:  # all-empty upstream blocks can arrive schema-less
            return df
        return df.sort_values(by, ascending=asc, kind="mergesort").head(k)

    out = ds.map_batches(part, batch_format="pandas").to_pandas()
    if out.empty:
        return out.reset_index(drop=True)
    return (
        out.sort_values(by, ascending=asc, kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )


def winsorize_by_group(
    ds: "rd.Dataset",
    *,
    value_col: str,
    group_col: str,
    lo: "Fraction | float" = Fraction(1, 20),
    hi: "Fraction | float" = Fraction(19, 20),
    out_col: str = "value_w",
    keep_cols: Sequence[str] = (),
) -> "rd.Dataset":
    """Per-group winsorization (outlier clipping) at EXACT group
    quantiles: values clip to [q_lo, q_hi] where q_f is the
    ``ceil(f·n)``-th smallest value of the group (``exact_group_quantiles``
    — histogram refinement, no sort, driver holds #groups × 2 values).
    One quantile pass + one shuffle-free clip scan; the quantile dict
    broadcasts once via ``ray.put``."""
    import pandas as pd
    import ray

    q = exact_group_quantiles(ds, value_col, group_col, (lo, hi))
    lo_d = {g: v[0] for g, v in q.items()}
    hi_d = {g: v[1] for g, v in q.items()}
    qref = ray.put((lo_d, hi_d))

    def clip(t: pa.Table) -> pa.Table:
        lod, hid = ray.get(qref)
        g = pd.Series(t[group_col].to_pylist())
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.minimum(
            np.maximum(v, g.map(lod).to_numpy(dtype=np.float64)),
            g.map(hid).to_numpy(dtype=np.float64),
        )
        cols = {}
        for c in keep_cols:
            cols[c] = t[c]
        cols[group_col] = t[group_col]
        cols[out_col] = pa.array(w, type=pa.float64())
        return pa.table(cols)

    return ds.map_batches(clip, batch_format="pyarrow")


def mad_outliers(
    ds: "rd.Dataset",
    *,
    value_col: str,
    group_col: str,
    k: float = 3.0,
    consistency: float = 1.4826,
    keep_cols: Sequence[str] = (),
) -> "rd.Dataset":
    """Per-group robust outlier detection by median absolute deviation:
    keep rows with ``|v - median| > k * consistency * MAD`` where both
    the median and MAD are the EXACT ``ceil(n/2)``-th smallest values
    (``exact_group_quantiles`` — histogram refinement, no sort; the SQL
    replay is a row_number rank).  Two quantile passes + one
    shuffle-free filter scan; per-group (median, threshold) pairs
    broadcast once via ``ray.put``.  The threshold product is computed
    as ``(k * consistency) * MAD`` — the same constant-folded order a
    SQL ``k * consistency * mad`` evaluates, so engine and oracle test
    bit-identical doubles."""
    import ray

    med = {
        g: v[0]
        for g, v in exact_group_quantiles(
            ds, value_col, group_col, (Fraction(1, 2),)
        ).items()
    }
    med_ref = ray.put(med)

    def adev(t: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        g = pd.Series(t[group_col].to_pylist())
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                group_col: t[group_col],
                "_adev": pa.array(
                    np.abs(v - g.map(m).to_numpy(dtype=np.float64)),
                    type=pa.float64(),
                ),
            }
        )

    dev_ds = ds.map_batches(adev, batch_format="pyarrow")
    mad = {
        g: v[0]
        for g, v in exact_group_quantiles(
            dev_ds, "_adev", group_col, (Fraction(1, 2),)
        ).items()
    }
    c = k * consistency
    thr_ref = ray.put({g: (med[g], c * mad[g]) for g in med})

    def pick(t: pa.Table) -> pa.Table:
        thr = ray.get(thr_ref)
        g = pd.Series(t[group_col].to_pylist())
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        meds = g.map({k_: p[0] for k_, p in thr.items()}).to_numpy(
            dtype=np.float64
        )
        lims = g.map({k_: p[1] for k_, p in thr.items()}).to_numpy(
            dtype=np.float64
        )
        mask = np.abs(v - meds) > lims
        return t.select([*keep_cols, group_col, value_col]).filter(
            pa.array(mask)
        )

    return ds.map_batches(pick, batch_format="pyarrow")


# --------------------------------------------------------------------------
# exact per-group Gini concentration
# --------------------------------------------------------------------------

def grouped_gini(
    ds: rd.Dataset,
    *,
    value_col: str,
    group_col: str,
) -> pd.DataFrame:
    """Exact per-group Gini coefficient of ``value_col`` (host/source
    concentration: "does one source contribute most of the bytes?" — the
    corpus-diversity dashboard next to the rollups).

    Definition (the standard sorted-rank form over ascending values
    x_1..x_n): G = Σ_i (2i − n − 1)·x_i / (n · Σ x_i).  Ties are
    order-invariant (equal values make equal terms), so the exact value
    is computable from VALUE COUNTS alone: for a run of c copies of v
    starting after cumulative count b, Σ (2i − n − 1)·v over the run
    = v · (2bc + c(c+1) − c(n+1)).

    Scale shape: per-batch Arrow (group, value) count partials → ONE
    small groupby → a |distinct (group, value)|-sized driver fold (value
    counts, never rows; lengths/ratios are low-cardinality by nature).
    Values must be non-negative integers (exact Python-int arithmetic —
    no overflow, no FP drift; one float division per group), matching
    the SQL replay in :func:`grouped_gini_sql` bit-for-bit.
    """

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([group_col, value_col]).group_by(
            [group_col, value_col]
        ).aggregate([(value_col, "count")])
        return g.rename_columns([group_col, value_col, "n"])

    from .collect import collect_table

    counts = collect_table(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby([group_col, value_col])
        .aggregate(Sum("n", alias_name="n"))
    ).to_pandas()
    counts = counts.sort_values([group_col, value_col])
    rows = []
    for grp, sub in counts.groupby(group_col, sort=True):
        vals = [int(v) for v in sub[value_col].to_numpy()]
        cnts = [int(c) for c in sub["n"].to_numpy()]
        if any(v < 0 for v in vals):
            raise ValueError("grouped_gini requires non-negative values")
        n = sum(cnts)
        total = sum(v * c for v, c in zip(vals, cnts))
        num, b = 0, 0
        for v, c in zip(vals, cnts):
            num += v * (2 * b * c + c * (c + 1) - c * (n + 1))
            b += c
        gini = num / (n * total) if total else 0.0
        rows.append((grp, n, total, gini))
    out = pd.DataFrame(rows, columns=[group_col, "n", "total", "gini"])
    out["n"] = out["n"].astype(np.int64)
    out["total"] = out["total"].astype(np.int64)
    out["gini"] = round_half_away(out["gini"].to_numpy(dtype=np.float64), 6)
    return out.reset_index(drop=True)


def grouped_gini_sql(
    source_cte: str,
    *,
    group_col: str = "grp",
) -> str:
    """DuckDB replay of :func:`grouped_gini` (single-generator policy).
    ``source_cte`` must define a CTE ``v`` with columns
    (``group_col``, val BIGINT)."""
    return f"""
        WITH {source_cte},
        r AS (
          SELECT {group_col}, val,
                 row_number() OVER (PARTITION BY {group_col} ORDER BY val)
                   AS rn,
                 count(*) OVER (PARTITION BY {group_col}) AS n,
                 sum(val) OVER (PARTITION BY {group_col}) AS s
          FROM v
        )
        SELECT {group_col},
               CAST(max(n) AS BIGINT) AS n,
               CAST(max(s) AS BIGINT) AS total,
               coalesce(round(sum(val * (2 * rn - n - 1))
                     / (CAST(max(n) AS DOUBLE) * max(s)), 6), 0.0) AS gini
        FROM r GROUP BY {group_col}
    """


def cume_dist_by_group(
    ds: rd.Dataset,
    *,
    value_col: str,
    group_col: str,
    keep_cols: Sequence[str] = (),
) -> rd.Dataset:
    """Per-group cumulative-distribution normalization: each row gets
    ``cume = P(X <= x)`` within its group (SQL ``cume_dist()``) — the
    rank-calibration step before mixing scores from different scorers /
    groups (a raw BM25 of 12 and a perplexity of −9.1 both become
    "top 3% of their group").

    Scale shape: ONE coarse value-hash partition shuffle over per-batch
    (group, value, n) count partials (a composite Ray groupby over the
    |groups×values| key space measured 10 s at sf0.1 — the many-tiny-
    groups anti-pattern; value-hash co-location with a per-partition
    pandas sum is 4×), a |groups×values|-sized driver fold into
    per-group sorted (values, cum<=) tables broadcast via ``ray.put``,
    then a shuffle-free searchsorted scan.  Distinct values per group
    must be bounded — quantize continuous scores first, the q169 rule.
    ``cume`` is an exact integer ratio (one double division), rounded
    to 6 like the SQL replay.  Rows with a null group or null value are
    EXCLUDED from both the tables and the output (SQL ``cume_dist``
    counts nulls in the partition total — ``fill_null`` first for that
    semantics)."""
    from .collect import cached_ref, collect_table
    from .dedup import add_key_partition

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([group_col, value_col]).drop_null().group_by(
            [group_col, value_col]
        ).aggregate([(value_col, "count")])
        return add_key_partition(
            g.rename_columns([group_col, value_col, "n"]), value_col,
            num_parts=64,
        )

    def sum_part(df: pd.DataFrame) -> pd.DataFrame:
        r = df.groupby([group_col, value_col], sort=False)["n"].sum().reset_index()
        r["n"] = r["n"].astype("int64")
        return r

    counts = (
        collect_table(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
            .groupby("_part")
            .map_groups(sum_part, batch_format="pandas")
        )
        .to_pandas()
        .sort_values([group_col, value_col])
    )
    tables = {}
    for grp, sub in counts.groupby(group_col, sort=False):
        vals = sub[value_col].to_numpy(np.float64)
        cum = sub["n"].to_numpy(np.int64).cumsum()
        tables[grp] = (vals, cum, int(cum[-1]))
    tab_ref = ray.put(tables)

    cols = [*keep_cols, group_col, value_col]

    def scan(t: pa.Table, _ref=tab_ref) -> pa.Table:
        tabs = cached_ref(_ref)
        # null group/value rows are excluded (docstring) — other columns
        # may hold nulls freely
        t = t.filter(
            pc.and_(pc.is_valid(t[group_col]), pc.is_valid(t[value_col]))
        )
        g = pd.Series(t[group_col].to_pylist())
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cume = np.empty(len(v), dtype=np.float64)
        for grp in g.unique():
            m = (g == grp).to_numpy()
            vals, cum, n = tabs[grp]
            idx = np.searchsorted(vals, v[m], side="right") - 1
            cume[m] = cum[idx] / float(n)
        out = t.select(cols)
        return out.append_column(
            "cume", pa.array(round_half_away(cume, 6), type=pa.float64())
        )

    return ds.map_batches(scan, batch_format="pyarrow")


def decile_bins(
    ds: rd.Dataset,
    *,
    value_col: str,
    n_bins: int = 10,
) -> pd.DataFrame:
    """Equi-depth (quantile) binning of a column: EXACT global decile
    thresholds via :func:`exact_group_quantiles` (rank = ceil(j/10·n),
    no sort), bucket = number of thresholds strictly below the value —
    the length-balanced bucketing used for curriculum/balanced sampling
    (each bucket ≈ n/10 rows up to ties).  Output per bucket:
    (bucket, n, min_v, max_v).

    Scale shape: the quantile refinement scans (histogram-refinement,
    bins-sized driver state) + ONE shuffle-free bucket-count scan with
    per-batch partials → a |bins|-sized groupby."""
    from .collect import collect_table

    const = "_all"

    def tag(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_g", pa.array(np.full(t.num_rows, const, dtype=object), pa.string())
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    fracs = [Fraction(j, n_bins) for j in range(1, n_bins)]
    q = exact_group_quantiles(tagged, value_col, "_g", fracs=fracs)
    thresholds = np.array(sorted(q[const]), dtype=np.float64)
    thr_ref = ray.put(thresholds)

    def bucket_partial(t: pa.Table, _ref=thr_ref) -> pa.Table:
        th = ray.get(_ref)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.searchsorted(th, v, side="left")  # count of thresholds < v...
        # searchsorted(left) counts th < v only when v > th; ties (v == th)
        # must NOT count that threshold — 'left' gives first i with th[i] >= v,
        # i.e. exactly |{j: th[j] < v}|.
        g = pa.table(
            {"bucket": pa.array(b.astype(np.int64)), "v": t[value_col]}
        ).group_by(["bucket"]).aggregate(
            [("v", "count"), ("v", "min"), ("v", "max")]
        )
        return g.rename_columns(["bucket", "n", "min_v", "max_v"])

    out = (
        collect_table(
            tagged.map_batches(
                bucket_partial, batch_format="pyarrow", batch_size=65536
            )
            .groupby("bucket")
            .aggregate(
                Sum("n", alias_name="n"),
                Min("min_v", alias_name="min_v"),
                Max("max_v", alias_name="max_v"),
            )
        )
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    out["bucket"] = out["bucket"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    return out


# --------------------------------------------------------------------------
# exact weighted median by histogram refinement
# --------------------------------------------------------------------------

def weighted_median_by_group(
    ds: rd.Dataset,
    *,
    value_col: str,
    weight_col: str,
    group_col: str,
    bins: int = 1024,
    collect_cap: int = 100_000,
    num_parts: int = 16,
    max_rounds: int = 24,
) -> pa.Table:
    """Per group, the EXACT lower weighted median of ``value_col`` under
    integer weights ``weight_col``: the smallest v with
    ``2 * W(<= v) >= W_total`` — e.g. with weight = n_chars, the
    document length below which half the corpus BYTES lie (a corpus
    statistic the unweighted median distorts badly under skewed doc
    sizes).  Weights must be a non-negative INTEGER column (exact
    HUGEINT accumulation on the SQL side demands exact int64 cumsums on
    this side; quantize float weights upstream).  Rows with a null
    group, value or weight drop on both sides; groups whose total
    weight is 0 drop (the median is undefined).

    Scale shape: the exact_group_quantiles discipline with weight sums
    riding next to the counts — one stats scan, <= max_rounds
    histogram-refinement scans whose shuffle volume is sparse
    (interval, bin, count, wsum, vmin, vmax) partials, then one
    <= collect_cap-rows-per-target gather; the driver never holds more
    than groups x bins rows.  No sort anywhere.

    Returns a pa.Table (group, n:int64, w_total:int64, wmedian:float64),
    groups in ascending group order.  SQL replay: single-generator
    :func:`weighted_median_sql`."""
    from .collect import collect_tables
    from .skew import partitioned_groupby

    sch = ds.schema()
    wt = dict(zip(sch.names, sch.types))[weight_col]
    if not (isinstance(wt, pa.DataType) and pa.types.is_integer(wt)):
        raise ValueError(
            f"weighted_median_by_group: weight column {weight_col!r} must "
            f"be an integer type (got {wt}); quantize float weights upstream"
        )

    def _gvw(t: pa.Table) -> pa.Table:
        """Project to internal (_g, _v, _w) names — value_col and
        weight_col may be the SAME column (the size-biased median), and
        duplicate names break select/aggregate."""
        t2 = pa.table(
            {"_g": t[group_col], "_v": t[value_col], "_w": t[weight_col]}
        ).drop_null()
        if pa.types.is_floating(t2["_v"].type):
            t2 = t2.filter(pc.invert(pc.is_nan(t2["_v"])))
        return t2

    def stats_partial(t: pa.Table) -> pa.Table:
        return _gvw(t).group_by("_g").aggregate(
            [("_v", "min"), ("_v", "max"), ("_v", "count"),
             ("_w", "sum"), ("_w", "min")]
        )

    agg = (
        ds.map_batches(stats_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("_g")
        .aggregate(
            Min("_v_min", alias_name="vmin"),
            Max("_v_max", alias_name="vmax"),
            Sum("_v_count", alias_name="n"),
            Sum("_w_sum", alias_name="wt"),
            Min("_w_min", alias_name="wmin"),
        )
        .to_pandas()
        .rename(columns={"_g": group_col})
    )
    if len(agg) and int(agg["wmin"].min()) < 0:
        raise ValueError(
            "weighted_median_by_group: negative weights break the "
            "cumulative-weight monotonicity the refinement relies on"
        )

    # per-group state: threshold T = ceil(W/2) (2*cumw >= W), interval
    # [lo, hi] inclusive, exact int64 weight-before, state machine as in
    # exact_group_quantiles
    st: dict[object, dict] = {}
    for _, row in agg.iterrows():
        g, n, wt_g = row[group_col], int(row["n"]), int(row["wt"])
        if wt_g <= 0:
            continue
        lo, hi = float(row["vmin"]), float(row["vmax"])
        s = {"n": n, "wt": wt_g, "T": (wt_g + 1) // 2, "before": 0,
             "lo": lo, "hi": hi, "state": "refine", "value": math.nan}
        if lo == hi:
            s["state"], s["value"] = "done", lo
        elif n <= collect_cap:
            s["state"] = "collect"
        st[g] = s

    def scan_bins(intervals: list[tuple]) -> dict:
        """intervals: (group, lo, hi) inclusive → per interval
        (cnt[bins], wsum[bins], vmin[bins], vmax[bins]) exact int64."""
        groups = [iv[0] for iv in intervals]
        gset = pa.array(groups)
        edges = [np.linspace(lo, hi, bins + 1) for (_, lo, hi) in intervals]

        def partial(t: pa.Table) -> pa.Table:
            t = _gvw(t)
            v = t["_v"].to_numpy(zero_copy_only=False).astype(np.float64)
            w = t["_w"].to_numpy(zero_copy_only=False).astype(np.int64)
            gidx = pc.fill_null(
                pc.index_in(t["_g"], value_set=gset), -1
            ).to_numpy(zero_copy_only=False)
            ivs, bs, cs, ws, mns, mxs = [], [], [], [], [], []
            for i, (_, lo, hi) in enumerate(intervals):
                m = (gidx == i) & (v >= lo) & (v <= hi)
                if not m.any():
                    continue
                vm, wm = v[m], w[m]
                b = np.searchsorted(edges[i], vm, side="right") - 1
                np.clip(b, 0, bins - 1, out=b)
                cnt = np.bincount(b, minlength=bins)
                wsum = np.bincount(b, weights=wm.astype(np.float64),
                                   minlength=bins)
                # float bincount is exact for batch-local weight sums
                # (< 2^53); the cross-batch fold below is int64
                nz = np.flatnonzero(cnt)
                bmin = np.full(bins, np.inf)
                bmax = np.full(bins, -np.inf)
                np.minimum.at(bmin, b, vm)
                np.maximum.at(bmax, b, vm)
                ivs.append(np.full(len(nz), i, dtype=np.int64))
                bs.append(nz.astype(np.int64))
                cs.append(cnt[nz].astype(np.int64))
                ws.append(np.round(wsum[nz]).astype(np.int64))
                mns.append(bmin[nz])
                mxs.append(bmax[nz])
            if not ivs:
                return pa.table(
                    {"_iv": pa.array([], pa.int64()),
                     "_bin": pa.array([], pa.int64()),
                     "_cnt": pa.array([], pa.int64()),
                     "_w": pa.array([], pa.int64()),
                     "_vmin": pa.array([], pa.float64()),
                     "_vmax": pa.array([], pa.float64())}
                )
            return pa.table(
                {"_iv": pa.array(np.concatenate(ivs)),
                 "_bin": pa.array(np.concatenate(bs)),
                 "_cnt": pa.array(np.concatenate(cs)),
                 "_w": pa.array(np.concatenate(ws)),
                 "_vmin": pa.array(np.concatenate(mns)),
                 "_vmax": pa.array(np.concatenate(mxs))}
            )

        summed = partitioned_groupby(
            ds.map_batches(partial, batch_format="pyarrow", batch_size=65536),
            ["_iv", "_bin"],
            {"n": ("_cnt", "sum"), "w": ("_w", "sum"),
             "vmin": ("_vmin", "min"), "vmax": ("_vmax", "max")},
            num_parts=num_parts,
        ).to_pandas()
        out = {
            i: (np.zeros(bins, np.int64), np.zeros(bins, np.int64),
                np.full(bins, np.inf), np.full(bins, -np.inf))
            for i in range(len(intervals))
        }
        for _, r in summed.iterrows():
            i, b = int(r["_iv"]), int(r["_bin"])
            out[i][0][b] = int(r["n"])
            out[i][1][b] = int(r["w"])
            out[i][2][b] = float(r["vmin"])
            out[i][3][b] = float(r["vmax"])
        return out

    for _ in range(max_rounds):
        active = [g for g, s in st.items() if s["state"] == "refine"]
        if not active:
            break
        active.sort(key=str)
        intervals = [(g, st[g]["lo"], st[g]["hi"]) for g in active]
        res = scan_bins(intervals)
        for i, g in enumerate(active):
            s = st[g]
            cnt, wsum, bmn, bmx = res[i]
            cumw = np.cumsum(wsum)
            r = s["T"] - s["before"]
            j = int(np.searchsorted(cumw, r, side="left"))
            s["before"] += int(cumw[j - 1]) if j > 0 else 0
            blo, bhi = float(bmn[j]), float(bmx[j])
            if blo == bhi:
                s["state"], s["value"] = "done", blo
            elif int(cnt[j]) <= collect_cap:
                s["state"], s["lo"], s["hi"] = "collect", blo, bhi
            else:
                s["lo"], s["hi"] = blo, bhi
    if any(s["state"] == "refine" for s in st.values()):
        raise RuntimeError(
            f"weighted_median_by_group: histogram refinement did not "
            f"converge in {max_rounds} rounds"
        )

    collects = [g for g, s in st.items() if s["state"] == "collect"]
    if collects:
        gset = pa.array(collects)
        specs = [(i, st[g]["lo"], st[g]["hi"]) for i, g in enumerate(collects)]

        def grab(t: pa.Table) -> pa.Table:
            t = _gvw(t)
            v = t["_v"].to_numpy(zero_copy_only=False).astype(np.float64)
            w = t["_w"].to_numpy(zero_copy_only=False).astype(np.int64)
            gidx = pc.fill_null(
                pc.index_in(t["_g"], value_set=gset), -1
            ).to_numpy(zero_copy_only=False)
            tid_out, val_out, w_out = [], [], []
            for i, lo, hi in specs:
                m = (gidx == i) & (v >= lo) & (v <= hi)
                if m.any():
                    tid_out.append(np.full(int(m.sum()), i, dtype=np.int64))
                    val_out.append(v[m])
                    w_out.append(w[m])
            if not tid_out:
                return pa.table(
                    {"_tid": pa.array([], pa.int64()),
                     "_v": pa.array([], pa.float64()),
                     "_w": pa.array([], pa.int64())}
                )
            return pa.table(
                {"_tid": pa.array(np.concatenate(tid_out)),
                 "_v": pa.array(np.concatenate(val_out)),
                 "_w": pa.array(np.concatenate(w_out))}
            )

        tbl = pa.concat_tables(collect_tables(
            ds.map_batches(grab, batch_format="pyarrow", batch_size=65536),
            drop_empty=False,
        ))
        tid = tbl["_tid"].to_numpy(zero_copy_only=False)
        vv = tbl["_v"].to_numpy(zero_copy_only=False)
        ww = tbl["_w"].to_numpy(zero_copy_only=False)
        for i, g in enumerate(collects):
            s = st[g]
            m = tid == i
            vals, wts = vv[m], ww[m]
            o = np.argsort(vals, kind="mergesort")
            vals, wts = vals[o], wts[o]
            cum = s["before"] + np.cumsum(wts)
            k = int(np.searchsorted(cum, s["T"], side="left"))
            if not 0 <= k < len(vals):
                raise RuntimeError(
                    f"weighted_median_by_group: weight bookkeeping out of "
                    f"range for group {g!r}"
                )
            s["state"], s["value"] = "done", float(vals[k])

    groups = sorted(st, key=lambda g: (g is None, g))
    return pa.table(
        {
            group_col: pa.array(groups),
            "n": pa.array([st[g]["n"] for g in groups], type=pa.int64()),
            "w_total": pa.array([st[g]["wt"] for g in groups],
                                type=pa.int64()),
            "wmedian": pa.array([st[g]["value"] for g in groups],
                                type=pa.float64()),
        }
    )


def weighted_median_sql(
    *,
    table: str,
    value_col: str,
    weight_col: str,
    group_col: str,
) -> str:
    """DuckDB replay of :func:`weighted_median_by_group`
    (single-generator).  The RANGE-framed window sum makes cw(v) the
    weight of ALL rows with value <= v (peers included), so
    ``min(v) FILTER (2*cw >= W)`` is exactly the lower weighted median;
    integer weights accumulate exactly (HUGEINT)."""
    return f"""
        WITH base AS (
            SELECT {group_col} AS g, {value_col} AS v, {weight_col} AS w
            FROM {table}
            WHERE {group_col} IS NOT NULL AND {value_col} IS NOT NULL
              AND {weight_col} IS NOT NULL
        ), tot AS (
            SELECT g, count(*) AS n, sum(w) AS wt
            FROM base GROUP BY g HAVING sum(w) > 0
        ), cum AS (
            SELECT g, v,
                   sum(w) OVER (PARTITION BY g ORDER BY v
                                RANGE BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS cw
            FROM base
        )
        SELECT t.g AS {group_col}, CAST(t.n AS BIGINT) AS n,
               CAST(t.wt AS BIGINT) AS w_total,
               CAST(min(c.v) AS DOUBLE) AS wmedian
        FROM cum c JOIN tot t ON c.g = t.g
        WHERE 2 * c.cw >= t.wt
        GROUP BY t.g, t.n, t.wt
    """


def trimmed_mean_by_group(
    ds: rd.Dataset,
    *,
    value_col: str,
    group_col: str,
    trim: Fraction = Fraction(1, 10),
    round_to: int = 6,
) -> pd.DataFrame:
    """Per-group inter-quantile (trimmed) mean of an INTEGER column: the
    mean of values v with Q(trim) <= v <= Q(1−trim), where Q(f) is the
    EXACT ceil(f·n)-th smallest value (exact_group_quantiles) — the
    robust location estimate that ignores both the spam tail and the
    truncation head without the winsorizer's clamping bias.  Threshold-
    based (values at ranks), so ties are multiset-safe: identical
    results regardless of tie order, unlike a rank-range trim.

    The value column must be integer so the kept-sum accumulates
    exactly (int64 / HUGEINT on the two engines); the only float op is
    the final sum/count division, identical on both.

    Scale shape: the quantile machinery's histogram-refinement scans
    (no sort) + ONE filtered moment scan with a groups-sized threshold
    broadcast; driver holds groups × 2 thresholds.  Output: (group,
    n_kept:int64, lo:f64, hi:f64, trimmed_mean:f64 rounded).  SQL
    replay: single-generator :func:`trimmed_mean_sql` (row_number
    thresholds at the same ceil ranks)."""
    import ray
    from fractions import Fraction as _F

    from .collect import cached_ref

    if not (0 < trim < _F(1, 2)):
        raise ValueError("trimmed_mean_by_group: trim must be in (0, 1/2)")
    sch = ds.schema()
    vt = dict(zip(sch.names, sch.types))[value_col]
    if not (isinstance(vt, pa.DataType) and pa.types.is_integer(vt)):
        raise ValueError(
            f"trimmed_mean_by_group: value column {value_col!r} must be an "
            "integer type (exact kept-sum accumulation); quantize upstream"
        )

    q = exact_group_quantiles(
        ds, value_col, group_col, fracs=(trim, 1 - trim)
    )
    thr = {g: (v[0], v[1]) for g, v in q.items()}
    ref = ray.put(thr)

    def partial(t: pa.Table, _ref=ref) -> pa.Table:
        tm = cached_ref(_ref)
        t2 = pa.table(
            {"g": t[group_col], "v": t[value_col]}
        ).drop_null()
        keys = t2["g"].to_numpy(zero_copy_only=False)
        v = t2["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        ks = pd.Series(keys)
        lo = ks.map({g: b[0] for g, b in tm.items()}).to_numpy(np.float64)
        hi = ks.map({g: b[1] for g, b in tm.items()}).to_numpy(np.float64)
        m = (v >= lo) & (v <= hi)
        if not m.any():
            # names must match the non-empty branch's post-aggregate
            # schema (s_sum/c_sum) or Ray sees mixed block schemas
            return pa.table(
                {"g": pa.array([], type=t2["g"].type),
                 "s_sum": pa.array([], type=pa.int64()),
                 "c_sum": pa.array([], type=pa.int64())}
            )
        aug = pa.table(
            {"g": t2["g"].filter(pa.array(m)), "s": pa.array(v[m]),
             "c": pa.array(np.ones(int(m.sum()), dtype=np.int64))}
        )
        return aug.group_by("g").aggregate([("s", "sum"), ("c", "sum")])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("g")
        .aggregate(Sum("s_sum", alias_name="s"), Sum("c_sum", alias_name="c"))
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    s = agg["s"].to_numpy().astype(np.int64)
    c = agg["c"].to_numpy().astype(np.int64)
    lo = np.array([thr[g][0] for g in agg["g"]], dtype=np.float64)
    hi = np.array([thr[g][1] for g in agg["g"]], dtype=np.float64)
    return pd.DataFrame(
        {
            group_col: agg["g"],
            "n_kept": c,
            "lo": lo,
            "hi": hi,
            "trimmed_mean": round_half_away(
                s / c.astype(np.float64), round_to
            ),
        }
    )


def trimmed_mean_sql(
    *,
    table: str,
    value_col: str,
    group_col: str,
    trim_num: int = 1,
    trim_den: int = 10,
    round_to: int = 6,
) -> str:
    """DuckDB replay of :func:`trimmed_mean_by_group`
    (single-generator): thresholds are the values at row_number ranks
    ceil(n·trim) and ceil(n·(1−trim)) — the exact order statistics the
    engine's histogram refinement finds."""
    lo_rank = f"CAST(ceil(n * {trim_num} / {trim_den}.0) AS BIGINT)"
    hi_rank = (
        f"CAST(ceil(n * {trim_den - trim_num} / {trim_den}.0) AS BIGINT)"
    )
    return f"""
        WITH r AS (
            SELECT {group_col} AS g, {value_col} AS v,
                   row_number() OVER (PARTITION BY {group_col}
                                      ORDER BY {value_col}) AS rn,
                   count(*) OVER (PARTITION BY {group_col}) AS n
            FROM {table}
            WHERE {group_col} IS NOT NULL AND {value_col} IS NOT NULL
        ), thr AS (
            SELECT g,
                   min(CASE WHEN rn = {lo_rank} THEN v END) AS lo,
                   min(CASE WHEN rn = {hi_rank} THEN v END) AS hi
            FROM r GROUP BY g
        )
        SELECT r.g AS {group_col},
               CAST(count(*) AS BIGINT) AS n_kept,
               CAST(t.lo AS DOUBLE) AS lo,
               CAST(t.hi AS DOUBLE) AS hi,
               round(sum(r.v) / CAST(count(*) AS DOUBLE), {round_to})
                   AS trimmed_mean
        FROM r JOIN thr t ON r.g = t.g
        WHERE r.v >= t.lo AND r.v <= t.hi
        GROUP BY r.g, t.lo, t.hi
    """
