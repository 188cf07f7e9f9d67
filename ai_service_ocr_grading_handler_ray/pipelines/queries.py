"""Driver-contract query battery: one entry per operator family from
SURVEY.md §2, each with a DuckDB-checkable oracle (see ORACLE_SQL).

Conventions for oracle parity (driver compares row-count + schema +
order-insensitive value hash, columns sorted by name):
- every aggregate / computed column is explicitly named, identically in
  Ray and SQL;
- integer outputs are int64 (SQL: CAST(... AS BIGINT)); floats are
  float64 rounded post-aggregation (kills FP association drift);
- deterministic tie-breaks on every sort/top-k.

Queries that aren't SQL-expressible (near-dup clustering, LSH ANN,
extraction, grading) return deterministic results and are listed without
an oracle — the driver records a rows-only check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum


def _read(sf_dir: str, name: str, columns: list[str] | None = None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{name}.parquet", columns=columns)


def _round_half_away(x: np.ndarray, nd: int) -> np.ndarray:
    """DuckDB/SQL ROUND semantics (half away from zero) — numpy's .round is
    half-to-even and would drift from the oracle on exact halves."""
    f = 10.0**nd
    return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f


def _finalize(df: pd.DataFrame, rounding: dict[str, int] | None = None) -> pd.DataFrame:
    if rounding:
        for col, nd in rounding.items():
            df[col] = _round_half_away(df[col].astype(np.float64).to_numpy(), nd)
    return df.reset_index(drop=True)


# --------------------------------------------------------------------------
# Relational: aggregations
# --------------------------------------------------------------------------

def q01_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q1-style grouped aggregate with map-side partial aggregation
    (SURVEY.md A7 pattern: combine inside map_batches, tiny final groupby)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = batch.append_column("disc_price", disc_price)
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"), ("disc_price", "sum"),
             ("l_quantity", "count")]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    out = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity_sum", alias_name="sum_qty"),
            Sum("l_extendedprice_sum", alias_name="sum_base_price"),
            Sum("disc_price_sum", alias_name="sum_disc_price"),
            Sum("l_quantity_count", alias_name="n"),
        )
        .to_pandas()
    )
    out["avg_qty"] = out["sum_qty"] / out["n"]
    return _finalize(
        out, {"sum_qty": 2, "sum_base_price": 2, "sum_disc_price": 2, "avg_qty": 4}
    )


def q02_high_quantity_items(sf_dir: str) -> rd.Dataset:
    """Vectorized filter + projection (prune at the read)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])
    return ds.map_batches(
        lambda t: t.filter(pc.greater_equal(t["l_quantity"], 45.0)),
        batch_format="pyarrow",
    )


def q04_orders_by_status(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])
    out = (
        ds.groupby("o_orderstatus")
        .aggregate(Count(alias_name="n"), Sum("o_totalprice", alias_name="total_price"))
        .to_pandas()
    )
    out["avg_price"] = out["total_price"] / out["n"]
    return _finalize(out, {"total_price": 2, "avg_price": 4})


def q13_part_brand_stats(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "part", ["p_brand", "p_retailprice", "p_size"])
    out = (
        ds.groupby("p_brand")
        .aggregate(
            Count(alias_name="n"),
            Sum("p_retailprice", alias_name="sum_price"),
            Max("p_size", alias_name="max_size"),
        )
        .to_pandas()
    )
    out["avg_price"] = out["sum_price"] / out["n"]
    out["max_size"] = out["max_size"].astype(np.int64)
    out = out.drop(columns=["sum_price"])
    return _finalize(out, {"avg_price": 4})


def q19_events_type_stats(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["event_type", "value"])
    out = (
        ds.groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("value", alias_name="sum_value"),
            Min("value", alias_name="min_value"),
            Max("value", alias_name="max_value"),
        )
        .to_pandas()
    )
    return _finalize(out, {"sum_value": 3, "min_value": 3, "max_value": 3})


# --------------------------------------------------------------------------
# Relational: joins
# --------------------------------------------------------------------------

def q03_top_revenue_orders(sf_dir: str) -> pd.DataFrame:
    """Grouped revenue + top-k, join LAST: per-order revenue via map-side
    combine + groupby, global top-10 via distributed sort+limit, and only
    those 10 keys fetch their dimension row — the scale-smart plan (a
    large-large join before the limit would shuffle every order row for
    10 survivors)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def partial_revenue(batch: pa.Table) -> pa.Table:
        # map-side combine: per-batch group_by shrinks the shuffle ~4×
        rev = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = pa.table({"l_orderkey": batch["l_orderkey"], "rev": rev})
        return t.group_by("l_orderkey").aggregate([("rev", "sum")])

    from ..stages.skew import partitioned_sum

    # high-cardinality (one group per order) → partitioned vectorized agg
    per_order = partitioned_sum(
        li.map_batches(partial_revenue, batch_format="pyarrow", batch_size=65536),
        "l_orderkey",
        "rev_sum",
        out_col="revenue",
    )

    def local_top10(t: pa.Table) -> pa.Table:
        # round BEFORE the top-k: the oracle orders by the rounded value,
        # and rounding can create ties the o_orderkey tie-break must see.
        # Partial top-10 per block: the driver merge sees 10 × n_blocks
        # rows instead of a global sort.
        r = _round_half_away(t["revenue"].to_numpy(zero_copy_only=False), 2)
        keys_np = t["l_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((keys_np, -r))[:10]
        return pa.table(
            {"l_orderkey": pa.array(keys_np[order]), "revenue": pa.array(r[order])}
        )

    top = (
        per_order.map_batches(local_top10, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["revenue", "l_orderkey"], ascending=[False, True])
        .head(10)
    )
    keys = set(top["l_orderkey"])
    prio_tbl = pa.concat_tables(
        collect_tables(
            _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
            .map_batches(
                lambda t: t.filter(
                    pa.array([k in keys for k in t["o_orderkey"].to_pylist()])
                ),
                batch_format="pyarrow",
            )
            , drop_empty=False)
    ).to_pandas()
    df = top.rename(columns={"l_orderkey": "o_orderkey"}).merge(
        prio_tbl, on="o_orderkey", how="inner"
    )
    df = df.sort_values(["revenue", "o_orderkey"], ascending=[False, True])[
        ["o_orderkey", "o_orderpriority", "revenue"]
    ]
    return _finalize(df)


def _broadcast_map(sf_dir: str, table: str, key: str, val: str) -> dict:
    tbl = pa.concat_tables(collect_tables(_read(sf_dir, table, [key, val]), drop_empty=False))
    return dict(zip(tbl[key].to_pylist(), tbl[val].to_pylist()))


# single-slot per-worker cache (ref hex, dict): a new ref evicts the old
# entry, so repeated invocations can't grow worker memory unboundedly
_BROADCAST_CACHE: list = []


def q05_orders_by_segment(sf_dir: str) -> pd.DataFrame:
    """Broadcast map-side join (small dim via ray.put) + grouped agg.
    Stateless tasks with a per-worker cache of the deserialized dict
    (keyed by the object ref) — actor-pool spin-up dominated this short
    stage, and Ray workers persist across tasks so the cache stays warm."""
    seg_map_ref = ray.put(_broadcast_map(sf_dir, "customer", "c_custkey", "c_mktsegment"))
    ref_key = seg_map_ref.hex()

    def add_segment(batch: pa.Table) -> pa.Table:
        if not _BROADCAST_CACHE or _BROADCAST_CACHE[0][0] != ref_key:
            _BROADCAST_CACHE[:] = [(ref_key, ray.get(seg_map_ref))]
        seg = _BROADCAST_CACHE[0][1]
        segs = [seg.get(k) for k in batch["o_custkey"].to_pylist()]
        return batch.append_column("c_mktsegment", pa.array(segs, type=pa.string()))

    ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        add_segment,
        batch_format="pyarrow",
        batch_size=65536,
    )
    out = (
        ds.groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total"))
        .to_pandas()
    )
    return _finalize(out, {"total": 2})


def q06_customers_with_orders(sf_dir: str) -> rd.Dataset:
    """Semi join via Ray's native shuffled left_semi — correct at any
    right-side size (the Bloom variant q53 keeps the broadcast constant
    when a pre-filter pays; a raw broadcast key set would not scale)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    keys = _read(sf_dir, "orders", ["o_custkey"])
    return cust.join(
        keys, "left_semi", num_partitions=4, on=("c_custkey",), right_on=("o_custkey",)
    )


def q07_customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """Anti join via native shuffled left_anti (resume-frontier pattern,
    SURVEY.md §2.4)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    keys = _read(sf_dir, "orders", ["o_custkey"])
    ds = cust.join(
        keys, "left_anti", num_partitions=4, on=("c_custkey",), right_on=("o_custkey",)
    )
    # an empty result must still carry its schema for the oracle compare
    df = ds.to_pandas()
    if df.empty:
        df = pd.DataFrame(
            {"c_custkey": pd.Series(dtype=np.int64), "c_name": pd.Series(dtype=str)}
        )
    return df[["c_custkey", "c_name"]]


def q10_customers_per_region(sf_dir: str) -> pd.DataFrame:
    """3-way broadcast join: customer → nation → region, grouped count."""
    nat = _broadcast_map(sf_dir, "nation", "n_nationkey", "n_regionkey")
    reg = _broadcast_map(sf_dir, "region", "r_regionkey", "r_name")
    lookup_ref = ray.put({k: reg[v] for k, v in nat.items()})

    def add_region(batch: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        names = [lk.get(k) for k in batch["c_nationkey"].to_pylist()]
        return batch.append_column("r_name", pa.array(names, type=pa.string()))

    out = (
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        .map_batches(add_region, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_customers"))
        .to_pandas()
    )
    return _finalize(out)


def q22_supplier_nation_rollup(sf_dir: str) -> pd.DataFrame:
    nat_ref = ray.put(_broadcast_map(sf_dir, "nation", "n_nationkey", "n_name"))

    def add_nation(batch: pa.Table) -> pa.Table:
        lk = ray.get(nat_ref)
        names = [lk.get(k) for k in batch["s_nationkey"].to_pylist()]
        return batch.append_column("n_name", pa.array(names, type=pa.string()))

    out = (
        _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"])
        .map_batches(add_nation, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Count(alias_name="n_suppliers"), Sum("s_acctbal", alias_name="total_bal"))
        .to_pandas()
    )
    return _finalize(out, {"total_bal": 2})


# --------------------------------------------------------------------------
# Relational: sort / top-k / distinct
# --------------------------------------------------------------------------

def q08_top_customers(sf_dir: str) -> pd.DataFrame:
    """Top-10 by balance via per-block partial top-k (no global sort —
    a total sort for 10 rows was VERDICT r3 wrong #2)."""
    from ..stages.selection import global_top_k

    ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    df = global_top_k(
        ds, k=10, by=["c_acctbal", "c_custkey"], descending=[True, False]
    )
    return _finalize(df, {"c_acctbal": 2})


def q09_distinct_segments(sf_dir: str) -> pd.DataFrame:
    vals = sorted(_read(sf_dir, "customer", ["c_mktsegment"]).unique("c_mktsegment"))
    return pd.DataFrame({"c_mktsegment": vals})


# --------------------------------------------------------------------------
# Events: windowed aggregate + sessionization
# --------------------------------------------------------------------------

def q11_events_hourly(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour window per event_type (ts → epoch-hour key in a
    vectorized map_batches; groupby over small keyspace)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def add_hour(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch["ts"], pa.int64())
        hour = pc.divide(us, pa.scalar(3_600_000_000, type=pa.int64()))
        return pa.table(
            {"event_type": batch["event_type"], "hour": hour, "value": batch["value"]}
        )

    out = (
        ds.map_batches(add_hour, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    return _finalize(out, {"sum_value": 3})


def q12_sessionize(sf_dir: str, gap_s: int = 1800) -> pd.DataFrame:
    """Gap-based sessionization (SURVEY.md §2.8 streaming-shaped
    workload): one hash shuffle over salted user partitions; inside each
    partition EVERY user sessionizes in one vectorized pass (sort by
    (user, ts, event_id), per-user diff + cumsum) — no per-user group
    overhead."""
    from ..stages.dedup import add_key_partition

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        gap = g.groupby("user_id", sort=False)["ts"].diff().dt.total_seconds()
        new_s = gap.isna() | (gap > gap_s)
        sid_global = new_s.cumsum()
        sid = (
            sid_global - sid_global.groupby(g["user_id"], sort=False).transform("first") + 1
        ).astype(np.int64)
        out = (
            g.assign(session_id=sid)
            .groupby(["user_id", "session_id"], sort=True)
            .agg(n_events=("event_id", "size"))
            .reset_index()
        )
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return _finalize(
        ds.map_batches(lambda t: add_key_partition(t, "user_id"), batch_format="pyarrow")
        .groupby("_part")
        .map_groups(sessions, batch_format="pandas")
        .to_pandas()
    )


# --------------------------------------------------------------------------
# Documents: text analysis + dedup
# --------------------------------------------------------------------------

def q14_doc_token_counts(sf_dir: str) -> rd.Dataset:
    from ..stages.text_analysis import add_token_counts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: add_token_counts(b).select(["doc_id", "ws_tokens"]),
        batch_format="pyarrow",
    )


def q15_doc_quality(sf_dir: str) -> rd.Dataset:
    from ..stages.text_analysis import add_quality_metrics

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        t = add_quality_metrics(b)
        mean_wl = pc.round(
            t["mean_word_len"], 4, round_mode="half_towards_infinity"
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars_text": t["q_n_chars"],
                "n_words": t["q_n_words"],
                "mean_word_len": mean_wl,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q16_dedup_docs_exact(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = (
        ds.groupby("text")
        .aggregate(Min("doc_id", alias_name="keep_id"), Count(alias_name="n_copies"))
        .to_pandas()
    )
    out["keep_id"] = out["keep_id"].astype(np.int64)
    return _finalize(out)


def q17_lang_counts(sf_dir: str) -> pd.DataFrame:
    out = (
        _read(sf_dir, "documents", ["lang"])
        .groupby("lang")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    return _finalize(out)


def q18_docs_en_long(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source", "n_chars"])
    return ds.map_batches(
        lambda t: t.filter(
            pc.and_(pc.equal(t["lang"], "en"), pc.greater(t["n_chars"], 300))
        ).select(["doc_id", "source", "n_chars"]),
        batch_format="pyarrow",
    )


def q23_events_user_first(sf_dir: str) -> pd.DataFrame:
    """Exact dedup by key with deterministic winner: first event per user
    (ordered by ts, event_id) — the groupby→first operator (SURVEY.md
    §2.5), via the partitioned vectorized exact_dedup."""
    from ..stages.dedup import exact_dedup

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    df = exact_dedup(ds, key="user_id", order_by=["ts", "event_id"]).to_pandas()
    return _finalize(df[["user_id", "event_id", "event_type"]])


# --------------------------------------------------------------------------
# Embeddings: similarity + aggregates
# --------------------------------------------------------------------------

def _query_vectors(sf_dir: str, n: int = 2) -> tuple[list[int], np.ndarray]:
    tbl = pa.concat_tables(
        collect_tables(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"])
            .map_batches(
                lambda t: t.filter(pc.less(t["vec_id"], n)), batch_format="pyarrow"
            )
            , drop_empty=False),
        promote_options="default",
    )
    order = np.argsort(tbl["vec_id"].to_pylist())
    ids = [tbl["vec_id"].to_pylist()[i] for i in order]
    vecs = np.array([tbl["embedding"].to_pylist()[i] for i in order], dtype=np.float64)
    return ids, vecs


def q20_knn_brute(sf_dir: str) -> pd.DataFrame:
    from ..stages.similarity import knn_brute_force

    ids, vecs = _query_vectors(sf_dir, 2)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_brute_force(ds, vecs, k=10).to_pandas()
    out["query_id"] = out["query_id"].map(dict(enumerate(ids))).astype(np.int64)
    out["vec_id"] = out["vec_id"].astype(np.int64)
    return _finalize(out[["query_id", "vec_id"]])


def q21_label_counts(sf_dir: str) -> pd.DataFrame:
    out = (
        _read(sf_dir, "embeddings", ["label"])
        .groupby("label")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    out["label"] = out["label"].astype(np.int64)
    return _finalize(out)


def q24_credit_reducer(sf_dir: str) -> pd.DataFrame:
    """A3 + J4 parity: credits' = credits − n_generated/10 (grouped count
    joined against the users side table; orders stand in for generated
    questions, question_generation_handler.py:460-469)."""
    from .questions import credit_reducer

    generated = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        lambda t: pa.table({"user_id": t["o_custkey"]}), batch_format="pyarrow"
    )
    users = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        lambda t: pa.table({"user_id": t["c_custkey"], "credits": t["c_acctbal"]}),
        batch_format="pyarrow",
    )
    out = credit_reducer(generated, users)
    return _finalize(out, {"credits": 2})


def q25_salted_user_counts(sf_dir: str) -> pd.DataFrame:
    """Two-level salted grouped aggregate (skew-safe) — must equal the
    plain groupby exactly (SURVEY.md §4 skew handling)."""
    from ..stages.skew import salted_count

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    out = salted_count(ds, key="user_id", salt_from="event_id", salt=8, sum_col="value")
    return _finalize(out, {"sum_value": 3})


def q26_field_extractors(sf_dir: str) -> rd.Dataset:
    """M12/M13 regex field extractors over synthesized model-output strings
    (three response shapes per doc_id); the oracle computes the expected
    extraction independently in SQL."""
    from ..functions.textfns import extract_first_json_block, extract_ocr_field

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        ocr_out: list[str] = []
        json_out: list[str] = []
        for d, t in zip(ids, texts):
            head = " ".join((t or "").split()[:5])
            if d % 3 == 0:
                s = f'model says ocr:"{head}" done'
            elif d % 3 == 1:
                s = '{"ocr": "' + head + '"}'
            else:
                s = head
            ocr_out.append(extract_ocr_field(s))
            json_out.append(
                extract_first_json_block(f'noise {{"k": {d % 5}}} tail {{"z": 9}}')
            )
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "ocr_text": pa.array(ocr_out, type=pa.string()),
                "json_block": pa.array(json_out, type=pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Engine-specific (no SQL oracle → driver rows-only check)
# --------------------------------------------------------------------------

def q30_flagship_extract(sf_dir: str) -> rd.Dataset:
    from .extract import flagship

    return flagship(sf_dir, concurrency=(1, 4))


def q41_flagship_deduped(sf_dir: str) -> rd.Dataset:
    """Flagship with the north-rule exact url-dedup stage: duplicate-url
    pairs (synth fixture, ~4% of rows) collapse to the earliest snapshot
    before extraction."""
    from .extract import flagship_deduped

    return flagship_deduped(sf_dir, concurrency=(1, 4))


def q31_grading(sf_dir: str) -> rd.Dataset:
    from .grading import grading_pipeline

    return grading_pipeline(sf_dir)


def _docs_with_near_dups(sf_dir: str) -> rd.Dataset:
    """Deterministic near-dup fixture: every doc_id % 7 == 0 gains a
    variant (id+1M) with every 5th word dropped."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out_i, out_t = [], []
        for i, t in zip(ids, texts):
            out_i.append(i)
            out_t.append(t)
            if i % 7 == 0:
                words = (t or "").split()
                out_i.append(i + 1_000_000)
                out_t.append(" ".join(w for j, w in enumerate(words) if j % 5 != 0))
        return pa.table({"doc_id": pa.array(out_i, type=pa.int64()),
                         "text": pa.array(out_t, type=pa.string())})

    return ds.map_batches(expand, batch_format="pyarrow")


def q32_minhash_dedup(sf_dir: str) -> rd.Dataset:
    """Rows-only (minhash is not SQL-expressible); invariants — cluster_id
    is the min doc_id of its cluster, every id appears exactly once, and
    the synthesized variants land with their sources — are pinned at the
    driver's compare scale by tests/test_dedup_invariants.py."""
    from ..stages.dedup import minhash_lsh_clusters

    return minhash_lsh_clusters(_docs_with_near_dups(sf_dir), threshold=0.55)


def q113_bigram_logprob(sf_dir: str) -> pd.DataFrame:
    """Bigram-LM perplexity proxy: per-doc mean ln P(w_i | w_{i-1}) under
    the corpus' own bigram distribution (prefix-conditional counts) —
    one Markov order above q90.  Count pass = per-batch factorize
    partials + one pair-vocab shuffle; score pass = broadcast sorted
    hash LM + shuffle-free searchsorted/reduceat scan.  Docs with < 2
    tokens drop (no bigrams).  Oracle replays both passes relationally
    (pair unnest → counts → prefix totals → join → avg ln)."""
    from ..stages.text_analysis import score_bigram_logprob

    out = (
        score_bigram_logprob(_read(sf_dir, "documents", ["doc_id", "text"]))
        .to_pandas()
    )
    return _finalize(out, {"avg_logprob2": 4})


_Q140_SEED = 7
_Q140_PCTS = (90, 5, 5)
_Q140_NAMES = ("train", "val", "test")

_Q141_MIN_DF = 2
_Q141_MAXDF_FRAC = 0.8

_Q142_WINDOW = 2
_Q142_MIN_COUNT = 5


def q151_cohort_retention(sf_dir: str) -> pd.DataFrame:
    """Cohort retention (stages/cohort.py): users cohort by the month
    of their first event; n_users(cohort, k) counts users active k
    months later — the activity-matrix analytic next to q150's funnel.
    ONE user-hash shuffle, vectorized per-partition pass (datetime64[M]
    month floor + per-user transform-min + one drop_duplicates),
    cohorts×horizon partial rows folded on the driver.  Events spread
    deterministically across months (user-year cohort shift + sparse
    7·event_id%40 month offsets — the SAME month-floor arithmetic the
    oracle rebuilds, clamp-free because shifts add to the month floor);
    oracle GENERATED by cohort_retention_sql."""
    from ..stages.cohort import cohort_retention

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])

    def shift(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        m = ts.astype("datetime64[M]")
        frac = ts - m.astype("datetime64[us]")
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sh = 12 * (uid % 3) + (eid * 7) % 40
        ts2 = (m + sh.astype("timedelta64[M]")).astype("datetime64[us]") + frac
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": pa.array(ts2, type=pa.timestamp("us")),
            }
        )

    return cohort_retention(ds.map_batches(shift, batch_format="pyarrow"))


_Q150_STEPS = ["view", "click", "purchase"]
_Q150_WINDOW_US = 86_400_000_000  # 1 day


def q150_funnel(sf_dir: str) -> pd.DataFrame:
    """Funnel analysis (stages/funnel.py): users reaching
    view → click → purchase, each step strictly after the previous and
    within 1 day of the user's first view — the ordered-progression
    analytic beyond q12's sessionize.  ONE user-hash shuffle; the
    per-partition pass is fully vectorized (per step: one mask, one
    per-user groupby-min, one mapped filter) and emits only
    len(steps) partial rows per partition.  Oracle GENERATED by
    funnel_sql from the SAME steps/window (single-generator policy)."""
    from ..stages.funnel import funnel_counts

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    return funnel_counts(ds, _Q150_STEPS, window_us=_Q150_WINDOW_US)


_Q149_KINDS = {
    "event_id": "num", "ts": "ts", "user_id": "num",
    "event_type": "other", "value": "num", "props": "other",
}


def q149_profile_events(sf_dir: str) -> pd.DataFrame:
    """Table profiler (stages/profile.py) over events — the
    Deequ-style ingestion audit: per column n / nulls / EXACT distinct
    count / numeric bounds (timestamps as epoch µs).  ONE stat scan
    (one-row partials per batch×column) + ONE unioned distinct shuffle
    for every column together, values hashed to u64 BEFORE the shuffle
    and salted 64 ways so a high-cardinality column never lands in one
    dedup group.  The oracle is GENERATED by profile_sql from the SAME
    column-kind table (single-generator policy)."""
    from ..stages.profile import profile_table

    ds = _read(sf_dir, "events", list(_Q149_KINDS))
    out = profile_table(ds, list(_Q149_KINDS))
    return _finalize(out, {"min_num": 6, "max_num": 6})


def q148_quantize_embeddings(sf_dir: str) -> pd.DataFrame:
    """Per-vector int8 affine quantization (stages/quantize.py): the
    FAISS-SQ8-style storage compression for the embedding battery —
    per vector (min, max, code-sum checksum, reconstruction MSE).  One
    shuffle-free scan; the kernel reshapes the batch's flattened
    list<float> buffer once and runs pure float64 numpy with HALF-AWAY
    rounding.  The oracle is GENERATED by the stage's own quantize_sql
    from the same LEVELS constant and formula ordering
    (single-generator policy)."""
    from ..stages.quantize import quantize_batch

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = ds.map_batches(quantize_batch, batch_format="pyarrow").to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    return _finalize(out, {"v_min": 6, "v_max": 6, "mse": 8})


def q147_registrable_domains(sf_dir: str) -> pd.DataFrame:
    """Registrable-domain (eTLD+1) rollup (stages/domains.py): hosts
    collapse to their owner domain under the PSL-lite rule (last 3
    labels for listed two-level suffixes like co.uk/com.au, else last
    2, else the host itself) — the grouping key dedup scopes,
    politeness budgets and leakage-safe splits should actually use
    (q140 splits by host; same-owner subdomains belong together).  One
    shuffle-free domain scan + a per-batch (domain, host) combiner +
    one domain groupby.  Hosts are the url-convention hosts augmented
    deterministically with multi-label co.uk / com.au / dotless cases
    so every rule branch is exercised; the oracle CASE is GENERATED
    from the SAME suffix table (registrable_domain_sql,
    single-generator policy)."""
    from ..stages.domains import add_registrable_domain
    from ..stages.skew import hosts_of_urls
    from ..synth import url_for_doc

    ds = _read(sf_dir, "documents", ["doc_id", "source", "lang"])

    def hostify(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        urls = [
            url_for_doc(dd, s, lg)
            for dd, s, lg in zip(
                d, t["source"].to_pylist(), t["lang"].to_pylist()
            )
        ]
        base = hosts_of_urls(pa.array(urls, type=pa.string())).to_pylist()
        hosts = [
            f"shop{dd % 3}.megacorp{dd % 5}.co.uk"
            if dd % 9 == 0
            else f"a.b.site{dd % 4}.com.au"
            if dd % 9 == 1
            else "intranet-host"
            if dd % 9 == 2
            else h
            for dd, h in zip(d, base)
        ]
        return pa.table({"host": pa.array(hosts, type=pa.string())})

    def pair_counts(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        r = df.groupby(["domain", "host"], sort=False).size().reset_index(name="n")
        r["n"] = r["n"].astype("int64")
        return pa.Table.from_pandas(r, preserve_index=False)

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "domain": [g["domain"].iloc[0]],
                "n_docs": np.array([int(g["n"].sum())], dtype=np.int64),
                "n_hosts": np.array([g["host"].nunique()], dtype=np.int64),
            }
        )

    out = (
        ds.map_batches(hostify, batch_format="pyarrow")
        .map_batches(add_registrable_domain, batch_format="pyarrow")
        .map_batches(pair_counts, batch_format="pyarrow")
        .groupby("domain")
        .map_groups(rollup, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("domain").reset_index(drop=True)


_Q146_K = 5
_Q146_DECAY_DAYS = 30.0
_EPOCH_2024_US = 1_704_067_200_000_000  # synth.warc_ts convention


def q146_crawl_frontier(sf_dir: str) -> pd.DataFrame:
    """Crawl-frontier prioritization — the composed WEB-CRAWL capstone
    (pipelines/crawl.py): CDX keep-latest per url → host PageRank over
    the crawl's own link events → priority = pagerank8 × freshness8
    (exp decay over warc_ts age) → per-host politeness top-5 with a
    partial-top-k combiner (a giant host's candidates never gather in
    one task).  Unlike the component entries (q118/q129/q109) this runs
    the WHOLE composition under ONE oracle: the SQL replays the url
    CASE rebuild, the keep-latest groupby, the SAME edge CTE through
    graph.pagerank_sql, the identical round-before-rank formula
    (crawl.frontier_priority_sql — single-generator) and the
    (priority DESC, url) window.  Urls/hosts/ts follow the
    page-synthesis convention (synth.url_for_doc / warc_ts =
    epoch + doc_id s); link events: every doc links its host to a
    rotated source host, every 7th to the big hub."""
    from ..pipelines.crawl import crawl_frontier
    from ..stages.skew import hosts_of_urls
    from ..synth import url_for_doc

    ds = _read(sf_dir, "documents", ["doc_id", "source", "lang"])
    n = ds.count()

    def pages(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        urls = [
            url_for_doc(dd, s, lg)
            for dd, s, lg in zip(
                d, t["source"].to_pylist(), t["lang"].to_pylist()
            )
        ]
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "ts_us": pa.array(_EPOCH_2024_US + d * 1_000_000),
            }
        )

    def links(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        srcs = t["source"].to_pylist()
        urls = [
            url_for_doc(dd, s, lg)
            for dd, s, lg in zip(d, srcs, t["lang"].to_pylist())
        ]
        src_hosts = hosts_of_urls(pa.array(urls, type=pa.string()))
        dst = [
            "big.example.com"
            if dd % 7 == 0
            else f"src{(int(s[3:]) + 3) % 20}.example.org"
            for dd, s in zip(d, srcs)
        ]
        return pa.table(
            {"src": src_hosts, "dst": pa.array(dst, type=pa.string())}
        )

    out = crawl_frontier(
        ds.map_batches(pages, batch_format="pyarrow"),
        ds.map_batches(links, batch_format="pyarrow"),
        ref_us=_EPOCH_2024_US + n * 1_000_000,
        decay_days=_Q146_DECAY_DAYS,
        k=_Q146_K,
    ).to_pandas()
    return _finalize(
        out.sort_values(["host", "host_rank"]).reset_index(drop=True),
        {"priority": 8},
    )


def q145_script_mix(sf_dir: str) -> pd.DataFrame:
    """Unicode script-mix detection (text_analysis.add_script_mix):
    per-script codepoint counts, dominant writing system and latin
    fraction per document — the script-based filtering axis multilingual
    curation runs BEFORE language ID (q35's trigram heuristic assumes an
    alphabetic script; CJK/Arabic pages must route to different
    pipelines).  One shuffle-free scan; the kernel classifies the
    batch's utf-32 tape with one searchsorted over the range bounds and
    one bincount fold.  To exercise every class, docs are
    deterministically augmented with a non-Latin payload by doc_id % 6
    (the SAME chr() arithmetic the oracle rebuilds with printf-free
    chr(); the oracle itself is GENERATED by script_mix_sql from the
    SAME range table — single-generator policy)."""
    from ..stages.text_analysis import add_script_mix

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def augment(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t["text"].to_pylist()
        out = []
        for dd, tx in zip(d, texts):
            k = dd % 6
            if k == 1:
                extra = "".join(chr(0x400 + (dd + j) % 0x60) for j in range(40))
            elif k == 2:
                extra = "".join(chr(0x4E00 + (dd + j) % 0x100) for j in range(60))
            elif k == 3:
                extra = "".join(chr(0x600 + (dd + j) % 0x60) for j in range(40))
            elif k == 4:
                extra = str(dd) * 30
            else:
                extra = ""
            out.append((tx or "") + " " + extra)
        return pa.table(
            {"doc_id": t["doc_id"], "text": pa.array(out, type=pa.string())}
        )

    out = (
        ds.map_batches(augment, batch_format="pyarrow")
        .map_batches(add_script_mix, batch_format="pyarrow", batch_size=4096)
        .drop_columns(["text"])
        .to_pandas()
    )
    return _finalize(out.sort_values("doc_id"), {"latin_frac": 4})


def q144_compression_ratio(sf_dir: str) -> pd.DataFrame:
    """DEFLATE compression-ratio junk signal
    (text_analysis.add_compression_ratio): zlib_bytes / utf8_bytes per
    document — the long-range repetitiveness axis entropy (q139) cannot
    see (LZ77 matches repeated STRUCTURE at any ≤32 KiB offset, entropy
    only the codepoint distribution).  One shuffle-free scan, one C call
    per row.  Rows-only: DuckDB has no deflate; kernel semantics pinned
    by tests/test_text_analysis.py (range, monotonicity on repetitive vs
    high-entropy text, empty-text zero)."""
    from ..stages.text_analysis import add_compression_ratio

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = (
        ds.map_batches(add_compression_ratio, batch_format="pyarrow",
                       batch_size=4096)
        .drop_columns(["text"])
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def q143_host_components(sf_dir: str) -> pd.DataFrame:
    """Weakly-connected components over STRING (host) node ids — the
    oracle check for round 4's rank-encode path in
    dedup.propagate_min_labels_ds (q128 pins the integer-id path; url/
    host-keyed corpora hit THIS branch, where the fixpoint label must
    decode to the LEXICOGRAPHIC-min member).  The recursive reachability
    CTE computes min-reachable-node per node over the symmetrized edges,
    which equals the propagation fixpoint.  The deterministic graph is
    12 chain components of 10 hosts (diameter 9 — a genuinely multi-round
    propagation, deeper than q128's ≤7, and the string-id rank-encode path
    added in round 4: component = LEXICOGRAPHIC min host).  Scale shape:
    per-round one salted cogroup + one salted grouped min, labels stay
    Datasets; the driver holds only the (deduped) edge list, the
    documented cluster_assignments contract."""
    from ..stages.collect import collect_table
    from ..stages.dedup import propagate_min_labels_ds

    ds = _read(sf_dir, "documents", ["doc_id"])
    hosts = np.array([f"c{i:03d}.example.org" for i in range(120)], dtype=object)

    def edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = d % 120
        keep = i % 10 != 9  # chains never cross the 10-host blocks
        a = i[keep]
        return pa.table(
            {
                "a": pa.array(hosts[a], type=pa.string()),
                "b": pa.array(hosts[a + 1], type=pa.string()),
            }
        )

    edge_tbl = (
        collect_table(ds.map_batches(edges, batch_format="pyarrow"))
        .to_pandas()
        .drop_duplicates()
    )
    out = (
        propagate_min_labels_ds(pa.Table.from_pandas(edge_tbl))
        .to_pandas()
        .rename(columns={"id": "host", "label": "component"})
    )
    return out.sort_values("host").reset_index(drop=True)[["host", "component"]]


def q142_pmi_collocations(sf_dir: str) -> pd.DataFrame:
    """Windowed co-occurrence + PMI (stages/cooccur.py): ordered pairs
    (a, b) with b within 2 positions after a in the same doc, scored
    ``ln((n_ab/N_pairs) / ((n_a/N_tok)(n_b/N_tok)))`` — the
    phrase-mining / word2vec-prep collocation statistic.  Scale shape:
    per-batch factorize + shifted-mask pair extraction with an in-task
    np.unique combiner (corpus windows reduce to pair TYPES before the
    shuffle), ONE hash(a) pair shuffle, vocab broadcast via ray.put with
    the LM scorer's sorted probe, totals folded from one-row partials.
    The oracle is GENERATED by the stage's own pmi_sql
    (single-generator policy) — identical tokenizer, empty-drop +
    renumber, window join and division/ln ordering."""
    from ..stages.cooccur import pmi_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = pmi_pairs(
        ds, window=_Q142_WINDOW, min_count=_Q142_MIN_COUNT
    ).to_pandas()
    out = out.sort_values(["a", "b"]).reset_index(drop=True)
    return _finalize(out, {"pmi": 4})


def q141_inverted_index(sf_dir: str) -> pd.DataFrame:
    """FULL-postings inverted-index build (stages/inverted.py): term →
    (df, ascending comma-joined posting list), df-bounded both ways the
    way real indexers prune (min_df hapaxes, max_df stopwords).  q75
    builds the truncated (first-10) postings variant with an in-group
    df prune; what THIS entry adds is the part that fails at corpus
    scale there: emitting COMPLETE posting lists safely, via a
    vocab-sized df pre-count whose above-threshold term set broadcasts
    and drops stopword pairs BEFORE the posting groupby — so a
    stopword's corpus-sized posting group NEVER materializes in one
    task.  Map side emits only DISTINCT (term, doc) pairs (factorize +
    packed-key np.unique); ONE term-hash groupby emits postings.
    max_df is corpus-relative (floor(0.8·N)) with the SAME fraction and
    IEEE floor on both sides; the oracle is GENERATED by the stage's
    own inverted_index_sql (single-generator policy)."""
    from ..stages.inverted import inverted_index

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n = ds.count()
    out = inverted_index(
        ds, min_df=_Q141_MIN_DF, max_df=int(np.floor(_Q141_MAXDF_FRAC * n))
    ).to_pandas()
    return out.sort_values("term").reset_index(drop=True)


def q140_host_disjoint_split(sf_dir: str) -> pd.DataFrame:
    """Leakage-safe host-disjoint train/val/test split
    (sampling.disjoint_split_by_key): every document of a host lands in
    ONE split — ``bucket = splitmix64(polyhash64(host) + seed) % 100``
    is a pure function of the key, so the draw is shuffle-FREE (no
    groupby: co-location is irrelevant when the label is
    key-deterministic) and rows never migrate as the corpus or cluster
    grows.  This is how web corpora must be split: a per-document draw
    like train_eval_split leaks same-host near-dup boilerplate
    train→test.  ``polyhash64`` (stages/hashing.py) is the engine's new
    SQL-REPLAYABLE string hash — the oracle replays hash, splitmix64
    finisher and thresholds EXACTLY via ``disjoint_split_sql``
    (single-generator policy), closing the "string-keyed draws are not
    oracle-checkable" gap the siphash shuffle family has.  Hosts follow
    the page-synthesis convention (synth.url_for_doc, the flagship's
    input shape) so the skewed big.example.com host rides along."""
    from ..stages.sampling import disjoint_split_by_key
    from ..stages.skew import hosts_of_urls
    from ..synth import url_for_doc

    ds = _read(sf_dir, "documents", ["doc_id", "source", "lang"])

    def hostify(t: pa.Table) -> pa.Table:
        urls = [
            url_for_doc(d, s, lg)
            for d, s, lg in zip(
                t["doc_id"].to_pylist(),
                t["source"].to_pylist(),
                t["lang"].to_pylist(),
            )
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "host": hosts_of_urls(pa.array(urls, type=pa.string())),
            }
        )

    out = disjoint_split_by_key(
        ds.map_batches(hostify, batch_format="pyarrow"),
        "host",
        pcts=_Q140_PCTS,
        names=_Q140_NAMES,
        seed=_Q140_SEED,
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)[
        ["doc_id", "host", "split"]
    ]


def q114_winsorize(sf_dir: str) -> pd.DataFrame:
    """Per-group winsorization at EXACT group quantiles: event values
    clip to [p05, p95] of their event_type, where p_f is the
    ceil(f*n)-th smallest value (exact_group_quantiles histogram
    refinement — no sort, driver holds #groups x 2 values).  Oracle
    replays the rank convention with row_number over a per-group
    ORDER BY."""
    from fractions import Fraction

    from ..stages.selection import winsorize_by_group

    out = winsorize_by_group(
        _read(sf_dir, "events", ["event_id", "event_type", "value"]),
        value_col="value",
        group_col="event_type",
        lo=Fraction(1, 20),
        hi=Fraction(19, 20),
        keep_cols=("event_id",),
    ).to_pandas()
    return _finalize(out, {"value_w": 3})


def q115_curriculum_order(sf_dir: str) -> pd.DataFrame:
    """Curriculum ordering: dense global training positions under
    ORDER BY (difficulty tier ASC, splitmix64(doc_id) ASC, doc_id ASC)
    — short/easy docs first, reproducibly shuffled within each tier
    (curriculum learning).  Tier = n_chars bucket (<600 / <900 / rest).
    Two scans + ONE compound (tier x hash-bucket) shuffle; the driver
    holds n_tiers x num_buckets counts.  Oracle replays the hash
    bit-exactly via splitmix64_sql and the order via row_number."""
    from ..stages.shuffle import curriculum_positions

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def add_tier(t: pa.Table) -> pa.Table:
        n = t["n_chars"].to_numpy(zero_copy_only=False)
        tier = np.where(n < 600, 0, np.where(n < 900, 1, 2)).astype(np.int64)
        return t.append_column("tier", pa.array(tier))

    out = (
        curriculum_positions(
            ds.map_batches(add_tier, batch_format="pyarrow"),
            key_col="doc_id",
            tier_col="tier",
            n_tiers=3,
            seed=7,
        )
        .to_pandas()
        .sort_values("pos")
        .reset_index(drop=True)
    )
    return _finalize(out[["doc_id", "n_chars", "tier", "pos"]])


def q116_snapshot_dedup(sf_dir: str) -> pd.DataFrame:
    """Crawl-snapshot dedup: keep the EARLIEST event per (user, 1-day
    tumbling window) — the per-url-per-snapshot keep-one a Common-Crawl
    ingest runs before extraction.  One salted key shuffle; vectorized
    keep-first inside partitions.  Oracle: row_number over
    (key, window ORDER BY ts, id)."""
    from ..stages.dedup import dedup_snapshots

    out = (
        dedup_snapshots(
            _read(sf_dir, "events", ["event_id", "user_id", "ts"]),
            key_col="user_id",
            ts_col="ts",
            window_s=86400,
            tiebreak="event_id",
        )
        .to_pandas()
    )
    return _finalize(out[["event_id", "user_id", "snapshot_window"]])


def q117_gopher_quality(sf_dir: str) -> pd.DataFrame:
    """Gopher quality-rule battery (Rae et al. 2021): word-count bounds,
    mean word length, symbol-to-word ratio, alpha-word fraction,
    distinct-stop-word floor — one fused shuffle-free scan emitting the
    signals AND the keep verdict.  Oracle replays every rule with list
    kernels (the repetition half of Gopher is q93)."""
    from ..stages.text_analysis import gopher_quality_rules

    out = gopher_quality_rules(
        _read(sf_dir, "documents", ["doc_id", "text"])
    ).to_pandas()
    return _finalize(
        out, {"mean_word_len": 4, "frac_alpha_words": 4, "symbol_word_ratio": 4}
    )


def q118_host_pagerank(sf_dir: str) -> pd.DataFrame:
    """Damped PageRank over a deterministic 97-host link graph (the
    web-graph ranking primitive crawl prioritization / domain-quality
    scoring needs; cf. Common-Crawl host ranks in CCNet/RefinedWeb
    curation).  Edges derive row-locally from doc_id arithmetic (two
    rotation edges + a hub edge every 4th doc), so the oracle replays
    the generator in pure SQL and unrolls the 3 power iterations as
    CTEs.  Scale shape: one groupby(src,dst) edge-reduce shuffle, then
    per-iteration ONE rank-vector broadcast + ONE shuffle-free sparse-
    bincount scan + a node-sized driver fold (stages/graph.py)."""
    from ..stages.graph import pagerank

    ds = _read(sf_dir, "documents", ["doc_id"])
    H = 97
    hosts = np.array([f"h{i:03d}.example.org" for i in range(H)], dtype=object)

    def edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = (d * 48271) % H
        hub_src = base[d % 4 == 0]
        src = np.concatenate([base, base, hub_src])
        dst = np.concatenate(
            [(base + 26) % H, (base + 52) % H,
             np.zeros(len(hub_src), dtype=np.int64)]
        )
        return pa.table({"src": pa.array(hosts[src], type=pa.string()),
                         "dst": pa.array(hosts[dst], type=pa.string())})

    out = (
        pagerank(ds.map_batches(edges, batch_format="pyarrow"),
                 damping=0.85, n_iter=3)
        .to_pandas()
        .rename(columns={"node": "host"})
    )
    return _finalize(out[["host", "pagerank"]], {"pagerank": 8})


def q138_host_hits(sf_dir: str) -> pd.DataFrame:
    """HITS hubs & authorities (stages/graph.hits) over the SAME
    deterministic 97-host link graph as q118 — the second classic
    link-analysis signal (Kleinberg's mutual reinforcement: good hubs
    point at good authorities), used alongside PageRank for crawl
    seed selection.  Same scale shape: one edge-reduce shuffle, then
    per-iteration one node-sized broadcast + one shuffle-free bincount
    scan per direction.  The oracle unrolls the L1-normalized
    iterations via stages/graph.hits_sql over the SAME edge CTE the
    q118 oracle uses (single-generator policy on both halves)."""
    from ..stages.graph import hits

    ds = _read(sf_dir, "documents", ["doc_id"])
    H = 97
    hosts = np.array([f"h{i:03d}.example.org" for i in range(H)], dtype=object)

    def edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = (d * 48271) % H
        hub_src = base[d % 4 == 0]
        src = np.concatenate([base, base, hub_src])
        dst = np.concatenate(
            [(base + 26) % H, (base + 52) % H,
             np.zeros(len(hub_src), dtype=np.int64)]
        )
        return pa.table({"src": pa.array(hosts[src], type=pa.string()),
                         "dst": pa.array(hosts[dst], type=pa.string())})

    out = (
        hits(ds.map_batches(edges, batch_format="pyarrow"), n_iter=3)
        .to_pandas()
        .rename(columns={"node": "host"})
    )
    return _finalize(out[["host", "hub", "authority"]],
                     {"hub": 8, "authority": 8})


def q152_triangle_clustering(sf_dir: str) -> pd.DataFrame:
    """Per-host triangle participation + local clustering coefficient
    (stages/graph.triangle_counts) over the SAME deterministic 97-host
    link graph as q118/q138 — the graph-cohesion signal link-farm and
    spam-cluster detection rank hosts by.  Scale shape: one canonical
    edge-dedup shuffle, degree-ordered ("forward") wedge generation per
    oriented source (out-degree bounded O(sqrt m)), closing-edge probe
    via one sorted-key broadcast (cogroup fallback above the cap,
    equivalence-tested in tests/test_graph.py), node-sized sparse
    folds.  Oracle: stages/graph.triangle_sql over the SAME edge CTE as
    q118 (single-generator on both halves)."""
    from ..stages.graph import triangle_counts

    ds = _read(sf_dir, "documents", ["doc_id"])
    H = 97
    hosts = np.array([f"h{i:03d}.example.org" for i in range(H)], dtype=object)

    def edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = (d * 48271) % H
        hub_src = base[d % 4 == 0]
        src = np.concatenate([base, base, hub_src])
        dst = np.concatenate(
            [(base + 26) % H, (base + 52) % H,
             np.zeros(len(hub_src), dtype=np.int64)]
        )
        return pa.table({"src": pa.array(hosts[src], type=pa.string()),
                         "dst": pa.array(hosts[dst], type=pa.string())})

    out = (
        triangle_counts(ds.map_batches(edges, batch_format="pyarrow"))
        .to_pandas()
        .rename(columns={"node": "host"})
    )
    return _finalize(out[["host", "degree", "n_tri", "clustering"]])


_Q153_EVERY_US = 21_600_000_000  # 6-hour bars


def q153_resample_ffill(sf_dir: str) -> rd.Dataset:
    """Per-user 6-hour time-series bars with forward fill
    (stages/resample.resample_last_ffill): bucket each user's events,
    keep the last value per bucket ((ts, event_id) last-write-wins),
    and gap-fill the dense grid between the user's first and last
    bucket — the metrics-rollup / series-densification primitive.
    Scale shape: ONE user-hash shuffle, fully vectorized per-partition
    pass (multi-arange grid + one searchsorted ffill), grid-sized
    output streams from map_groups.  Oracle GENERATED by
    stages/resample.resample_sql from the same parameters
    (single-generator policy)."""
    from ..stages.resample import resample_last_ffill

    return resample_last_ffill(
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]),
        every_us=_Q153_EVERY_US,
    )


def q154_rolling_window(sf_dir: str) -> rd.Dataset:
    """Per-user ROW-frame rolling aggregates (stages/rolling.py): for
    each event, the running rank, value delta vs the previous event,
    and sum/avg/max over the user's last 4 events ordered by
    (ts, event_id) — the last-N-rows analytics the time-window family
    (q28/q80/q84) can't express.  One user-hash shuffle + a fully
    vectorized masked-shift per-partition pass; oracle GENERATED by
    stages/rolling.rolling_sql (single-generator policy)."""
    from ..stages.rolling import rolling_window

    return rolling_window(
        _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]),
        window=4,
    )


def q155_similarity_join(sf_dir: str) -> rd.Dataset:
    """EXACT 3-gram-shingle Jaccard similarity self-join at t >= 1/2
    (stages/simjoin.similarity_join) — the no-recall-loss counterpart
    of the MinHash-LSH sweep (q32): every qualifying pair with its
    exact intersection/union sizes, found via PPJoin-style prefix
    filtering (rarest-first global order, complete by the prefix
    theorem).  Scale shape: one profile scan, one vocab df shuffle +
    broadcast, ONE prefix-shingle shuffle with in-bucket verification,
    one pair-sized dedup.  All threshold tests are integer arithmetic;
    oracle GENERATED by stages/simjoin.similarity_join_sql — the
    brute-force shingle-string equijoin with the identical shingle
    convention (single-generator policy)."""
    from ..stages.simjoin import similarity_join

    return similarity_join(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        threshold=(1, 2),
        ngram=3,
    )


_Q156_SEEDS = ["h007.example.org", "h042.example.org"]


def q156_crawl_depth(sf_dir: str) -> pd.DataFrame:
    """Multi-source directed BFS crawl depth (stages/graph.bfs_depth)
    from two seed hosts over the SAME deterministic 97-host link graph
    as q118/q138/q152 — the link-hop budget signal a frontier scheduler
    ranks by.  Scale shape: one edge-reduce shuffle, then per hop ONE
    sorted-frontier broadcast + ONE shuffle-free edge scan + a
    node-sized fold, early exit on an empty frontier.  Oracle:
    stages/graph.bfs_sql — a bounded recursive reachability CTE with
    min-hop fold over the SAME edge CTE (single-generator policy)."""
    from ..stages.graph import bfs_depth

    ds = _read(sf_dir, "documents", ["doc_id"])
    H = 97
    hosts = np.array([f"h{i:03d}.example.org" for i in range(H)], dtype=object)

    def edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = (d * 48271) % H
        hub_src = base[d % 4 == 0]
        src = np.concatenate([base, base, hub_src])
        dst = np.concatenate(
            [(base + 26) % H, (base + 52) % H,
             np.zeros(len(hub_src), dtype=np.int64)]
        )
        return pa.table({"src": pa.array(hosts[src], type=pa.string()),
                         "dst": pa.array(hosts[dst], type=pa.string())})

    out = (
        bfs_depth(ds.map_batches(edges, batch_format="pyarrow"),
                  _Q156_SEEDS, max_hops=3)
        .to_pandas()
        .rename(columns={"node": "host"})
    )
    return _finalize(out[["host", "depth"]])


def q157_user_trend(sf_dir: str) -> rd.Dataset:
    """Per-user OLS spend trend (stages/trend.grouped_linear_trend):
    slope / intercept / R² of event value against time-in-days — the
    drift-detector analytic.  Scale shape: the TPC-H-Q1 pattern — one
    shuffle-free moment-partial scan (Arrow group_by inside the batch),
    one key-count-sized groupby sum, one finish scan; nothing
    row-count-sized reaches the driver.  Oracle GENERATED by
    stages/trend.grouped_trend_sql — identical sufficient statistics,
    thresholds, and textbook formulas (single-generator policy)."""
    from ..stages.trend import grouped_linear_trend

    return grouped_linear_trend(
        _read(sf_dir, "events", ["user_id", "ts", "value"])
    )


def q158_naive_bayes(sf_dir: str) -> rd.Dataset:
    """Multinomial Naive Bayes source classifier (stages/nbayes.py):
    train on (text, source), score every doc against every class —
    the generative counterpart of q120's discriminative logistic
    classifier.  Scale shape: training is ONE token-class shuffle
    (per-batch factorize partials, vocab×classes rows, never corpus
    tokens) + a tiny per-label doc-count groupby; the fitted model
    broadcasts once via ray.put and scoring is a shuffle-free
    searchsorted/reduceat scan.  Laplace alpha=1 over the pooled
    training vocabulary makes every term an integer-ratio ln —
    SQL-replayable exactly (counts → totals → V → left-join score)."""
    from ..stages.nbayes import nb_score, nb_train

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])
    model = nb_train(ds, text_col="text", label_col="source")
    scored = nb_score(ds, model, text_col="text", id_col="doc_id")

    def rnd(t: pa.Table) -> pa.Table:
        v = _round_half_away(
            t["nb_logprob"].to_numpy(zero_copy_only=False), 4
        )
        return t.set_column(
            t.schema.get_field_index("nb_logprob"),
            "nb_logprob",
            pa.array(v, type=pa.float64()),
        )

    return scored.map_batches(rnd, batch_format="pyarrow")


def q159_markov_transitions(sf_dir: str) -> pd.DataFrame:
    """First-order Markov transition matrix over user event streams
    (stages/markov.py): P(next event_type | current) from consecutive
    pairs within each user's (ts, event_id)-ordered timeline — the
    clickstream page-flow analytic.  Scale shape: ONE user-hash shuffle,
    vectorized per-partition pass (mergesort + shifted-key mask),
    |states|²×partitions partial rows folded on the driver.  Oracle:
    lead() OVER (PARTITION BY user ORDER BY ts, event_id) replay."""
    from ..stages.markov import transition_matrix

    out = transition_matrix(
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])
    )
    return _finalize(out, {"p": 6})


def q160_rollup_lang_source(sf_dir: str) -> pd.DataFrame:
    """Hierarchical ROLLUP(lang, source) over documents
    (stages/rollup.py): doc counts + char sums at full detail, per-lang,
    and grand-total levels — the OLAP corpus-composition dashboard.
    Scale shape: ONE fine-level shuffle (map-side Arrow partials →
    group-cardinality rows); every coarser level re-aggregates the fine
    table on the driver (exact for int sums, |langs×sources|-bounded).
    Oracle: GROUP BY ROLLUP with coalesce sentinels."""
    from ..stages.rollup import rollup_aggregate

    return rollup_aggregate(
        _read(sf_dir, "documents", ["lang", "source", "n_chars"]),
        ["lang", "source"],
        ["n_chars"],
        count_col="n_docs",
    )


def q161_pareto_skyline(sf_dir: str) -> pd.DataFrame:
    """2-D Pareto skyline over lineitem maximizing (l_extendedprice,
    l_discount) — the multi-criteria selection operator
    (stages/skyline.py).  Scale shape: per-block local skylines
    (vectorized two-window scan), one answer×blocks-bounded merge, one
    finishing scan — no shuffle at all.  Oracle: the identical
    two-window dominance replay (max-preceding-y over x-desc order +
    max-preceding-x within equal-y)."""
    from ..stages.skyline import pareto_skyline

    out = pareto_skyline(
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"],
        ),
        "l_extendedprice",
        "l_discount",
        keep_cols=("l_orderkey", "l_linenumber"),
    )
    out["l_linenumber"] = out["l_linenumber"].astype("int64")
    return _finalize(
        out[["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"]]
    )


def q162_mad_outliers(sf_dir: str) -> rd.Dataset:
    """Per-event-type robust outliers by median absolute deviation
    (stages/selection.mad_outliers): |v − median| > 3·1.4826·MAD with
    EXACT ceil(n/2) medians — the quality-signal outlier sweep that
    tolerates heavy tails where z-scores (q57) break.  Scale shape: two
    histogram-refinement quantile passes (no sort, driver holds
    #groups×1 values) + one shuffle-free filter scan.  Oracle: the
    row_number rank replay of both medians (q114's convention) + the
    identical threshold expression."""
    from ..stages.selection import mad_outliers

    return mad_outliers(
        _read(sf_dir, "events", ["event_id", "event_type", "value"]),
        value_col="value",
        group_col="event_type",
        keep_cols=("event_id",),
    )


def q163_url_param_profile(sf_dir: str) -> rd.Dataset:
    """URL query-parameter cardinality profile
    (stages/url_params.param_cardinality_profile): per (host, param)
    occurrence count, EXACT distinct-value count and the
    session-id/spider-trap flag (ratio > 0.5 at n ≥ 10) — the crawl
    canonicalization signal next to SURT (q129) and the URL rule gate
    (q123).  Pages are synthesized deterministically from doc_id: a
    'sid' param carries the unique id (ratio 1 → trap), 'page'/'ref'
    are low-cardinality, and every 7th url has no query at all.  Scale
    shape: in-batch triple dedup combiner, ONE (host,param)-hash
    shuffle, |hosts×params|-sized output.  Oracle rebuilds the same
    urls via printf and replays the parse with split_part/strpos."""
    from ..stages.url_params import param_cardinality_profile

    ds = _read(sf_dir, "documents", ["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sd = pd.Series(d).astype(str)
        base = (
            "https://h"
            + pd.Series(d % 37).astype(str).str.zfill(2)
            + ".example.org/p/"
            + pd.Series(d % 11).astype(str)
        )
        q = (
            "?sid="
            + sd
            + "&page="
            + pd.Series(d % 5).astype(str)
            + "&ref="
            + pd.Series(np.where(d % 3 == 0, "ads", "organic"))
        )
        url = np.where(d % 7 == 0, base, base + q)
        return pa.table({"url": pa.array(url, type=pa.string())})

    return param_cardinality_profile(
        ds.map_batches(mk, batch_format="pyarrow")
    ).select_columns(
        ["host", "pkey", "n", "n_distinct", "distinct_ratio", "is_trap"]
    )


def q164_left_outer_join(sf_dir: str) -> rd.Dataset:
    """LEFT OUTER equi-join orders ⟕ lineitem
    (stages/joins.bucketed_outer_join): orders with no lineitems (a real
    feature of the fixture — 27 dangling orders at sf0.001) survive with
    sentinel-coalesced right columns — the general outer-join operator
    next to the inner (q21-family), semi/anti (q67/q110) and asof (q47)
    joins.  Scale shape: one key-hash bucket shuffle per side, per-bucket
    vectorized pandas merges, dangling rows as typed nulls.  Oracle:
    LEFT JOIN + coalesce."""
    from ..stages.joins import bucketed_outer_join

    joined = bucketed_outer_join(
        _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"]),
        _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_quantity"]),
        left_key="o_orderkey",
        right_key="l_orderkey",
        how="left",
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                "o_orderstatus": t["o_orderstatus"],
                "l_linenumber": pc.fill_null(
                    t["l_linenumber"].cast(pa.int64()), -1
                ),
                "l_quantity": pc.fill_null(
                    t["l_quantity"].cast(pa.float64()), 0.0
                ),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


_Q165_LO, _Q165_HI, _Q165_BINS = 0.0, 500.0, 25


def q165_grouped_histogram(sf_dir: str) -> rd.Dataset:
    """Exact equi-width value histogram per event_type
    (stages/histogram.grouped_histogram): 25 bins over [0, 500), clamp
    semantics on both edges — the monitoring-distribution primitive
    next to the exact quantiles (q64/q114).  Scale shape: per-batch
    vectorized (group, bin) partial counts (groups×bins rows leave each
    task, never event rows) + ONE tiny groupby-sum.  Oracle: identical
    floor((v-lo)/width) double arithmetic with least/greatest clamps."""
    from ..stages.histogram import grouped_histogram

    return grouped_histogram(
        _read(sf_dir, "events", ["event_type", "value"]),
        value_col="value",
        group_col="event_type",
        lo=_Q165_LO,
        hi=_Q165_HI,
        bins=_Q165_BINS,
    )


def q166_day_over_day(sf_dir: str) -> pd.DataFrame:
    """Day-over-day value drift per event_type
    (stages/trend.period_over_period): daily totals, lagged previous
    day and relative change — the calendar-period complement of the
    OLS trend (q157) and row-frame lag (q154).  The fixture events span
    ~30 natural days (one month), so DAY is the granularity with real
    lag structure.  Scale shape: per-batch (key, day) partials, ONE
    keys×days groupby, keys×days driver lag fold.  Totals round at 4
    (sum association), pct at 6 (computed from unrounded sums on both
    sides — 1e-12 drift absorbed)."""
    from ..stages.trend import period_over_period

    out = period_over_period(
        _read(sf_dir, "events", ["event_type", "ts", "value"]), period="day"
    )
    return _finalize(out, {"total": 4, "prev_total": 4, "pct_change": 6})


def q167_fuzzy_linkage(sf_dir: str) -> rd.Dataset:
    """Fuzzy record linkage (stages/linkage.fuzzy_name_join): entity
    names synthesized with planted single-char deletions; pairs block
    on the first 4 chars and verify with EXACT Levenshtein ≤ 1 — the
    entity-resolution / typo-dedup operator next to the set-similarity
    join (q155).  Scale shape: ONE block-hash shuffle, in-block
    VECTORIZED verify (hamming matrix for same lengths, prefix+suffix
    alignment for off-by-one — no per-pair DP at max_dist=1), loud pair
    cap.  Oracle: identical printf/substr name synthesis + DuckDB
    levenshtein over the same block equi-join."""
    from ..stages.linkage import fuzzy_name_join

    ds = _read(sf_dir, "documents", ["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = pd.Series(d // 2).astype(str).str.zfill(6) + " entity record"
        name = base.to_numpy(dtype=object)
        p = d % 7 + 9  # 1-based deletion position, inside 'entity rec'
        odd = d % 2 == 1
        for pv in np.unique(p[odd]):
            m = odd & (p == pv)
            name[m] = base[m].str.slice(0, pv - 1) + base[m].str.slice(pv)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "name": pa.array(name, type=pa.string()),
            }
        )

    return fuzzy_name_join(
        ds.map_batches(mk, batch_format="pyarrow"),
        id_col="doc_id",
        name_col="name",
        block_len=4,
        max_dist=1,
    )


def q168_cube_lang_source(sf_dir: str) -> pd.DataFrame:
    """CUBE(lang, source) over documents (stages/rollup.cube_aggregate):
    all four grouping sets — (lang, source), (lang), (source), () — the
    cross-dimension corpus dashboard ROLLUP (q160) can't express (it
    lacks the (source)-only slice).  Scale shape: identical to q160 —
    ONE fine-level shuffle (map-side Arrow partials, group-cardinality
    rows); every coarser set re-aggregates the fine table on the driver
    (exact int sums, |langs×sources| × 2^k bounded).  Oracle: GROUP BY
    CUBE with coalesce sentinels."""
    from ..stages.rollup import cube_aggregate

    return cube_aggregate(
        _read(sf_dir, "documents", ["lang", "source", "n_chars"]),
        ["lang", "source"],
        ["n_chars"],
        count_col="n_docs",
    )


_Q169_THRESHOLD = 0.5


def q169_classifier_eval(sf_dir: str) -> pd.DataFrame:
    """Exact distributed ROC-AUC + threshold confusion for a binary
    quality classifier (stages/evaluation.binary_eval) — the eval step
    of every classifier-curation loop (q120/q158).  Scores/labels are
    integer-arithmetic functions of doc_id (scores k/32 — exact float64,
    33 distinct values WITH ties, so the tie-corrected average-rank AUC
    path is actually exercised).  Scale shape: per-batch (score, label)
    Arrow partials → ONE small groupby → a |distinct scores|-sized
    driver fold in pure Python-int rank arithmetic (2·ranksum form — no
    overflow at any corpus size, one float division per metric).
    Oracle: GENERATED by binary_eval_sql (single-generator policy)."""
    from ..stages.evaluation import binary_eval

    ds = _read(sf_dir, "documents", ["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        score = ((d * 37) % 33) / 32.0
        label = ((d * 37) % 33 + d % 11) >= 22
        return pa.table(
            {"score": pa.array(score, type=pa.float64()), "label": pa.array(label)}
        )

    return binary_eval(
        ds.map_batches(mk, batch_format="pyarrow"), threshold=_Q169_THRESHOLD
    )


def q170_source_gini(sf_dir: str) -> pd.DataFrame:
    """Exact per-source Gini concentration of document lengths
    (stages/selection.grouped_gini) — the corpus-diversity axis next to
    the composition rollups (q160/q168): a source whose bytes come from
    a few giant documents is a skew risk for packing and dedup alike.
    Scale shape: per-batch (source, n_chars) Arrow count partials → ONE
    small groupby → a |distinct (source, value)|-sized driver fold in
    exact Python-int arithmetic (ties are order-invariant, so value
    COUNTS suffice — no per-group sort).  Oracle: GENERATED by
    grouped_gini_sql (row_number rank replay, same one float division)."""
    from ..stages.selection import grouped_gini

    return grouped_gini(
        _read(sf_dir, "documents", ["source", "n_chars"]),
        value_col="n_chars",
        group_col="source",
    )


def q171_degree_distribution(sf_dir: str) -> pd.DataFrame:
    """In/out-degree distribution + CCDF of the q118 97-host link graph
    (stages/graph.degree_distribution) — the power-law-tail diagnostic
    (hub detection, crawl fanout budgeting) next to PageRank/HITS/
    triangles, over the SAME deterministic edge generator so the oracle
    reuses the shared edge CTE.  Scale shape: edge-dedup shuffle →
    (direction, node) degree-count shuffle over distinct pairs →
    per-batch degree-histogram partials; the driver fold is |distinct
    degrees|-sized.  Oracle: GENERATED by degree_distribution_sql over
    _Q118_EDGES (single-generator on both halves)."""
    from ..stages.graph import degree_distribution

    ds = _read(sf_dir, "documents", ["doc_id"])
    H = 97
    hosts = np.array([f"h{i:03d}.example.org" for i in range(H)], dtype=object)

    def edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = (d * 48271) % H
        hub_src = base[d % 4 == 0]
        src = np.concatenate([base, base, hub_src])
        dst = np.concatenate(
            [(base + 26) % H, (base + 52) % H,
             np.zeros(len(hub_src), dtype=np.int64)]
        )
        return pa.table({"src": pa.array(hosts[src], type=pa.string()),
                         "dst": pa.array(hosts[dst], type=pa.string())})

    return degree_distribution(ds.map_batches(edges, batch_format="pyarrow"))


def q172_c4_line_filter(sf_dir: str) -> rd.Dataset:
    """C4-style LINE-level quality rewrite (stages/clean.c4_line_filter):
    keep lines with ≥5 words ending in terminal punctuation and no
    blocked substring (javascript / lorem ipsum / '{'), drop docs with
    no survivors — the line-structured rewrite the document-level gates
    (q91/q96) can't express.  Lines synthesized per doc_id (nav junk,
    no-terminal ads, a javascript notice every 3rd, a good sentence
    every 4th, Lorem Ipsum every 5th; every 9th doc all-junk → dropped).
    Scale shape: ONE shuffle-free scan, vectorized pandas str kernels
    over the batch's exploded line table.  Oracle: GENERATED by
    c4_line_filter_sql over the printf-rebuilt line table (rule
    constants interpolate from the same tuples)."""
    from ..stages.clean import c4_line_filter

    ds = _read(sf_dir, "documents", ["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = pd.Series(d.astype(str))
        a = "the quick brown fox jumps over dog " + s + "."
        a[d % 9 == 8] = "click here"
        text = a + "\nhome | menu | login\nbuy now " + pd.Series(d % 7).astype(str)
        text = text.where(
            d % 3 != 0, text + "\nplease enable javascript to view this content."
        )
        text = text.where(
            d % 4 != 0,
            text + "\nthis is a perfectly fine sentence number "
            + pd.Series(d % 11).astype(str) + "!",
        )
        text = text.where(
            d % 5 != 0,
            text + "\nLorem Ipsum dolor sit amet consectetur adipiscing elit.",
        )
        return pa.table(
            {"doc_id": t["doc_id"],
             "text": pa.array(text.to_numpy(dtype=object), type=pa.string())}
        )

    return c4_line_filter(
        ds.map_batches(mk, batch_format="pyarrow"), min_words=5, min_kept_lines=1
    ).select_columns(["doc_id", "text", "n_lines", "n_kept"])


def q173_novelty(sf_dir: str) -> rd.Dataset:
    """Word-3-gram novelty vs a reference corpus
    (stages/text_analysis.novelty_scores): fraction of each document's
    DISTINCT 3-grams unseen in the reference (sources src0/src1 — 10%
    of the corpus) — the "how much new text does this shard add" signal
    dual to decontamination (q110 removes overlap, this SCORES it).
    Scale shape: reference grams fold once on the driver (amortized
    sorted merges, loud cap; Bloom path documented for corpus-sized
    references) and broadcast via ray.put; scoring is a shuffle-free
    scan (gram tape → factorize → ONE searchsorted probe per batch).
    Oracle: GENERATED by novelty_sql (generate_series + list_slice gram
    replay, LEFT JOIN reference distinct)."""
    from ..stages.text_analysis import novelty_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    def mk(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": t["text"],
                "is_ref": pc.is_in(
                    t["source"], value_set=pa.array(["src0", "src1"])
                ),
            }
        )

    return novelty_scores(ds.map_batches(mk, batch_format="pyarrow"), n=3)


def q174_fix_encoding(sf_dir: str) -> rd.Dataset:
    """Double-encoding (mojibake) repair
    (stages/clean.add_fixed_encoding): every 3rd document's text is
    replaced by the UTF-8-read-as-cp1252 garble of a known accented
    string (the ftfy top case — 'é' → 'Ã©', '—' → 'â€”'); the engine
    must detect the lead+continuation signature with ONE vectorized
    regex pass and repair EXACTLY (cp1252-encode → UTF-8-decode) while
    leaving the other two-thirds byte-identical.  Shuffle-free scan;
    repair runs only on flagged rows.  Oracle: emits the chr()-rebuilt
    CLEAN string directly for synthesized rows — the repair itself is
    what's being checked."""
    from ..stages.clean import add_fixed_encoding

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def mk(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t["text"].to_pylist()
        out = []
        for i, dv in enumerate(d):
            if dv % 3 == 0:
                clean = f"café and résumé {dv} — it’s fine."
                out.append(clean.encode("utf-8").decode("cp1252"))
            else:
                out.append(texts[i])
        return pa.table(
            {"doc_id": t["doc_id"], "text": pa.array(out, type=pa.string())}
        )

    return ds.map_batches(mk, batch_format="pyarrow").map_batches(
        add_fixed_encoding, batch_format="pyarrow"
    )


_Q175_TOPK = 100


def q175_rrf_fusion(sf_dir: str) -> pd.DataFrame:
    """Reciprocal-rank fusion of two retrieval rankings
    (stages/fusion.rrf_fuse): BM25 over the q130 query terms fused with
    a document-length prior — the hybrid-retrieval combiner (Cormack
    2009) used when lexical and dense scores aren't calibrated.  Scale
    shape: each list is a k×blocks partial top-k
    (selection.global_top_k — no global sort), ranks on the ROUNDED
    bm25 (ties broken by doc_id, so both engines rank identically);
    fusion is a k-sized driver merge with a FIXED list order so the
    two-term float add matches the oracle.  Oracle: bm25_sql as a
    derived table + row_number ranks + FULL JOIN."""
    from ..stages.bm25 import bm25_scores
    from ..stages.fusion import rrf_fuse
    from ..stages.selection import global_top_k

    docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    bm = bm25_scores(
        docs.map_batches(
            lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow"
        ),
        _BM25_TERMS,
    )

    def rnd(t: pa.Table) -> pa.Table:
        v = _round_half_away(
            t["bm25"].to_numpy(zero_copy_only=False).astype(np.float64), 4
        )
        return t.set_column(
            t.column_names.index("bm25"), "bm25", pa.array(v, type=pa.float64())
        )

    top_bm = global_top_k(
        bm.map_batches(rnd, batch_format="pyarrow"),
        k=_Q175_TOPK, by=["bm25", "doc_id"], descending=[True, False],
    )
    top_len = global_top_k(
        docs.map_batches(
            lambda t: t.select(["doc_id", "n_chars"]), batch_format="pyarrow"
        ),
        k=_Q175_TOPK, by=["n_chars", "doc_id"], descending=[True, False],
    )
    return rrf_fuse([("bm25", top_bm), ("len", top_len)])


def q176_head_meta(sf_dir: str) -> rd.Dataset:
    """HTML head-metadata extraction (stages/html_meta.py): title /
    rel=canonical / meta-description pulled from synthesized page
    payloads covering both attribute orders, both quote styles, bare
    attributes, absent fields and a decoy stylesheet <link> — the
    crawl-side metadata pass before body extraction (canonical feeds
    URL dedup, titles feed retrieval).  Scale shape: ONE shuffle-free
    scan, compiled-regex pandas kernels over the decoded head only
    (head_cap), html dropped on output.  Oracle: emits the PLANTED
    truth via CASE — any parse miss on any variant diverges."""
    from ..stages.html_meta import extract_head_meta

    ds = _read(sf_dir, "documents", ["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for dv in d:
            head = ["<html><head>", '<link rel="stylesheet" href="/s.css">']
            if dv % 7 != 3:
                head.append(f"<title>Doc {dv} overview</title>")
            if dv % 4 == 0:
                head.append(
                    f'<link rel="canonical" href="https://canon.example.org/c/{dv // 4}">'
                )
            elif dv % 4 == 2:
                head.append(
                    f"<link href='https://canon.example.org/c/{dv // 4}' rel=canonical>"
                )
            if dv % 3 == 0:
                head.append(
                    f'<meta name="description" content="summary {dv % 13} of document">'
                )
            elif dv % 3 == 2:
                head.append(
                    f"<meta content='alt summary {dv % 13} of document' name='description'>"
                )
            head.append(f"</head><body><p>filler {dv}</p></body></html>")
            payloads.append("\n".join(head).encode("utf-8"))
        return pa.table(
            {"doc_id": t["doc_id"], "html": pa.array(payloads, type=pa.binary())}
        )

    return extract_head_meta(
        ds.map_batches(mk, batch_format="pyarrow"), keep_cols=["doc_id"]
    )


_Q177_DELAY_S = 5


def q177_politeness_schedule(sf_dir: str) -> rd.Dataset:
    """Per-host crawl politeness scheduling (stages/schedule.py): a
    37-host prioritized frontier turned into fetch slots — within each
    host (priority DESC, url ASC), fetch i waits i·5 s, the Crawl-delay
    contract downstream of q127's robots gate and q146's frontier
    priorities.  Scale shape: ONE host-hash coarse-partition shuffle,
    fully vectorized per-partition rank (mergesort + cumcount), int64
    end-to-end.  Oracle: row_number window replay."""
    from ..stages.schedule import politeness_schedule

    ds = _read(sf_dir, "documents", ["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        host = pd.Series(d % 37).map(lambda h: f"h{h:02d}.example.org")
        url = (
            "https://" + host + "/p/" + pd.Series(d).astype(str)
        )
        return pa.table(
            {
                "url": pa.array(url.to_numpy(object), type=pa.string()),
                "host": pa.array(host.to_numpy(object), type=pa.string()),
                "priority": pa.array((d * 17) % 10),
            }
        )

    return politeness_schedule(
        ds.map_batches(mk, batch_format="pyarrow"), delay_s=_Q177_DELAY_S
    )


def q178_recency_reputation(sf_dir: str) -> pd.DataFrame:
    """Recency-weighted per-type event value (stages/trend.
    recency_weighted_mean): weight 2^(−age_days/7) from the corpus
    max(ts) — the EWMA-style host-reputation signal where last week
    outweighs last month, WITHOUT a sequential pass (closed-form
    weighted sums fold like the OLS trend q157).  Scale shape: one
    max(ts) partial fold, then one shuffle-free scan of per-key
    (Σwv, Σw, n) Arrow partials into a key-count-sized groupby.
    Oracle: GENERATED by recency_weighted_sql (identical µs age
    arithmetic and pow(2,−x) weights)."""
    from ..stages.trend import recency_weighted_mean

    return recency_weighted_mean(
        _read(sf_dir, "events", ["event_type", "ts", "value"]),
        key_col="event_type",
        value_col="value",
        half_life_days=7.0,
    )


def q179_source_lang_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-source language-mix entropy
    (stages/profile.grouped_category_entropy): Shannon entropy of the
    lang distribution within each source — the mix-purity audit
    (multilingual scraper farms vs routable single-language sources)
    next to the composition rollups (q160/q168) and script mix (q145).
    Scale shape: per-batch (source, lang) Arrow count partials → ONE
    small groupby → |sources×langs| driver fold in sorted order.
    Oracle: GENERATED by category_entropy_sql (same −Σ p log2 p, same
    −0.0 fold)."""
    from ..stages.profile import grouped_category_entropy

    return grouped_category_entropy(
        _read(sf_dir, "documents", ["source", "lang"]),
        group_col="source",
        cat_col="lang",
    )


def q180_nucleus_sources(sf_dir: str) -> pd.DataFrame:
    """Top-p (nucleus) source selection (stages/sampling.
    nucleus_sources): order sources by total chars DESC and keep the
    minimal prefix reaching p = 4/5 of corpus mass — the head/tail
    split mixing applies before per-source treatment (q97/q100's
    quota/temperature act on the head, pruning on the tail).  The keep
    rule is pure INTEGER arithmetic (5·cum_before < 4·total), so no FP
    boundary can flip it.  Scale shape: per-batch source partials →
    ONE group-cardinality groupby → |sources| driver fold.  Oracle:
    GENERATED by nucleus_sources_sql (same order, same lagged-integer
    rule)."""
    from ..stages.sampling import nucleus_sources

    return nucleus_sources(
        _read(sf_dir, "documents", ["source", "n_chars"]),
        group_col="source",
        weight_col="n_chars",
        p_num=4,
        p_den=5,
    )


def q181_html_tables(sf_dir: str) -> rd.Dataset:
    """HTML table extraction (stages/html_tables.py): flat <table>
    markup → relational (doc, table, row, col, cell, is_header) tuples
    — the structured-data sibling of the boilerplate stripper (specs /
    standings / price tables are the highest-value page content).
    Every even doc gets a (1 header + d%3+1 rows) × (d%4+1 cols) table
    with attribute noise on every tag.  Scale shape: ONE shuffle-free
    scan, compiled-regex finditer per payload, html never outlives its
    task.  Oracle: emits the PLANTED truth via generate_series — any
    parse miss diverges."""
    from ..stages.html_tables import extract_tables

    ds = _read(sf_dir, "documents", ["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for dv in d:
            if dv % 2 != 0:
                payloads.append(b"<html><body><p>no table</p></body></html>")
                continue
            r, c = dv % 3 + 1, dv % 4 + 1
            rows = [
                "<tr id='hdr'>"
                + "".join(f"<th scope=col>h{dv}-{ci}</th>" for ci in range(c))
                + "</tr>"
            ]
            for ri in range(1, r + 1):
                rows.append(
                    "<tr>"
                    + "".join(
                        f'<td class="v">c{dv}-{ri}-{ci}</td>' for ci in range(c)
                    )
                    + "</tr>"
                )
            payloads.append(
                (
                    '<html><body><table class="data">'
                    + "".join(rows)
                    + "</table></body></html>"
                ).encode()
            )
        return pa.table(
            {"doc_id": t["doc_id"], "html": pa.array(payloads, type=pa.binary())}
        )

    return extract_tables(ds.map_batches(mk, batch_format="pyarrow"))


def q182_shard_packing(sf_dir: str) -> pd.DataFrame:
    """LPT shard bin packing (stages/packing.lpt_shard_assign): sources
    greedily assigned by descending total chars to the lightest of 4
    training shards — the epoch-balance step after quota/temperature
    mixing (one hot shard = epoch wall-time).  Scale shape: per-batch
    source partials → ONE group-cardinality groupby → |sources| driver
    heap fold.  Rows-only (stepwise argmin isn't SQL-expressible);
    balance/determinism invariants pinned by tests/test_packing.py."""
    from ..stages.packing import lpt_shard_assign

    return lpt_shard_assign(
        _read(sf_dir, "documents", ["source", "n_chars"]),
        group_col="source",
        weight_col="n_chars",
        n_shards=4,
    )


def q183_readability(sf_dir: str) -> rd.Dataset:
    """Per-doc readability statistics (stages/text_analysis.
    add_readability): words, sentence-punctuation runs, long-word
    fraction and the Flesch-style proxy score — the readability axis of
    the quality battery (q96 gates, q139 entropy, q144 compression).
    ONE shuffle-free vectorized scan over the batch word tape.  Oracle:
    GENERATED by readability_sql (identical tokenizer, sentence regex
    and left-associated score expression)."""
    from ..stages.text_analysis import add_readability

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        add_readability, batch_format="pyarrow", batch_size=4096
    ).select_columns(
        ["doc_id", "n_words", "n_sentences", "n_long_words", "flesch_proxy"]
    )


def q184_host_churn(sf_dir: str) -> pd.DataFrame:
    """Per-host churn between crawl snapshots (stages/snapshots.
    host_churn over q133's snapshot_diff): the recrawl-budget signal —
    hosts that churn get crawled often, frozen hosts get demoted
    (q146's freshness term is the per-page version).  Scale shape:
    q133's one salted cogroup + one shuffle-free host-extract scan +
    ONE hosts×4-bounded groupby.  Oracle: the q133 FULL JOIN CTEs +
    host regexp + conditional counts."""
    import hashlib as _hl

    from ..stages.snapshots import host_churn, snapshot_diff

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def snap(side: str):
        def f(t: pa.Table) -> pa.Table:
            d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            texts = t["text"].to_pylist()
            urls, hs = [], []
            for dd, txt in zip(d, texts):
                if side == "old":
                    if dd % 17 == 0:
                        continue
                    body = f"old:{txt}" if dd % 5 == 0 else txt
                else:
                    if dd % 13 == 0:
                        continue
                    body = txt
                urls.append(f"https://h{(dd * 48271) % 97:03d}.example.org/p/{dd}")
                hs.append(_hl.md5(body.encode()).hexdigest())
            return pa.table(
                {
                    "url": pa.array(urls, type=pa.string()),
                    "content_hash": pa.array(hs, type=pa.string()),
                }
            )

        return f

    diff = snapshot_diff(
        ds.map_batches(snap("old"), batch_format="pyarrow"),
        ds.map_batches(snap("new"), batch_format="pyarrow"),
    )
    return host_churn(diff)


def q185_daily_activity(sf_dir: str) -> pd.DataFrame:
    """Per-day event volume + EXACT distinct users + repeat rate
    (stages/profile.daily_activity) — the ingestion monitor (traffic
    dips, bot storms, dedup-rate drift) next to the table profiler
    (q149).  Scale shape: per-batch (day, user) dedup partials → ONE
    exact-distinct groupby bounded by daily actives → |days×blocks|
    driver fold; one all-to-all total.  Oracle: date_trunc +
    count(DISTINCT)."""
    from ..stages.profile import daily_activity

    return daily_activity(_read(sf_dir, "events", ["ts", "user_id"]))


def q186_cume_dist(sf_dir: str) -> rd.Dataset:
    """Per-group cumulative-distribution normalization
    (stages/selection.cume_dist_by_group): every event's value becomes
    P(X ≤ x) within its event_type — the rank calibration applied
    before mixing scores from different scorers (q175's RRF is the
    rank-side cousin; this is the score-side).  Scale shape: ONE
    grouped value-count shuffle (bounded by distinct values), per-group
    cumulative tables broadcast once, shuffle-free searchsorted scan.
    Oracle: round(cume_dist() OVER (PARTITION BY ... ORDER BY ...), 6)."""
    from ..stages.selection import cume_dist_by_group

    return cume_dist_by_group(
        _read(sf_dir, "events", ["event_id", "event_type", "value"]),
        value_col="value",
        group_col="event_type",
        keep_cols=["event_id"],
    )


def q187_k_anonymity(sf_dir: str) -> rd.Dataset:
    """k-anonymity suppression (stages/clean.suppress_small_groups):
    drop documents whose (lang, source) quasi-identifier combination
    has fewer than 8 members — the privacy-release gate (rare
    combinations identify; common ones don't).  Scale shape: ONE
    combination-cardinality count groupby → keep-set broadcast →
    shuffle-free membership filter.  Oracle: HAVING-count semi-join."""
    from ..stages.clean import suppress_small_groups

    return suppress_small_groups(
        _read(sf_dir, "documents", ["doc_id", "lang", "source"]),
        group_cols=["lang", "source"],
        k=8,
    )


_Q188_SEEDS = ["h000.example.org", "h007.example.org", "h021.example.org"]


def q188_personalized_pagerank(sf_dir: str) -> pd.DataFrame:
    """Personalized PageRank (stages/graph.pagerank with seeds): random
    walk with restart to a 3-host seed list over the q118 graph — the
    topic/trust-rank variant crawl prioritization uses to rank "near my
    curated seeds" (teleport, dangling mass and r0 all restart at the
    seeds).  Same scale shape as q118 (one edge reduce, per iteration
    one broadcast + one shuffle-free sparse-bincount scan).  Oracle:
    GENERATED by personalized_pagerank_sql over the SAME edge CTE —
    the unseeded path's float arithmetic is untouched (q118 oracle
    unchanged)."""
    from ..stages.graph import pagerank

    ds = _read(sf_dir, "documents", ["doc_id"])
    H = 97
    hosts = np.array([f"h{i:03d}.example.org" for i in range(H)], dtype=object)

    def edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = (d * 48271) % H
        hub_src = base[d % 4 == 0]
        src = np.concatenate([base, base, hub_src])
        dst = np.concatenate(
            [(base + 26) % H, (base + 52) % H,
             np.zeros(len(hub_src), dtype=np.int64)]
        )
        return pa.table({"src": pa.array(hosts[src], type=pa.string()),
                         "dst": pa.array(hosts[dst], type=pa.string())})

    out = (
        pagerank(ds.map_batches(edges, batch_format="pyarrow"),
                 damping=0.85, n_iter=3, seeds=_Q188_SEEDS)
        .to_pandas()
        .rename(columns={"node": "host"})
    )
    return _finalize(out[["host", "pagerank"]], {"pagerank": 8})


def q189_top_paths(sf_dir: str) -> pd.DataFrame:
    """Top-20 length-3 event-type paths across user timelines
    (stages/markov.top_event_paths): the clickstream path-mining step
    between the first-order transitions (q159) and the fixed-funnel
    check (q150).  Scale shape: ONE user-hash coarse shuffle,
    vectorized shifted-mask path extraction per partition, path-vocab
    groupby folded by per-block top-k (no global sort).  Oracle: two
    lead() windows + concat + count + the same (n DESC, path) tie-break."""
    from ..stages.markov import top_event_paths

    return top_event_paths(
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"]),
        path_len=3,
        k=20,
    )


def q190_numeric_drift(sf_dir: str) -> pd.DataFrame:
    """Numeric drift report between two snapshot halves
    (stages/profile.numeric_drift): events split by event_id parity
    stand in for consecutive crawls; per column (value, user_id) —
    n / null fraction / mean / min / max per side + mean shift — the
    ingestion regression gate next to the profiler (q149).  Scale
    shape: one moment-partial scan per side, driver fold only.
    Oracle: two aggregate CTEs joined per column."""
    from ..stages.profile import numeric_drift

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def half(parity: int):
        def f(t: pa.Table) -> pa.Table:
            d = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return t.filter(pa.array(d % 2 == parity))

        return f

    return numeric_drift(
        ds.map_batches(half(0), batch_format="pyarrow"),
        ds.map_batches(half(1), batch_format="pyarrow"),
        ["user_id", "value"],
    )


def q191_daily_burst(sf_dir: str) -> pd.DataFrame:
    """Burst detection (stages/trend.daily_burst): per-event-type daily
    totals z-scored against the trailing 7 days (≥3 days history) —
    the traffic-spike / bot-storm monitor composing q166's daily lags
    with rolling moments.  sd is the explicit textbook expression on
    BOTH sides (not the engine-internal stddev_samp), so the oracle is
    the identical formula; keys×days driver fold.  Oracle: GENERATED
    by daily_burst_sql."""
    from ..stages.trend import daily_burst

    return daily_burst(
        _read(sf_dir, "events", ["event_type", "ts", "value"]),
        window=7,
        min_hist=3,
    )


def q192_source_quality_report(sf_dir: str) -> pd.DataFrame:
    """Composed capstone: per-source QUALITY DASHBOARD — readability
    (q183 kernel), character entropy (q139 kernel) and length fused in
    ONE scan, rolled up per source as n_docs, EXACT median word count
    (selection.exact_group_quantiles — no sort), avg flesch / avg
    entropy (per-doc rounded at 4 on BOTH sides, sums associate under
    round-4), and an integer pass rate (flesch ≥ 40 AND ≥ 50 words on
    the ROUNDED values — no FP boundary).  The corpus-health report a
    curation run prints per shard, next to the corpus-build (q98) and
    crawl-frontier (q146) capstones.  Scale shape: one fused metrics
    scan materialized SLIM (4 columns — double-consumed by the rollup
    and the quantile passes, the pagerank-_indexed_edges precedent),
    per-batch source partials → ONE source-cardinality groupby, plus
    the quantile refinement scans; |sources|-sized driver join.
    Oracle: readability_sql as a derived table joined to the q139
    entropy CTEs and a row_number median — fully composed."""
    from ..stages.selection import exact_group_quantiles
    from ..stages.text_analysis import add_char_entropy, add_readability
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def metrics(t: pa.Table) -> pa.Table:
        t = add_readability(t, "text")
        t = add_char_entropy(t, "text")
        ent = _round_half_away(
            t["char_entropy"].to_numpy(zero_copy_only=False), 4
        )
        return pa.table(
            {
                "source": t["source"],
                "n_words": t["n_words"],
                "flesch_proxy": t["flesch_proxy"],
                "char_entropy": pa.array(ent, type=pa.float64()),
            }
        )

    slim = ds.map_batches(
        metrics, batch_format="pyarrow", batch_size=4096
    ).materialize()

    def part(t: pa.Table) -> pa.Table:
        f = t["flesch_proxy"].to_numpy(zero_copy_only=False)
        w = t["n_words"].to_numpy(zero_copy_only=False)
        ok = ((f >= 40.0) & (w >= 50)).astype(np.int64)
        g = pa.table(
            {
                "source": t["source"],
                "f": t["flesch_proxy"],
                "e": t["char_entropy"],
                "ok": pa.array(ok),
            }
        ).group_by(["source"]).aggregate(
            [("f", "sum"), ("e", "sum"), ("ok", "sum"), ("ok", "count")]
        )
        return g.rename_columns(["source", "f", "e", "ok", "n"])

    agg = (
        slim.map_batches(part, batch_format="pyarrow", batch_size=65536)
        .groupby("source")
        .aggregate(
            Sum("f", alias_name="f"),
            Sum("e", alias_name="e"),
            Sum("ok", alias_name="ok"),
            Sum("n", alias_name="n_docs"),
        )
        .to_pandas()
    )
    med = exact_group_quantiles(slim, "n_words", "source", fracs=[0.5])
    agg["median_words"] = agg["source"].map(
        {g: int(v[0]) for g, v in med.items()}
    ).astype(np.int64)
    agg["n_docs"] = agg["n_docs"].astype(np.int64)
    n = agg["n_docs"].to_numpy(np.float64)
    agg["avg_flesch"] = _round_half_away(agg["f"].to_numpy(np.float64) / n, 4)
    agg["avg_entropy"] = _round_half_away(agg["e"].to_numpy(np.float64) / n, 4)
    agg["pass_rate"] = _round_half_away(agg["ok"].to_numpy(np.float64) / n, 6)
    return (
        agg[["source", "n_docs", "median_words", "avg_flesch",
             "avg_entropy", "pass_rate"]]
        .sort_values("source")
        .reset_index(drop=True)
    )


def q193_decile_bins(sf_dir: str) -> pd.DataFrame:
    """Equi-depth decile binning of document lengths
    (stages/selection.decile_bins): EXACT global decile thresholds via
    the histogram-refinement quantile machinery (no sort), bucket =
    number of thresholds strictly below the value — the length-balanced
    bucketing curriculum/balanced sampling uses.  Scale shape: the
    quantile refinement scans + ONE shuffle-free bucket-count scan into
    a |bins| groupby.  Oracle: row_number threshold extraction at
    ceil(j·n/10) + the identical strict-less bucket count."""
    from ..stages.selection import decile_bins

    out = decile_bins(
        _read(sf_dir, "documents", ["n_chars"]), value_col="n_chars"
    )
    out["min_v"] = out["min_v"].astype(np.int64)
    out["max_v"] = out["max_v"].astype(np.int64)
    return out


def q194_rolling_distinct(sf_dir: str) -> pd.DataFrame:
    """EXACT 7-day rolling distinct users (stages/profile.
    rolling_distinct_users): windowed engagement (WAU) — per-day
    distincts (q185) can't be summed across days; this is the exact
    sliding-multiset answer.  Scale shape: the daily_activity
    (day, user) dedup recipe (one coarse shuffle) + ONE O(pairs)
    driver sweep bounded by window actives.  Oracle: day × window
    range join + count(DISTINCT)."""
    from ..stages.profile import rolling_distinct_users

    return rolling_distinct_users(
        _read(sf_dir, "events", ["ts", "user_id"]), window_days=7
    )


def q195_url_templates(sf_dir: str) -> pd.DataFrame:
    """URL template mining (stages/url_params.url_templates): digit
    runs in host+path collapse to '{n}', pages counted per template,
    top-20 — the structure-discovery step behind crawl canonicalization
    and per-template caps (q163 profiles the query-string side).  Urls
    synthesized with shared path shapes + unique ids so real templates
    emerge.  Scale shape: one shuffle-free regexp scan with per-batch
    count partials → template-vocab groupby → per-block top-k.
    Oracle: identical RE2 replace + count + (n DESC, template) order."""
    from ..stages.url_params import url_templates

    ds = _read(sf_dir, "documents", ["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = pd.Series(d).astype(str)
        host = "https://h" + pd.Series(d % 7).astype(str) + ".example.org"
        kind = d % 3
        prod = host + "/product/" + s + "/review/" + pd.Series(d % 13).astype(str)
        blog = host + "/blog/2024/" + pd.Series(d % 12 + 1).astype(str) + "/post-" + s
        about = host + "/about?sid=" + s
        url = prod.where(kind == 0, blog.where(kind == 1, about))
        return pa.table(
            {"url": pa.array(url.to_numpy(dtype=object), pa.string())}
        )

    return url_templates(ds.map_batches(mk, batch_format="pyarrow"), k=20)


def q196_table_linearize(sf_dir: str) -> rd.Dataset:
    """Table-to-text linearization (stages/html_tables.
    linearize_tables over q181's extractor): each extracted data row
    becomes 'header: value | ...' ordered by column — how tabular page
    content enters an LM corpus.  Scale shape: q181's shuffle-free
    parse + ONE doc-hash coarse-partition shuffle with a vectorized
    per-partition header merge.  Oracle: string_agg over the SAME
    planted generate_series truth as q181."""
    from ..stages.html_tables import extract_tables, linearize_tables

    ds = _read(sf_dir, "documents", ["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for dv in d:
            if dv % 2 != 0:
                payloads.append(b"<p>none</p>")
                continue
            r, c = dv % 3 + 1, dv % 4 + 1
            rows = [
                "<tr>"
                + "".join(f"<th>h{dv}-{ci}</th>" for ci in range(c))
                + "</tr>"
            ]
            for ri in range(1, r + 1):
                rows.append(
                    "<tr>"
                    + "".join(f"<td>c{dv}-{ri}-{ci}</td>" for ci in range(c))
                    + "</tr>"
                )
            payloads.append(
                ("<table>" + "".join(rows) + "</table>").encode()
            )
        return pa.table(
            {"doc_id": t["doc_id"], "html": pa.array(payloads, type=pa.binary())}
        )

    cells = extract_tables(ds.map_batches(mk, batch_format="pyarrow"))
    return linearize_tables(cells)


def _q197_pages(sf_dir: str, *, with_bytes: bool = False) -> rd.Dataset:
    """Shared q197/q198/q224 fixture: 29-host page table where every
    5th doc serves one of 37 mirrored contents (cross-host copies) and
    the rest keep their unique text; content_hash = md5 (the q133
    convention — DuckDB md5 == hashlib).  ``with_bytes`` adds the
    served body's byte size (mirror-body length for mirrored docs,
    n_chars otherwise) — keep the derivation HERE so q197/q198 and
    q224's oracle subqueries can never silently diverge."""
    import hashlib as _hl

    cols = ["doc_id", "text"] + (["n_chars"] if with_bytes else [])
    ds = _read(sf_dir, "documents", cols)

    def mk(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t["text"].to_pylist()
        hosts, hs = [], []
        for dv, txt in zip(d, texts):
            body = f"mirror {dv % 37}" if dv % 5 == 0 else txt
            hosts.append(f"h{(dv * 48271) % 29:02d}.example.org")
            hs.append(_hl.md5(body.encode()).hexdigest())
        out = {
            "host": pa.array(hosts, type=pa.string()),
            "content_hash": pa.array(hs, type=pa.string()),
        }
        if with_bytes:
            nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
            out["n_bytes"] = pa.array(
                [len(f"mirror {dv % 37}") if dv % 5 == 0 else int(b)
                 for dv, b in zip(d, nc)],
                type=pa.int64(),
            )
        return pa.table(out)

    return ds.map_batches(mk, batch_format="pyarrow")


def q197_host_dup_profile(sf_dir: str) -> pd.DataFrame:
    """Per-host duplication profile (stages/mirrors.host_dup_profile):
    fraction of each host's pages whose content occurs ≥2 times
    anywhere — the host-level view of what document dedup (q16/q32)
    removes; a 95%-mirrored host is a copy, not a source.  Scale shape:
    ONE content-hash coarse shuffle (copies co-locate → partition-local
    occurrence counts are global), |hosts| driver fold.  Oracle:
    hash-count join + host rollup."""
    from ..stages.mirrors import host_dup_profile

    return host_dup_profile(_q197_pages(sf_dir))


def q198_mirror_pairs(sf_dir: str) -> pd.DataFrame:
    """Mirror host-pair detection (stages/mirrors.mirror_host_pairs):
    top-20 unordered host pairs by DISTINCT shared contents — scraper
    farms and parked-domain templates surface as near-clique pair
    groups.  Scale shape: the q197 shuffle, per-partition C(h,2) pair
    expansion with a loud hosts-per-hash cap, pair-vocab groupby +
    per-block top-k.  Oracle: distinct (hash, host) self-join a<b +
    count + (n DESC, a, b) order."""
    from ..stages.mirrors import mirror_host_pairs

    return mirror_host_pairs(_q197_pages(sf_dir), k=20)


def q199_sitemap_coverage(sf_dir: str) -> pd.DataFrame:
    """Sitemap-vs-crawl coverage gap (stages/sitemaps.sitemap_coverage):
    per host, the fraction of sitemap-declared urls the crawl fetched
    (every 13th page missed — the q133 convention) — the crawl-ops
    completeness metric closing the loop between sitemap ingestion
    (q136), the frontier (q146) and the fetch log.  Scale shape: ONE
    url-hash coarse shuffle over both sides, partition-local
    membership, |hosts| driver fold.  Oracle: distinct LEFT JOIN +
    host rollup."""
    from ..stages.sitemaps import sitemap_coverage

    ds = _read(sf_dir, "documents", ["doc_id"])

    def side(crawled: bool):
        def f(t: pa.Table) -> pa.Table:
            d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            if crawled:
                d = d[d % 13 != 0]
            host = [f"h{(dv * 48271) % 29:02d}.example.org" for dv in d]
            url = [
                f"https://h{(dv * 48271) % 29:02d}.example.org/p/{dv}"
                for dv in d
            ]
            return pa.table(
                {
                    "host": pa.array(host, type=pa.string()),
                    "url": pa.array(url, type=pa.string()),
                }
            )

        return f

    return sitemap_coverage(
        ds.map_batches(side(False), batch_format="pyarrow"),
        ds.map_batches(side(True), batch_format="pyarrow"),
    )


def q200_jpeg_decode(sf_dir: str) -> rd.Dataset:
    """REAL JPEG decode through the media actor pool
    (stages/jpeg.py + multimodal.ImageDecodeActor): every doc renders a
    deterministic gradient image and encodes it as baseline JPEG —
    4:4:4, 4:2:0 and grayscale layouts by doc_id, every 9th payload
    truncated (→ decode_status 'error') — then the actor pool decodes
    natively (no Pillow/libjpeg; full Huffman + IDCT + chroma
    upsample).  Closes the compressed-image seam of the multimodal
    battery (PNG/WAV/Y4M were already native).  Rows-only (a codec is
    not SQL-expressible); roundtrip fidelity, both layouts, scope
    errors and this integration are pinned by tests/test_jpeg.py."""
    from ..stages.jpeg import encode_jpeg
    from ..stages.multimodal import ImageDecodeActor

    ds = _read(sf_dir, "documents", ["doc_id"])

    def render(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for i in ids:
            w = 16 + int(i % 3) * 8
            h = 16 + int(i % 5) * 4
            x = np.linspace(0, 255, w)
            y = np.linspace(0, 255, h)
            g = ((np.add.outer(y, x) / 2) + (i % 29)).astype(np.uint8)
            if i % 4 == 0:
                data = encode_jpeg(g, quality=80)
            elif i % 4 == 1:
                rgb = np.stack([g, g[::-1], np.full_like(g, i % 251)], axis=-1)
                data = encode_jpeg(rgb, quality=85, subsample="420")
            else:
                rgb = np.stack([g, g[::-1], np.full_like(g, i % 251)], axis=-1)
                data = encode_jpeg(rgb, quality=75)
            if i % 9 == 0:
                data = data[: len(data) // 3]  # truncated fetch
            payloads.append(data)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    decoded = ds.map_batches(render, batch_format="pyarrow", batch_size=256).map_batches(
        # concurrency leaves CPUs free for the read/finish task operators
        # (an actor pool bound == total CPUs stalls the pipeline — the
        # documented 4-CPU-driver gotcha)
        ImageDecodeActor, batch_format="pyarrow", concurrency=2, batch_size=256
    )

    def finish(t: pa.Table) -> pa.Table:
        meta = t["image_meta"]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "width": pa.array(
                    [m["width"] for m in meta.to_pylist()], type=pa.int64()
                ),
                "height": pa.array(
                    [m["height"] for m in meta.to_pylist()], type=pa.int64()
                ),
                "format": pa.array(
                    [m["format"] for m in meta.to_pylist()], type=pa.string()
                ),
                "decode_status": t["decode_status"],
            }
        )

    return decoded.map_batches(finish, batch_format="pyarrow")


def q119_bpe_tokenize(sf_dir: str) -> rd.Dataset:
    """Distributed BPE tokenizer train + encode (Sennrich 2016): one
    word-count shuffle reduces the corpus to a capped vocab-sized
    frequency table, the merge loop runs on THAT (corpus-size-
    independent), and encoding streams through an actor pool with merge
    ranks broadcast once and a warm per-actor word memo
    (stages/bpe.py).  Returns a LAZY (doc_id, n_bpe_tokens) Dataset —
    the driver's collect is the only materialization.  Rows-only (BPE
    merges are not SQL-expressible); incremental-vs-naive equivalence,
    lossless-segmentation and block-layout determinism are pinned by
    tests/test_bpe.py."""
    from ..stages.bpe import bpe_encode, bpe_train

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    merges = bpe_train(ds, n_merges=150, top_words=8000)
    return bpe_encode(ds, merges).select_columns(["doc_id", "n_bpe_tokens"])


def q120_quality_classifier(sf_dir: str) -> rd.Dataset:
    """Trained quality classifier (FineWeb-Edu-style bootstrap): a
    balanced weak label (docs using the word 'stream' at least twice —
    base rate 0.50 on the fixture corpus, AUC 0.91 learned), trained by
    distributed full-batch logistic regression over hashed tf features
    (per iteration: one weight broadcast + one shuffle-free sparse-
    gradient scan + a dim-sized canonical driver fold), then a
    streaming scoring pass (stages/classifier.py).  Returns a lazy
    (doc_id, prob) Dataset, prob rounded to 6.  Rows-only (iterative
    GD is not SQL-expressible); single-process-numpy equivalence and
    planted-separation tests pin correctness
    (tests/test_classifier.py)."""
    from ..stages.classifier import logreg_score, logreg_train
    from ..stages.text_analysis import batch_words

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def label(t: pa.Table) -> pa.Table:
        words, lens = batch_words(t["text"].to_pylist())
        hit = (words == "stream").astype(np.float64)
        doc = np.repeat(np.arange(len(lens)), lens)
        y = np.bincount(doc, weights=hit, minlength=len(lens)) >= 2
        return t.append_column("label", pa.array(y.astype(np.int64)))

    labeled = docs.map_batches(label, batch_format="pyarrow")
    w, b = logreg_train(
        labeled, label_col="label", dim=1 << 14, n_iter=10, lr=5.0, mode="tf"
    )

    def fin(t: pa.Table) -> pa.Table:
        p = _round_half_away(t["prob"].to_numpy(zero_copy_only=False), 6)
        return pa.table({"doc_id": t["doc_id"], "prob": pa.array(p)})

    return logreg_score(docs, w, b, mode="tf").map_batches(
        fin, batch_format="pyarrow"
    )


def q121_phash_image_dedup(sf_dir: str) -> rd.Dataset:
    """Perceptual-hash image near-dup (stages/phash.py): deterministic
    PNG payloads derive from doc_id (a gradient+sinusoid pattern whose
    frequencies are doc_id arithmetic — no external data per the
    input-table mandate), every doc_id % 7 == 0 gains a re-toned twin
    (brightness +12, id + 10_000_000 — the re-encoded-logo case byte
    hashing misses), and the full pHash actor pool → 4×16-bit band
    shuffle → XOR/popcount verify → distributed label finish runs at
    max_hamming=6.  Returns (img_id, cluster_id).  Rows-only (DCT bit
    patterns are not SQL-expressible); twin-pairing/singleton/
    determinism invariants pinned by tests/test_phash.py."""
    from ..stages.phash import phash_clusters
    from ..stages.png import encode_png

    ds = _read(sf_dir, "documents", ["doc_id"])

    def render(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        y, x = np.mgrid[0:40, 0:56].astype(np.float64)
        out_ids, payloads = [], []
        for i in ids:
            fx = 3.0 + (i % 11)
            fy = 4.0 + (i % 7)
            ph = (i % 13) * 0.5
            base = (
                128.0
                + 60.0 * np.sin(x / fx + ph)
                + 40.0 * np.cos(y / fy)
            ).clip(0, 255).astype(np.uint8)
            out_ids.append(int(i))
            payloads.append(encode_png(base))
            if i % 7 == 0:
                twin = (base.astype(np.int64) + 12).clip(0, 255).astype(np.uint8)
                out_ids.append(int(i) + 10_000_000)
                payloads.append(encode_png(twin))
        return pa.table(
            {
                "img_id": pa.array(out_ids, type=pa.int64()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    images = ds.map_batches(render, batch_format="pyarrow", batch_size=256)
    return phash_clusters(
        images, id_col="img_id", payload_col="payload", max_hamming=6
    )


def q122_multimodal_features(sf_dir: str) -> rd.Dataset:
    """Audio + video feature extraction over REAL container formats
    (stages/multimodal.py): every doc synthesizes a deterministic
    RIFF/WAVE PCM clip (stdlib ``wave``; tone frequency and length are
    doc_id arithmetic) and a YUV4MPEG2 stream (3-6 luma frames), then
    the AudioFeatureActor / VideoFrameSampleActor actor pools decode
    them natively — no ffmpeg, no Pillow — and emit (doc_id, n_samples,
    duration_s, zero_crossings, spectral_centroid rounded to 2,
    n_frames, n_sampled).  Rows-only (FFT centroids are not
    SQL-expressible); decoder correctness is pinned by
    tests/test_sources_multimodal.py (roundtrips, stereo mixdown,
    codec-seam raises)."""
    from ..stages.multimodal import (
        AudioFeatureActor,
        VideoFrameSampleActor,
        encode_wav,
        encode_y4m,
    )

    ds = _read(sf_dir, "documents", ["doc_id"])

    def render(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        wavs, vids = [], []
        for i in ids:
            n = 800 + int(i % 5) * 160
            freq = 200.0 + float(i % 17) * 40.0
            tt = np.arange(n, dtype=np.float64)
            samples = (3000.0 * np.sin(2.0 * np.pi * freq * tt / 16000.0)).astype(np.int16)
            wavs.append(encode_wav(samples, rate=16000))
            nf = 3 + int(i % 4)
            frames = [
                np.full((16, 16), (int(i) * 7 + 31 * k) % 256, dtype=np.uint8)
                for k in range(nf)
            ]
            vids.append(encode_y4m(frames))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "wav": pa.array(wavs, type=pa.binary()),
                "y4m": pa.array(vids, type=pa.binary()),
            }
        )

    media = ds.map_batches(render, batch_format="pyarrow", batch_size=256)
    audio = media.map_batches(
        AudioFeatureActor,
        fn_kwargs={"column": "wav"},
        batch_format="pyarrow",
        concurrency=(1, 8),
        batch_size=64,
    )
    both = audio.map_batches(
        VideoFrameSampleActor,
        fn_kwargs={"column": "y4m"},
        batch_format="pyarrow",
        concurrency=(1, 8),
        batch_size=64,
    )

    def fin(t: pa.Table) -> pa.Table:
        cent = _round_half_away(
            t["spectral_centroid"].to_numpy(zero_copy_only=False), 2
        )
        n_sampled = pa.array(
            [len(f) for f in t["frames"].to_pylist()], type=pa.int64()
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_samples": t["n_samples"],
                "duration_s": t["duration_s"],
                "zero_crossings": t["zero_crossings"],
                "spectral_centroid": pa.array(cent, type=pa.float64()),
                "n_frames": t["n_frames"],
                "n_sampled": n_sampled,
            }
        )

    return both.map_batches(fin, batch_format="pyarrow")


def q123_url_filter(sf_dir: str) -> pd.DataFrame:
    """URL-rule gate (stages/url_rules.py): adversarial URLs derive from
    doc_id arithmetic (blocked ad-tracker hosts, casino path keywords,
    query-param spam, 10-deep paths, ftp scheme) and ONE fused
    shuffle-free scan classifies each with the ordered rule battery
    (first hit names the verdict).  The oracle rebuilds the urls with
    printf and replays the rules as a CASE over the SAME split regex —
    rule logic, not the generator, is what the hash checks."""
    from ..stages.url_rules import DEFAULT_RULES, classify_urls_batch

    ds = _read(sf_dir, "documents", ["doc_id"])

    def render(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        scheme = np.where(ids % 29 == 0, "ftp", "https")
        host = np.where(
            ids % 17 == 0,
            "ads.tracker.example.org",
            np.char.add(
                np.char.add("h", np.char.zfill(((ids * 48271) % 97).astype(str), 3)),
                ".example.org",
            ),
        )
        mid = np.where(
            ids % 19 == 0,
            "/casino/x",
            np.where(ids % 23 == 0, "/a/b/c/d/e/f/g/h/i", "/p"),
        )
        query = np.where(ids % 13 == 0, "?a=1&b=2&c=3&d=4&e=5", "")
        urls = [
            f"{s}://{h}{m}/{i}{q}"
            for s, h, m, i, q in zip(scheme, host, mid, ids, query)
        ]
        return pa.table(
            {"doc_id": pa.array(ids), "url": pa.array(urls, type=pa.string())}
        )

    labeled = ds.map_batches(render, batch_format="pyarrow").map_batches(
        lambda t: classify_urls_batch(t, rules=DEFAULT_RULES),
        batch_format="pyarrow",
    )
    return (
        labeled.to_pandas().sort_values("doc_id").reset_index(drop=True)
    )


def q124_link_graph_pagerank(sf_dir: str) -> pd.DataFrame:
    """Web-graph construction from ACTUAL page HTML (stages/links.py):
    documents → synthetic pages (the flagship's page table — ~80% HTML
    with nav/link-farm anchors, the rest pdf/image/garbage contributing
    no edges), each HTML page additionally gains two deterministic
    cross-host partner links, then href-regex + urljoin extraction →
    hosts_of_urls → pagerank over the EXTRACTED host graph.  Returns
    (host, pagerank, n_out_hosts).  Rows-only (href parsing of
    hash-shaped boilerplate is not SQL-expressible); extractor semantics
    and graph invariants pinned by tests/test_links.py."""
    from ..stages.graph import pagerank
    from ..stages.links import count_host_edges, outlink_host_edges
    from ..synth import docs_to_pages

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

    def pages(t: pa.Table) -> pa.Table:
        p = docs_to_pages(t)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # two cross-host partner links appended to HTML payloads only
        # (deterministic from doc_id; non-HTML payloads stay untouched)
        html = p["html"].to_pylist()
        out = []
        for i, payload in zip(ids, html):
            if payload and payload.startswith(b"<!DOCTYPE html"):
                extra = (
                    f'<div><a href="https://h{(i * 7) % 23:03d}.partner.net/x">p1</a>'
                    f'<a href="//h{(i * 11) % 23:03d}.partner.net/y">p2</a></div>'
                ).encode()
                payload = payload + extra
            out.append(payload)
        return p.set_column(
            p.column_names.index("html"), "html", pa.array(out, type=pa.binary())
        )

    page_ds = docs.map_batches(pages, batch_format="pyarrow")
    # edges feed TWO consumers (pagerank + out-degree): materialize the
    # slim host-pair table once so the html scan runs exactly once
    edges = outlink_host_edges(page_ds, drop_self=True).materialize()
    ranks = pagerank(edges, damping=0.85, n_iter=3).to_pandas()
    from ray.data.aggregate import Count

    outdeg = (
        count_host_edges(edges)
        .groupby("src")
        .aggregate(Count(alias_name="n_out_hosts"))
        .to_pandas()
        .rename(columns={"src": "node"})
    )
    out = ranks.merge(outdeg, on="node", how="left")
    out["n_out_hosts"] = out["n_out_hosts"].fillna(0).astype("int64")
    out = out.rename(columns={"node": "host"}).sort_values("host").reset_index(drop=True)
    return _finalize(out[["host", "pagerank", "n_out_hosts"]], {"pagerank": 8})


def q125_interval_join(sf_dir: str) -> pd.DataFrame:
    """General range join (stages/intervals.py): events.value (points)
    × OVERLAPPING integer intervals derived from the part table
    (lo = floor(p_retailprice) % 90, hi = lo + 3 + p_partkey % 7 —
    deliberately overlapping, so q55's non-overlapping-band searchsorted
    shortcut does NOT apply), both sides bucketed on the value domain
    (one shuffle each), pairs emitted in-bucket, then a per-interval
    rollup.  Oracle = JOIN ON value BETWEEN lo AND hi + GROUP BY —
    hash-checked end-to-end."""
    from ..stages.intervals import interval_join_points

    events = _read(sf_dir, "events", ["event_id", "value"])
    part = _read(sf_dir, "part", ["p_partkey", "p_retailprice"])

    def mk_intervals(t: pa.Table) -> pa.Table:
        pk = t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        price = t["p_retailprice"].to_numpy(zero_copy_only=False)
        # every 41st part only: the value domain is fixed [0, 97), so at
        # larger sf the FULL part table's interval density — and with it
        # the pair count (events × intervals × coverage) — would grow
        # quadratically with sf; the thinned side keeps output
        # sf-linear while both join inputs still scale
        keep = pk % 41 == 0
        pk, price = pk[keep], price[keep]
        lo = np.floor(price).astype(np.int64) % 90
        hi = lo + 3 + pk % 7
        return pa.table(
            {
                "p_partkey": pa.array(pk),
                "lo": pa.array(lo.astype(np.float64)),
                "hi": pa.array(hi.astype(np.float64)),
            }
        )

    intervals = part.map_batches(mk_intervals, batch_format="pyarrow")
    pairs = interval_join_points(
        events, intervals,
        value_col="value", start_col="lo", end_col="hi", bucket_width=2.0,
    )

    # map-side pre-combine: pair blocks are output-sized (millions of
    # rows); fold each block to interval-keyed partials so the groupby
    # shuffles n_intervals × n_blocks rows, not the pair stream
    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("p_partkey", sort=False)["value"].agg(["count", "sum"])
        return pd.DataFrame(
            {
                "p_partkey": g.index.to_numpy(dtype=np.int64),
                "c": g["count"].to_numpy(dtype=np.int64),
                "s": g["sum"].to_numpy(dtype=np.float64),
            }
        )

    out = (
        pairs.map_batches(partial, batch_format="pandas")
        .groupby("p_partkey")
        .aggregate(Sum("c", alias_name="n_events"), Sum("s", alias_name="sum_value"))
        .to_pandas()
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )
    out["p_partkey"] = out["p_partkey"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return _finalize(out, {"sum_value": 3})


def q126_chunk_documents(sf_dir: str) -> pd.DataFrame:
    """Overlapping word-window chunking (stages/chunking.py): 64-word
    chunks with 16-word overlap over the documents table — the
    context-window prep for embedding / training.  One shuffle-free
    scan; the oracle is GENERATED from the same chunking_sql function
    the stage documents (generate_series + list_slice replay), so
    engine and oracle cannot desync."""
    from ..stages.chunking import chunk_documents

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = (
        chunk_documents(ds, chunk_words=64, overlap=16)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    return out


def q127_robots_gate(sf_dir: str) -> pd.DataFrame:
    """robots.txt gating (stages/robots.py): a deterministic per-host
    robots registry (full blocks, wildcard-agent groups behind a
    non-matching googlebot group, Allow lines to ignore, empty-Disallow
    allow-alls) parsed once and broadcast, then ONE scan labels each
    url.  Parser semantics equal urllib.robotparser on this corpus
    (tests/test_robots.py); the oracle replays generator + effective
    prefix rules as a CASE."""
    from ..stages.robots import robots_gate

    ds = _read(sf_dir, "documents", ["doc_id"])

    def urls(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hostk = (ids * 48271) % 97
        path = np.where(
            ids % 19 == 0,
            "/casino/x/",
            np.where(ids % 23 == 0, "/t/", "/p/"),
        )
        u = [
            f"https://h{k:03d}.example.org{p}{i}"
            for k, p, i in zip(hostk, path, ids)
        ]
        return pa.table(
            {"doc_id": pa.array(ids), "url": pa.array(u, type=pa.string())}
        )

    def robots_txt(k: int) -> str:
        if k % 7 == 0:
            return "User-agent: *\nDisallow: /\n"
        if k % 5 == 0:
            return (
                "User-agent: googlebot\nDisallow: /x\n\n"
                "User-agent: *\nDisallow: /casino\nDisallow: /t/\n"
            )
        if k % 3 == 0:
            return "User-agent: *\nAllow: /open\nDisallow: /p/9\n"
        return "User-agent: *\nDisallow:\n"

    robots = rd.from_arrow(
        pa.table(
            {
                "host": [f"h{k:03d}.example.org" for k in range(97)],
                "robots_txt": [robots_txt(k) for k in range(97)],
            }
        )
    )
    out = robots_gate(
        ds.map_batches(urls, batch_format="pyarrow"),
        robots,
        verdict_col="robots_verdict",
    )
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def q128_connected_components(sf_dir: str) -> pd.DataFrame:
    """Distributed connected components, oracle-checked end-to-end —
    the first FULL SQL check of `propagate_min_labels_ds` (the cluster
    finish every near-dup family shares), via a DuckDB recursive-CTE
    transitive closure.  Edges derive row-locally from doc_id
    arithmetic: chain edges (d, d-1) for d % 6 != 0 plus star edges
    (d, 36*(d//36)) for the other rows, giving components of 36
    consecutive ids (min-label distance <= 6, so propagation converges
    in ~7 rounds).  The component rollup (n_nodes, min/max/sum of
    member ids) hash-pins every node's label.  Scale shape: edge list
    is driver-held (the verified-edge contract all cluster finishes
    use); each round is two salted groupby shuffles; the rollup is
    component-sized."""
    from ..stages.collect import collect_table
    from ..stages.dedup import propagate_min_labels_ds

    ds = _read(sf_dir, "documents", ["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        chain = d[d % 6 != 0]
        star = d[(d % 6 == 0) & (d % 36 != 0)]
        return pa.table(
            {
                "a": pa.array(np.concatenate([chain, star])),
                "b": pa.array(
                    np.concatenate([chain - 1, (star // 36) * 36])
                ),
            }
        )

    edge_tbl = collect_table(ds.map_batches(edges, batch_format="pyarrow"))
    labels = propagate_min_labels_ds(edge_tbl, max_rounds=20)
    out = (
        labels.groupby("label")
        .aggregate(
            Count(alias_name="n_nodes"),
            Min("id", alias_name="min_id"),
            Max("id", alias_name="max_id"),
            Sum("id", alias_name="sum_id"),
        )
        .to_pandas()
        .rename(columns={"label": "component"})
        .sort_values("component")
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def q129_surt_cdx_dedup(sf_dir: str) -> pd.DataFrame:
    """SURT canonicalization + CDX keep-latest (stages/surt.py): crawl
    captures derive from doc_id arithmetic — each url appears as an
    https form AND an http/www./mixed-case twin (same SURT key), some
    with query-string variants (different key) and some bare-host
    captures (empty rest canonicalizes to '/', colliding per host) —
    then ONE canonicalization scan + ONE salted keep-latest shuffle
    keeps the max-ts capture per key (ties -> min url).  The oracle
    rebuilds the captures with printf and keys them with the SAME
    generated surt_sql expression (single-generator policy)."""
    from ..stages.surt import cdx_latest_per_surt

    ds = _read(sf_dir, "documents", ["doc_id"])

    def captures(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        k = (d * 48271) % 97
        urls: list[str] = []
        ts: list[int] = []
        for dd, kk in zip(d, k):
            urls.append(f"https://h{kk:03d}.example.org/p/{dd}")
            ts.append(1000 * dd + 17)
            urls.append(f"http://WWW.H{kk:03d}.Example.ORG/p/{dd}")
            ts.append(1000 * dd + 17 + ((dd % 7) - 3) * 10)
            if dd % 11 == 0:
                urls.append(f"https://h{kk:03d}.example.org/p/{dd}?x=1")
                ts.append(1000 * dd)
            if dd % 13 == 0:
                urls.append(f"https://h{kk:03d}.example.org")
                ts.append(999 * dd)
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "ts_us": pa.array(ts, type=pa.int64()),
            }
        )

    out = (
        cdx_latest_per_surt(
            ds.map_batches(captures, batch_format="pyarrow"),
            url_col="url",
            ts_col="ts_us",
        )
        .to_pandas()
        .sort_values("surt_key")
    )
    return out[["surt_key", "url", "ts_us", "n_captures"]].reset_index(drop=True)


_BM25_TERMS = ["dup", "join", "vector", "nosuchterm"]


def q130_bm25_rank(sf_dir: str) -> pd.DataFrame:
    """BM25 retrieval scoring (stages/bm25.py) against a fixed query-term
    set mixing a rare discriminative term ('dup', df≈5%), two common
    terms, and one absent term (df=0 — contributes zero on both sides,
    exercising the no-special-case Lucene idf).  ONE tokenize pass →
    slim (doc_id, dl, tf…) profile; stats fold from one-row partials;
    scoring is a shuffle-free vectorized scan.  The oracle is GENERATED
    by the stage's own bm25_sql from the SAME terms/k1/b (the repo's
    single-generator policy)."""
    from ..stages.bm25 import bm25_scores

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = bm25_scores(ds, _BM25_TERMS).to_pandas()
    return _finalize(out.sort_values("doc_id"), {"bm25": 4})


def q131_weighted_sample(sf_dir: str) -> pd.DataFrame:
    """Efraimidis-Spirakis weighted sampling without replacement
    (stages/sampling.weighted_sample): 50 docs drawn ∝ n_chars, a pure
    function of (ids, weights, seed) — layout- and cluster-size-
    independent, so the oracle replays the EXACT draw (splitmix64_sql
    bits → identical u → identical keys; single-generator policy via
    weighted_sample_sql).  One keying scan + per-block partial top-k;
    no shuffle, driver holds k × blocks rows."""
    from ..stages.sampling import weighted_sample

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    out = weighted_sample(
        ds, k=50, weight_col="n_chars", id_col="doc_id", seed=7
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def q132_host_template_removal(sf_dir: str) -> pd.DataFrame:
    """Per-host boilerplate stripping (stages/clean.remove_host_templates):
    a segment is removed from a site's pages when ≥5 distinct documents
    OF THAT SITE contain it — the CCNet 'same line on every page of a
    host' rule, keyed here by the documents table's source column.  One
    composite (host ␟ segment) shuffle + one shuffle-free rewrite; the
    oracle replays q89's resegmentation with a per-source HAVING and a
    source-scoped anti-join."""
    from ..stages.clean import remove_host_templates

    ds = _read(sf_dir, "documents", ["doc_id", "source", "text"])
    out = remove_host_templates(ds, min_docs=5, host_col="source").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q133_snapshot_diff(sf_dir: str) -> pd.DataFrame:
    """Crawl-snapshot diff (stages/snapshots.py): one row per url across
    two synthetic crawls — added / removed / changed / unchanged by
    content hash.  Old crawl misses every 17th page and carries stale
    content for every 5th; new crawl misses every 13th.  Lazy union +
    ONE salted key shuffle + vectorized per-partition reindex compare;
    the oracle is a FULL OUTER JOIN over the same printf-rebuilt
    snapshots (q129's url scheme, DuckDB md5 == hashlib md5)."""
    import hashlib as _hl

    from ..stages.snapshots import snapshot_diff

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def snap(side: str):
        def f(t: pa.Table) -> pa.Table:
            d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            texts = t["text"].to_pylist()
            urls, hs = [], []
            for dd, txt in zip(d, texts):
                if side == "old":
                    if dd % 17 == 0:
                        continue
                    body = f"old:{txt}" if dd % 5 == 0 else txt
                else:
                    if dd % 13 == 0:
                        continue
                    body = txt
                urls.append(f"https://h{(dd * 48271) % 97:03d}.example.org/p/{dd}")
                hs.append(_hl.md5(body.encode()).hexdigest())
            return pa.table(
                {
                    "url": pa.array(urls, type=pa.string()),
                    "content_hash": pa.array(hs, type=pa.string()),
                }
            )

        return f

    old_ds = ds.map_batches(snap("old"), batch_format="pyarrow")
    new_ds = ds.map_batches(snap("new"), batch_format="pyarrow")
    out = snapshot_diff(old_ds, new_ds).to_pandas()
    return (
        out.sort_values("url")
        .reset_index(drop=True)[["url", "change", "old_hash", "new_hash"]]
    )


_ANCHOR_WORDS = [
    "news", "shop", "docs", "blog", "forum", "wiki", "games", "maps",
]


def q134_anchor_text(sf_dir: str) -> pd.DataFrame:
    """Anchor-text corpus (stages/links.py extract_anchors /
    anchor_term_counts / top_anchor_terms): what the rest of the web
    calls each destination host — each HTML page gains two deterministic
    cross-host partner anchors whose VISIBLE TEXT is drawn from an
    8-word vocabulary by doc_id arithmetic, then one shuffle-free
    extraction scan (map-side-combined term counts) + ONE dst-hash
    shuffle yields each partner host's top-3 anchor terms.  Rows-only
    (regex anchor parsing of binary payloads is not SQL-expressible,
    q124 precedent); extraction semantics and aggregation ties pinned by
    tests/test_anchor_text.py."""
    from ..stages.links import anchor_term_counts, top_anchor_terms
    from ..synth import docs_to_pages

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

    def pages(t: pa.Table) -> pa.Table:
        p = docs_to_pages(t)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        html = p["html"].to_pylist()
        out = []
        for i, payload in zip(ids, html):
            if payload and payload.startswith(b"<!DOCTYPE html"):
                w1 = _ANCHOR_WORDS[i % 8]
                w2 = _ANCHOR_WORDS[(i // 8) % 8]
                extra = (
                    f'<div><a href="https://h{(i * 7) % 23:03d}.partner.net/x">'
                    f"{w1} {w2}</a>"
                    f'<a href="//h{(i * 11) % 23:03d}.partner.net/y">'
                    f"<b>{w2}</b> site</a></div>"
                ).encode()
                payload = payload + extra
            out.append(payload)
        cols = {c: p[c] for c in p.column_names if c != "html"}
        cols["html"] = pa.array(out, type=pa.binary())
        return pa.table(cols)

    counts = anchor_term_counts(
        docs.map_batches(pages, batch_format="pyarrow")
    )
    out = top_anchor_terms(counts, k=3).to_pandas()
    return (
        out.sort_values(["dst", "n", "term"], ascending=[True, False, True])
        .reset_index(drop=True)
    )


def q135_unicode_normalize(sf_dir: str) -> pd.DataFrame:
    """Unicode canonicalization (stages/clean.normalize_unicode): NFC
    compose-then-control-strip over adversarial text — every doc gains a
    deterministic mojibake suffix (combining-acute runs, a BEL control,
    U+212B ANGSTROM SIGN) that NFC must fold before hashing/dedup sees
    it.  One shuffle-free scan; the oracle rebuilds the SAME suffix with
    chr()/repeat() and replays DuckDB nfc_normalize + the identical RE2
    control class (both implement the Unicode standard, checked
    codepoint-for-codepoint)."""
    from ..stages.clean import add_normalized_text

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def mojibake(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t["text"].to_pylist()
        raw = [
            f"{txt} {('e' + chr(769)) * (int(dd) % 3 + 1)}\x07{chr(8491)}"
            for dd, txt in zip(d, texts)
        ]
        return pa.table(
            {"doc_id": t["doc_id"], "text": pa.array(raw, type=pa.string())}
        )

    out = (
        ds.map_batches(mojibake, batch_format="pyarrow")
        .map_batches(add_normalized_text, batch_format="pyarrow")
        .drop_columns(["text"])
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def q136_sitemap_freshness(sf_dir: str) -> pd.DataFrame:
    """Sitemap ingestion (stages/sitemaps.py): per-doc synthetic
    <urlset> payloads (1–3 entries, lastmod present on 3 of 4) → one
    shuffle-free regex parse scan → per-host frontier rollup
    (n_urls, n_dated, newest lastmod).  The oracle rebuilds
    BYTE-IDENTICAL XML with printf/string_agg and RE-PARSES it with the
    same patterns via regexp_extract_all — the parse itself is
    oracle-checked, not just the rollup."""
    from ..stages.sitemaps import sitemap_host_freshness, sitemap_urls

    ds = _read(sf_dir, "documents", ["doc_id"])

    def sitemaps(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        xmls = []
        for dd in d:
            h = (dd * 48271) % 97
            parts = ["<urlset>"]
            for j in range(dd % 3 + 1):
                parts.append(
                    f"<url><loc>https://h{h:03d}.example.org/s/{dd}/{j}</loc>"
                )
                if (dd + j) % 4 != 0:
                    parts.append(
                        f"<lastmod>2024-{(dd + j) % 12 + 1:02d}-"
                        f"{(dd * 7 + j) % 28 + 1:02d}</lastmod>"
                    )
                parts.append("</url>")
            parts.append("</urlset>")
            xmls.append("".join(parts))
        return pa.table({"xml": pa.array(xmls, type=pa.string())})

    urls = sitemap_urls(ds.map_batches(sitemaps, batch_format="pyarrow"))
    out = sitemap_host_freshness(urls).to_pandas()
    return out.sort_values("host").reset_index(drop=True)[
        ["host", "n_urls", "n_dated", "last_mod"]
    ]


def q137_resolve_redirects(sf_dir: str) -> pd.DataFrame:
    """Redirect-chain resolution (stages/redirects.py): a functional
    url→url map derived from doc_id arithmetic — descending chains of
    length doc_id%10 ending at every-10th terminals (some exceeding the
    8-hop budget) plus 2-cycles every 40th doc — walked by max_hops
    bucketed-cogroup rounds over a shrinking frontier.  Resolved rows
    carry the true final url + chain length; loops and over-budget
    chains report status='unresolved' with '' / 0 sentinels.  The
    oracle replays the walk as a bounded recursive CTE over the SAME
    printf-rebuilt edges."""
    from ..stages.redirects import resolve_redirects

    ds = _read(sf_dir, "documents", ["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src, dst = [], []
        for dd in d:
            if dd % 10 != 0:
                src.append(f"https://r.example.org/{dd}")
                dst.append(f"https://r.example.org/{dd - 1}")
            if dd % 40 == 0:
                src.append(f"https://rx.example.org/{dd}")
                dst.append(f"https://ry.example.org/{dd}")
                src.append(f"https://ry.example.org/{dd}")
                dst.append(f"https://rx.example.org/{dd}")
        return pa.table(
            {"src": pa.array(src, type=pa.string()),
             "dst": pa.array(dst, type=pa.string())}
        )

    out = resolve_redirects(
        ds.map_batches(edges, batch_format="pyarrow"), max_hops=8
    ).to_pandas()
    return out.sort_values("src").reset_index(drop=True)[
        ["src", "final_url", "n_hops", "status"]
    ]


def q139_char_entropy(sf_dir: str) -> pd.DataFrame:
    """Character-entropy junk signals (stages/text_analysis.py
    add_char_entropy): Shannon entropy in bits + distinct-codepoint
    count per document — the standard low-entropy (repetitive
    boilerplate) / high-entropy (binary garble) prune axes.  One
    shuffle-free scan; the kernel is one np.unique over a packed
    (doc << 21 | codepoint) key, no per-row Python.  The oracle
    explodes codepoints with regexp_extract_all('[\\s\\S]') and replays
    -SUM(p*log2(p)) exactly (both sides fold -0.0 to +0.0 so the
    driver's value hash can't split on the zero sign)."""
    from ..stages.text_analysis import add_char_entropy

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = (
        ds.map_batches(add_char_entropy, batch_format="pyarrow", batch_size=4096)
        .drop_columns(["text"])
        .to_pandas()
    )
    return _finalize(out.sort_values("doc_id"), {"char_entropy": 4})


def q112_url_near_dup(sf_dir: str) -> rd.Dataset:
    """Near-dup clustering keyed by URL — the north-rule page key is a
    STRING, and round 3's distributed cluster finish was integer-only
    (VERDICT r3 missing #2).  Pages derive from documents (same url
    scheme as the flagship's synthetic pages); every doc_id % 7 == 0
    gains a '?variant=2' twin with every 12th word dropped (word-3-gram
    Jaccard ~0.67, above the 0.55 threshold), and the full
    minhash → band shuffle → verify → rank-encoded label propagation
    runs with id_col='url'.  cluster_id is the lexicographic-min url of
    the component.  Rows-only (siphash/minhash are not SQL-expressible);
    invariants pinned by tests/test_dedup_invariants.py."""
    from ..stages.dedup import minhash_lsh_clusters
    from ..synth import url_for_doc

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        sources = batch["source"].to_pylist()
        out_u, out_t = [], []
        for i, t, lg, s in zip(ids, texts, langs, sources):
            if i % 53 == 2:
                continue  # second of url_for_doc's shared-url pair: keep urls unique
            u = url_for_doc(i, s, lg)
            out_u.append(u)
            out_t.append(t)
            if i % 7 == 0:
                words = (t or "").split()
                out_u.append(u + "?variant=2")
                out_t.append(" ".join(w for j, w in enumerate(words) if j % 12 != 0))
        return pa.table({"url": pa.array(out_u, type=pa.string()),
                         "text": pa.array(out_t, type=pa.string())})

    pages = ds.map_batches(expand, batch_format="pyarrow")
    return minhash_lsh_clusters(pages, id_col="url", threshold=0.55)


def q33_simhash_dedup(sf_dir: str) -> rd.Dataset:
    from ..stages.dedup import simhash_clusters

    return simhash_clusters(_docs_with_near_dups(sf_dir), max_hamming=8)


def q34_fingerprint_docs(sf_dir: str) -> rd.Dataset:
    from ..stages.text_analysis import add_fingerprint

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: add_fingerprint(b).select(["doc_id", "fingerprint"]),
        batch_format="pyarrow",
    )


def q35_language_id(sf_dir: str) -> rd.Dataset:
    from ..stages.text_analysis import add_language_id

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: add_language_id(b).select(["doc_id", "lang_pred"]),
        batch_format="pyarrow",
    )


def q36_knn_lsh(sf_dir: str) -> pd.DataFrame:
    from ..stages.similarity import knn_lsh

    ids, vecs = _query_vectors(sf_dir, 2)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_lsh(ds, vecs, k=10, n_planes=8, probe_hamming=2).to_pandas()
    out["query_id"] = out["query_id"].map(dict(enumerate(ids))).astype(np.int64)
    return _finalize(out[["query_id", "vec_id", "score"]], {"score": 4})


def q37_embedding_dedup(sf_dir: str) -> rd.Dataset:
    from ..stages.dedup import embedding_cosine_clusters

    return embedding_cosine_clusters(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]), threshold=0.98
    )


def q27_props_json_extract(sf_dir: str) -> rd.Dataset:
    """§2.7 JSON parse parity: extract the 'k' field from the events props
    JSON-string column (vectorized per batch; oracle via json_extract)."""
    import json as _json

    ds = _read(sf_dir, "events", ["event_id", "props"])

    def fn(batch: pa.Table) -> pa.Table:
        ks = []
        for p in batch["props"].to_pylist():
            try:
                ks.append(int(_json.loads(p or "{}").get("k")))
            except (ValueError, TypeError):
                ks.append(None)
        return pa.table(
            {"event_id": batch["event_id"], "k": pa.array(ks, type=pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q28_streaming_window(sf_dir: str) -> pd.DataFrame:
    """Stateful streaming tumbling window (per-bucket actors, incremental
    state + watermark), fed from a Ray Data pipeline — must equal the
    batch groupby window (q11 family)."""
    from ..stages.streaming import tumbling_window_aggregate_ds

    events = _read(sf_dir, "events", ["ts", "event_type", "value"])
    out = tumbling_window_aggregate_ds(
        events, key_col="event_type", ts_col="ts", value_col="value", window_s=3600
    )
    # the stage is lazy Dataset→Dataset; collection (window-count-sized)
    # happens only here, for the oracle compare
    df = out.to_pandas().sort_values(
        ["event_type", "window"], kind="mergesort"
    ).reset_index(drop=True)
    return _finalize(df, {"sum_value": 3})


def q29_topk_per_group(sf_dir: str) -> pd.DataFrame:
    """Top-2 customers by acctbal per market segment (window-function
    parity: groupby → per-group sorted head, deterministic tie-breaks)."""
    ds = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"])

    def top2(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(
            ["c_acctbal", "c_custkey"], ascending=[False, True], kind="mergesort"
        ).head(2)

    df = ds.groupby("c_mktsegment").map_groups(top2, batch_format="pandas").to_pandas()
    return _finalize(df, {"c_acctbal": 2})


def q43_event_median(sf_dir: str) -> pd.DataFrame:
    """Per-type median (exact, per-group pandas; DuckDB median oracle —
    both interpolate the middle pair for even counts)."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def med(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]], "median_value": [g["value"].median()]}
        )

    df = ds.groupby("event_type").map_groups(med, batch_format="pandas").to_pandas()
    return _finalize(df, {"median_value": 4})


def q44_train_split(sf_dir: str) -> rd.Dataset:
    """Deterministic md5-threshold train split (75%) — rows never migrate
    as data/cluster grows; oracle uses DuckDB's identical md5()."""
    from ..stages.sampling import train_eval_split

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    train, _ = train_eval_split(ds, "doc_id", train_frac_16ths=12)
    return train


def q45_stratified_sample_counts(sf_dir: str) -> pd.DataFrame:
    """~25% deterministic sample, counted per lang stratum."""
    from ..stages.sampling import stratified_sample

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    out = (
        stratified_sample(ds, "doc_id", frac_16ths=4)
        .groupby("lang")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    return _finalize(out)


def q46_approx_distinct_parts(sf_dir: str) -> pd.DataFrame:
    """HLL count-distinct of l_partkey (mergeable per-batch sketches) —
    rows-only; accuracy vs exact asserted in tests (<5% error)."""
    from ..stages.sampling import approx_count_distinct

    ds = _read(sf_dir, "lineitem", ["l_partkey"])
    est = approx_count_distinct(ds, "l_partkey")
    return pd.DataFrame({"approx_distinct_partkeys": [round(est)]})


def q47_asof_join(sf_dir: str) -> pd.DataFrame:
    """As-of join: each event gets the latest order (by o_orderdate ≤ ts)
    of the same customer; duplicate (custkey, date) orders resolved to
    max(o_orderkey) by the operator's right_tiebreak — no pre-aggregate
    shuffle of the right side (oracle: DuckDB ASOF JOIN over the same
    max() pre-aggregate, which the tiebreak reproduces exactly)."""
    from ..stages.asof import asof_join_backward

    events = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: pa.table(
            {
                "user_id": pc.cast(t["o_custkey"], pa.int64()),
                "o_orderdate": t["o_orderdate"],
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = asof_join_backward(
        events,
        orders,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_tiebreak=["o_orderkey"],
        # known projections → skip the two limit-1 schema-probe executions
        left_schema=pa.schema(
            [("event_id", pa.int64()), ("ts", pa.timestamp("us")), ("user_id", pa.int64())]
        ),
        right_schema=pa.schema(
            [
                ("user_id", pa.int64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderkey", pa.int64()),
            ]
        ),
    )
    df = joined.to_pandas()[["event_id", "user_id", "o_orderkey"]]
    df["o_orderkey"] = df["o_orderkey"].astype("int64")
    return _finalize(df)


def q48_ngram_jaccard_pairs(sf_dir: str) -> rd.Dataset:
    """Exact word-3-gram Jaccard between each doc (doc_id % 7 == 0) and
    its deterministic every-5th-word-dropped variant — the near-dup
    verifier with an independent SQL oracle (DuckDB list kernels)."""
    from ..stages.dedup import ngram_jaccard

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, js = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            if d % 7 != 0:
                continue
            words = (t or "").split()
            variant = " ".join(w for j, w in enumerate(words) if j % 5 != 0)
            ids.append(d)
            js.append(ngram_jaccard(t or "", variant))
        import numpy as _np

        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "jaccard": pa.array(
                    _round_half_away(_np.asarray(js, dtype=_np.float64), 4)
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q86_decontaminate(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination (standard LLM-curation step): flag every
    corpus doc sharing ≥1 word-8-gram with the benchmark slice
    (doc_id % 97 == 0).  Contamination is injected deterministically —
    docs ≡ 5 (mod 13) get a 12-word benchmark snippet appended — so the
    flag column is non-trivial; the oracle replays the exact construction
    in SQL (string grams; the engine's 64-bit gram hashes are
    collision-free at this scale).  Scale shape: benchmark grams collect
    once (eval sets are dimension-sized) and broadcast via ray.put; the
    corpus is flagged in one map_batches scan — no shuffle."""
    from ..stages.dedup import benchmark_gram_hashes, flag_contaminated

    docs = _read(sf_dir, "documents", ["doc_id", "text"]).materialize()

    # snippet: first 12 lowercased words of the smallest benchmark doc
    # (two tiny pulls — an id-only projection, then one row by equality)
    id_blocks = collect_tables(
        docs.map_batches(
            lambda t: pa.table(
                {"doc_id": t["doc_id"].filter(pa.array(t["doc_id"].to_numpy(zero_copy_only=False) % 97 == 0))}
            ),
            batch_format="pyarrow",
        ), drop_empty=False)
    bench_ids = pa.concat_tables([b for b in id_blocks if b.num_rows])["doc_id"]
    min_id = pc.min(bench_ids).as_py()
    row_blocks = collect_tables(
        docs.map_batches(
            lambda t: t.filter(pc.equal(t["doc_id"], min_id)), batch_format="pyarrow"
        ), drop_empty=False)
    src_text = pa.concat_tables([b for b in row_blocks if b.num_rows])["text"][0].as_py()
    snippet = " ".join((src_text or "").lower().split()[:12])

    def make_corpus(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        mask = ids % 13 == 5
        if mask.any():
            texts = t["text"].to_pylist()
            new = [
                ((x or "") + " " + snippet) if m else x
                for x, m in zip(texts, mask)
            ]
            t = t.set_column(
                t.column_names.index("text"), "text", pa.array(new, type=pa.string())
            )
        return t

    corpus = docs.map_batches(make_corpus, batch_format="pyarrow")

    def bench_side(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t["doc_id"].to_numpy(zero_copy_only=False) % 97 == 0))

    def corpus_side(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(t["doc_id"].to_numpy(zero_copy_only=False) % 97 != 0))

    grams = benchmark_gram_hashes(
        corpus.map_batches(bench_side, batch_format="pyarrow"), ngram=8
    )
    flagged = flag_contaminated(
        corpus.map_batches(corpus_side, batch_format="pyarrow"), grams, ngram=8
    )
    df = flagged.to_pandas()
    df["doc_id"] = df["doc_id"].astype("int64")
    df["contaminated"] = df["contaminated"].astype(bool)
    return _finalize(df.sort_values("doc_id"))


def q49_knn_ivf(sf_dir: str) -> pd.DataFrame:
    """IVF approximate ANN (deterministic k-means lists, n_probe nearest
    lists probed) — the scale path beside brute force (q20) and LSH (q36)."""
    from ..stages.similarity import knn_ivf

    ids, vecs = _query_vectors(sf_dir, 2)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_ivf(ds, vecs, k=10, n_lists=16, n_probe=6).to_pandas()
    out["query_id"] = out["query_id"].map(dict(enumerate(ids))).astype(np.int64)
    return _finalize(out[["query_id", "vec_id", "score"]], {"score": 4})


def q50_bucketed_join(sf_dir: str) -> pd.DataFrame:
    """Explicit bucketed hash join (portable large-large pattern) —
    orders x customer rolled up per segment, oracle = plain SQL join."""
    from ..stages.joins import bucketed_inner_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = bucketed_inner_join(
        orders, cust, left_key="o_custkey", right_key="c_custkey", n_buckets=8
    )
    out = (
        joined.groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total"))
        .to_pandas()
    )
    return _finalize(out, {"total": 2})


def q51_redact_pii(sf_dir: str) -> rd.Dataset:
    """PII redaction (emails/phones/IPs → tokens) over synthesized
    pii-bearing strings; the oracle applies identical RE2 patterns via
    DuckDB regexp_replace (verified byte-equal semantics)."""
    from ..stages.clean import redact_pii

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        out = []
        for d, t in zip(ids, texts):
            head = " ".join((t or "").split()[:6])
            s = f"{head} contact user{d}@example.com or 555-000-{d % 10000:04d} end"
            out.append(redact_pii(s))
        return pa.table(
            {"doc_id": pa.array(ids, type=pa.int64()),
             "redacted": pa.array(out, type=pa.string())}
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q52_curation(sf_dir: str) -> rd.Dataset:
    """Full training-data curation composition: extract -> canonical-url
    dedup -> PII redaction -> quality/repetition filter -> lang ID ->
    deterministic split (pipelines/curate.py)."""
    from .curate import curation_pipeline

    return curation_pipeline(sf_dir)


def q53_bloom_semi_join(sf_dir: str) -> rd.Dataset:
    """Semi join via a broadcast Bloom filter (constant-size broadcast at
    any scale) with exact re-verify — must equal the plain IN-subquery."""
    from ..stages.sketches import bloom_semi_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_custkey"])
    return bloom_semi_join(
        cust, orders, left_key="c_custkey", right_key="o_custkey",
        n_expected=200_000, exact=True,
    )


def q54_heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """Misra-Gries heavy hitters over event users (the salting pre-pass:
    counts are lower bounds within n/k of exact)."""
    from ..stages.sketches import heavy_hitters

    ds = _read(sf_dir, "events", ["user_id"])
    hh = heavy_hitters(ds, "user_id", k=32)
    out = pd.DataFrame(
        sorted(((int(k), int(v)) for k, v in hh.items()), key=lambda t: (-t[1], t[0])),
        columns=["user_id", "approx_count"],
    )
    return _finalize(out.head(10))


def q55_range_join(sf_dir: str) -> pd.DataFrame:
    """Range (interval) join: events.value joined to a broadcast band
    table via vectorized searchsorted (no shuffle — the small interval
    side broadcasts; oracle = BETWEEN join)."""
    ds = _read(sf_dir, "events", ["event_id", "value"])
    edges = np.array([0.0, 20.0, 40.0, 60.0, 80.0], dtype=np.float64)
    labels = np.array(["b0", "b20", "b40", "b60", "b80"])

    def bin_values(batch: pa.Table) -> pa.Table:
        vals = batch["value"].to_numpy(zero_copy_only=False)
        # rows below the first band edge fall outside every interval —
        # drop them exactly as the oracle's BETWEEN join does
        keep = vals >= edges[0]
        vals = vals[keep]
        idx = np.minimum(
            np.searchsorted(edges, vals, side="right") - 1, len(labels) - 1
        )
        return pa.table(
            {"band": pa.array(labels[idx]), "value": pa.array(vals)}
        )

    out = (
        ds.map_batches(bin_values, batch_format="pyarrow")
        .groupby("band")
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    return _finalize(out, {"sum_value": 3})


def q56_extraction_fidelity(sf_dir: str) -> pd.DataFrame:
    """Self-audit: per payload kind, how many extracted texts match the
    source document words verbatim (the extract-exactly invariant,
    gen_ai_calling.py:205; edge rows excluded)."""
    from ..synth import edge_bucket
    from ..stages.classify import classify_payload_kind
    from ..stages.extract import extract_batch_task
    from .extract import build_pages_dataset

    pages = build_pages_dataset(sf_dir)

    def audit_full(batch: pa.Table) -> pa.Table:
        t = classify_payload_kind(batch)
        r = extract_batch_task(t)
        kinds, flags = [], []
        for k, s_, u, e, src in zip(
            r["payload_kind"].to_pylist(), r["status"].to_pylist(),
            r["url"].to_pylist(), r["extracted_text"].to_pylist(),
            batch["text"].to_pylist(),
        ):
            if k in ("html", "pdf", "image") and s_ == "ok" and not edge_bucket(u):
                kinds.append(k)
                flags.append(int(" ".join(e.split()) == " ".join((src or "").split())))
        return pa.table({"payload_kind": pa.array(kinds, type=pa.string()),
                         "verbatim": pa.array(flags, type=pa.int64())})

    out = (
        pages.map_batches(audit_full, batch_format="pyarrow")
        .groupby("payload_kind")
        .aggregate(Count(alias_name="n_checked"), Sum("verbatim", alias_name="n_verbatim"))
        .to_pandas()
    )
    out["n_verbatim"] = out["n_verbatim"].astype(np.int64)
    return _finalize(out)


def q57_group_zscore(sf_dir: str) -> pd.DataFrame:
    """Per-user z-score normalization of event values (feature-engineering
    window op: groupby → per-group vectorized transform; oracle = SQL
    window AVG/STDDEV_SAMP)."""
    from ..stages.dedup import add_key_partition

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def z(g: pd.DataFrame) -> pd.DataFrame:
        # every user in the partition normalizes in one vectorized pass
        gb = g.groupby("user_id", sort=False)["value"]
        mu = gb.transform("mean")
        sd = gb.transform("std")  # ddof=1, matches STDDEV_SAMP
        zv = np.where(sd.isna() | (sd == 0), 0.0, (g["value"] - mu) / sd)
        return pd.DataFrame(
            {"event_id": g["event_id"], "user_id": g["user_id"], "value_z": zv}
        )

    df = (
        ds.map_batches(lambda t: add_key_partition(t, "user_id"), batch_format="pyarrow")
        .groupby("_part")
        .map_groups(z, batch_format="pandas")
        .to_pandas()
    )
    return _finalize(df, {"value_z": 4})


def q58_pivot_events(sf_dir: str) -> pd.DataFrame:
    """Reshape/pivot: per-user event-type counts as wide columns
    (conditional-aggregation oracle).  Ray side: map-side partial pivot
    inside map_batches → tiny final groupby-sum (no wide shuffle)."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    types = ["click", "error", "purchase", "signup", "view"]

    def partial(batch: pa.Table) -> pa.Table:
        import collections

        counts: dict = collections.defaultdict(lambda: dict.fromkeys(types, 0))
        for u, t in zip(batch["user_id"].to_pylist(), batch["event_type"].to_pylist()):
            if t in counts[u]:
                counts[u][t] += 1
        users = sorted(counts)
        cols = {"user_id": pa.array(users, type=pa.int64())}
        for t in types:
            cols[f"n_{t}"] = pa.array([counts[u][t] for u in users], type=pa.int64())
        return pa.table(cols)

    aggs = [Sum(f"n_{t}", alias_name=f"n_{t}") for t in types]
    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("user_id")
        .aggregate(*aggs)
        .to_pandas()
    )
    for t in types:
        out[f"n_{t}"] = out[f"n_{t}"].astype(np.int64)
    return _finalize(out)


def q59_rollup_orders(sf_dir: str) -> pd.DataFrame:
    """ROLLUP-style multi-level aggregate: (status, priority) cells +
    per-status subtotals + grand total, as three grouped aggregates
    unioned (each level shuffles only its own key; oracle = GROUP BY
    ROLLUP).  NULL level markers encoded as 'ALL'."""
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    cells = (
        ds.groupby(["o_orderstatus", "o_orderpriority"])
        .aggregate(Count(alias_name="n"), Sum("o_totalprice", alias_name="total"))
        .to_pandas()
    )
    subtotals = (
        ds.groupby("o_orderstatus")
        .aggregate(Count(alias_name="n"), Sum("o_totalprice", alias_name="total"))
        .to_pandas()
    )
    subtotals["o_orderpriority"] = "ALL"
    grand = pd.DataFrame(
        {
            "o_orderstatus": ["ALL"],
            "o_orderpriority": ["ALL"],
            "n": [int(cells["n"].sum())],
            "total": [float(cells["total"].sum())],
        }
    )
    out = pd.concat([cells, subtotals, grand], ignore_index=True)
    out["n"] = out["n"].astype(np.int64)
    return _finalize(out[["o_orderstatus", "o_orderpriority", "n", "total"]], {"total": 2})


def q60_above_nation_avg(sf_dir: str) -> rd.Dataset:
    """Decorrelated subquery: customers whose balance exceeds their
    nation's average — small per-nation aggregate broadcast into a
    vectorized filter (no correlated per-row subquery, no big shuffle)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
    avgs_df = (
        cust.groupby("c_nationkey")
        .aggregate(Sum("c_acctbal", alias_name="s"), Count(alias_name="n"))
        .to_pandas()
    )
    avg_map = dict(zip(avgs_df["c_nationkey"], avgs_df["s"] / avgs_df["n"]))
    avg_ref = ray.put(avg_map)

    def filt(batch: pa.Table) -> pa.Table:
        m = ray.get(avg_ref)
        mask = [
            b > m[k]
            for b, k in zip(batch["c_acctbal"].to_pylist(), batch["c_nationkey"].to_pylist())
        ]
        t = batch.filter(pa.array(mask))
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
                "c_acctbal": pc.round(t["c_acctbal"], 2, round_mode="half_towards_infinity"),
            }
        )

    return cust.map_batches(filt, batch_format="pyarrow")


def q61_set_ops(sf_dir: str) -> pd.DataFrame:
    """Set operations on derived key sets: customers with orders INTERSECT
    / EXCEPT customers with >=1 high-value order (broadcast sets +
    vectorized membership)."""
    all_cust = set(_read(sf_dir, "orders", ["o_custkey"]).unique("o_custkey"))
    big = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 200_000.0)).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    big_cust = set(big.unique("o_custkey"))
    inter = sorted(all_cust & big_cust)
    exc = sorted(all_cust - big_cust)
    return pd.DataFrame(
        {
            "c_custkey": [int(k) for k in inter + exc],
            "set_op": ["intersect"] * len(inter) + ["except"] * len(exc),
        }
    )


def q62_weighted_avg(sf_dir: str) -> pd.DataFrame:
    """Custom UDAF shape: quantity-weighted average price per supplier —
    two partial sums inside map_batches, one tiny groupby, final ratio."""
    ds = _read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        wp = pc.multiply(batch["l_extendedprice"], batch["l_quantity"])
        t = pa.table(
            {"l_suppkey": batch["l_suppkey"], "wp": wp, "q": batch["l_quantity"]}
        )
        return t.group_by("l_suppkey").aggregate([("wp", "sum"), ("q", "sum")])

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("l_suppkey")
        .aggregate(Sum("wp_sum", alias_name="wp"), Sum("q_sum", alias_name="q"))
        .to_pandas()
    )
    out["weighted_avg_price"] = out["wp"] / out["q"]
    out = out.drop(columns=["wp", "q"])
    return _finalize(out, {"weighted_avg_price": 4})


def q63_percentiles(sf_dir: str) -> pd.DataFrame:
    """Exact per-group percentiles (p50/p90/p99) via per-group pandas
    linear interpolation — matches SQL quantile_cont."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def pct(g: pd.DataFrame) -> pd.DataFrame:
        q = g["value"].quantile([0.5, 0.9, 0.99], interpolation="linear")
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "p50": [q.loc[0.5]],
                "p90": [q.loc[0.9]],
                "p99": [q.loc[0.99]],
            }
        )

    df = ds.groupby("event_type").map_groups(pct, batch_format="pandas").to_pandas()
    return _finalize(df, {"p50": 4, "p90": 4, "p99": 4})


def q64_string_functions(sf_dir: str) -> rd.Dataset:
    """§2.7 string-kernel battery over part names: upper/lower, substring,
    concat, length, replace — all pyarrow.compute, oracle = SQL string fns."""
    ds = _read(sf_dir, "part", ["p_partkey", "p_name", "p_brand"])

    def fn(t: pa.Table) -> pa.Table:
        name = t["p_name"]
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "upper_name": pc.utf8_upper(name),
                "first5": pc.utf8_slice_codeunits(name, 0, 5),
                "branded": pc.binary_join_element_wise(t["p_brand"], name, ": "),
                "name_len": pc.cast(pc.utf8_length(name), pa.int64()),
                "dashed": pc.replace_substring(name, " ", "-"),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def q65_orders_by_year(sf_dir: str) -> pd.DataFrame:
    """Timestamp kernels: group order totals by calendar year
    (pyarrow.compute.year; oracle = date_part)."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {"year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
             "o_totalprice": t["o_totalprice"]}
        )

    out = (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby("year")
        .aggregate(Count(alias_name="n"), Sum("o_totalprice", alias_name="total"))
        .to_pandas()
    )
    return _finalize(out, {"total": 2})


def q66_union_sources(sf_dir: str) -> pd.DataFrame:
    """Dataset.union of two derived sources (early vs late events) with a
    grouped count — the multi-source ingestion shape (oracle: UNION ALL)."""
    early = _read(sf_dir, "events", ["event_id", "ts", "event_type"]).map_batches(
        lambda t: t.filter(pc.less(pc.cast(t["ts"], pa.int64()), 1_705_276_800_000_000)),
        batch_format="pyarrow",
    )
    late = _read(sf_dir, "events", ["event_id", "ts", "event_type"]).map_batches(
        lambda t: t.filter(pc.greater_equal(pc.cast(t["ts"], pa.int64()), 1_705_276_800_000_000)),
        batch_format="pyarrow",
    )
    out = (
        early.union(late)
        .groupby("event_type")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    return _finalize(out)


def q67_bloom_anti_join(sf_dir: str) -> pd.DataFrame:
    """Anti join with a Bloom fast path for definite non-members (exact
    re-check only on Bloom hits) — parts never ordered (oracle NOT IN)."""
    from ..stages.sketches import bloom_anti_join

    part = _read(sf_dir, "part", ["p_partkey", "p_name"])
    li = _read(sf_dir, "lineitem", ["l_partkey"]).map_batches(
        lambda t: t.filter(pc.less(t["l_partkey"], 50)), batch_format="pyarrow"
    )
    out = bloom_anti_join(
        part, li, left_key="p_partkey", right_key="l_partkey", n_expected=100_000
    ).to_pandas()
    if out.empty:
        out = pd.DataFrame({"p_partkey": pd.Series(dtype=np.int64),
                            "p_name": pd.Series(dtype=str)})
    return out


def q68_props_stats(sf_dir: str) -> pd.DataFrame:
    """JSON-field aggregate: mean of props.k per event_type (vectorized
    json parse in map_batches; oracle json_extract + avg)."""
    import json as _json

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def fn(batch: pa.Table) -> pa.Table:
        ks = []
        for p in batch["props"].to_pylist():
            try:
                ks.append(int(_json.loads(p or "{}").get("k")))
            except (ValueError, TypeError):
                ks.append(None)
        return pa.table({"event_type": batch["event_type"],
                         "k": pa.array(ks, type=pa.int64())})

    out = (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("k", alias_name="sum_k"))
        .to_pandas()
    )
    out["avg_k"] = out["sum_k"] / out["n"]
    out["sum_k"] = out["sum_k"].astype(np.int64)
    return _finalize(out, {"avg_k": 4})


def q69_filtered_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q6-style scalar: revenue from discounted mid-quantity items
    (pure vectorized filter + product + global sum via per-batch partials)."""
    def partial(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(batch["l_discount"], 0.05),
                pc.less_equal(batch["l_discount"], 0.07),
            ),
            pc.less(batch["l_quantity"], 24.0),
        )
        t = batch.filter(mask)
        rev = pc.sum(pc.multiply(t["l_extendedprice"], t["l_discount"])).as_py() or 0.0
        return pa.table({"rev": pa.array([rev], type=pa.float64())})

    total = (
        _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .to_pandas()["rev"]
        .sum()
    )
    return _finalize(pd.DataFrame({"revenue": [float(total)]}), {"revenue": 2})


def q70_rubric_flatten(sf_dir: str) -> pd.DataFrame:
    """Nested-column explode: grading output rubric_wise_response
    (list<struct>) flattened to one row per rubric via Arrow list kernels,
    then bucketed by awarded score (engine-specific → rows-only)."""
    from .grading import grading_pipeline

    graded = grading_pipeline(sf_dir)

    def explode(batch: pa.Table) -> pa.Table:
        col = batch["rubric_wise_response"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = pc.list_flatten(col)  # struct child rows
        if len(flat) == 0:
            return pa.table(
                {"rubric_score": pa.array([], type=pa.float64()),
                 "rubric_max": pa.array([], type=pa.float64())}
            )
        return pa.table(
            {
                "rubric_score": flat.field("rubric_wise_score"),
                "rubric_max": flat.field("rubric_wise_max_score"),
            }
        )

    out = (
        graded.map_batches(explode, batch_format="pyarrow")
        .groupby(["rubric_score", "rubric_max"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    return _finalize(out, {"rubric_score": 1, "rubric_max": 1})


def q71_month_over_month(sf_dir: str) -> pd.DataFrame:
    """Month-over-month revenue delta: distributed monthly aggregate, then
    a lag-difference over the (tiny) monthly series (oracle: window LAG)."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
                "month": pc.cast(pc.month(t["o_orderdate"]), pa.int64()),
                "o_totalprice": t["o_totalprice"],
            }
        )

    monthly = (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby(["year", "month"])
        .aggregate(Sum("o_totalprice", alias_name="revenue"))
        .to_pandas()
        .sort_values(["year", "month"], kind="mergesort")
        .reset_index(drop=True)
    )
    # round revenue BEFORE differencing — the oracle lags over rounded
    # values, and deltas of unrounded sums can differ at the cent level
    monthly["revenue"] = _round_half_away(monthly["revenue"].to_numpy(), 2)
    monthly["delta"] = (monthly["revenue"] - monthly["revenue"].shift(1)).fillna(0.0)
    return _finalize(monthly, {"revenue": 2, "delta": 2})


def q72_distinct_per_group(sf_dir: str) -> pd.DataFrame:
    """Exact count(distinct part) per supplier: per-batch pair dedup
    (map-side combine) → one shuffle on salted supplier partitions →
    vectorized per-partition nunique (cross-batch dups removed inside the
    partition: every pair of one supplier co-locates)."""
    from ..stages.dedup import add_key_partition

    ds = _read(sf_dir, "lineitem", ["l_suppkey", "l_partkey"])

    def pairs(t: pa.Table) -> pa.Table:
        deduped = pa.table(
            {"l_suppkey": t["l_suppkey"], "l_partkey": t["l_partkey"]}
        ).group_by(["l_suppkey", "l_partkey"]).aggregate([])
        return add_key_partition(deduped, "l_suppkey")

    def nunique(g: pd.DataFrame) -> pd.DataFrame:
        r = (
            g.drop_duplicates(["l_suppkey", "l_partkey"])
            .groupby("l_suppkey", sort=False)["l_partkey"]
            .size()
            .reset_index(name="n_distinct_parts")
        )
        r["n_distinct_parts"] = r["n_distinct_parts"].astype(np.int64)
        return r

    out = (
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=65536)
        .groupby("_part")
        .map_groups(nunique, batch_format="pandas")
        .to_pandas()
    )
    return _finalize(out)


def q73_split_priority(sf_dir: str) -> pd.DataFrame:
    """Capture-group regex extraction: split "N-LABEL" priorities into
    typed code + label columns (pc.extract_regex; oracle regexp_extract),
    aggregated per code."""
    ds = _read(sf_dir, "orders", ["o_orderpriority"])

    def fn(t: pa.Table) -> pa.Table:
        ex = pc.extract_regex(t["o_orderpriority"], r"^(?P<code>[0-9]+)-(?P<label>.+)$")
        if isinstance(ex, pa.ChunkedArray):
            ex = ex.combine_chunks()
        return pa.table(
            {
                "code": pc.cast(pc.struct_field(ex, "code"), pa.int64()),
                "label": pc.struct_field(ex, "label"),
            }
        )

    out = (
        ds.map_batches(fn, batch_format="pyarrow")
        .groupby(["code", "label"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    return _finalize(out)


def q74_string_agg(sf_dir: str) -> pd.DataFrame:
    """Grouped string aggregation: comma-joined, alphabetically-ordered
    nation names per region (oracle string_agg ORDER BY)."""
    nat = _read(sf_dir, "nation", ["n_name", "n_regionkey"])

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        names = ",".join(sorted(g["n_name"]))
        return pd.DataFrame(
            {"n_regionkey": [int(g["n_regionkey"].iloc[0])], "nations": [names]}
        )

    df = nat.groupby("n_regionkey").map_groups(agg, batch_format="pandas").to_pandas()
    df["n_regionkey"] = df["n_regionkey"].astype(np.int64)
    return _finalize(df)


def q38_question_generation(sf_dir: str) -> rd.Dataset:
    """/generateQuestion pipeline over synthesized requests (SURVEY.md §3.2)."""
    from .questions import question_generation_batch

    reqs = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: pa.table(
            {
                "user_id": pc.cast(t["c_custkey"], pa.string()),
                "grade_level": pc.add(pc.cast(pc.bit_wise_and(t["c_custkey"], 7), pa.int64()), 1),
                "subject": pa.array(
                    ["Mathematics" if k % 2 == 0 else "English" for k in t["c_custkey"].to_pylist()],
                    type=pa.string(),
                ),
                "board": pa.array(["CBSE"] * len(t), type=pa.string()),
                "topic": t["c_mktsegment"],
                "n_questions": pa.array([2 + k % 4 for k in t["c_custkey"].to_pylist()], type=pa.int64()),
            }
        ).filter(pc.less(pc.cast(t["c_custkey"], pa.int64()), 40)),
        batch_format="pyarrow",
    )
    return reqs.map_batches(question_generation_batch, batch_format="pyarrow")


def q39_number_predict(sf_dir: str) -> pd.DataFrame:
    """Group-compose + number prediction (A5/A6/J5): gemini-number grading
    requests grouped by scan, stacked, predicted, equality-scored."""
    from ..stages.compose import predict_numbers_for_group

    reqs = _read(sf_dir, "documents", ["doc_id", "text", "lang"]).map_batches(
        docs_to_grading_requests_batch, batch_format="pyarrow"
    )
    number_reqs = reqs.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.equal(t["grading_prompt"], "gemini-number"),
                pc.greater(pc.binary_length(t["student_answer_payload"]), 0),
            )
        ).select(["scan_id", "que_id", "student_answer_payload", "correct_answer", "max_score"]),
        batch_format="pyarrow",
    )
    out = (
        number_reqs.groupby("scan_id")
        .map_groups(predict_numbers_for_group, batch_format="pandas")
        .to_pandas()
    )
    return _finalize(out)


def docs_to_grading_requests_batch(batch: pa.Table) -> pa.Table:
    from ..synth import docs_to_grading_requests

    return docs_to_grading_requests(batch)


def q40_host_stats(sf_dir: str) -> pd.DataFrame:
    """Per-host salted rollup over the synthetic pages table (giant-host
    skew fixture: big.example.com owns ~20% of rows)."""
    from ..stages.skew import host_stats
    from .extract import build_pages_dataset

    return host_stats(build_pages_dataset(sf_dir))


# --------------------------------------------------------------------------
# Corpus/text index operators (round 2 additions)
# --------------------------------------------------------------------------


def _tokens(text: str) -> list[str]:
    return (text or "").lower().split()


def q75_inverted_index(sf_dir: str) -> pd.DataFrame:
    """Inverted-index build: token → document-frequency + first-10
    postings.  (token, doc_id) pairs distinct-ed per doc inside
    map_batches; the groupby(token) shuffle carries only pairs.  Tokens
    with df < 20 pruned (both sides) to bound the output."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def pairs(batch: pa.Table) -> pa.Table:
        # vectorized token explode + per-doc distinct (pandas kernels)
        df = batch.select(["doc_id", "text"]).to_pandas()
        df["token"] = df["text"].fillna("").str.lower().str.split()
        ex = (
            df[["doc_id", "token"]]
            .explode("token")
            .dropna(subset=["token"])
            .drop_duplicates(["doc_id", "token"])
        )
        return pa.table(
            {"token": pa.array(ex["token"], type=pa.string()),
             "doc_id": pa.array(ex["doc_id"], type=pa.int64())}
        )

    from ..stages.dedup import add_key_partition

    def postings(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass over all tokens in the partition
        g = g.sort_values(["token", "doc_id"], kind="mergesort")
        sizes = g.groupby("token", sort=False)["doc_id"].transform("size")
        g = g[sizes >= 20]
        if g.empty:
            return pd.DataFrame(
                {"token": pd.Series(dtype=str), "df": pd.Series(dtype="int64"),
                 "postings": pd.Series(dtype=str)}
            )
        agg = g.groupby("token", sort=False)["doc_id"].agg(
            df="size", postings=lambda s: ",".join(str(i) for i in s.iloc[:10])
        )
        out = agg.reset_index()
        out["df"] = out["df"].astype("int64")
        return out[["token", "df", "postings"]]

    df = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .map_batches(lambda t: add_key_partition(t, "token"), batch_format="pyarrow")
        .groupby("_part")
        .map_groups(postings, batch_format="pandas")
        .to_pandas()
    )
    return _finalize(df)


def q76_top_bigrams(sf_dir: str) -> pd.DataFrame:
    """Corpus-level top-20 word bigrams: per-batch partial counts
    (map-side combine) → groupby sum → per-block partial top-k merge
    (no global sort)."""
    ds = _read(sf_dir, "documents", ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        big: list[str] = []
        for t in batch["text"].to_pylist():
            w = _tokens(t)
            big.extend(map(" ".join, zip(w, w[1:])))
        vc = pd.Series(big, dtype=object).value_counts()  # C-hash combine
        return pa.table(
            {"bigram": pa.array(vc.index, type=pa.string()),
             "n": pa.array(vc.to_numpy(), type=pa.int64())}
        )

    from ..stages.selection import global_top_k

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
    )
    out = global_top_k(counts, k=20, by=["n", "bigram"], descending=[True, False])
    out["n"] = out["n"].astype("int64")
    return _finalize(out[["bigram", "n"]])


def q77_hash_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic uniform k-sample without replacement: the 64 docs
    with the smallest md5(doc_id) — per-batch partial top-k, tiny driver
    merge (cluster-size- and order-independent membership)."""
    import hashlib as _hl

    ds = _read(sf_dir, "documents", ["doc_id"])
    k = 64

    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        hs = [_hl.md5(str(i).encode()).hexdigest() for i in ids]
        order = sorted(range(len(ids)), key=lambda j: (hs[j], ids[j]))[:k]
        return pa.table(
            {"doc_id": pa.array([ids[j] for j in order], type=pa.int64()),
             "h": pa.array([hs[j] for j in order], type=pa.string())}
        )

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["h", "doc_id"], kind="mergesort").head(k)
    return _finalize(cand.reset_index(drop=True))


def q78_tfidf_top_term(sf_dir: str) -> pd.DataFrame:
    """Per-document top term by tf-idf.  Pass 1: document frequencies via
    distinct (token, doc) pairs + groupby (vocabulary-sized result,
    broadcast via ray.put — natural-language vocab is bounded, documented
    scale assumption).  Pass 2: per-doc scoring inside map_batches (no
    per-doc shuffle: each doc's terms score locally)."""
    import math

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).materialize()
    n_docs = ds.count()

    def pairs(batch: pa.Table) -> pa.Table:
        toks, dids = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for tok in set(_tokens(t)):
                toks.append(tok)
                dids.append(d)
        return pa.table(
            {"token": pa.array(toks, type=pa.string()),
             "doc_id": pa.array(dids, type=pa.int64())}
        )

    df_tbl = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Count(alias_name="df"))
        .to_pandas()
    )
    df_ref = ray.put(dict(zip(df_tbl["token"], df_tbl["df"].astype(int))))

    def score(batch: pa.Table) -> pa.Table:
        import collections

        dfm = ray.get(df_ref)
        out_d, out_t = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            w = _tokens(t)
            if not w:
                continue
            tf = collections.Counter(w)
            best_term, best_score = None, None
            for term in tf:
                s = tf[term] * math.log(float(n_docs) / dfm[term])
                if best_score is None or s > best_score or (
                    s == best_score and term < best_term
                ):
                    best_term, best_score = term, s
            out_d.append(d)
            out_t.append(best_term)
        return pa.table(
            {"doc_id": pa.array(out_d, type=pa.int64()),
             "top_term": pa.array(out_t, type=pa.string())}
        )

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    return _finalize(out)


def q79_quantile_sketch(sf_dir: str) -> pd.DataFrame:
    """Mergeable histogram quantile sketch over events.value (constant
    4096-bin state, element-wise-sum merge — the scale path beside q63's
    exact per-group quantiles).  The oracle replays the identical
    histogram algorithm in SQL, so even this approximate operator is
    hash-checked, not rows-only."""
    from ..stages.sampling import approx_quantiles

    ds = _read(sf_dir, "events", ["value"])
    qs = [0.1, 0.5, 0.9, 0.99]
    vals = approx_quantiles(ds, "value", qs)
    out = pd.DataFrame({"q": qs, "value": vals})
    return _finalize(out, {"value": 6})


def q80_sliding_window(sf_dir: str) -> pd.DataFrame:
    """Sliding (overlapping) event-time windows: 1h windows every 15 min
    — each event explodes into its 4 containing windows inside
    map_batches, then one grouped aggregate (oracle: unnest of the window
    range in SQL)."""
    from ..stages.streaming import sliding_window_aggregate

    events = _read(sf_dir, "events", ["ts", "event_type", "value"])
    out = sliding_window_aggregate(
        events, key_col="event_type", ts_col="ts", value_col="value",
        window_s=3600, slide_s=900,
    )
    df = out.to_pandas().sort_values(
        ["event_type", "window_start"], kind="mergesort"
    ).reset_index(drop=True)
    return _finalize(df, {"sum_value": 3})


def q81_doc_chunks(sf_dir: str) -> pd.DataFrame:
    """Training-sequence chunking: split each document into 64-word
    chunks with 8-word overlap (stride 56) — pure map_batches explode, no
    shuffle.  Emits (doc_id, chunk_id, n_words, first_word) per chunk."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    size, stride = 64, 56

    def chunks(batch: pa.Table) -> pa.Table:
        d_out: list[int] = []
        c_out: list[int] = []
        n_out: list[int] = []
        f_out: list[str] = []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            w = (t or "").split()
            if not w:
                continue
            cid = 0
            for start in range(0, len(w), stride):
                piece = w[start : start + size]
                d_out.append(d)
                c_out.append(cid)
                n_out.append(len(piece))
                f_out.append(piece[0])
                cid += 1
                if start + size >= len(w):
                    break
        return pa.table(
            {
                "doc_id": pa.array(d_out, type=pa.int64()),
                "chunk_id": pa.array(c_out, type=pa.int64()),
                "n_words": pa.array(n_out, type=pa.int64()),
                "first_word": pa.array(f_out, type=pa.string()),
            }
        )

    return _finalize(ds.map_batches(chunks, batch_format="pyarrow").to_pandas())


def q82_source_quota(sf_dir: str) -> pd.DataFrame:
    """Per-source quota sampling (curation: cap any one source's share):
    keep the first 50 docs per source ordered by doc_id — vectorized
    head-N per key inside salted partitions (one shuffle)."""
    from ..stages.dedup import add_key_partition

    ds = _read(sf_dir, "documents", ["doc_id", "source"])
    quota = 50

    def head_n(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values("doc_id", kind="mergesort")
            .groupby("source", sort=False)
            .head(quota)
            .drop(columns=["_part"])
        )

    out = (
        ds.map_batches(
            lambda t: add_key_partition(t, "source"), batch_format="pyarrow"
        )
        .groupby("_part")
        .map_groups(head_n, batch_format="pandas")
        .to_pandas()
    )
    return _finalize(out[["doc_id", "source"]])


def q83_skewed_join(sf_dir: str) -> pd.DataFrame:
    """Skew-aware join plan: Misra-Gries-detected hot users join map-side
    against a broadcast right-side fragment (no reducer receives a hot
    key's full row set); cold keys take the bucketed hash join.  Rolled
    up per market segment; oracle = plain SQL join."""
    from ..stages.joins import skewed_inner_join

    events = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = skewed_inner_join(
        events, cust, left_key="user_id", right_key="c_custkey", hot_k=16
    )

    def partial(t: pa.Table) -> pa.Table:
        # map-side combine: 5 segments → tiny shuffle instead of a full
        # sort-aggregate over every joined row
        g = (
            t.select(["c_mktsegment", "value"])
            .to_pandas()
            .groupby("c_mktsegment", sort=False)["value"]
            .agg(_n="size", _s="sum")
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("_n", alias_name="n"), Sum("_s", alias_name="sum_value"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return _finalize(out, {"sum_value": 3})


def q84_streaming_sessionize(sf_dir: str) -> pd.DataFrame:
    """STATEFUL streaming sessionization (per-bucket actors holding only
    open sessions, watermark-closed) — must equal the batch sessionizer
    q12 exactly, so it shares q12's SQL oracle."""
    from ..stages.streaming import session_window_aggregate_ds

    events = _read(sf_dir, "events", ["ts", "user_id"])
    out = session_window_aggregate_ds(
        events, key_col="user_id", ts_col="ts", gap_s=1800
    )
    df = out.to_pandas().sort_values(
        ["user_id", "session_id"], kind="mergesort"
    ).reset_index(drop=True)
    return _finalize(df)


def q85_string_key_join(sf_dir: str) -> pd.DataFrame:
    """Bucketed hash join on a STRING key — oracle coverage of the
    siphash routing path end-to-end (q50/q83 exercise integer keys).
    The right side is a derived language dimension (distinct langs with
    a computed label), so DuckDB can reproduce the whole plan."""
    from ..stages.joins import bucketed_inner_join

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])

    # dimension build: distinct langs (per-batch distinct → tiny driver
    # distinct; a handful of languages — dimension-sized by construction)
    import ray as _ray

    blocks = collect_tables(
        docs.map_batches(
            lambda t: pa.table({"lang": pc.unique(t["lang"])}),
            batch_format="pyarrow",
        ), drop_empty=False)
    langs = sorted({v for b in blocks for v in b["lang"].to_pylist()})
    dim = rd.from_arrow(
        pa.table(
            {
                "r_lang": pa.array(langs, type=pa.string()),
                "lang_label": pa.array([f"{x.upper()}-LBL" for x in langs]),
            }
        )
    )
    joined = bucketed_inner_join(
        docs, dim, left_key="lang", right_key="r_lang", n_buckets=8
    )

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["lang", "lang_label"])
            .to_pandas()
            .groupby(["lang", "lang_label"], sort=False)
            .size()
            .reset_index(name="_n")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "lang_label"])
        .aggregate(Sum("_n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return _finalize(out)


# --------------------------------------------------------------------------
# Registry + oracles
# --------------------------------------------------------------------------

# Ordering contract: the driver oracle-checks the FIRST 50 entries (dict
# insertion order).  The window rotates per round so every registered
# query gets a driver-green row at least once across rounds: round 3
# front-loads the 33 queries the r2 window did not sample, then the
# queries whose implementation changed this round.  Everything parked
# after position 50 already has a driver-green row from rounds 1/2 and
# still runs in tests/test_oracle_parity.py every session.
def q87_normalized_dedup(sf_dir: str) -> rd.Dataset:
    """Case/whitespace-insensitive exact dedup keeping the best copy per
    normalized text (most original characters, ties → smallest doc_id).
    One coarse hash shuffle on the normalized key; the oracle replays
    normalization with the same RE2 pattern in DuckDB."""
    from ..stages.dedup import normalized_dedup_keep_best

    return normalized_dedup_keep_best(
        _read(sf_dir, "documents", ["doc_id", "text"])
    )


def q88_semantic_dedup(sf_dir: str) -> rd.Dataset:
    """SemDeDup over the embeddings table: k-means buckets (deterministic
    seeded training) then greedy in-cluster cosine pruning at tau=0.98.
    Near-dup vectors are injected deterministically (every vec_id % 11
    == 0 gains an identical copy at id+1M — cosine exactly 1, so the
    copy must prune) to make the keep column non-trivial.  Not
    SQL-expressible (iterative k-means + order-dependent greedy) —
    rows-only driver check; determinism + keep-semantics pinned in
    tests/test_dedup.py and invariants (copies always prune, sources
    survive, id universe exact) in tests/test_dedup_invariants.py."""
    from ..stages.dedup import semantic_dedup

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def expand(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_pylist()
        vecs = batch["embedding"].to_pylist()
        out_i, out_v = [], []
        for i, v in zip(ids, vecs):
            out_i.append(i)
            out_v.append(v)
            if i % 11 == 0:
                out_i.append(i + 1_000_000)
                out_v.append(v)
        return pa.table(
            {"vec_id": pa.array(out_i, type=pa.int64()),
             "embedding": pa.array(out_v, type=batch["embedding"].type)}
        )

    return semantic_dedup(
        ds.map_batches(expand, batch_format="pyarrow"), n_lists=16, tau=0.98
    )


def q89_remove_frequent_segments(sf_dir: str) -> rd.Dataset:
    """CCNet-style boilerplate removal: drop every 2-word segment whose
    document frequency ≥ 20 (~p90 of the test corpus, so removal is
    non-trivial at every sf), reassemble survivors in order (docs left
    empty are dropped).  Frequency pass is one segment-hash shuffle;
    the frequent set broadcasts once and the rewrite is shuffle-free.
    The oracle replays the segmentation with list slicing in SQL."""
    from ..stages.clean import remove_frequent_segments

    return remove_frequent_segments(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        min_docs=20,
        words_per_seg=2,
    )


def q90_unigram_logprob(sf_dir: str) -> pd.DataFrame:
    """CCNet-style perplexity proxy: per-doc mean unigram log-probability
    under the corpus' own unigram LM.  Count pass = per-batch np.unique
    partials + one vocab-sized shuffle; score pass = broadcast hashed LM
    + shuffle-free searchsorted/reduceat scan.  The oracle replays the
    two passes relationally (unnest → counts → join → avg ln)."""
    from ..stages.text_analysis import score_unigram_logprob

    out = (
        score_unigram_logprob(_read(sf_dir, "documents", ["doc_id", "text"]))
        .to_pandas()
    )
    return _finalize(out, {"avg_logprob": 4})


def q91_badword_filter(sf_dir: str) -> rd.Dataset:
    """C4-style blocklist filter: drop documents containing any blocked
    token; blocklist ships once in the closure, scan is shuffle-free
    (vectorized isin + per-doc reduceat).  Blocklist chosen so ~4% of
    documents survive at every sf (every common token appears in most
    docs — survival means none of the three)."""
    from ..stages.clean import filter_blocked_words

    return filter_blocked_words(
        _read(sf_dir, "documents", ["doc_id", "source", "text"]),
        ["spark", "vector", "stream"],
    )


def q92_pack_sequences(sf_dir: str) -> rd.Dataset:
    """Training-sequence offset packing (concatenate-then-chunk): per
    source, docs ordered by doc_id fill 256-token sequences; a doc's
    seq_id = floor(prior tokens / 256).  Text prunes to an int count
    before the single coarse co-location shuffle; per-group exclusive
    cumsums are vectorized pandas.  Oracle = window-function prefix sum."""
    from ..stages.packing import pack_sequences

    return pack_sequences(
        _read(sf_dir, "documents", ["doc_id", "source", "text"]),
        budget=256,
        group_col="source",
        order_col="doc_id",
    )


def q93_repetition_signals(sf_dir: str) -> pd.DataFrame:
    """Gopher/MassiveText within-doc repetition filter signals: top-word
    fraction, duplicate-word fraction, duplicate-2-gram fraction — one
    shuffle-free vectorized scan (batch-wide lexsort over token hashes,
    no per-doc Python).  The oracle replays it relationally with zipped
    unnests + a pos+1 self-join for the 2-grams."""
    from ..stages.text_analysis import repetition_signals

    out = repetition_signals(
        _read(sf_dir, "documents", ["doc_id", "text"])
    ).to_pandas()
    return _finalize(
        out,
        {"frac_top_word": 4, "frac_dup_words": 4, "frac_dup_2grams": 4},
    )


def q94_dsir_weights(sf_dir: str) -> pd.DataFrame:
    """DSIR importance weights: target LM = English documents, raw LM =
    the whole corpus; weight = per-doc mean ln p_target - ln p_raw.
    The target is passed as a boolean mask column, so BOTH LM count
    reductions fuse into one pass over the corpus text; then one
    broadcast + one shuffle-free scoring scan.  Non-English docs rank
    low (their tokens hit the target LM's add-half OOV floor), giving
    the resampling signal."""
    from ..stages.text_analysis import dsir_importance_weights

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    flagged = docs.map_batches(
        lambda t: t.append_column("_is_en", pc.equal(t["lang"], "en")),
        batch_format="pyarrow",
    )
    out = dsir_importance_weights(flagged, "_is_en").to_pandas()
    return _finalize(out, {"dsir_weight": 4})


def q95_segment_dedup_keep_first(sf_dir: str) -> rd.Dataset:
    """RefinedWeb-style global exact segment dedup, keep-first: a
    2-word segment survives only in the lowest-doc_id document
    containing it.  One segment-hash shuffle computes keepers; only
    duplicated segments broadcast back; the rewrite is shuffle-free.
    Oracle: min(doc_id) per segment via the q89 list-slicing
    resegmentation."""
    from ..stages.clean import dedup_segments_keep_first

    return dedup_segments_keep_first(
        _read(sf_dir, "documents", ["doc_id", "text"]), words_per_seg=2
    )


def q96_fused_quality_filter(sf_dir: str) -> pd.DataFrame:
    """FineWeb-style fused rule cascade: token bounds + duplicate-word
    fraction + unigram-LM mean log-probability, all from ONE tokenize
    +hash pass (shared by the repetition grouping and the LM probe),
    emitting per-doc signals and a 0/1 keep verdict.  The oracle
    replays the three rules relationally over the same unigram LM."""
    from ..stages.text_analysis import fused_quality_filter

    out = fused_quality_filter(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        min_tokens=30,
        max_tokens=90,
        max_frac_dup_words=0.9,
        min_avg_logprob=-3.42,
    ).to_pandas()
    return _finalize(
        out, {"frac_top_word": 4, "frac_dup_words": 4, "avg_logprob": 4}
    )


def q97_token_quota_mix(sf_dir: str) -> rd.Dataset:
    """DoReMi-style static corpus mixing: per source, docs ordered by
    doc_id fill a token tape; a doc is selected iff its first token
    lands under the 800-token source quota.  Same slim-then-shuffle
    shape as q92 packing.  Oracle: window prefix sum + WHERE."""
    from ..stages.packing import select_token_quota

    return select_token_quota(
        _read(sf_dir, "documents", ["doc_id", "source", "text"]),
        800,
        group_col="source",
        order_col="doc_id",
    )


def q98_corpus_build(sf_dir: str) -> rd.Dataset:
    """The training-corpus capstone: prefix-fingerprint exact dedup →
    scale-proportional frequent-segment removal → fused quality cascade
    (self-trained LM) → 256-token offset packing, composed end-to-end
    from the curation operators (pipelines/curate.corpus_build).  Four
    shuffles total; both statistics+rewrite stages read a checkpointed
    slim corpus instead of re-executing upstream shuffles.  The oracle
    replays all four stages as one CTE chain."""
    from .curate import corpus_build

    return corpus_build(_read(sf_dir, "documents", ["doc_id", "source", "text"]))


def q99_perplexity_tiers(sf_dir: str) -> rd.Dataset:
    """CCNet head/middle/tail tiering (Wenzek et al. 2020): per-language
    EXACT terciles of the q90 unigram-LM score via distributed histogram
    refinement (stages/selection.exact_group_quantiles — no sort, no
    driver values), then a shuffle-free broadcast-threshold assign.
    Oracle: window-function rank-at-ceil(n/3) thresholds over the same
    rounded score."""
    from ..stages.selection import perplexity_tiers

    return perplexity_tiers(_read(sf_dir, "documents", ["doc_id", "text", "lang"]))


def q100_temperature_mix(sf_dir: str) -> rd.Dataset:
    """Temperature (α=0.5) source mixing: per-source keep rate ∝
    n_s^0.5 scaled to a 240-doc budget, selection by deterministic
    md5-u32 threshold (stages/sampling.temperature_sample) — one tiny
    count groupby + a shuffle-free filter scan.  Oracle replays the
    rate formula and the hex-threshold cut in SQL."""
    from ..stages.sampling import temperature_sample

    sampled = temperature_sample(
        _read(sf_dir, "documents", ["doc_id", "source"]),
        group_col="source",
        id_col="doc_id",
        alpha=0.5,
        budget=240.0,
    )
    return sampled


def q101_tier_extract(sf_dir: str) -> rd.Dataset:
    """The tier-extraction capstone (pipelines/tiering.tier_extract):
    extraction → language ID on the extracted text → unigram-LM scoring
    → per-language EXACT tercile tiers.  Not SQL-expressible (extraction
    is the engine's own DOM/PDF/OCR surface) — rows-only under the
    driver; the tiering math is oracle-checked by q99, the extraction by
    q56's fidelity audit, and the result invariants (unique urls, exact
    per-language terciles) by tests/test_dedup_invariants.py."""
    from .tiering import tier_extract_sf

    return tier_extract_sf(sf_dir)


def q102_dup_ngram_coverage(sf_dir: str) -> pd.DataFrame:
    """ExactSubstr-proxy duplicate-span signal: fraction of each doc's
    token positions covered by a word-8-gram occurring >1× in the
    corpus.  One gram-hash count shuffle + one broadcast + a
    shuffle-free difference-array coverage scan.  Oracle replays grams
    relationally (list-slice grams → dup set → position unnest →
    count distinct covered)."""
    from ..stages.dedup import duplicate_ngram_coverage

    out = duplicate_ngram_coverage(
        _read(sf_dir, "documents", ["doc_id", "text"])
    ).to_pandas()
    return _finalize(out, {"frac_dup_ngrams": 4})


def q103_remove_dup_spans(sf_dir: str) -> pd.DataFrame:
    """ExactSubstr-style duplicate-span REMOVAL: every document
    rewritten with all word-8-grams occurring >1× corpus-wide excised
    (every occurrence — the Dolma convention for cross-page
    boilerplate).  Same plan shape as q102 (one gram-count shuffle +
    one broadcast + a shuffle-free rewrite scan); the rewrite gathers
    kept original-case tokens on the batch token tape and reassembles
    text with one vectorized binary_join.  Oracle replays it
    relationally: dup grams → covered positions → string_agg of the
    uncovered tokens in position order."""
    from ..stages.dedup import remove_duplicate_spans

    return remove_duplicate_spans(
        _read(sf_dir, "documents", ["doc_id", "text"])
    ).to_pandas()


def q104_kmeans_assign(sf_dir: str) -> pd.DataFrame:
    """Distributed k-means (stages/clustering): ONE Lloyd iteration from
    the deterministic smallest-4-id seed, then nearest-centroid
    assignment — per iteration: one (k,d) broadcast, one shuffle-free
    partial-sums scan (argmin over a matmul Gram term +
    sort/add.reduceat), a k×blocks-bounded driver fold.  Output is ids
    only (vec_id, cluster), so the oracle compares integers — the SQL
    replays seed → assign → per-dimension means → reassign
    relationally over CAST(embedding AS DOUBLE[])."""
    from ..stages.clustering import (
        assign_clusters,
        kmeans_iterate,
        smallest_k_vectors,
    )

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    seeds = smallest_k_vectors(ds, id_col="vec_id", vec_col="embedding", k=4)
    c1 = kmeans_iterate(ds, seeds, vec_col="embedding", n_iter=1)
    out = assign_clusters(
        ds, c1, vec_col="embedding", keep_cols=["vec_id"]
    ).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def q105_cluster_prune(sf_dir: str) -> pd.DataFrame:
    """Cluster-based density pruning (SSL-prototypes / SemDeDup
    selection): q104's k-means assignment, then keep each cluster's
    most-prototypical half — squared distance ≤ the cluster's exact
    ceil(n/2)-th smallest (distributed histogram-refinement quantiles;
    ties at the threshold all kept).  One assignment scan + bounded
    refinement scans over the materialized slim projection + one
    shuffle-free threshold filter.  Ids-only output; the oracle ranks
    the same |v|²+|c|²−2v·c expansion with window functions."""
    from ..stages.clustering import (
        cluster_prune,
        kmeans_iterate,
        smallest_k_vectors,
    )

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    seeds = smallest_k_vectors(ds, id_col="vec_id", vec_col="embedding", k=4)
    c1 = kmeans_iterate(ds, seeds, vec_col="embedding", n_iter=1)
    out = cluster_prune(ds, c1, id_col="vec_id", vec_col="embedding").to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def q106_shuffle_positions(sf_dir: str) -> pd.DataFrame:
    """Reproducible global shuffle (stages/shuffle): every document's
    dense 0-based position under the seeded splitmix64 order — a pure
    function of (doc_id, seed), independent of block layout and cluster
    size, so shard N of the training order can be regenerated alone.
    One tiny hash-range count pass (driver holds 64 bucket counts) +
    ONE bucket shuffle + per-bucket vectorized rank.  Oracle replays
    splitmix64 exactly in SQL (HUGEINT mod-2^64 arithmetic, multiplies
    split at 32 bits) and ranks with row_number()."""
    from ..stages.shuffle import shuffle_positions

    out = shuffle_positions(
        _read(sf_dir, "documents", ["doc_id"]),
        key_col="doc_id", seed=42, num_buckets=64,
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q107_epoch_mix(sf_dir: str) -> pd.DataFrame:
    """Fractional-epoch mixture materialization (LLaMA-style static
    mixtures): source src_i repeats 1 + (i mod 4)·0.5 epochs — full
    copies for everyone, plus a deterministic splitmix64-threshold
    half-sample for the fractional part.  Shuffle-free: the epoch table
    ships in the closure; expansion is one vectorized take per batch.
    Oracle replays the hash threshold bit-exactly (same splitmix64 CTE
    as q106, seed 7) and expands copies with generate_series."""
    from ..stages.sampling import epoch_mix

    epochs = {f"src{i}": 1 + (i % 4) * 0.5 for i in range(20)}
    out = epoch_mix(
        _read(sf_dir, "documents", ["doc_id", "source"]),
        epochs, source_col="source", id_col="doc_id", seed=7,
    ).to_pandas()
    return out.sort_values(["doc_id", "epoch"]).reset_index(drop=True)


def q109_cap_per_source(sf_dir: str) -> pd.DataFrame:
    """Per-group cap (FineWeb per-domain rule): keep at most 7 docs per
    source, selected by seeded splitmix64 hash order — uniform and
    layout-independent, not first-k-by-position.  Per-batch partial
    head-k bounds the one finishing cogroup at k×blocks rows per group
    (hot groups cannot overload a reducer).  Oracle ranks the bit-exact
    hash replay with a window function."""
    from ..stages.sampling import cap_per_group

    out = cap_per_group(
        _read(sf_dir, "documents", ["doc_id", "source"]),
        group_col="source", id_col="doc_id", k=7, seed=11,
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q110_subtract_corpus(sf_dir: str) -> pd.DataFrame:
    """Cross-corpus exact subtraction (held-out decontamination by
    exact content match): documents minus every row whose text appears
    in the held-out set (doc_id % 10 == 0) — exact dups of held-out
    text drop even under different ids.  Both sides hash text
    vectorized; the finish is a bloom_anti_join on the hash (map-side
    fast path for definite non-members).  Oracle: NOT IN over raw
    text."""
    from ..stages.dedup import subtract_exact

    docs = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def held(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 10 == 0))

    heldout = docs.map_batches(held, batch_format="pyarrow")
    out = subtract_exact(docs, heldout, col="text").to_pandas()
    return (
        out[["doc_id", "source"]].sort_values("doc_id").reset_index(drop=True)
    )


def q111_covariance(sf_dir: str) -> pd.DataFrame:
    """Distributed covariance of the embedding table (the whitening
    moment pass, stages/linalg): ONE shuffle-free scan emits a (n, Σx,
    X'X) moment row per batch — d+d² floats, never row-count-sized — and
    the driver folds blocks-many rows.  Output: upper-triangle (i, j,
    cov).  Oracle replays E[xy] − μμ' relationally over unnested
    dimension pairs."""
    from ..stages.linalg import covariance

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    _, cov = covariance(ds, vec_col="embedding")
    iu = np.triu_indices(cov.shape[0])
    out = pd.DataFrame(
        {"i": iu[0].astype(np.int64), "j": iu[1].astype(np.int64), "cov": cov[iu]}
    )
    return _finalize(out, {"cov": 6})


def q108_within_doc_segment_dedup(sf_dir: str) -> pd.DataFrame:
    """Intra-document segment dedup (Dolma's within-doc rule): keep the
    first occurrence of every distinct 2-word segment inside each
    document, order preserved.  Shuffle-FREE — one scan, vectorized
    drop_duplicates over the batch's exploded (row, segment) table.
    Oracle replays the q95 resegmentation with min(s) firsts + ordered
    string_agg."""
    from ..stages.clean import dedup_segments_within_doc

    out = dedup_segments_within_doc(
        _read(sf_dir, "documents", ["doc_id", "text"]), words_per_seg=2
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_Q205_SPLIT_US = 1_705_363_200_000_000  # epoch us of 2024-01-16 00:00:00 UTC


def q201_spearman_drift(sf_dir: str) -> pd.DataFrame:
    """Per-event-type Spearman rank correlation of value vs time
    (stages/trend.grouped_spearman) — the monotone drift detector that
    is robust to the outliers the OLS trend (q157) is not.  Ranks use
    the average-tie convention, centered so every moment term is a
    multiple of 0.25 (fold-order drift ~n·ulp, absorbed by round-6);
    all-tied axes excluded on both sides (exact-zero test).  Scale
    shape: ONE coarse group-hash partition shuffle, vectorized
    per-group ranks inside, group-count driver fold.  Oracle: GENERATED
    by spearman_sql (rank() + (ties-1)/2 replay, identical centering
    and division)."""
    from ..stages.trend import grouped_spearman

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["value"]))
        x = t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {"event_type": t["event_type"], "x": x, "y": t["value"]}
        )

    return grouped_spearman(
        ds.map_batches(prep, batch_format="pyarrow"),
        group_col="event_type", x_col="x", y_col="y",
    )


def q202_user_modal_event(sf_dir: str) -> rd.Dataset:
    """Most frequent event type per user (stages/profile.grouped_mode)
    — the modal-label rollup whose ranking key is a per-(group, value)
    COUNT, which the row-value top-k family (q29) can't express.
    Deterministic ties: highest count, then smallest type.  Scale
    shape: per-batch Arrow count partials → ONE coarse user-hash
    partition shuffle (the q186 many-tiny-groups lesson) → one row per
    user streams from map_groups.  Oracle: GENERATED by
    grouped_mode_sql (row_number over (count DESC, value ASC))."""
    from ..stages.profile import grouped_mode

    return grouped_mode(
        _read(sf_dir, "events", ["user_id", "event_type"]),
        group_col="user_id", value_col="event_type",
    )


def q203_json_ld(sf_dir: str) -> rd.Dataset:
    """JSON-LD structured-data extraction
    (stages/html_meta.extract_json_ld): first-valid-block @type/name
    plus parseable-block count from synthesized pages covering both
    quote styles, a BROKEN first block (trailing comma — consumers
    skip, not fail), multiple valid blocks, a top-level array (out of
    scope, skipped), a javascript decoy with braces, and pages with no
    JSON-LD at all.  The schema.org metadata feeds entity-aware dedup
    and retrieval the plain-text extractors can't see.  Scale shape:
    ONE shuffle-free scan, html never outlives the task.  Oracle: emits
    the PLANTED truth via CASE — any parse miss on any variant
    diverges."""
    from ..stages.html_meta import extract_json_ld

    ds = _read(sf_dir, "documents", ["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for dv in d:
            parts = ["<html><head>",
                     '<script type="text/javascript">var x = {a: 1};</script>']
            m = dv % 5
            if m == 0:
                parts.append(
                    '<script type="application/ld+json">'
                    f'{{"@type": "Article", "name": "Item {dv % 23}"}}'
                    "</script>"
                )
            elif m == 1:
                # broken first block (trailing comma), valid second
                parts.append(
                    '<script type="application/ld+json">'
                    f'{{"@type": "Product", "name": "Item {dv % 23}",}}'
                    "</script>"
                )
                parts.append(
                    "<script type='application/ld+json'>"
                    f'{{"@type": "Product", "name": "Item {dv % 23}"}}'
                    "</script>"
                )
            elif m == 2:
                # two valid blocks: first wins; second still counted
                parts.append(
                    '<script type="application/ld+json">'
                    f'{{"@type": "NewsArticle", "name": "Item {dv % 23}"}}'
                    "</script>"
                )
                parts.append(
                    '<script type="application/ld+json">'
                    '{"@type": "WebSite", "name": "decoy"}'
                    "</script>"
                )
            elif m == 3:
                # top-level array: documented out of scope — not counted
                parts.append(
                    '<script type="application/ld+json">'
                    '[{"@type": "Article", "name": "in-array"}]'
                    "</script>"
                )
            parts.append("</head><body><p>filler</p></body></html>")
            payloads.append("\n".join(parts).encode("utf-8"))
        return pa.table(
            {"doc_id": t["doc_id"], "html": pa.array(payloads, type=pa.binary())}
        )

    return extract_json_ld(
        ds.map_batches(mk, batch_format="pyarrow"), keep_cols=["doc_id"]
    )


def q204_containment_join(sf_dir: str) -> rd.Dataset:
    """Asymmetric shingle-containment self-join
    (stages/simjoin.containment_join): ordered pairs (a contained in b)
    with |S(a)∩S(b)| >= 0.8·|S(a)| over documents plus derived QUOTE
    docs (the first ceil(3n/5) words of every 11th document, id + 10^6)
    — the excerpt/truncated-mirror detector Jaccard (q155) misses
    because a short quote inside a long page has J ≈ 0.  Integer
    threshold arithmetic; prefix filter on the probe side, full
    postings on the indexed side, verify cogroup on b.  Scale shape:
    one profile scan, one vocab shuffle → broadcast, one candidate
    shuffle, one pair dedup, one verify cogroup — all bounded, caps
    loud.  Oracle: GENERATED by containment_join_sql over the SAME
    union (the quote derivation is replayed with list_slice — exact
    word semantics both sides)."""
    from ..stages.simjoin import containment_join

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def derive(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t["text"].to_pylist()
        out_id, out_tx = [], []
        for dv, tx in zip(ids, texts):
            out_id.append(int(dv))
            out_tx.append(tx)
            if dv % 11 == 0:
                words = (tx or "").split()
                n = len(words)
                if n >= 5:
                    k = (3 * n + 4) // 5  # ceil(3n/5)
                    out_id.append(int(dv) + 1_000_000)
                    out_tx.append(" ".join(words[:k]))
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "text": pa.array(out_tx, type=pa.string()),
            }
        )

    return containment_join(
        ds.map_batches(derive, batch_format="pyarrow"),
        id_col="doc_id", text_col="text", threshold=(4, 5), ngram=3,
    )


def q205_welch_drift(sf_dir: str) -> pd.DataFrame:
    """Per-event-type Welch two-sample test between the early and late
    halves of the stream (stages/trend.welch_drift, split at
    2024-01-16) — the significance layer on top of the mean-delta
    drift report (q190): a mean shift on 3 events is noise, the same
    shift on 30k is a regression.  Explicit textbook variance / t / df
    expressions on both sides (not engine-internal var_samp).  Scale
    shape: TPC-H-Q1 moment partials per (key, side), ONE tiny groupby,
    key-count driver fold.  Oracle: GENERATED by welch_drift_sql."""
    from ..stages.trend import welch_drift

    return welch_drift(
        _read(sf_dir, "events", ["ts", "event_type", "value"]),
        key_col="event_type", ts_col="ts", value_col="value",
        split_us=_Q205_SPLIT_US,
    )


def q206_apply_changelog(sf_dir: str) -> rd.Dataset:
    """CDC changelog compaction (stages/changelog.apply_changelog) —
    the Delta/Hudi-style merge an incremental crawl store runs between
    recrawls: base snapshot + upsert/delete log → new snapshot, winner
    per url = greatest seq, delete winners drop, log-only urls insert.
    Base = every document's url; log touches every 3rd doc (delete when
    doc_id%9==0, else upsert with new content) and inserts a fresh url
    for every 10th doc.  Scale shape: lazy union + ONE url-hash coarse
    cogroup; output streams.  Oracle: GENERATED by apply_changelog_sql
    over the same printf-rebuilt base and log CTEs."""
    from ..stages.changelog import apply_changelog

    ds = _read(sf_dir, "documents", ["doc_id"])

    def base(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "url": pa.array(
                    [f"https://h{(dd * 48271) % 29:02d}.example.org/p/{dd}"
                     for dd in d],
                    type=pa.string(),
                ),
                "content_hash": pa.array(
                    [f"c{dd}" for dd in d], type=pa.string()
                ),
            }
        )

    def log(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        urls, seqs, ops, hs = [], [], [], []
        for dd in d:
            if dd % 3 == 0:
                urls.append(
                    f"https://h{(dd * 48271) % 29:02d}.example.org/p/{dd}"
                )
                seqs.append(int(dd))
                ops.append("delete" if dd % 9 == 0 else "upsert")
                hs.append("" if dd % 9 == 0 else f"n{dd}")
            if dd % 10 == 0:
                urls.append(f"https://new.example.org/p/{dd}")
                seqs.append(int(dd) + 1)
                ops.append("upsert")
                hs.append(f"i{dd}")
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "seq": pa.array(seqs, type=pa.int64()),
                "op": pa.array(ops, type=pa.string()),
                "content_hash": pa.array(hs, type=pa.string()),
            }
        )

    return apply_changelog(
        ds.map_batches(base, batch_format="pyarrow"),
        ds.map_batches(log, batch_format="pyarrow"),
        key_col="url",
        value_cols=("content_hash",),
    )


def q207_global_rank(sf_dir: str) -> rd.Dataset:
    """Distributed global rank (stages/ranksort.global_rank): every
    non-null-valued event's 1-based position in the total order
    (value ASC, event_id ASC) — computed WITHOUT a global sort via the
    sample-based range partitioner (per-block order-statistic samples →
    cuts → ONE bucket shuffle → in-bucket sort + prefix offsets; cuts
    affect placement, never the rank).  Oracle: GENERATED by
    global_rank_sql — one row_number window over the same filter."""
    from ..stages.ranksort import global_rank

    ds = _read(sf_dir, "events", ["event_id", "value"]).map_batches(
        lambda t: t.filter(pc.is_valid(t["value"])), batch_format="pyarrow"
    )
    return global_rank(ds, key_col="value", id_col="event_id")


def q208_group_sample(sf_dir: str) -> rd.Dataset:
    """Exact-k-per-language document sample
    (sampling.group_sample): each lang keeps its 20 smallest doc_ids in
    splitmix64 hash order — the hard-count stratified draw (per-language
    eval sets) the rate-based stratified_sample can't guarantee.
    Deterministic pure function of (ids, seed); per-batch keep-k
    combiner + ONE coarse group-hash shuffle.  Oracle: GENERATED by
    group_sample_sql (identical splitmix64 bits + row_number replay)."""
    from ..stages.sampling import group_sample

    return group_sample(
        _read(sf_dir, "documents", ["lang", "doc_id"]),
        k=20, group_col="lang", id_col="doc_id",
    )


def q209_ohlc_bars(sf_dir: str) -> rd.Dataset:
    """Hourly OHLC bars per user (resample.ohlc_bars): open/high/low/
    close/n per (user, hour) with deterministic (ts, event_id) tie
    order — the downsample that keeps within-bucket dynamics q153's
    last-write-wins discards.  ONE user-hash shuffle, vectorized
    reduceat per partition.  Oracle: GENERATED by ohlc_sql (row_number
    both directions + plain aggregates)."""
    from ..stages.resample import ohlc_bars

    ds = _read(sf_dir, "events", ["user_id", "ts", "value", "event_id"])

    def drop_null(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t["value"]))

    return ohlc_bars(
        ds.map_batches(drop_null, batch_format="pyarrow"),
        every_us=3_600_000_000,
    )


def q210_heading_outline(sf_dir: str) -> rd.Dataset:
    """Heading-outline extraction (html_meta.extract_outline): one row
    per well-formed h1–h6 over synthesized pages — every doc has an h1,
    every 3rd adds an h2 with inline markup + entities, every 5th an h3
    with attributes and ragged whitespace; every page also carries an
    <h7> decoy and an UNCLOSED h4 that must not match.  ONE shuffle-free
    scan; html never outlives its task.  Oracle: emits the PLANTED
    truth (three UNION branches with the position CASE) — any parse
    miss on any variant diverges."""
    from ..stages.html_meta import extract_outline

    ds = _read(sf_dir, "documents", ["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = []
        for dv in d:
            parts = [f"<html><body><h1>Title {dv % 17}</h1><p>x</p>"]
            parts.append("<h7>decoy</h7><h4 class='x'>never closed")
            if dv % 3 == 0:
                parts.append(
                    "<h2 id='c'>Chapter <em>two</em> &amp; more</h2>"
                )
            if dv % 5 == 0:
                parts.append(
                    f"<h3 data-k=\"v\">\n  deep   dive {dv % 7}\n</h3>"
                )
            parts.append("</body></html>")
            payloads.append("".join(parts).encode("utf-8"))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "html": pa.array(payloads, type=pa.binary()),
            }
        )

    return extract_outline(ds.map_batches(mk, batch_format="pyarrow"))


def q211_running_totals(sf_dir: str) -> rd.Dataset:
    """Per-event running count and running value sum over the user's
    whole history (sequence.running_totals) — the UNBOUNDED-PRECEDING
    window family the fixed-frame rolling ops (q154) don't cover.
    Null values filtered on BOTH sides (SQL sum skips NULLs; the int64
    micro-unit cumsum can't).  ONE user-hash coarse shuffle, vectorized
    segment cumsum.  Oracle: GENERATED by running_totals_sql."""
    from ..stages.sequence import running_totals

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    return running_totals(
        ds.map_batches(
            lambda t: t.filter(pc.is_valid(t["value"])),
            batch_format="pyarrow",
        ),
        key_col="user_id", ts_col="ts", id_col="event_id",
        value_col="value",
    )


def q212_interarrival(sf_dir: str) -> rd.Dataset:
    """Per-user inter-event gap statistics (sequence.interarrival_stats)
    — n_gaps / mean / min / max seconds between consecutive events, the
    crawl-politeness / user-cadence diagnostic.  Single-event users
    drop (no gaps), matching the SQL lag-CTE.  Integer-microsecond gap
    arithmetic until the final divide.  ONE user-hash coarse shuffle.
    Oracle: GENERATED by interarrival_sql."""
    from ..stages.sequence import interarrival_stats

    return interarrival_stats(
        _read(sf_dir, "events", ["event_id", "ts", "user_id"]),
        key_col="user_id", ts_col="ts", id_col="event_id",
    )


def q213_attribution(sf_dir: str) -> rd.Dataset:
    """Last-touch attribution (sequence.last_touch_attribution): for
    every purchase, the user's most recent strictly-preceding
    non-purchase event — ``lag(... ) IGNORE NULLS`` as a vectorized
    segmented forward-fill, not a self-join.  First-touch-less
    conversions keep SQL LEFT semantics in the operator; THIS query
    coalesces them to (-1, '') on both sides so the driver's value hash
    sees no nullable-int dtype skew.  ONE user-hash coarse shuffle.
    Oracle: GENERATED by attribution_sql (+ the same coalesce)."""
    from ..stages.sequence import last_touch_attribution

    out = last_touch_attribution(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]),
        key_col="user_id", ts_col="ts", id_col="event_id",
        type_col="event_type", conversion="purchase",
    )

    def fill(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "touch_id": pc.fill_null(
                    t["touch_id"].cast(pa.int64()), -1
                ),
                "touch_type": pc.fill_null(t["touch_type"], ""),
            }
        )

    return out.map_batches(fill, batch_format="pyarrow")


def q214_cusum_drift(sf_dir: str) -> rd.Dataset:
    """Per-event-type CUSUM change-point screen (sequence.cusum_drift):
    0-anchored max-minus-min range of the cumulative deviations from
    the key's own mean, plus the sd·sqrt(n)-normalized statistic — the
    ORDER-SENSITIVE drift test (a level shift mid-stream scores high
    even when the Welch halves (q205) average it away).  Null values
    filtered both sides.  ONE key-hash shuffle, two vectorized passes.
    Oracle: GENERATED by cusum_sql (pure window algebra replay)."""
    from ..stages.sequence import cusum_drift

    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])
    return cusum_drift(
        ds.map_batches(
            lambda t: t.filter(pc.is_valid(t["value"])),
            batch_format="pyarrow",
        ),
        key_col="event_type", ts_col="ts", id_col="event_id",
        value_col="value",
    )


def q215_unpivot(sf_dir: str) -> rd.Dataset:
    """Wide→long melt (reshape.unpivot): lineitem's four measure
    columns become (metric, value) rows — the inverse of the q58 pivot
    and the canonical shape for the per-metric profiling family (q190's
    drift report consumes exactly this layout).  Shuffle-free, 4× rows,
    streams block by block.  Oracle: GENERATED by unpivot_sql (UNION
    ALL of one SELECT per measure)."""
    from ..stages.reshape import unpivot

    return unpivot(
        _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_linenumber", "l_quantity",
             "l_extendedprice", "l_discount", "l_tax"],
        ),
        id_cols=["l_orderkey", "l_linenumber"],
        value_cols=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


def q216_benford(sf_dir: str) -> pa.Table:
    """Benford first-significant-digit audit per event type
    (profile.benford_profile) — the fabricated-feed screen: per (group,
    digit 1–9) observed count and share vs log10(1+1/d), plus the
    group's 9-cell chi-square.  Values quantized at 2 decimals; null
    and non-positive values drop on both sides.  Shuffle-free ≤9-rows-
    per-(batch,group) partials, (groups×9) driver fold.  Oracle:
    GENERATED by benford_sql over the same null-filtered view."""
    from ..stages.profile import benford_profile

    ds = _read(sf_dir, "events", ["event_type", "value"])
    return benford_profile(
        ds.map_batches(
            lambda t: t.filter(pc.is_valid(t["value"])),
            batch_format="pyarrow",
        ),
        group_col="event_type", value_col="value", decimals=2,
    )


def q217_kwic(sf_dir: str) -> rd.Dataset:
    """Keyword-in-context snippets (kwic.kwic_snippets): for every
    document containing 'window merge', the 1-based codepoint position
    of its first occurrence and ±40 codepoints of context — the
    concordance / search-result view.  Vectorized str.find; only
    matched rows pay the O(snippet) slice.  Shuffle-free scan.
    Oracle: GENERATED by kwic_sql (strpos/substr are codepoint-based,
    matching Python slicing)."""
    from ..stages.kwic import kwic_snippets

    return kwic_snippets(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        term="window merge", id_col="doc_id", text_col="text", context=40,
    )


def q218_weighted_median(sf_dir: str) -> pa.Table:
    """Per-language byte-weighted median document length
    (selection.weighted_median_by_group): the n_chars value below which
    half the language's corpus BYTES lie — the size-biased median that
    tells you what a typical BYTE of corpus looks like (the unweighted
    median (q17 family) tells you what a typical DOCUMENT looks like;
    under web-scale doc-size skew they differ wildly).  Exact via the
    histogram-refinement discipline with int64 weight sums riding next
    to the counts — no sort, driver holds groups × bins rows.  Oracle:
    GENERATED by weighted_median_sql (RANGE-framed cumulative weight)."""
    from ..stages.selection import weighted_median_by_group

    return weighted_median_by_group(
        _read(sf_dir, "documents", ["lang", "n_chars"]),
        value_col="n_chars", weight_col="n_chars", group_col="lang",
    )


def q219_ks_drift(sf_dir: str) -> rd.Dataset:
    """Per-event-type exact two-sample Kolmogorov-Smirnov test between
    the early and late halves of the stream (trend.ks_drift, split at
    2024-01-16) — the DISTRIBUTION-shift screen: Welch (q205) misses a
    variance blow-up or a bimodal split with an unchanged mean; the max
    ECDF gap doesn't.  Distinct-value count partials → ONE key-hash
    shuffle → vectorized segment cumsums; per-key state is distinct-
    value-sized.  Oracle: GENERATED by ks_drift_sql."""
    from ..stages.trend import ks_drift

    return ks_drift(
        _read(sf_dir, "events", ["ts", "event_type", "value"]),
        key_col="event_type", ts_col="ts", value_col="value",
        split_us=_Q205_SPLIT_US,
    )


def q220_keyness(sf_dir: str) -> pd.DataFrame:
    """Distinctive terms per source by Dunning log-likelihood keyness
    (text_analysis.keyness_by_group): each source's top-10
    overrepresented tokens vs the rest of the corpus, G² ranked — the
    "what characterizes this slice" screen corpus curation runs before
    choosing mixture weights.  Per-batch factorized (group, token)
    partials, ONE token-hash shuffle (a token's counts across groups
    co-locate, so c_w and the scores are partition-local), groups-sized
    totals broadcast, parts × groups × k driver fold.  Oracle:
    GENERATED by keyness_sql (identical float order, unrounded-G²
    ordering)."""
    from ..stages.text_analysis import keyness_by_group

    return keyness_by_group(
        _read(sf_dir, "documents", ["source", "text"]),
        text_col="text", group_col="source", top_k=10, min_count=5,
    )


def q221_psi_drift(sf_dir: str) -> pd.DataFrame:
    """Per-event-type Population Stability Index between the early and
    late stream halves (trend.psi_drift, split 2024-01-16, 10 equi-
    width bins over each key's own range, continuity-smoothed shares) —
    the binned, magnitude-weighted drift score auditors threshold
    (<0.1 stable, >0.25 action) next to KS's exact sup-gap (q219).
    Scale shape: one min/max scan, one binned-count scan, ONE tiny
    groupby, keys×bins driver fold.  Oracle: GENERATED by psi_sql."""
    from ..stages.trend import psi_drift

    return psi_drift(
        _read(sf_dir, "events", ["ts", "event_type", "value"]),
        key_col="event_type", ts_col="ts", value_col="value",
        split_us=_Q205_SPLIT_US, n_bins=10,
    )


def q222_lang_source_independence(sf_dir: str) -> pd.DataFrame:
    """Mutual information + chi-square independence + Cramér's V
    between lang and source (profile.categorical_independence) — the
    "are my two mixture knobs confounded?" audit a corpus-mixture
    design runs before treating language and source as independent
    dials.  Full |X|×|Y| grid, zero cells contribute expectation to
    chi² and 0 to MI.  Scale shape: grid-sized Arrow partials, ONE tiny
    groupby, |X|·|Y| driver fold.  Oracle: GENERATED by
    independence_sql."""
    from ..stages.profile import categorical_independence

    return categorical_independence(
        _read(sf_dir, "documents", ["lang", "source"]),
        x_col="lang", y_col="source",
    )


def q223_trimmed_mean(sf_dir: str) -> pd.DataFrame:
    """Per-language inter-decile trimmed mean of document length
    (selection.trimmed_mean_by_group, trim=1/10): mean of n_chars
    between the exact 10th and 90th percentile values — the robust
    location that ignores the spam tail and truncation head without
    winsorize's (q114) clamping bias.  Threshold-based (values at exact
    ranks), so tie-safe.  Scale shape: histogram-refinement quantiles
    (no sort) + one filtered int64 moment scan.  Oracle: GENERATED by
    trimmed_mean_sql (row_number thresholds at the same ceil ranks)."""
    from fractions import Fraction as _F

    from ..stages.selection import trimmed_mean_by_group

    return trimmed_mean_by_group(
        _read(sf_dir, "documents", ["lang", "n_chars"]),
        value_col="n_chars", group_col="lang", trim=_F(1, 10),
    )


def q224_dedup_impact(sf_dir: str) -> pd.DataFrame:
    """Dedup impact sizing (mirrors.dedup_impact) over the q197 mirror
    corpus (md5 content hashes, bytes = n_chars): per duplicate-cluster
    size, how many clusters / pages exist and how many bytes keep-best
    dedup would reclaim — the report that decides whether the dedup
    compute is worth spending.  ONE content-hash coarse shuffle,
    sizes-bounded folds, exact int64 sums.  Oracle: GENERATED by
    dedup_impact_sql over the same md5 derivation."""
    from ..stages.mirrors import dedup_impact

    return dedup_impact(_q197_pages(sf_dir, with_bytes=True))


def q225_lateness_audit(sf_dir: str) -> rd.Dataset:
    """Per-user event-time lateness audit (sequence.lateness_audit):
    in arrival order (event_id), how often and by how much an event's
    timestamp lands BEHIND the user's running max — the watermark-
    sizing diagnostic that decides a streaming window's allowed
    lateness (q28/q84's operational prerequisite).  Integer-µs
    arithmetic; keys with no late events report NULL max/mean.  ONE
    user-hash shuffle + segmented cummax.  Oracle: GENERATED by
    lateness_sql (ROWS ... 1 PRECEDING window max)."""
    from ..stages.sequence import lateness_audit

    return lateness_audit(
        _read(sf_dir, "events", ["event_id", "ts", "user_id"]),
        key_col="user_id", ts_col="ts", id_col="event_id",
    )


def q226_session_copairs(sf_dir: str) -> pd.DataFrame:
    """Top co-occurring event-type pairs within sessions
    (markov.session_copairs, 30-min gaps): the unordered market-basket
    view next to the ORDERED transition matrix (q159) and top paths
    (q189) — an (error, purchase) pair surfaces "errors happen in
    buying sessions" even when never adjacent.  ONE user-hash shuffle,
    vectorized sessionize, enum-bounded pair expansion, pairs-sized
    driver fold.  Oracle: GENERATED by session_copairs_sql (the q12
    sessionize CTE + distinct self-join a<b)."""
    from ..stages.markov import session_copairs

    return session_copairs(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]),
        gap_s=1800, top_k=20,
    )


def q227_ntile(sf_dir: str) -> rd.Dataset:
    """SQL NTILE(4) per event type over (value, event_id) order
    (sequence.ntile_by_group): equal-population quartile labels — the
    spread-assignment primitive behind per-tier sampling and eval
    buckets; exact NTILE semantics (first n mod k tiles get one extra
    row), closed-form tile arithmetic, no per-tile loop.  Null values
    filtered both sides (ORDER BY NULL ambiguity removed).  ONE
    key-hash shuffle.  Oracle: GENERATED by ntile_sql."""
    from ..stages.sequence import ntile_by_group

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    return ntile_by_group(
        ds.map_batches(
            lambda t: t.filter(pc.is_valid(t["value"])),
            batch_format="pyarrow",
        ),
        k=4, key_col="event_type", value_col="value", id_col="event_id",
    )


def q228_km_conversion(sf_dir: str) -> pd.DataFrame:
    """Kaplan-Meier days-to-first-purchase curve
    (survival.km_conversion): right-censoring-aware conversion timing —
    users who never purchased are censored at their last event, not
    dropped (a naive mean of converter times is biased toward fast
    converters).  Steps at each distinct conversion day with at-risk
    counts and the survival product.  ONE user groupby (per-user rows
    leave it), days-sized driver fold, exp-of-window-sum SQL replay in
    the same accumulation order.  Oracle: GENERATED by km_sql."""
    from ..stages.survival import km_conversion

    return km_conversion(
        _read(sf_dir, "events", ["user_id", "ts", "event_type"]),
        key_col="user_id", ts_col="ts", type_col="event_type",
        conversion="purchase",
    )


def q229_quality_kappa(sf_dir: str) -> pd.DataFrame:
    """Cohen's kappa between two document quality raters
    (agreement.cohens_kappa): rater 1 = length rule (n_chars >= 256),
    rater 2 = wordcount rule (>= 50 whitespace tokens) — the
    chance-corrected agreement score that decides whether two cheap
    quality filters are measuring the same thing (raw agreement is
    inflated by skewed marginals).  Label-grid partials, ONE tiny
    groupby, single-row fold.  Oracle: GENERATED by kappa_sql over the
    same derived labels."""
    from ..stages.agreement import cohens_kappa

    ds = _read(sf_dir, "documents", ["text", "n_chars"])

    def label(t: pa.Table) -> pa.Table:
        nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t["text"].to_pylist()
        words = np.array(
            [len([w for w in (x or "").split() if w]) for x in texts],
            dtype=np.int64,
        )
        return pa.table(
            {
                "r1": pa.array(np.where(nc >= 256, "good", "bad")),
                "r2": pa.array(np.where(words >= 50, "good", "bad")),
            }
        )

    return cohens_kappa(
        ds.map_batches(label, batch_format="pyarrow"),
        rater1_col="r1", rater2_col="r2",
    )


def q230_ab_test(sf_dir: str) -> pd.DataFrame:
    """Pooled two-proportion z-test between two user variants
    (abtest.ab_conversion_test): variant = user_id parity, conversion =
    user has ≥1 purchase event — the experiment readout (rates, lift,
    z) next to Welch's mean test (q205) and the KM timing curve (q228).
    Unit of analysis is the USER (any-conversion), so heavy users don't
    dominate.  ONE user-hash groupby, 2-row fold.  Oracle: GENERATED
    by ab_test_sql over the same derived columns."""
    from ..stages.abtest import ab_conversion_test

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def derive(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = t["event_type"]
        return pa.table(
            {
                "user_id": t["user_id"],
                "variant": pa.array(np.where(u % 2 == 0, "A", "B")),
                "conv": pc.cast(
                    pc.equal(et, pa.scalar("purchase")), pa.int64()
                ),
            }
        )

    return ab_conversion_test(
        ds.map_batches(derive, batch_format="pyarrow"),
        key_col="user_id", variant_col="variant", conv_col="conv",
    )


def q231_daily_autocorr(sf_dir: str) -> pd.DataFrame:
    """Lag-1 autocorrelation of each event type's daily-count series
    (trend.grouped_autocorr): the volume-memory diagnostic next to
    q191's burst flags — consecutive-calendar-day pairs only (q166's
    calendar-sparse lag semantics), mean/denominator over all observed
    days.  ONE keys×days groupby, calendar-bounded driver fold.
    Oracle: GENERATED by autocorr_sql."""
    from ..stages.trend import grouped_autocorr

    return grouped_autocorr(
        _read(sf_dir, "events", ["event_type", "ts"]),
        key_col="event_type", ts_col="ts",
    )


def q232_calibration(sf_dir: str) -> pd.DataFrame:
    """Reliability table + ECE for a document-quality score
    (evaluation.calibration_bins): score = n_chars/(n_chars+300) — one
    IEEE division, bit-identical on both engines so bin edges can't
    drift — against the q229 wordcount label (≥50 tokens).  Says
    whether the score's VALUES (not just its ranking, q169's AUC) can
    be trusted as sampling weights.  Per-batch bin partials, ONE
    10-row groupby.  Oracle: GENERATED by calibration_sql."""
    from ..stages.evaluation import calibration_bins

    ds = _read(sf_dir, "documents", ["text", "n_chars"])

    def derive(t: pa.Table) -> pa.Table:
        nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        texts = t["text"].to_pylist()
        words = np.array(
            [len([w for w in (x or "").split() if w]) for x in texts],
            dtype=np.int64,
        )
        return pa.table(
            {
                "score": pa.array(nc / (nc + 300.0), type=pa.float64()),
                "label": pa.array(
                    (words >= 50).astype(np.int64), type=pa.int64()
                ),
            }
        )

    return calibration_bins(
        ds.map_batches(derive, batch_format="pyarrow"),
        score_col="score", label_col="label", n_bins=10,
    )


def q233_path_rollup(sf_dir: str) -> pd.DataFrame:
    """URL directory-prefix rollup (pathtree.path_prefix_rollup):
    pages + bytes per /section and /section/subsection across 29 hosts
    — the inside-the-host descent of q40's host stats that sizes
    per-directory crawl budgets.  Vectorized split_part-convention
    parse, depth-bounded explode collapsed by per-batch partials, ONE
    prefix-space groupby.  Oracle: GENERATED by path_rollup_sql over
    the printf-rebuilt urls (q163's parse-replay pattern)."""
    from ..stages.pathtree import path_prefix_rollup

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def mk(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        urls = [
            f"https://h{(dv * 48271) % 29:02d}.example.org/"
            f"s{dv % 7}/t{dv % 11}/p{dv}"
            for dv in d
        ]
        return pa.table(
            {"url": pa.array(urls, type=pa.string()), "n_bytes": t["n_chars"]}
        )

    out = path_prefix_rollup(
        ds.map_batches(mk, batch_format="pyarrow"),
        url_col="url", bytes_col="n_bytes", max_depth=2,
    ).to_pandas()
    return (
        out.sort_values(["host", "prefix"])
        .reset_index(drop=True)[["host", "prefix", "depth", "n_pages", "n_bytes"]]
    )


def q234_position_attribution(sf_dir: str) -> pd.DataFrame:
    """Position-based (40/20/40 U-shaped) multi-touch attribution
    (sequence.position_attribution): every session gets ONE unit of
    credit split first/middles/last — the multi-touch complement of
    q213's last-touch rule, over the same q12 gap-sessionize
    convention.  ONE user-hash coarse shuffle, closed-form per-segment
    position arithmetic, driver folds |event_type| rows.  Oracle:
    GENERATED by position_attribution_sql over events directly."""
    from ..stages.sequence import position_attribution

    return position_attribution(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]),
        key_col="user_id", ts_col="ts", id_col="event_id",
        type_col="event_type",
    )


def _q235_caps_batch(t: pa.Table) -> pa.Table:
    """The q235/q247 multi-snapshot capture fixture (Arrow half of the
    shared scheme — the SQL half is _Q235_CAPS): doc d gets 1 + d%4
    captures at integer crawl ordinals 0..k, content flips to a ':v2'
    hash at ordinal 1 + d%3, every 23rd doc's ordinal-1 capture is a
    NULL hash (exercises the null-safe IS-DISTINCT-FROM boundary)."""
    import hashlib as _hl

    d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = t["text"].to_pylist()
    urls: list[str] = []
    ords: list[int] = []
    hs: list[str | None] = []
    for dd, txt in zip(d, texts):
        h_base = _hl.md5(txt.encode()).hexdigest()
        h_v2 = _hl.md5((txt + ":v2").encode()).hexdigest()
        change = 1 + dd % 3
        for k in range(1 + dd % 4):
            urls.append(
                f"https://h{(dd * 48271) % 97:03d}.example.org/p/{dd}"
            )
            ords.append(k)
            if dd % 23 == 0 and k == 1:
                hs.append(None)
            elif k < change:
                hs.append(h_base)
            else:
                hs.append(h_v2)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "ts": pa.array(ords, type=pa.int64()),
            "content_hash": pa.array(hs, type=pa.string()),
        }
    )


def q235_scd2_history(sf_dir: str) -> pd.DataFrame:
    """SCD-2 intervalization of a multi-snapshot capture table
    (snapshots.scd2_history): each url's capture sequence collapses to
    content RUNS with (valid_from, valid_to, version) — the history
    table an incremental corpus keeps for point-in-time reconstruction.
    Captures are synthesized from documents (q133's url scheme): doc d
    gets 1 + d%4 captures at integer crawl ordinals 0..k, content
    flips to a ':v2' hash at ordinal 1 + d%3, and every 23rd doc's
    ordinal-1 capture carries a NULL hash to exercise the null-safe
    IS-DISTINCT-FROM run boundary on both engines.  ONE salted
    key-hash shuffle, vectorized shift compare, one output row per RUN.
    NULL valid_to (current version) coalesces to -1 on both sides so
    the driver's value hash sees no nullable-int dtype skew (q213
    precedent).  Oracle: GENERATED by scd2_sql over the same
    generate_series-rebuilt captures."""
    from ..stages.snapshots import scd2_history

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    out = scd2_history(
        ds.map_batches(_q235_caps_batch, batch_format="pyarrow"),
        key_col="url", ts_col="ts", hash_col="content_hash",
    ).to_pandas()
    out["valid_from"] = out["valid_from"].astype(np.int64)
    out["valid_to"] = out["valid_to"].fillna(-1).astype(np.int64)
    out["version"] = out["version"].astype(np.int64)
    return (
        out.sort_values(["url", "valid_from"])
        .reset_index(drop=True)
        [["url", "content_hash", "valid_from", "valid_to", "version"]]
    )


def q236_lexical_diversity(sf_dir: str) -> pd.DataFrame:
    """Per-source lexical diversity (text_analysis.lexical_diversity):
    tokens / types / hapax / TTR / hapax share per source — the
    vocabulary-health screen next to q220's keyness (WHICH terms
    differ vs HOW MUCH vocabulary each slice carries).  Per-batch
    factorized (source, token) partials, ONE token-hash groupby, a
    shuffle-free fold to per-source triples, driver holds |sources|
    rows.  Oracle: GENERATED by lexical_diversity_sql (string_split
    tokenizer convention)."""
    from ..stages.text_analysis import lexical_diversity

    return lexical_diversity(
        _read(sf_dir, "documents", ["text", "source"]),
        text_col="text", group_col="source",
    )


def q237_tag_histogram(sf_dir: str) -> pd.DataFrame:
    """HTML tag-frequency profile per host (tagstats.tag_histogram):
    <p>/<div>/<a> opener counts + page counts per host over
    deterministic repeat()-built markup (1 + d%5 paragraphs, d%4
    link divs, q233's 29-host scheme) — the structural fingerprint
    read BEFORE extraction (link farms vs article hosts).  The html
    travels as BINARY to exercise the zero-copy cast; counters only
    leave each task (per-batch Arrow group_by partial, ONE 29-row
    groupby).  Oracle: GENERATED by tag_histogram_sql via the
    length-difference substring-count identity over the same
    repeat()-rebuilt markup."""
    from ..stages.tagstats import tag_histogram

    ds = _read(sf_dir, "documents", ["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hosts = [f"h{(dd * 48271) % 29:02d}.example.org" for dd in d]
        html = [
            (
                "<html><body>"
                + "<p>x</p>" * (1 + int(dd) % 5)
                + '<div><a href="/x">l</a></div>' * (int(dd) % 4)
                + "</body></html>"
            ).encode()
            for dd in d
        ]
        return pa.table(
            {
                "host": pa.array(hosts, type=pa.string()),
                "html": pa.array(html, type=pa.binary()),
            }
        )

    out = tag_histogram(
        ds.map_batches(mk, batch_format="pyarrow"),
        html_col="html", group_col="host",
    ).to_pandas()
    out = out.rename(columns={"g": "host"})
    return (
        out.sort_values("host")
        .reset_index(drop=True)[["host", "n_pages", "n_p", "n_div", "n_a"]]
    )


def q238_zipf_slope(sf_dir: str) -> pd.DataFrame:
    """Zipf rank-frequency fit per source
    (text_analysis.zipf_slope_by_group): OLS slope/intercept of
    log-freq on log-rank over each source's top-512 tokens — the
    vocabulary-SHAPE health check next to q236's vocabulary-SIZE
    screen.  ONE token-hash shuffle + per-block per-group top-K
    partials; driver folds sources × K rows.  Oracle: GENERATED by
    zipf_sql (identical rank tie-break and closed-form OLS)."""
    from ..stages.text_analysis import zipf_slope_by_group

    return zipf_slope_by_group(
        _read(sf_dir, "documents", ["text", "source"]),
        text_col="text", group_col="source", top_k=512,
    )


def q239_mann_whitney(sf_dir: str) -> pd.DataFrame:
    """Mann-Whitney U rank-sum test between the q230 user-parity
    variants over per-event value (abtest.mann_whitney_u): the
    nonparametric location test next to Welch (q205, means) and the
    pooled z (q230, proportions).  Range-bucketed tie-averaged rank
    partials — ONE bucket groupby, driver folds num_buckets rows.
    Oracle: GENERATED by mann_whitney_sql (per-distinct-value
    cumulative form; rank sums are dyadic halves, so both engines are
    exact)."""
    from ..stages.abtest import mann_whitney_u

    ds = _read(sf_dir, "events", ["user_id", "value"])

    def derive(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "variant": pa.array(np.where(u % 2 == 0, "A", "B")),
                "value": t["value"],
            }
        )

    return mann_whitney_u(
        ds.map_batches(derive, batch_format="pyarrow"),
        variant_col="variant", value_col="value",
    )


def q240_rfm_segments(sf_dir: str) -> pd.DataFrame:
    """RFM quintile segmentation over the event stream
    (rfm.rfm_segments): recency/frequency/monetary quintile scores per
    user folded to ≤125 segment rows — the per-user VALUE rollup next
    to cohort (q151) and funnel (q150).  Integer metrics throughout
    (days / counts / cents), so threshold comparisons cannot drift.
    ONE user shuffle + histogram-refinement thresholds + shuffle-free
    scoring scan.  Oracle: GENERATED by rfm_sql."""
    from ..stages.rfm import rfm_segments

    return rfm_segments(
        _read(sf_dir, "events", ["user_id", "ts", "value"]),
    )


def q241_stickiness(sf_dir: str) -> pd.DataFrame:
    """DAU/MAU stickiness per event type (trend.stickiness): average
    daily actives over average monthly actives — the engagement-depth
    ratio next to q185's daily monitor and q231's autocorrelation.
    ONE (type, day, user) distinct shuffle; month level re-dedups the
    day-distinct triples; int-ratio folds.  Oracle: GENERATED by
    stickiness_sql."""
    from ..stages.trend import stickiness

    return stickiness(
        _read(sf_dir, "events", ["event_type", "ts", "user_id"]),
    )


def q242_vocab_overlap(sf_dir: str) -> pd.DataFrame:
    """Pairwise vocabulary Jaccard between sources
    (text_analysis.vocab_overlap): which sources are near-clones of
    each other BEFORE any per-document dedup — the cross-corpus
    similarity screen over distinct token sets.  ONE token-hash
    shuffle (shared with q236/q238's counts stage) + a token-partition
    self-merge pair emission; driver folds |sources|² rows.  Oracle:
    GENERATED by vocab_overlap_sql (distinct self-join on token)."""
    from ..stages.text_analysis import vocab_overlap

    return vocab_overlap(
        _read(sf_dir, "documents", ["text", "source"]),
        text_col="text", group_col="source",
    )


def q243_source_jsd(sf_dir: str) -> pd.DataFrame:
    """Pairwise Jensen-Shannon divergence between per-source unigram
    DISTRIBUTIONS (text_analysis.jsd_by_group): the distributional
    complement of q242's set-based vocabulary Jaccard (shared tokens,
    different weights ⇒ Jaccard 1, JSD ≫ 0) — the corpus-similarity
    screen mixture design runs before picking sampling weights.  ONE
    token-hash shuffle (shared group_token_counts stage), groups-sized
    total fold, token-partition self-merge pair partials; driver folds
    |sources|² rows.  Pairs with no common token come out exactly ln 2
    on both engines.  Oracle: GENERATED by jsd_sql."""
    from ..stages.text_analysis import jsd_by_group

    return jsd_by_group(
        _read(sf_dir, "documents", ["text", "source"]),
        text_col="text", group_col="source",
    )


def q244_host_kcore(sf_dir: str) -> pd.DataFrame:
    """k-core decomposition (k=3) of a heterogeneous 97-host link graph
    (graph.kcore_members): iterative degree peel to the fixed point —
    the mutual-density certificate next to PageRank/HITS (rank vs
    cohesion; a pendant chain can't fabricate core membership).  The
    fixture is built to peel non-trivially: a degree-2 ring over all
    97 hosts (peels in round one) + a dense pseudo-random cluster on
    hosts 0..19 (survives).  Scale shape: ONE canonical-edge dedup
    shuffle, then per round ONE node-sized alive-mask broadcast + ONE
    shuffle-free bincount scan + a node-sized fold; RAISES past
    max_rounds (the oracle unrolls exactly that many layers, so the
    engines cannot silently diverge).  Oracle: GENERATED by kcore_sql
    over _Q244_EDGES (single-generator on both halves)."""
    from ..stages.graph import kcore_members

    ds = _read(sf_dir, "documents", ["doc_id"])
    H = 97
    hosts = np.array([f"h{i:03d}.example.org" for i in range(H)], dtype=object)

    def edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = (d * 48271) % H
        cl = d[d % 3 == 0]
        src = np.concatenate([base, (cl * 31) % 20])
        dst = np.concatenate([(base + 1) % H, (cl * 37 + 7) % 20])
        return pa.table({"src": pa.array(hosts[src], type=pa.string()),
                         "dst": pa.array(hosts[dst], type=pa.string())})

    return kcore_members(
        ds.map_batches(edges, batch_format="pyarrow"), k=3, max_rounds=12
    ).rename(columns={"node": "host"})


def q245_entry_exit(sf_dir: str) -> pd.DataFrame:
    """Session entry/exit/bounce profile per event type
    (sequence.entry_exit_pages): which types OPEN sessions, CLOSE
    them, or are one-event dead ends — the landing/abandonment screen
    next to last-touch (q213) and position (q234) attribution, over
    the same q12 gap-sessionize convention.  ONE user-hash coarse
    shuffle, vectorized per-partition sessionize + positional
    first/last (ASC row numbers, never a DESC re-sort — null-ts
    placement differs between engines under DESC); driver folds
    |types| rows.  Oracle: GENERATED by entry_exit_sql."""
    from ..stages.sequence import entry_exit_pages

    return entry_exit_pages(
        _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]),
        key_col="user_id", ts_col="ts", id_col="event_id",
        type_col="event_type",
    )


def q246_zorder_layout(sf_dir: str) -> pd.DataFrame:
    """Z-order (Morton) layout plan over (epoch-hour, user-shard) for
    the event stream (stages/zorder.zorder_layout): bit-interleave the
    two dimensions and bucket rows into target files by zkey prefix,
    then report per-file row counts and min/max of BOTH dimensions —
    the Delta/Iceberg OPTIMIZE-ZORDER primitive that makes time
    filters AND user filters prunable from one physical sort.  The
    user dimension is Fibonacci-hashed (uid · 2654435761 mod 2¹⁶) so
    both 16-bit lanes are actually exercised (raw uid/day values
    cluster in the low bits and would collapse every row into one
    file).  Shuffle-free SWAR spread scan + ONE |files|-sized groupby
    of min/max/count partials.  Oracle: GENERATED by zorder_sql
    (identical mask-and-shift chain as a nested BIGINT expression)."""
    import pyarrow.compute as pc

    from ..stages.zorder import zorder_layout

    ds = _read(sf_dir, "events", ["ts", "user_id"])

    def derive(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(t["ts"]), pc.is_valid(t["user_id"]))
        t = t.filter(keep)
        hour = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[h]").astype(np.int64)
        )
        uid = (
            t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            * np.int64(2654435761)
        )
        return pa.table({"hour": pa.array(hour), "ushard": pa.array(uid)})

    return zorder_layout(
        ds.map_batches(derive, batch_format="pyarrow"),
        x_col="hour", y_col="ushard", file_shift=26,
    )


def q247_change_rate(sf_dir: str) -> rd.Dataset:
    """Per-url content change-rate + revisit-priority bucket from the
    q235 multi-snapshot capture fixture (snapshots.change_rate): the
    Cho/Garcia-Molina-style frequency estimate an incremental crawl
    derives from its own history to size revisit intervals — feeds the
    crawl frontier (q146) the way q235's SCD-2 feeds point-in-time
    reads.  ONE salted url-hash shuffle, vectorized shift compare,
    lazy url-sized Dataset out (nothing returns to the driver).
    Single-capture urls report the −1.0 sentinel + 'unknown' (q235
    dtype convention).  Oracle: GENERATED by change_rate_sql over the
    same generate_series-rebuilt captures (_Q235_CAPS)."""
    from ..stages.snapshots import change_rate

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return change_rate(
        ds.map_batches(_q235_caps_batch, batch_format="pyarrow"),
        key_col="url", ts_col="ts", hash_col="content_hash",
    )


def q248_cocitation(sf_dir: str) -> pd.DataFrame:
    """Co-citation similarity between the q118 97-host graph's source
    hosts (graph.cocitation_similarity): Jaccard over distinct
    OUT-neighbour sets — "who links ALIKE", the link-structure twin of
    the content-based mirror detector (q198), with a deterministic
    in-degree cap excluding signal-free mega-hubs before the
    per-destination pair expansion.  ONE (src,dst) distinct shuffle +
    dst-partition self-merge; driver folds co-cited pairs only.
    Oracle: GENERATED by cocitation_sql over _Q118_EDGES
    (single-generator on both halves)."""
    from ..stages.graph import cocitation_similarity

    ds = _read(sf_dir, "documents", ["doc_id"])
    H = 97
    hosts = np.array([f"h{i:03d}.example.org" for i in range(H)], dtype=object)

    def edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = (d * 48271) % H
        hub_src = base[d % 4 == 0]
        src = np.concatenate([base, base, hub_src])
        dst = np.concatenate(
            [(base + 26) % H, (base + 52) % H,
             np.zeros(len(hub_src), dtype=np.int64)]
        )
        keep = src != dst
        return pa.table({"src": pa.array(hosts[src[keep]], type=pa.string()),
                         "dst": pa.array(hosts[dst[keep]], type=pa.string())})

    return cocitation_similarity(
        ds.map_batches(edges, batch_format="pyarrow")
    )


def q249_kendall_tau(sf_dir: str) -> pd.DataFrame:
    """Kendall τ-b between the daily volumes of 'click' and 'purchase'
    (trend.kendall_tau_daily): the tie-corrected rank-concordance
    drift statistic next to Spearman (q201) and the OLS trend (q177)
    — integer-exact C−D and tie terms, one days-sized groupby, an
    O(days²) driver fold bounded by the calendar.  Oracle: GENERATED
    by kendall_sql (identical i<j sign-product sum)."""
    from ..stages.trend import kendall_tau_daily

    return kendall_tau_daily(
        _read(sf_dir, "events", ["ts", "event_type"]),
        type_a="click", type_b="purchase",
    )


def q250_wilson_ranking(sf_dir: str) -> pd.DataFrame:
    """Host quality ranking by the Wilson 95% LOWER bound of the
    pass rate (abtest.wilson_lower_bound) over the q233 29-host
    scheme with the q229 length rule (n_chars ≥ 256) as the quality
    gate — the small-n-honest ranking that keeps a lucky ten-page
    host from jumping the re-crawl queue (raw-rate ranking does not).
    Shuffle-free integer moment partials + ONE 29-row groupby; the
    closed form runs once per host on the driver.  Oracle: GENERATED
    by wilson_sql over the same derived page table."""
    from ..stages.abtest import wilson_lower_bound

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def derive(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"host": pa.array(
                [f"h{dd:02d}.example.org" for dd in (d * 48271) % 29],
                type=pa.string()),
             "ok": pa.array((n >= 256).astype(np.int64))}
        )

    return wilson_lower_bound(
        ds.map_batches(derive, batch_format="pyarrow"),
        group_col="host", success_col="ok",
    )


def q251_union_coverage(sf_dir: str) -> rd.Dataset:
    """Per-user active time as the UNION of 5-minute activity windows
    (intervals.union_coverage): overlapping windows merge, so bursts
    don't double-count — the honest engagement-seconds metric next to
    q12's session counts, in exact integer µs end-to-end.  ONE
    user-hash coarse shuffle, vectorized sorted-stream sweep
    (Σ min(next−ts, window)), lazy |users|-sized Dataset out.
    Oracle: GENERATED by union_coverage_sql (identical lead/least
    integer form)."""
    from ..stages.intervals import union_coverage

    return union_coverage(
        _read(sf_dir, "events", ["user_id", "ts"]),
        key_col="user_id", ts_col="ts",
    )


def q252_longest_streak(sf_dir: str) -> rd.Dataset:
    """Longest consecutive-active-day streak per user
    (sequence.longest_daily_streak): the gaps-and-islands classic
    (day − rank constant within a run) — habit strength next to
    q241's stickiness and q184's churn.  Per-batch (user, day) dedup
    partials, ONE distinct shuffle, vectorized run-length scan, lazy
    |users|-sized Dataset out.  Oracle: GENERATED by streak_sql
    (row_number difference trick)."""
    from ..stages.sequence import longest_daily_streak

    return longest_daily_streak(
        _read(sf_dir, "events", ["user_id", "ts"]),
        key_col="user_id", ts_col="ts",
    )


def q253_approx_distinct(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog approximate distinct users per event type
    (sketches.approx_distinct_by_group, p=9): the per-slice
    cardinality screen that replaces an exact-distinct shuffle of
    corpus-sized (type, user) pairs with types × 512 register rows —
    and, unusually for a sketch, EXACTLY hash-checkable: the oracle
    replays the bit-exact splitmix64 registers (q106's generator),
    reads rho off bin(), and sums exact powers of two.  Per-batch
    max-rho partials, ONE register-sized groupby, types × 512 driver
    fold.  Oracle: GENERATED by approx_distinct_sql."""
    from ..stages.sketches import approx_distinct_by_group

    return approx_distinct_by_group(
        _read(sf_dir, "events", ["event_type", "user_id"]),
        group_col="event_type", value_col="user_id",
    )


def q254_revisit_schedule(sf_dir: str) -> pd.DataFrame:
    """Per-host revisit scheduling priorities
    (snapshots.revisit_priorities) — the capstone composing q247's
    per-url change rates into the number a crawl frontier consumes:
    priority = 0.5·share_fast + 0.5·max(mean_rate, 0) per host, with
    the −1.0 no-evidence sentinel.  ONE url-hash shuffle (inherited
    from change_rate) + a shuffle-free host-extraction partial scan +
    ONE |hosts| groupby.  Oracle: GENERATED by revisit_priorities_sql
    (the change-rate CTE verbatim + the same rollup)."""
    from ..stages.snapshots import revisit_priorities

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return revisit_priorities(
        ds.map_batches(_q235_caps_batch, batch_format="pyarrow"),
        key_col="url", ts_col="ts", hash_col="content_hash",
    )


_Q255_LANGS = ("en", "de", "fr", "es", "it")


def q255_hreflang_rollup(sf_dir: str) -> pd.DataFrame:
    """Per-target-language rollup of <link rel=alternate hreflang>
    head annotations (html_meta.hreflang_rollup) — the i18n surface a
    multilingual crawl reads to find translation clusters (the
    cheapest aligned-document candidates for parallel-corpus mining).
    Markup is rebuilt per doc (1 + d%6 links cycling a 5-language
    list, so some pages repeat a language: n_links ≠ n_pages) and
    travels as BINARY; the engine PARSES it with the compiled-regex
    scan while the oracle REGENERATES the counts arithmetically (the
    q237 build-vs-parse identity).  Shuffle-free count partials + ONE
    |langs| groupby.  Oracle: GENERATED inline over generate_series."""
    from ..stages.html_meta import hreflang_rollup

    ds = _read(sf_dir, "documents", ["doc_id"])

    def mk(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        html = []
        for dd in d:
            links = "".join(
                '<link rel="alternate" '
                f'hreflang="{_Q255_LANGS[(dd + i) % 5]}" '
                f'href="https://ex.org/{_Q255_LANGS[(dd + i) % 5]}/p/{dd}">'
                for i in range(1 + int(dd) % 6)
            )
            html.append(
                f"<html><head>{links}</head><body></body></html>".encode()
            )
        return pa.table({"html": pa.array(html, type=pa.binary())})

    return hreflang_rollup(
        ds.map_batches(mk, batch_format="pyarrow"), html_col="html"
    )


def q256_assortativity(sf_dir: str) -> pd.DataFrame:
    """Degree assortativity (Newman r) of the q244 heterogeneous
    ring+cluster graph (graph.assortativity): do hubs link hubs or
    leaves — the one-number degree-MIXING check next to the degree
    distribution (q171) and k-core (q244).  ONE canonical-edge dedup
    shuffle, node-sized degree fold, ONE shuffle-free moment scan with
    the degree vector broadcast once.  Oracle: GENERATED by
    assortativity_sql over _Q244_EDGES."""
    from ..stages.graph import assortativity

    ds = _read(sf_dir, "documents", ["doc_id"])
    H = 97
    hosts = np.array([f"h{i:03d}.example.org" for i in range(H)], dtype=object)

    def edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = (d * 48271) % H
        cl = d[d % 3 == 0]
        src = np.concatenate([base, (cl * 31) % 20])
        dst = np.concatenate([(base + 1) % H, (cl * 37 + 7) % 20])
        return pa.table({"src": pa.array(hosts[src], type=pa.string()),
                         "dst": pa.array(hosts[dst], type=pa.string())})

    return assortativity(ds.map_batches(edges, batch_format="pyarrow"))


def q257_reciprocity(sf_dir: str) -> pd.DataFrame:
    """Reciprocity of the DIRECTED q118 link graph
    (graph.reciprocity): what fraction of distinct edges are mutual —
    broadcast networks (spam points AT targets that never point back)
    vs partner networks; the hub edges make (0,26)/(0,52) mutual while
    the rotation edges stay one-way, so the fixture is non-trivial on
    both axes.  ONE distinct shuffle + a canonical direction-bit pair
    groupby; single counter row on the driver.  Oracle: GENERATED by
    reciprocity_sql over _Q118_EDGES."""
    from ..stages.graph import reciprocity

    ds = _read(sf_dir, "documents", ["doc_id"])
    H = 97
    hosts = np.array([f"h{i:03d}.example.org" for i in range(H)], dtype=object)

    def edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = (d * 48271) % H
        hub_src = base[d % 4 == 0]
        src = np.concatenate([base, base, hub_src])
        dst = np.concatenate(
            [(base + 26) % H, (base + 52) % H,
             np.zeros(len(hub_src), dtype=np.int64)]
        )
        keep = src != dst
        return pa.table({"src": pa.array(hosts[src[keep]], type=pa.string()),
                         "dst": pa.array(hosts[dst[keep]], type=pa.string())})

    return reciprocity(ds.map_batches(edges, batch_format="pyarrow"))


def q258_burstiness(sf_dir: str) -> pd.DataFrame:
    """Goh–Barabási burstiness B = (σ−μ)/(σ+μ) per event type over
    consecutive same-type gaps (sequence.burstiness_by_type): clock vs
    Poisson vs flash-crowd regularity — the axis mean gaps (q212) and
    daily autocorrelation (q231) can't see.  ONE type-hash coarse
    shuffle, vectorized diff, |types| driver fold.  Oracle: GENERATED
    by burstiness_sql (identical population moments)."""
    from ..stages.sequence import burstiness_by_type

    return burstiness_by_type(
        _read(sf_dir, "events", ["event_type", "ts", "event_id"]),
    )


def q259_heaps_fit(sf_dir: str) -> pd.DataFrame:
    """Heaps'-law vocabulary-growth fit (text_analysis.heaps_fit):
    OLS of ln V on ln N over power-of-two document checkpoints, where
    V(n) needs NO sequential scan — it's a threshold count over each
    token's FIRST document (one min-fold) — the growth-side companion
    of Zipf (q238) that sizes tokenizer vocab budgets as the corpus
    scales.  ONE token-hash shuffle + two |checkpoints|-integer count
    scans; OLS on ≤ 40 points.  Oracle: GENERATED by heaps_sql."""
    from ..stages.text_analysis import heaps_fit

    return heaps_fit(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        text_col="text", id_col="doc_id",
    )


def q260_ring_balance(sf_dir: str) -> pd.DataFrame:
    """Consistent-hash ring balance audit (stages/ring.ring_balance):
    assign the 97 q118 hosts (weighted by page count) to 8 shards ×
    16 vnodes and report per-shard keys/rows/load share — the
    pre-deploy capacity check for host-affine crawl ownership (low-V
    rings are lumpy even on uniform keys; empty shards MUST surface).
    Bit-exact splitmix64 ring and key hashes (q106's generator),
    clockwise-min pick with wrap, smallest-shard tie-break.  ONE host
    groupby; ring arithmetic is closed-form driver-side over the
    hosts-sized fold.  Oracle: GENERATED by ring_balance_sql."""
    from ..stages.ring import ring_balance

    ds = _read(sf_dir, "documents", ["doc_id"])

    def hostkey(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"hk": pa.array((d * 48271) % 97)})

    return ring_balance(
        ds.map_batches(hostkey, batch_format="pyarrow"),
        key_col="hk", n_shards=8, vnodes=16,
    )


def q261_vocab_coverage(sf_dir: str) -> pd.DataFrame:
    """Smallest head vocabulary covering 95% of token mass
    (text_analysis.vocab_coverage): the tokenizer/embedding-table
    sizing number, exact in integers end-to-end (ceil target, whole
    frequency classes + a partial boundary class).  ONE token-hash
    shuffle + a frequency-of-frequency fold (|distinct counts| rows);
    the head walk runs over that tiny histogram.  Oracle: GENERATED
    by vocab_coverage_sql (window cumsum replay)."""
    from ..stages.text_analysis import vocab_coverage

    return vocab_coverage(
        _read(sf_dir, "documents", ["text"]), text_col="text",
    )


def q262_ring_resize(sf_dir: str) -> pd.DataFrame:
    """Key movement under a fleet resize 8 → 9 shards
    (stages/ring.resize_movement): consistent hashing moves only the
    keys whose arcs the new shard captures (≈ 1/9) while naive mod
    placement moves ≈ 8/9 — the audit that justifies the ring before
    a resize is scheduled, over the same q260 host keys.  Same ONE
    host groupby; both assignments are driver-side searchsorteds over
    the hosts-sized fold.  Oracle: GENERATED by resize_movement_sql
    (prefix-stable ring growth on both engines)."""
    from ..stages.ring import resize_movement

    ds = _read(sf_dir, "documents", ["doc_id"])

    def hostkey(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"hk": pa.array((d * 48271) % 97)})

    return resize_movement(
        ds.map_batches(hostkey, batch_format="pyarrow"),
        key_col="hk", n_shards=8, vnodes=16,
    )


def q263_shard_digests(sf_dir: str) -> pd.DataFrame:
    """Order-insensitive per-shard content digests over documents
    (stages/ring.shard_digests, key=doc_id, value=n_chars): the
    anti-entropy primitive — verify a 100-TB copy by comparing 8 hex
    strings; any flipped value / lost row / duplicate changes the
    wrapping mod-2⁶⁴ sum, and commutativity makes row order and
    partitioning irrelevant.  ONE shuffle-free scan of shards-sized
    partials; shards × blocks driver fold.  Oracle: GENERATED by
    shard_digests_sql (HUGEINT mod-2⁶⁴ replay, bit-exact)."""
    from ..stages.ring import shard_digests

    return shard_digests(
        _read(sf_dir, "documents", ["doc_id", "n_chars"]),
        key_col="doc_id", value_col="n_chars", n_shards=8,
    )


def q264_lang_script_audit(sf_dir: str) -> pd.DataFrame:
    """Declared-lang vs dominant-script cross-audit
    (text_analysis.lang_script_audit): per (lang, script) doc counts,
    within-lang shares and an expected-script flag — the language-ID
    QA gate run BEFORE the trigram lang-ID (q35), which assumes an
    alphabetic script exactly where this audit flags (en-tagged CJK
    pages, zh-tagged Latin pinyin/spam).  The add_script_mix single-
    scan kernel feeds a langs×scripts groupby; driver holds the tiny
    grid.  Oracle: composes the GENERATED script_mix_sql verbatim
    (single-generator ranges/tie-break) via lang_script_audit_sql."""
    from ..stages.text_analysis import lang_script_audit

    return lang_script_audit(
        _read(sf_dir, "documents", ["doc_id", "text", "lang"]),
        text_col="text", lang_col="lang",
    )


def q265_centroid_cosines(sf_dir: str) -> pd.DataFrame:
    """Pairwise cosine between per-label embedding centroids
    (linalg.label_centroid_cosines): the semantic-space complement of
    the token-level screens (q243 JSD / q242 vocab Jaccard) — near-1
    centroid pairs are merge candidates or label noise; the mixture
    designer reads this matrix before weighting.  ONE shuffle-free
    moment scan (labels × d per batch), labels² driver matmul.
    Oracle: GENERATED by centroid_cosines_sql (the q111
    generate_subscripts pattern)."""
    from ..stages.linalg import label_centroid_cosines

    return label_centroid_cosines(
        _read(sf_dir, "embeddings", ["embedding", "label"]),
    )


def q266_rendezvous(sf_dir: str) -> pd.DataFrame:
    """Rendezvous (HRW) sharding audit over the q260 host keys
    (stages/ring.rendezvous_balance): per-shard load under
    highest-random-weight assignment — no vnode variance at all, the
    small-fleet alternative to the ring — plus the grow-movement
    column (rows leaving each shard when a 9th is added; HRW moves
    ≈ 1/9 total, same bound q262 demonstrates for the ring).  The
    shared _key_weights fold + a keys × (S+1) vectorized splitmix64
    score matrix on the driver.  Oracle: GENERATED by rendezvous_sql
    (identical nested hashes, DESC/shard-asc argmax ties)."""
    from ..stages.ring import rendezvous_balance

    ds = _read(sf_dir, "documents", ["doc_id"])

    def hostkey(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"hk": pa.array((d * 48271) % 97)})

    return rendezvous_balance(
        ds.map_batches(hostkey, batch_format="pyarrow"),
        key_col="hk", n_shards=8,
    )


def q267_content_survival(sf_dir: str) -> pd.DataFrame:
    """Corpus-level content-survival curve over capture age
    (snapshots.content_survival) from the q235 capture fixture:
    hazard(k) = changed/at-risk per revisit age, survival as the
    running product — the content half-life that sets DEFAULT revisit
    intervals before per-url evidence exists (q247 per url, q254 per
    host, this the corpus prior; the q228 right-censoring + exp-of-
    cumulative-ln replay conventions).  ONE salted url-hash shuffle,
    ages-sized driver fold.  Oracle: GENERATED by
    content_survival_sql over _Q235_CAPS."""
    from ..stages.snapshots import content_survival

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return content_survival(
        ds.map_batches(_q235_caps_batch, batch_format="pyarrow"),
        key_col="url", ts_col="ts", hash_col="content_hash",
    )


QUERIES = {
    # --- first 50 = the driver's oracle window this round (round 4) ---
    # (0) session-new, never driver-checked (lead the window):
    #     q152-q156 (session 6: triangle clustering, resample+ffill,
    #     rolling windows, exact similarity join, BFS crawl depth),
    #     q130-q137 (session 4) and q138-q149 (session 5: HITS, char
    #     entropy, host-disjoint split, inverted index, PMI, string-id
    #     CC, compression ratio, script mix, crawl-frontier capstone,
    #     registrable domains, embedding quantization, table profiler).
    #     Session 6's arrivals ceded q87/q88/q47/q83/q58 (driver-green
    #     r3, unchanged); earlier arrivals ceded q108/q110/q49/q77/
    #     q78/q82/q86/q85 and other double-green unchanged entries —
    #     all still run at both sfs in tests/test_oracle_parity.py
    #     every session;
    # (a) never driver-checked: the round-4-new q112/q113/q114;
    # (b) implementation changed in round 4 — re-verify: streaming
    #     rewrite (q28/q84/q80), partial top-k (q08/q76), simhash
    #     popcount verify + string-id finish (q32/q33/q37/q112),
    #     heavy-hitters nulls (q54), host semantics (q40), clean id
    #     passthrough (q89), shuffle-hash null path (q106/q107/q109),
    #     corpus_build checkpoint plumbing (q98), tier invariants (q101);
    # (c) the rest of the r3 window retained for breadth.  Ceded this
    #     round (double-green r3, unchanged code): q92/q93/q94/q102/
    #     q67/q79/q99/q100 — their oracles still run at both sfs in
    #     tests/test_oracle_parity.py every session.
    # session 8 additions lead the window (newest first): the q192
    # quality-report capstone + decile bins / rolling distinct / URL
    # templates / table linearization, then the analytics batch
    # (cume-dist, k-anonymity, personalized PageRank, top paths, drift,
    # bursts), then q168-q185 (CUBE, AUC eval, Gini, degrees, C4 lines,
    # novelty, encoding repair, RRF, head meta, scheduler, EWMA,
    # entropy, nucleus, tables, LPT, readability, churn, daily monitor).
    # session 9 additions lead the window: rank/two-sample statistics
    # (Spearman drift, Welch test), modal-label rollup, JSON-LD
    # extraction, asymmetric containment join, then tranche 2: CDC
    # changelog compaction, sort-free global rank, exact-k stratified
    # sample, OHLC bars, heading outline; tranche 3: the ordered-
    # sequence family (running totals, inter-arrival gaps, last-touch
    # attribution, CUSUM drift), unpivot, Benford audit, KWIC snippets,
    # exact weighted median, KS two-sample drift, G² keyness; tranche 4:
    # PSI drift, lang×source independence, trimmed mean, dedup impact;
    # tranche 5: lateness audit, session co-pairs, NTILE; tranche 6:
    # Kaplan-Meier conversion, Cohen's kappa.  Session-10 tranche 1:
    # A/B two-proportion z-test, daily-count autocorrelation,
    # calibration/ECE, URL path-prefix rollup.
    # Session-12 tranche 9: corpus content-survival curve.
    "q267_content_survival": q267_content_survival,
    # Session-12 tranche 8: rendezvous (HRW) sharding audit.
    "q266_rendezvous": q266_rendezvous,
    # Session-12 tranche 7: lang-script audit, centroid cosines.
    "q264_lang_script_audit": q264_lang_script_audit,
    "q265_centroid_cosines": q265_centroid_cosines,
    # Session-12 tranche 6: ring resize movement, anti-entropy digests.
    "q262_ring_resize": q262_ring_resize,
    "q263_shard_digests": q263_shard_digests,
    # Session-12 tranche 5: Heaps'-law growth fit, consistent-hash
    # ring balance, 95%-mass vocabulary coverage.
    "q259_heaps_fit": q259_heaps_fit,
    "q260_ring_balance": q260_ring_balance,
    "q261_vocab_coverage": q261_vocab_coverage,
    # Session-12 tranche 4: graph health (assortativity, reciprocity)
    # and stream regularity (burstiness).
    "q256_assortativity": q256_assortativity,
    "q257_reciprocity": q257_reciprocity,
    "q258_burstiness": q258_burstiness,
    # Session-12 tranche 3: SQL-replayable per-group HLL, revisit
    # scheduler capstone, hreflang rollup.
    "q253_approx_distinct": q253_approx_distinct,
    "q254_revisit_schedule": q254_revisit_schedule,
    "q255_hreflang_rollup": q255_hreflang_rollup,
    # Session-12 tranche 2: co-citation similarity, Kendall tau-b,
    # Wilson ranking, interval union coverage, longest streak.
    "q248_cocitation": q248_cocitation,
    "q249_kendall_tau": q249_kendall_tau,
    "q250_wilson_ranking": q250_wilson_ranking,
    "q251_union_coverage": q251_union_coverage,
    "q252_longest_streak": q252_longest_streak,
    # Session-12 tranche 1: source JSD, host k-core, entry/exit/bounce,
    # Z-order layout plan, capture change-rate.
    "q243_source_jsd": q243_source_jsd,
    "q244_host_kcore": q244_host_kcore,
    "q245_entry_exit": q245_entry_exit,
    "q246_zorder_layout": q246_zorder_layout,
    "q247_change_rate": q247_change_rate,
    # The session-12 block above (q243-q266) + sessions 10-11 below
    # (q230-q242) are round-4-new and never driver-checked: they fill
    # the 50-entry window front-to-back; everything after position 50
    # has a driver-green row from earlier rounds or runs at both sfs
    # in tests/test_oracle_parity.py every session.
    # Session-11 tranche 2: Zipf slope, Mann-Whitney U, RFM segments,
    # DAU/MAU stickiness, source vocabulary overlap.
    "q238_zipf_slope": q238_zipf_slope,
    "q239_mann_whitney": q239_mann_whitney,
    "q240_rfm_segments": q240_rfm_segments,
    "q241_stickiness": q241_stickiness,
    "q242_vocab_overlap": q242_vocab_overlap,
    # Session-11 tranche 1: position attribution, SCD-2 history,
    # lexical diversity, tag histogram.
    "q234_position_attribution": q234_position_attribution,
    "q235_scd2_history": q235_scd2_history,
    "q236_lexical_diversity": q236_lexical_diversity,
    "q237_tag_histogram": q237_tag_histogram,
    "q230_ab_test": q230_ab_test,
    "q231_daily_autocorr": q231_daily_autocorr,
    "q232_calibration": q232_calibration,
    "q233_path_rollup": q233_path_rollup,
    "q228_km_conversion": q228_km_conversion,
    "q229_quality_kappa": q229_quality_kappa,
    "q225_lateness_audit": q225_lateness_audit,
    "q226_session_copairs": q226_session_copairs,
    "q227_ntile": q227_ntile,
    "q221_psi_drift": q221_psi_drift,
    "q222_lang_source_independence": q222_lang_source_independence,
    "q223_trimmed_mean": q223_trimmed_mean,
    "q224_dedup_impact": q224_dedup_impact,
    "q218_weighted_median": q218_weighted_median,
    "q219_ks_drift": q219_ks_drift,
    "q220_keyness": q220_keyness,
    "q211_running_totals": q211_running_totals,
    "q212_interarrival": q212_interarrival,
    "q213_attribution": q213_attribution,
    "q214_cusum_drift": q214_cusum_drift,
    "q215_unpivot": q215_unpivot,
    "q216_benford": q216_benford,
    "q217_kwic": q217_kwic,
    "q206_apply_changelog": q206_apply_changelog,
    "q207_global_rank": q207_global_rank,
    "q208_group_sample": q208_group_sample,
    "q209_ohlc_bars": q209_ohlc_bars,
    "q210_heading_outline": q210_heading_outline,
    "q201_spearman_drift": q201_spearman_drift,
    "q202_user_modal_event": q202_user_modal_event,
    "q203_json_ld": q203_json_ld,
    "q204_containment_join": q204_containment_join,
    "q205_welch_drift": q205_welch_drift,
    "q200_jpeg_decode": q200_jpeg_decode,
    "q197_host_dup_profile": q197_host_dup_profile,
    "q198_mirror_pairs": q198_mirror_pairs,
    "q199_sitemap_coverage": q199_sitemap_coverage,
    "q193_decile_bins": q193_decile_bins,
    "q194_rolling_distinct": q194_rolling_distinct,
    "q195_url_templates": q195_url_templates,
    "q196_table_linearize": q196_table_linearize,
    "q192_source_quality_report": q192_source_quality_report,
    "q186_cume_dist": q186_cume_dist,
    "q187_k_anonymity": q187_k_anonymity,
    "q188_personalized_pagerank": q188_personalized_pagerank,
    "q189_top_paths": q189_top_paths,
    "q190_numeric_drift": q190_numeric_drift,
    "q191_daily_burst": q191_daily_burst,
    "q181_html_tables": q181_html_tables,
    "q182_shard_packing": q182_shard_packing,
    "q183_readability": q183_readability,
    "q184_host_churn": q184_host_churn,
    "q185_daily_activity": q185_daily_activity,
    "q176_head_meta": q176_head_meta,
    "q177_politeness_schedule": q177_politeness_schedule,
    "q178_recency_reputation": q178_recency_reputation,
    "q179_source_lang_entropy": q179_source_lang_entropy,
    "q180_nucleus_sources": q180_nucleus_sources,
    "q168_cube_lang_source": q168_cube_lang_source,
    "q169_classifier_eval": q169_classifier_eval,
    "q170_source_gini": q170_source_gini,
    "q171_degree_distribution": q171_degree_distribution,
    "q172_c4_line_filter": q172_c4_line_filter,
    "q173_novelty": q173_novelty,
    "q174_fix_encoding": q174_fix_encoding,
    "q175_rrf_fusion": q175_rrf_fusion,
    "q158_naive_bayes": q158_naive_bayes,
    "q159_markov_transitions": q159_markov_transitions,
    "q160_rollup_lang_source": q160_rollup_lang_source,
    "q161_pareto_skyline": q161_pareto_skyline,
    "q162_mad_outliers": q162_mad_outliers,
    "q163_url_param_profile": q163_url_param_profile,
    "q164_left_outer_join": q164_left_outer_join,
    "q165_grouped_histogram": q165_grouped_histogram,
    "q166_day_over_day": q166_day_over_day,
    "q167_fuzzy_linkage": q167_fuzzy_linkage,
    "q152_triangle_clustering": q152_triangle_clustering,
    "q153_resample_ffill": q153_resample_ffill,
    "q154_rolling_window": q154_rolling_window,
    "q155_similarity_join": q155_similarity_join,
    "q156_crawl_depth": q156_crawl_depth,
    "q157_user_trend": q157_user_trend,
    "q140_host_disjoint_split": q140_host_disjoint_split,
    "q141_inverted_index": q141_inverted_index,
    "q142_pmi_collocations": q142_pmi_collocations,
    "q143_host_components": q143_host_components,
    "q144_compression_ratio": q144_compression_ratio,
    "q145_script_mix": q145_script_mix,
    "q146_crawl_frontier": q146_crawl_frontier,
    "q147_registrable_domains": q147_registrable_domains,
    "q148_quantize_embeddings": q148_quantize_embeddings,
    "q149_profile_events": q149_profile_events,
    "q150_funnel": q150_funnel,
    "q151_cohort_retention": q151_cohort_retention,
    "q138_host_hits": q138_host_hits,
    "q139_char_entropy": q139_char_entropy,
    "q130_bm25_rank": q130_bm25_rank,
    "q131_weighted_sample": q131_weighted_sample,
    "q132_host_template_removal": q132_host_template_removal,
    "q133_snapshot_diff": q133_snapshot_diff,
    "q134_anchor_text": q134_anchor_text,
    "q135_unicode_normalize": q135_unicode_normalize,
    "q136_sitemap_freshness": q136_sitemap_freshness,
    "q137_resolve_redirects": q137_resolve_redirects,
    "q128_connected_components": q128_connected_components,
    "q129_surt_cdx_dedup": q129_surt_cdx_dedup,
    "q121_phash_image_dedup": q121_phash_image_dedup,
    "q122_multimodal_features": q122_multimodal_features,
    "q123_url_filter": q123_url_filter,
    "q124_link_graph_pagerank": q124_link_graph_pagerank,
    "q125_interval_join": q125_interval_join,
    "q126_chunk_documents": q126_chunk_documents,
    "q127_robots_gate": q127_robots_gate,
    "q118_host_pagerank": q118_host_pagerank,
    "q119_bpe_tokenize": q119_bpe_tokenize,
    "q120_quality_classifier": q120_quality_classifier,
    "q116_snapshot_dedup": q116_snapshot_dedup,
    "q113_bigram_logprob": q113_bigram_logprob,
    "q114_winsorize": q114_winsorize,
    "q115_curriculum_order": q115_curriculum_order,
    "q117_gopher_quality": q117_gopher_quality,
    "q112_url_near_dup": q112_url_near_dup,
    "q28_streaming_window": q28_streaming_window,
    "q84_streaming_sessionize": q84_streaming_sessionize,
    "q80_sliding_window": q80_sliding_window,
    "q08_top_customers": q08_top_customers,
    "q76_top_bigrams": q76_top_bigrams,
    "q33_simhash_dedup": q33_simhash_dedup,
    "q37_embedding_dedup": q37_embedding_dedup,
    "q54_heavy_hitters": q54_heavy_hitters,
    "q40_host_stats": q40_host_stats,
    "q32_minhash_dedup": q32_minhash_dedup,
    "q89_remove_frequent_segments": q89_remove_frequent_segments,
    "q106_shuffle_positions": q106_shuffle_positions,
    "q107_epoch_mix": q107_epoch_mix,
    "q109_cap_per_source": q109_cap_per_source,
    "q98_corpus_build": q98_corpus_build,
    "q101_tier_extract": q101_tier_extract,
    "q26_field_extractors": q26_field_extractors,
    "q29_topk_per_group": q29_topk_per_group,
    "q44_train_split": q44_train_split,
    "q45_stratified_sample_counts": q45_stratified_sample_counts,
    "q57_group_zscore": q57_group_zscore,
    "q111_covariance": q111_covariance,
    "q103_remove_dup_spans": q103_remove_dup_spans,
    "q104_kmeans_assign": q104_kmeans_assign,
    "q97_token_quota_mix": q97_token_quota_mix,
    "q105_cluster_prune": q105_cluster_prune,
    "q95_segment_dedup_keep_first": q95_segment_dedup_keep_first,
    "q96_fused_quality_filter": q96_fused_quality_filter,
    "q108_within_doc_segment_dedup": q108_within_doc_segment_dedup,
    "q110_subtract_corpus": q110_subtract_corpus,
    "q49_knn_ivf": q49_knn_ivf,
    "q77_hash_sample": q77_hash_sample,
    "q78_tfidf_top_term": q78_tfidf_top_term,
    "q82_source_quota": q82_source_quota,
    "q86_decontaminate": q86_decontaminate,
    "q85_string_key_join": q85_string_key_join,
    "q87_normalized_dedup": q87_normalized_dedup,
    "q88_semantic_dedup": q88_semantic_dedup,
    "q47_asof_join": q47_asof_join,
    "q83_skewed_join": q83_skewed_join,
    "q58_pivot_events": q58_pivot_events,
    # --- position >50: driver-green in earlier rounds and unchanged;
    # all still run in tests/test_oracle_parity.py every session ---
    # (q25/q90 ceded their round-4 slots to the new q115/q116;
    #  q59/q61/q62/q63 ceded theirs to the new q118/q119/q120)
    "q59_rollup_orders": q59_rollup_orders,
    "q61_set_ops": q61_set_ops,
    "q62_weighted_avg": q62_weighted_avg,
    "q63_percentiles": q63_percentiles,
    "q25_salted_user_counts": q25_salted_user_counts,
    "q90_unigram_logprob": q90_unigram_logprob,
    "q91_badword_filter": q91_badword_filter,
    "q92_pack_sequences": q92_pack_sequences,
    "q93_repetition_signals": q93_repetition_signals,
    "q94_dsir_weights": q94_dsir_weights,
    "q102_dup_ngram_coverage": q102_dup_ngram_coverage,
    "q67_bloom_anti_join": q67_bloom_anti_join,
    "q79_quantile_sketch": q79_quantile_sketch,
    "q99_perplexity_tiers": q99_perplexity_tiers,
    "q100_temperature_mix": q100_temperature_mix,
    "q43_event_median": q43_event_median,
    "q60_above_nation_avg": q60_above_nation_avg,
    "q46_approx_distinct_parts": q46_approx_distinct_parts,
    "q27_props_json_extract": q27_props_json_extract,
    "q10_customers_per_region": q10_customers_per_region,
    "q11_events_hourly": q11_events_hourly,
    "q18_docs_en_long": q18_docs_en_long,
    "q19_events_type_stats": q19_events_type_stats,
    "q22_supplier_nation_rollup": q22_supplier_nation_rollup,
    "q48_ngram_jaccard_pairs": q48_ngram_jaccard_pairs,
    "q05_orders_by_segment": q05_orders_by_segment,
    "q12_sessionize": q12_sessionize,
    "q16_dedup_docs_exact": q16_dedup_docs_exact,
    "q23_events_user_first": q23_events_user_first,
    "q50_bucketed_join": q50_bucketed_join,
    "q53_bloom_semi_join": q53_bloom_semi_join,
    "q13_part_brand_stats": q13_part_brand_stats,
    "q17_lang_counts": q17_lang_counts,
    "q21_label_counts": q21_label_counts,
    "q52_curation": q52_curation,
    "q30_flagship_extract": q30_flagship_extract,
    "q31_grading": q31_grading,
    "q34_fingerprint_docs": q34_fingerprint_docs,
    "q35_language_id": q35_language_id,
    "q36_knn_lsh": q36_knn_lsh,
    "q38_question_generation": q38_question_generation,
    "q39_number_predict": q39_number_predict,
    "q41_flagship_deduped": q41_flagship_deduped,
    "q01_pricing_summary": q01_pricing_summary,
    "q03_top_revenue_orders": q03_top_revenue_orders,
    "q06_customers_with_orders": q06_customers_with_orders,
    "q07_customers_without_orders": q07_customers_without_orders,
    "q14_doc_token_counts": q14_doc_token_counts,
    "q15_doc_quality": q15_doc_quality,
    "q20_knn_brute": q20_knn_brute,
    "q24_credit_reducer": q24_credit_reducer,
    "q51_redact_pii": q51_redact_pii,
    "q55_range_join": q55_range_join,
    "q56_extraction_fidelity": q56_extraction_fidelity,
    "q75_inverted_index": q75_inverted_index,
    "q81_doc_chunks": q81_doc_chunks,
    "q64_string_functions": q64_string_functions,
    "q65_orders_by_year": q65_orders_by_year,
    "q66_union_sources": q66_union_sources,
    "q68_props_stats": q68_props_stats,
    "q69_filtered_revenue": q69_filtered_revenue,
    "q70_rubric_flatten": q70_rubric_flatten,
    "q71_month_over_month": q71_month_over_month,
    "q72_distinct_per_group": q72_distinct_per_group,
    "q73_split_priority": q73_split_priority,
    "q74_string_agg": q74_string_agg,
    "q02_high_quantity_items": q02_high_quantity_items,
    "q04_orders_by_status": q04_orders_by_status,
    "q09_distinct_segments": q09_distinct_segments,
}

# --- round-5 driver-window rotation (VERDICT r4 #3) ------------------------
# The driver's CORRECTNESS window samples the FIRST 50 registry keys each
# round; 106 entries (q112-q217) had never received a driver row after
# rounds 1-4 (they ARE covered every session by tests/test_oracle_parity.py,
# which replays all oracles at sf0.001 + sf0.01 — this rotation adds the
# independent driver check, not new coverage).  Hoist the 50 oldest
# never-sampled keys to the head; any round-5-new queries are prepended
# above them as they are added.
_R5_WINDOW_HEAD = [
    "q112_url_near_dup", "q113_bigram_logprob", "q114_winsorize",
    "q115_curriculum_order", "q116_snapshot_dedup", "q117_gopher_quality",
    "q118_host_pagerank", "q119_bpe_tokenize", "q120_quality_classifier",
    "q121_phash_image_dedup", "q122_multimodal_features", "q123_url_filter",
    "q124_link_graph_pagerank", "q125_interval_join", "q126_chunk_documents",
    "q127_robots_gate", "q128_connected_components", "q129_surt_cdx_dedup",
    "q130_bm25_rank", "q131_weighted_sample", "q132_host_template_removal",
    "q133_snapshot_diff", "q134_anchor_text", "q135_unicode_normalize",
    "q136_sitemap_freshness", "q137_resolve_redirects", "q138_host_hits",
    "q139_char_entropy", "q140_host_disjoint_split", "q141_inverted_index",
    "q142_pmi_collocations", "q143_host_components", "q144_compression_ratio",
    "q145_script_mix", "q146_crawl_frontier", "q147_registrable_domains",
    "q148_quantize_embeddings", "q149_profile_events", "q150_funnel",
    "q151_cohort_retention", "q152_triangle_clustering", "q153_resample_ffill",
    "q154_rolling_window", "q155_similarity_join", "q156_crawl_depth",
    "q157_user_trend", "q158_naive_bayes", "q159_markov_transitions",
    "q160_rollup_lang_source", "q161_pareto_skyline",
]
QUERIES = {
    **{k: QUERIES[k] for k in _R5_WINDOW_HEAD},
    **{k: v for k, v in QUERIES.items() if k not in set(_R5_WINDOW_HEAD)},
}

# The splitmix64-keyed oracles (q106/q107/q109) replay the engine's hash
# via ONE generator — stages/shuffle.splitmix64_sql, itself
# equivalence-tested against numpy bit-for-bit — instead of hand-copied
# HUGEINT CTE chains whose constants could silently desync.
from ..stages.shuffle import splitmix64_sql as _sm_sql
from ..stages.graph import hits_sql as _hits_sql
from ..stages.graph import pagerank_sql as _pr_sql
from ..stages.collect import collect_tables

from ..stages.surt import surt_sql as _surt_sql

# q129's oracle: captures rebuilt with printf, keyed by the SAME
# generated SURT expression the engine kernel implements
_Q129_SQL = f"""
    WITH caps AS (
      SELECT printf('https://h%03d.example.org/p/%d',
                    (doc_id*48271)%97, doc_id) AS url,
             CAST(1000*doc_id + 17 AS BIGINT) AS ts_us FROM documents
      UNION ALL
      SELECT printf('http://WWW.H%03d.Example.ORG/p/%d',
                    (doc_id*48271)%97, doc_id),
             CAST(1000*doc_id + 17 + ((doc_id%7)-3)*10 AS BIGINT) FROM documents
      UNION ALL
      SELECT printf('https://h%03d.example.org/p/%d?x=1',
                    (doc_id*48271)%97, doc_id),
             CAST(1000*doc_id AS BIGINT) FROM documents WHERE doc_id%11=0
      UNION ALL
      SELECT printf('https://h%03d.example.org', (doc_id*48271)%97),
             CAST(999*doc_id AS BIGINT) FROM documents WHERE doc_id%13=0
    ),
    keyed AS (SELECT {_surt_sql('url')} AS surt_key, url, ts_us FROM caps),
    r AS (SELECT surt_key, url, ts_us,
                 row_number() OVER (PARTITION BY surt_key
                                    ORDER BY ts_us DESC, url ASC) AS rn,
                 count(*) OVER (PARTITION BY surt_key) AS n
          FROM keyed)
    SELECT surt_key, url, ts_us, CAST(n AS BIGINT) AS n_captures
    FROM r WHERE rn = 1 ORDER BY surt_key
"""

# q118's edge generator (doc_id arithmetic → 97-host graph), shared by
# the unrolled-iteration oracle below; the iterations themselves come
# from stages/graph.pagerank_sql so oracle and engine cannot desync.
_Q118_EDGES = """e0 AS (
  SELECT (doc_id * 48271) % 97 AS s, (doc_id * 48271 + 16807) % 97 AS t
  FROM documents
  UNION ALL
  SELECT (doc_id * 48271) % 97, (doc_id * 48271 + 33614) % 97 FROM documents
  UNION ALL
  SELECT (doc_id * 48271) % 97, 0 FROM documents WHERE doc_id % 4 = 0
),
e AS (
  SELECT 'h' || lpad(CAST(s AS VARCHAR), 3, '0') || '.example.org' AS src,
         'h' || lpad(CAST(t AS VARCHAR), 3, '0') || '.example.org' AS dst,
         CAST(count(*) AS DOUBLE) AS w
  FROM e0 WHERE s <> t GROUP BY 1, 2
)"""

from ..stages.chunking import chunking_sql as _chunk_sql

from ..stages.bm25 import bm25_sql as _bm25_sql
from ..stages.sampling import weighted_sample_sql as _ws_sql

from ..stages.sampling import disjoint_split_sql as _split_sql
from ..stages.inverted import inverted_index_sql as _inv_sql
from ..stages.cooccur import pmi_sql as _pmi_sql
from ..stages.text_analysis import script_mix_sql as _script_sql
from ..stages.graph import triangle_sql as _tri_sql
from ..stages.resample import resample_sql as _resample_sql
from ..stages.rolling import rolling_sql as _rolling_sql
from ..stages.simjoin import similarity_join_sql as _simjoin_sql
from ..stages.graph import bfs_sql as _bfs_sql
from ..stages.trend import grouped_trend_sql as _trend_sql

# synth.url_for_doc as a SQL CASE — shared by every oracle that rebuilds
# page urls (q140 split, q146 frontier), so the rebuild cannot desync
_URL_CASE = (
    "CASE WHEN doc_id % 53 IN (1, 2) THEN"
    "   'https://dup.example.com/' || lang || '/page-' ||"
    "   CAST(doc_id // 53 AS VARCHAR)"
    " WHEN doc_id % 5 = 0 THEN"
    "   'https://big.example.com/' || source || '/' || lang ||"
    "   '/doc-' || CAST(doc_id AS VARCHAR)"
    " ELSE 'https://' || source || '.example.org/' || lang ||"
    "   '/doc-' || CAST(doc_id AS VARCHAR) END"
)

_Q146_URLS = (
    f"docs AS (SELECT doc_id, source, lang, {_URL_CASE} AS url"
    " FROM documents),\n"
    "hosts AS (SELECT doc_id, url,"
    " regexp_extract(url, '^[^/]*//([^/?#]*)', 1) AS host FROM docs)"
)

_Q146_EDGES = (
    _Q146_URLS + ",\n"
    "e0 AS (SELECT h.host AS s,"
    " CASE WHEN h.doc_id % 7 = 0 THEN 'big.example.com'"
    " ELSE 'src' || CAST((CAST(substr(d.source, 4) AS INT) + 3) % 20"
    " AS VARCHAR) || '.example.org' END AS t"
    " FROM hosts h JOIN docs d USING (doc_id)),\n"
    "e AS (SELECT s AS src, t AS dst, CAST(count(*) AS DOUBLE) AS w"
    " FROM e0 WHERE s <> t GROUP BY 1, 2)"
)

_Q145_AUG = """aug AS (
  SELECT doc_id, text || ' ' || CASE doc_id % 6
    WHEN 1 THEN (SELECT string_agg(chr(CAST(1024 + (doc_id + r.i) % 96 AS INT)),
                                   '' ORDER BY r.i) FROM range(40) r(i))
    WHEN 2 THEN (SELECT string_agg(chr(CAST(19968 + (doc_id + r.i) % 256 AS INT)),
                                   '' ORDER BY r.i) FROM range(60) r(i))
    WHEN 3 THEN (SELECT string_agg(chr(CAST(1536 + (doc_id + r.i) % 96 AS INT)),
                                   '' ORDER BY r.i) FROM range(40) r(i))
    WHEN 4 THEN repeat(CAST(doc_id AS VARCHAR), 30)
    ELSE '' END AS text
  FROM documents
)"""

from ..pipelines.crawl import frontier_priority_sql as _prio_sql

_Q146_PRIO = _prio_sql(
    ts_diff_us="((SELECT count(*) FROM documents) - k.doc_id) * 1000000",
    pagerank_col="pr.pagerank",
    decay_days=_Q146_DECAY_DAYS,
)

from ..stages.domains import registrable_domain_sql as _dom_sql
from ..stages.quantize import quantize_sql as _quant_sql

from ..stages.profile import profile_sql as _prof_sql
from ..stages.funnel import funnel_sql as _funnel_sql

from ..stages.cohort import cohort_retention_sql as _cohort_sql

from ..stages.evaluation import binary_eval_sql as _eval_sql
from ..stages.selection import grouped_gini_sql as _gini_sql
from ..stages.graph import degree_distribution_sql as _degree_sql
from ..stages.clean import c4_line_filter_sql as _c4_sql
from ..stages.text_analysis import novelty_sql as _novelty_sql

_Q172_LINES_CTE = """nl AS (
          SELECT doc_id,
                 3 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END
                   + CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END
                   + CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS n_lines
          FROM documents
        ),
        l0 AS (
          SELECT doc_id, 1 AS line_no,
                 CASE WHEN doc_id % 9 = 8 THEN 'click here'
                      ELSE printf('the quick brown fox jumps over dog %d.',
                                  doc_id) END AS line
          FROM documents
          UNION ALL
          SELECT doc_id, 2, 'home | menu | login' FROM documents
          UNION ALL
          SELECT doc_id, 3, printf('buy now %d', doc_id % 7) FROM documents
          UNION ALL
          SELECT doc_id, 4, 'please enable javascript to view this content.'
          FROM documents WHERE doc_id % 3 = 0
          UNION ALL
          SELECT doc_id, 5,
                 printf('this is a perfectly fine sentence number %d!',
                        doc_id % 11)
          FROM documents WHERE doc_id % 4 = 0
          UNION ALL
          SELECT doc_id, 6,
                 'Lorem Ipsum dolor sit amet consectetur adipiscing elit.'
          FROM documents WHERE doc_id % 5 = 0
        ),
        lines AS (
          SELECT l0.doc_id, l0.line_no, l0.line, nl.n_lines
          FROM l0 JOIN nl USING (doc_id)
        )"""

from ..stages.trend import recency_weighted_sql as _recency_sql
from ..stages.profile import category_entropy_sql as _catent_sql
from ..stages.sampling import nucleus_sources_sql as _nucleus_sql

from ..stages.text_analysis import readability_sql as _readability_sql
from ..stages.graph import personalized_pagerank_sql as _ppr_sql
from ..stages.trend import daily_burst_sql as _burst_sql
from ..stages.trend import spearman_sql as _spearman_sql
from ..stages.trend import welch_drift_sql as _welch_sql
from ..stages.profile import grouped_mode_sql as _mode_sql
from ..stages.simjoin import containment_join_sql as _containment_sql
from ..stages.changelog import apply_changelog_sql as _changelog_sql
from ..stages.ranksort import global_rank_sql as _grank_sql
from ..stages.sampling import group_sample_sql as _gsample_sql
from ..stages.resample import ohlc_sql as _ohlc_sql
from ..stages.sequence import (
    attribution_sql as _attr_sql,
    cusum_sql as _cusum_sql,
    interarrival_sql as _gap_sql,
    running_totals_sql as _runtot_sql,
)
from ..stages.reshape import unpivot_sql as _unpivot_sql
from ..stages.profile import benford_sql as _benford_sql
from ..stages.kwic import kwic_sql as _kwic_sql

from ..stages.selection import weighted_median_sql as _wmed_sql
from ..stages.trend import ks_drift_sql as _ks_sql
from ..stages.text_analysis import keyness_sql as _keyness_sql

_EVENTS_VALUED = (
    "(SELECT event_id, ts, user_id, event_type, value "
    "FROM events WHERE value IS NOT NULL)"
)

from ..stages.trend import psi_sql as _psi_sql
from ..stages.profile import independence_sql as _indep_sql
from ..stages.selection import trimmed_mean_sql as _tmean_sql
from ..stages.mirrors import dedup_impact_sql as _dimpact_sql

from ..stages.sequence import lateness_sql as _late_sql, ntile_sql as _ntile_sql
from ..stages.markov import session_copairs_sql as _copairs_sql

from ..stages.survival import km_sql as _km_sql
from ..stages.agreement import kappa_sql as _kappa_sql

from ..stages.abtest import ab_test_sql as _ab_sql
from ..stages.trend import autocorr_sql as _acf_sql
from ..stages.evaluation import calibration_sql as _calib_sql
from ..stages.pathtree import path_rollup_sql as _pathroll_sql
from ..stages.sequence import position_attribution_sql as _posattr_sql
from ..stages.text_analysis import zipf_sql as _zipf_sql
from ..stages.text_analysis import vocab_overlap_sql as _vocover_sql
from ..stages.abtest import mann_whitney_sql as _mwu_sql
from ..stages.rfm import rfm_sql as _rfm_sql
from ..stages.trend import stickiness_sql as _stick_sql
from ..stages.snapshots import scd2_sql as _scd2_sql
from ..stages.text_analysis import lexical_diversity_sql as _lexdiv_sql
from ..stages.tagstats import tag_histogram_sql as _taghist_sql

# q235's derived capture table (shared scheme with the Arrow fixture):
# 1 + d%4 captures per doc at integer crawl ordinals, ':v2' content flip
# at ordinal 1 + d%3, NULL hash at ordinal 1 for every 23rd doc.
_Q235_CAPS = """(
  SELECT printf('https://h%03d.example.org/p/%d',
                (doc_id * 48271) % 97, doc_id) AS url,
         k AS ts,
         CASE WHEN doc_id % 23 = 0 AND k = 1 THEN NULL
              WHEN k < 1 + doc_id % 3 THEN md5(text)
              ELSE md5(text || ':v2') END AS content_hash
  FROM (SELECT doc_id, text,
               unnest(generate_series(0, doc_id % 4)) AS k
        FROM documents)
)"""

# q237's derived page table (shared scheme with the Arrow fixture).
_Q237_PAGES = """(
  SELECT printf('h%02d.example.org', (doc_id * 48271) % 29) AS host,
         '<html><body>' || repeat('<p>x</p>', 1 + doc_id % 5)
           || repeat('<div><a href="/x">l</a></div>', doc_id % 4)
           || '</body></html>' AS html
  FROM documents
)"""

_Q229_RATERS = """(
  SELECT CASE WHEN n_chars >= 256 THEN 'good' ELSE 'bad' END AS r1,
         CASE WHEN len(list_filter(string_split_regex(text, '\\s+'),
                                   x -> x <> '')) >= 50
              THEN 'good' ELSE 'bad' END AS r2
  FROM documents
)"""

from ..stages.graph import kcore_sql as _kcore_sql
from ..stages.sequence import entry_exit_sql as _entry_exit_sql
from ..stages.snapshots import change_rate_sql as _chrate_sql
from ..stages.text_analysis import jsd_sql as _jsd_sql
from ..stages.zorder import zorder_sql as _zorder_sql

# q244's derived edge table (shared scheme with the Arrow fixture):
# a degree-2 ring over all 97 hosts + a dense pseudo-random cluster on
# hosts 0..19 for every 3rd doc — built to peel non-trivially at k=3.
_Q244_EDGES = """e0 AS (
  SELECT (doc_id * 48271) % 97 AS s, ((doc_id * 48271) % 97 + 1) % 97 AS t
  FROM documents
  UNION ALL
  SELECT (doc_id * 31) % 20, (doc_id * 37 + 7) % 20
  FROM documents WHERE doc_id % 3 = 0
),
e AS (
  SELECT 'h' || lpad(CAST(s AS VARCHAR), 3, '0') || '.example.org' AS src,
         'h' || lpad(CAST(t AS VARCHAR), 3, '0') || '.example.org' AS dst
  FROM e0 WHERE s <> t
)"""

from ..stages.abtest import wilson_sql as _wilson_sql
from ..stages.graph import cocitation_sql as _cocite_sql
from ..stages.intervals import union_coverage_sql as _ucov_sql
from ..stages.sequence import streak_sql as _streak_sql
from ..stages.trend import kendall_sql as _kendall_sql

# q250's derived page table (shared scheme with the Arrow fixture):
# the q233 29-host scheme + the q229 length rule as the quality gate.
_Q250_PAGES = """(
  SELECT printf('h%02d.example.org', (doc_id * 48271) % 29) AS host,
         CASE WHEN n_chars >= 256 THEN 1 ELSE 0 END AS ok
  FROM documents
)"""

from ..stages.sketches import approx_distinct_sql as _adist_sql
from ..stages.snapshots import revisit_priorities_sql as _revisit_sql

# q255's generated-links oracle: regenerate the hreflang emission
# arithmetically (1 + d%6 links cycling the 5-language list) — the
# engine PARSES the markup, the oracle REPLAYS the generator.
_Q255_SQL = """
    WITH l AS (
        SELECT doc_id,
               (['en', 'de', 'fr', 'es', 'it'])[
                   CAST((doc_id + i) % 5 AS INTEGER) + 1
               ] AS lang
        FROM (SELECT doc_id,
                     unnest(generate_series(0, doc_id % 6)) AS i
              FROM documents)
    )
    SELECT lang AS hreflang,
           CAST(count(*) AS BIGINT) AS n_links,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_pages
    FROM l GROUP BY lang
"""

from ..stages.graph import assortativity_sql as _assort_sql
from ..stages.graph import reciprocity_sql as _recip_sql
from ..stages.sequence import burstiness_sql as _bursty_sql

from ..stages.ring import ring_balance_sql as _ring_sql
from ..stages.text_analysis import heaps_sql as _heaps_sql
from ..stages.text_analysis import vocab_coverage_sql as _vcov_sql

from ..stages.ring import resize_movement_sql as _resize_sql
from ..stages.ring import shard_digests_sql as _sdig_sql

from ..stages.linalg import centroid_cosines_sql as _ccos_sql
from ..stages.text_analysis import lang_script_audit_sql as _lsa_sql

from ..stages.ring import rendezvous_sql as _rdv_sql

from ..stages.snapshots import content_survival_sql as _csurv_sql

ORACLE_SQL = {
    "q267_content_survival": _csurv_sql(
        table=_Q235_CAPS, key_col="url", ts_col="ts",
        hash_col="content_hash",
    ),
    "q266_rendezvous": _rdv_sql(
        table_expr="(SELECT (doc_id * 48271) % 97 AS hk FROM documents)",
        key_col="hk", n_shards=8,
    ),
    "q264_lang_script_audit": _lsa_sql(
        table="documents", text_col="text", lang_col="lang",
    ),
    "q265_centroid_cosines": _ccos_sql(
        table="embeddings", vec_col="embedding", label_col="label",
    ),
    "q262_ring_resize": _resize_sql(
        table_expr="(SELECT (doc_id * 48271) % 97 AS hk FROM documents)",
        key_col="hk", n_shards=8, vnodes=16,
    ),
    "q263_shard_digests": _sdig_sql(
        table_expr="documents", key_col="doc_id", value_col="n_chars",
        n_shards=8,
    ),
    "q259_heaps_fit": _heaps_sql(
        table="documents", text_col="text", id_col="doc_id",
    ),
    "q260_ring_balance": _ring_sql(
        table_expr="(SELECT (doc_id * 48271) % 97 AS hk FROM documents)",
        key_col="hk", n_shards=8, vnodes=16,
    ),
    "q261_vocab_coverage": _vcov_sql(table="documents", text_col="text"),
    "q256_assortativity": _assort_sql(_Q244_EDGES),
    "q257_reciprocity": _recip_sql(_Q118_EDGES),
    "q258_burstiness": _bursty_sql(table="events"),
    "q253_approx_distinct": _adist_sql(
        table="events", group_col="event_type", value_col="user_id",
    ),
    "q254_revisit_schedule": _revisit_sql(
        table=_Q235_CAPS, key_col="url", ts_col="ts",
        hash_col="content_hash",
    ),
    "q255_hreflang_rollup": _Q255_SQL,
    "q248_cocitation": _cocite_sql(_Q118_EDGES),
    "q249_kendall_tau": _kendall_sql(
        table="events", type_a="click", type_b="purchase",
    ),
    "q250_wilson_ranking": _wilson_sql(
        table_expr=_Q250_PAGES, group_col="host", success_col="ok",
    ),
    "q251_union_coverage": _ucov_sql(
        table="events", key_col="user_id", ts_col="ts",
    ),
    "q252_longest_streak": _streak_sql(
        table="events", key_col="user_id", ts_col="ts",
    ),
    "q243_source_jsd": _jsd_sql(
        table="documents", text_col="text", group_col="source",
    ),
    "q244_host_kcore": _kcore_sql(
        _Q244_EDGES, k=3, max_rounds=12, node_col="host"
    ),
    "q245_entry_exit": _entry_exit_sql(
        table="events", key_col="user_id", ts_col="ts",
        id_col="event_id", type_col="event_type",
    ),
    # y: low-16 ring homomorphism — (a·b) mod 2^16 == ((a mod 2^16)
    # · (b mod 2^16)) mod 2^16, so the reduced product (31153 =
    # 2654435761 & 0xFFFF) replays the engine's wrapping int64
    # multiply without overflowing DuckDB's checked BIGINT
    "q246_zorder_layout": _zorder_sql(
        table_expr="events",
        x_expr="CAST(floor(epoch(ts) / 3600) AS BIGINT)",
        y_expr="(user_id % 65536) * 31153",
        file_shift=26,
    ),
    "q247_change_rate": _chrate_sql(
        table=_Q235_CAPS, key_col="url", ts_col="ts",
        hash_col="content_hash",
    ),
    "q238_zipf_slope": _zipf_sql(
        table="documents", text_col="text", group_col="source", top_k=512,
    ),
    "q239_mann_whitney": _mwu_sql(
        table="""(
          SELECT CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END
                     AS variant,
                 value
          FROM events
        )""",
        variant_col="variant", value_col="value",
    ),
    "q240_rfm_segments": _rfm_sql(
        table="events", user_col="user_id", ts_col="ts",
        value_col="value",
    ),
    "q241_stickiness": _stick_sql(
        table="events", key_col="event_type", ts_col="ts",
        user_col="user_id",
    ),
    "q242_vocab_overlap": _vocover_sql(
        table="documents", text_col="text", group_col="source",
    ),
    "q234_position_attribution": _posattr_sql(
        table="events", key_col="user_id", ts_col="ts",
        id_col="event_id", type_col="event_type",
    ),
    "q235_scd2_history": f"""
        SELECT url, content_hash, valid_from,
               coalesce(valid_to, -1) AS valid_to, version
        FROM ({_scd2_sql(table=_Q235_CAPS, key_col="url", ts_col="ts",
                         hash_col="content_hash")})
    """,
    "q236_lexical_diversity": _lexdiv_sql(
        table="documents", text_col="text", group_col="source",
    ),
    "q237_tag_histogram": f"""
        SELECT g AS host, n_pages, n_p, n_div, n_a
        FROM ({_taghist_sql(table=_Q237_PAGES, html_col="html",
                            group_col="host")})
    """,
    "q230_ab_test": _ab_sql(
        table="""(
          SELECT user_id,
                 CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
          FROM events
        )""",
        key_col="user_id", variant_col="variant", conv_col="conv",
    ),
    "q231_daily_autocorr": _acf_sql(
        table="events", key_col="event_type", ts_col="ts",
    ),
    "q232_calibration": _calib_sql(
        """s AS (
          SELECT n_chars / (n_chars + 300.0) AS score,
                 CASE WHEN len(list_filter(string_split_regex(text, '\\s+'),
                                           x -> x <> '')) >= 50
                      THEN 1 ELSE 0 END AS label
          FROM documents
        )""",
        n_bins=10,
    ),
    "q233_path_rollup": _pathroll_sql(
        table="""(
          SELECT printf('https://h%02d.example.org/s%d/t%d/p%d',
                        (doc_id * 48271) % 29, doc_id % 7, doc_id % 11,
                        doc_id) AS url,
                 n_chars AS n_bytes
          FROM documents
        )""",
        url_col="url", bytes_col="n_bytes", max_depth=2,
    ),
    "q228_km_conversion": _km_sql(
        table="events", key_col="user_id", ts_col="ts",
        type_col="event_type", conversion="purchase",
    ),
    "q229_quality_kappa": _kappa_sql(
        table=_Q229_RATERS, rater1_col="r1", rater2_col="r2",
    ),
    "q225_lateness_audit": _late_sql(
        table="events", key_col="user_id", ts_col="ts", id_col="event_id",
    ),
    "q226_session_copairs": _copairs_sql(
        table="events", key_col="user_id", ts_col="ts",
        id_col="event_id", type_col="event_type", gap_s=1800, top_k=20,
    ),
    "q227_ntile": _ntile_sql(
        k=4, table=_EVENTS_VALUED, key_col="event_type",
        value_col="value", id_col="event_id",
    ),
    "q221_psi_drift": _psi_sql(
        table="events", key_col="event_type", ts_col="ts",
        value_col="value", split_expr="TIMESTAMP '2024-01-16'", n_bins=10,
    ),
    "q222_lang_source_independence": _indep_sql(
        table="documents", x_col="lang", y_col="source",
    ),
    "q223_trimmed_mean": _tmean_sql(
        table="documents", value_col="n_chars", group_col="lang",
        trim_num=1, trim_den=10,
    ),
    "q224_dedup_impact": _dimpact_sql(
        table="""(
          SELECT md5(CASE WHEN doc_id%5=0 THEN printf('mirror %d', doc_id%37)
                          ELSE text END) AS content_hash,
                 CAST(CASE WHEN doc_id%5=0
                           THEN length(printf('mirror %d', doc_id%37))
                           ELSE n_chars END AS BIGINT) AS n_bytes
          FROM documents
        )""",
    ),
    "q218_weighted_median": _wmed_sql(
        table="documents", value_col="n_chars", weight_col="n_chars",
        group_col="lang",
    ),
    "q219_ks_drift": _ks_sql(
        table="events", key_col="event_type", ts_col="ts",
        value_col="value", split_expr="TIMESTAMP '2024-01-16'",
    ),
    "q220_keyness": _keyness_sql(
        table="documents", text_col="text", group_col="source",
        top_k=10, min_count=5,
    ),
    "q211_running_totals": _runtot_sql(
        table=_EVENTS_VALUED, key_col="user_id", ts_col="ts",
        id_col="event_id", value_col="value",
    ),
    "q212_interarrival": _gap_sql(
        table="events", key_col="user_id", ts_col="ts", id_col="event_id",
    ),
    "q213_attribution": f"""
        SELECT event_id, user_id, ts,
               coalesce(touch_id, -1) AS touch_id,
               coalesce(touch_type, '') AS touch_type
        FROM ({_attr_sql(table="events", key_col="user_id", ts_col="ts",
                         id_col="event_id", type_col="event_type",
                         conversion="purchase")})
    """,
    "q214_cusum_drift": _cusum_sql(
        table=_EVENTS_VALUED, key_col="event_type", ts_col="ts",
        id_col="event_id", value_col="value",
    ),
    "q215_unpivot": _unpivot_sql(
        table="lineitem",
        id_cols=["l_orderkey", "l_linenumber"],
        value_cols=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    ),
    "q216_benford": _benford_sql(
        table="(SELECT event_type, value FROM events "
              "WHERE value IS NOT NULL)",
        group_col="event_type", value_col="value", decimals=2,
    ),
    "q217_kwic": _kwic_sql(
        term="window merge", table="documents", id_col="doc_id",
        text_col="text", context=40,
    ),
    "q206_apply_changelog": _changelog_sql(
        base_table="""(
          SELECT printf('https://h%02d.example.org/p/%d',
                        (doc_id*48271)%29, doc_id) AS url,
                 printf('c%d', doc_id) AS content_hash
          FROM documents
        )""",
        log_table="""(
          SELECT printf('https://h%02d.example.org/p/%d',
                        (doc_id*48271)%29, doc_id) AS url,
                 doc_id AS seq,
                 CASE WHEN doc_id%9=0 THEN 'delete' ELSE 'upsert' END AS op,
                 CASE WHEN doc_id%9=0 THEN '' ELSE printf('n%d', doc_id)
                      END AS content_hash
          FROM documents WHERE doc_id%3=0
          UNION ALL
          SELECT printf('https://new.example.org/p/%d', doc_id) AS url,
                 doc_id + 1 AS seq, 'upsert' AS op,
                 printf('i%d', doc_id) AS content_hash
          FROM documents WHERE doc_id%10=0
        )""",
        key_col="url",
        value_cols=("content_hash",),
    ),
    "q207_global_rank": _grank_sql(
        table="(SELECT event_id, value FROM events "
              "WHERE value IS NOT NULL)",
        key_col="value", id_col="event_id",
    ),
    "q208_group_sample": _gsample_sql(
        k=20, table="documents", group_col="lang", id_col="doc_id"
    ),
    "q209_ohlc_bars": _ohlc_sql(
        every_us=3_600_000_000, table="events", key_col="user_id",
        ts_col="ts", value_col="value", id_col="event_id",
    ),
    "q210_heading_outline": """
        SELECT doc_id, CAST(1 AS BIGINT) AS pos, CAST(1 AS BIGINT) AS level,
               printf('Title %d', doc_id % 17) AS heading
        FROM documents
        UNION ALL
        SELECT doc_id, CAST(2 AS BIGINT), CAST(2 AS BIGINT),
               'Chapter two & more'
        FROM documents WHERE doc_id % 3 = 0
        UNION ALL
        SELECT doc_id,
               CAST(CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 2 END AS BIGINT),
               CAST(3 AS BIGINT),
               printf('deep dive %d', doc_id % 7)
        FROM documents WHERE doc_id % 5 = 0
    """,
    "q201_spearman_drift": _spearman_sql(
        table="events", group_col="event_type",
        x_expr="epoch_us(ts)", y_expr="value",
        where="value IS NOT NULL",
    ),
    "q202_user_modal_event": _mode_sql(
        table="events", group_col="user_id", value_col="event_type"
    ),
    "q203_json_ld": """
        SELECT doc_id,
               CASE doc_id % 5 WHEN 0 THEN 'Article'
                               WHEN 1 THEN 'Product'
                               WHEN 2 THEN 'NewsArticle'
                               ELSE '' END AS ld_type,
               CASE WHEN doc_id % 5 <= 2
                    THEN printf('Item %d', doc_id % 23)
                    ELSE '' END AS ld_name,
               CAST(CASE doc_id % 5 WHEN 0 THEN 1 WHEN 1 THEN 1
                                    WHEN 2 THEN 2 ELSE 0 END
                    AS BIGINT) AS n_ld_blocks
        FROM documents
    """,
    "q204_containment_join": _containment_sql(
        table="""(
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id,
                 array_to_string(
                   list_slice(wl, 1, (3 * len(wl) + 4) // 5), ' ') AS text
          FROM (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'),
                               x -> x <> '') AS wl
            FROM documents WHERE doc_id % 11 = 0
          ) WHERE len(wl) >= 5
        ) u""",
        threshold=(4, 5), ngram=3,
    ),
    "q205_welch_drift": _welch_sql(
        table="events", key_col="event_type", ts_col="ts",
        value_col="value", split_expr="TIMESTAMP '2024-01-16'",
    ),
    "q197_host_dup_profile": """
        WITH p AS (
          SELECT printf('h%02d.example.org', (doc_id*48271)%29) AS host,
                 md5(CASE WHEN doc_id%5=0 THEN printf('mirror %d', doc_id%37)
                          ELSE text END) AS h
          FROM documents
        ),
        c AS (SELECT h, count(*) AS n FROM p GROUP BY h)
        SELECT host, CAST(count(*) AS BIGINT) AS n_pages,
               CAST(sum(CASE WHEN c.n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup,
               round(sum(CASE WHEN c.n >= 2 THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS dup_rate
        FROM p JOIN c USING (h) GROUP BY host
    """,
    "q198_mirror_pairs": """
        WITH p AS (
          SELECT printf('h%02d.example.org', (doc_id*48271)%29) AS host,
                 md5(CASE WHEN doc_id%5=0 THEN printf('mirror %d', doc_id%37)
                          ELSE text END) AS h
          FROM documents
        ),
        d AS (SELECT DISTINCT h, host FROM p),
        pr AS (
          SELECT a.host AS host_a, b.host AS host_b,
                 CAST(count(*) AS BIGINT) AS n
          FROM d a JOIN d b ON a.h = b.h AND a.host < b.host
          GROUP BY a.host, b.host
        )
        SELECT host_a, host_b, n FROM pr
        ORDER BY n DESC, host_a, host_b LIMIT 20
    """,
    "q199_sitemap_coverage": """
        WITH e AS (
          SELECT DISTINCT
                 printf('h%02d.example.org', (doc_id*48271)%29) AS host,
                 printf('https://h%02d.example.org/p/%d',
                        (doc_id*48271)%29, doc_id) AS url
          FROM documents
        ),
        g AS (
          SELECT DISTINCT printf('https://h%02d.example.org/p/%d',
                                 (doc_id*48271)%29, doc_id) AS url
          FROM documents WHERE doc_id % 13 <> 0
        )
        SELECT host, CAST(count(*) AS BIGINT) AS n_expected,
               CAST(sum(CASE WHEN g.url IS NULL THEN 0 ELSE 1 END) AS BIGINT)
                 AS n_covered,
               round(sum(CASE WHEN g.url IS NULL THEN 0 ELSE 1 END)
                     / CAST(count(*) AS DOUBLE), 6) AS coverage
        FROM e LEFT JOIN g USING (url) GROUP BY host
    """,
    "q193_decile_bins": """
        WITH v AS (SELECT CAST(n_chars AS DOUBLE) AS val FROM documents),
        r AS (
          SELECT val, row_number() OVER (ORDER BY val) AS rn,
                 count(*) OVER () AS n
          FROM v
        ),
        th AS (
          SELECT j, max(CASE WHEN rn = CAST(ceil(j * n / 10.0) AS BIGINT)
                             THEN val END) AS t
          FROM r CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS j) js
          GROUP BY j
        ),
        b AS (
          SELECT val,
                 (SELECT count(*) FROM th WHERE th.t < v.val) AS bucket
          FROM v
        )
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(count(*) AS BIGINT) AS n,
               CAST(min(val) AS BIGINT) AS min_v,
               CAST(max(val) AS BIGINT) AS max_v
        FROM b GROUP BY bucket
    """,
    "q194_rolling_distinct": """
        WITH p AS (
          SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
        ),
        days AS (SELECT DISTINCT day FROM p)
        SELECT CAST(d.day AS TIMESTAMP) AS day,
               CAST(count(DISTINCT p.user_id) AS BIGINT) AS wau
        FROM days d JOIN p
          ON p.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
        GROUP BY d.day
    """,
    "q195_url_templates": """
        WITH u AS (
          SELECT 'https://h' || CAST(doc_id % 7 AS VARCHAR)
                 || '.example.org'
                 || CASE doc_id % 3
                    WHEN 0 THEN '/product/' || CAST(doc_id AS VARCHAR)
                                || '/review/' || CAST(doc_id % 13 AS VARCHAR)
                    WHEN 1 THEN '/blog/2024/' || CAST(doc_id % 12 + 1 AS VARCHAR)
                                || '/post-' || CAST(doc_id AS VARCHAR)
                    ELSE '/about?sid=' || CAST(doc_id AS VARCHAR)
                    END AS url
          FROM documents
        ),
        t AS (
          SELECT regexp_replace(regexp_replace(url, '[?#].*$', ''),
                                '[0-9]+', '{n}', 'g') AS template
          FROM u
        ),
        c AS (
          SELECT template, CAST(count(*) AS BIGINT) AS n
          FROM t GROUP BY template
        )
        SELECT template, n FROM c ORDER BY n DESC, template LIMIT 20
    """,
    "q196_table_linearize": """
        WITH dims AS (
          SELECT doc_id, doc_id % 3 + 1 AS r, doc_id % 4 + 1 AS c
          FROM documents WHERE doc_id % 2 = 0
        ),
        dat AS (
          SELECT doc_id, unnest(generate_series(1, r)) AS row_idx, c
          FROM dims
        ),
        cells AS (
          SELECT doc_id, row_idx,
                 unnest(generate_series(0, c - 1)) AS col_idx
          FROM dat
        )
        SELECT doc_id, CAST(0 AS BIGINT) AS table_idx,
               CAST(row_idx AS BIGINT) AS row_idx,
               string_agg(printf('h%d-%d: c%d-%d-%d', doc_id, col_idx,
                                 doc_id, row_idx, col_idx),
                          ' | ' ORDER BY col_idx) AS text
        FROM cells GROUP BY doc_id, row_idx
    """,
    "q192_source_quality_report": f"""
        WITH r AS (SELECT * FROM ({_readability_sql(
            table="documents", id_col="doc_id", text_col="text")})),
        chars AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '[\\s\\S]')) AS ch
          FROM documents
        ),
        counts AS (
          SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch
        ),
        tot AS (
          SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS L FROM counts
          GROUP BY doc_id
        ),
        ent AS (
          SELECT c.doc_id, -SUM((c.c / t.L) * log2(c.c / t.L)) AS e
          FROM counts c JOIN tot t USING (doc_id) GROUP BY c.doc_id
        ),
        j AS (
          SELECT d.source, r.n_words, r.flesch_proxy,
                 round(coalesce(ent.e, 0) + 0, 4) AS char_entropy
          FROM documents d
          JOIN r USING (doc_id)
          LEFT JOIN ent USING (doc_id)
        ),
        agg AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 round(sum(flesch_proxy) / count(*), 4) AS avg_flesch,
                 round(sum(char_entropy) / count(*), 4) AS avg_entropy,
                 round(sum(CASE WHEN flesch_proxy >= 40.0 AND n_words >= 50
                                THEN 1 ELSE 0 END)
                       / CAST(count(*) AS DOUBLE), 6) AS pass_rate
          FROM j GROUP BY source
        ),
        med AS (
          SELECT source, CAST(n_words AS BIGINT) AS median_words
          FROM (
            SELECT source, n_words,
                   row_number() OVER (PARTITION BY source ORDER BY n_words)
                     AS rn,
                   count(*) OVER (PARTITION BY source) AS n
            FROM j
          ) WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)
        )
        SELECT agg.source, agg.n_docs, med.median_words, agg.avg_flesch,
               agg.avg_entropy, agg.pass_rate
        FROM agg JOIN med USING (source)
    """,
    "q186_cume_dist": """
        SELECT event_id, event_type, value,
               round(cume_dist() OVER (PARTITION BY event_type
                                       ORDER BY value), 6) AS cume
        FROM events
    """,
    "q187_k_anonymity": """
        SELECT doc_id, lang, source FROM documents
        WHERE (lang, source) IN (
          SELECT (lang, source) FROM documents
          GROUP BY lang, source HAVING count(*) >= 8
        )
    """,
    "q188_personalized_pagerank": None,  # assigned post-dict (needs _Q118_EDGES)
    "q189_top_paths": """
        WITH s AS (
          SELECT user_id, event_type,
                 lead(event_type, 1) OVER w AS e2,
                 lead(event_type, 2) OVER w AS e3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        p AS (
          SELECT event_type || '>' || e2 || '>' || e3 AS path,
                 CAST(count(*) AS BIGINT) AS n
          FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
          GROUP BY 1
        )
        SELECT path, n FROM p ORDER BY n DESC, path LIMIT 20
    """,
    "q190_numeric_drift": """
        WITH a AS (SELECT * FROM events WHERE event_id % 2 = 0),
        b AS (SELECT * FROM events WHERE event_id % 2 = 1),
        stats AS (
          SELECT 'user_id' AS col,
                 (SELECT count(*) FROM a) AS n_a,
                 (SELECT round(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE), 6) FROM a) AS null_frac_a,
                 (SELECT round(sum(user_id) / CAST(count(user_id) AS DOUBLE), 6)
                   FROM a) AS mean_a,
                 (SELECT CAST(min(user_id) AS DOUBLE) FROM a) AS min_a,
                 (SELECT CAST(max(user_id) AS DOUBLE) FROM a) AS max_a,
                 (SELECT count(*) FROM b) AS n_b,
                 (SELECT round(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE), 6) FROM b) AS null_frac_b,
                 (SELECT round(sum(user_id) / CAST(count(user_id) AS DOUBLE), 6)
                   FROM b) AS mean_b,
                 (SELECT CAST(min(user_id) AS DOUBLE) FROM b) AS min_b,
                 (SELECT CAST(max(user_id) AS DOUBLE) FROM b) AS max_b
          UNION ALL
          SELECT 'value',
                 (SELECT count(*) FROM a),
                 (SELECT round(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE), 6) FROM a),
                 (SELECT round(sum(value) / CAST(count(value) AS DOUBLE), 6)
                   FROM a),
                 (SELECT CAST(min(value) AS DOUBLE) FROM a),
                 (SELECT CAST(max(value) AS DOUBLE) FROM a),
                 (SELECT count(*) FROM b),
                 (SELECT round(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE), 6) FROM b),
                 (SELECT round(sum(value) / CAST(count(value) AS DOUBLE), 6)
                   FROM b),
                 (SELECT CAST(min(value) AS DOUBLE) FROM b),
                 (SELECT CAST(max(value) AS DOUBLE) FROM b)
        )
        SELECT col, CAST(n_a AS BIGINT) AS n_a, null_frac_a, mean_a, min_a,
               max_a, CAST(n_b AS BIGINT) AS n_b, null_frac_b, mean_b, min_b,
               max_b, round(mean_b - mean_a, 6) AS mean_shift
        FROM stats
    """,
    "q191_daily_burst": _burst_sql(
        table="events", key_col="event_type", ts_col="ts",
        value_col="value", window=7, min_hist=3,
    ),
    "q181_html_tables": """
        WITH dims AS (
          SELECT doc_id, doc_id % 3 + 1 AS r, doc_id % 4 + 1 AS c
          FROM documents WHERE doc_id % 2 = 0
        ),
        hdr AS (
          SELECT doc_id, 0 AS row_idx,
                 unnest(generate_series(0, c - 1)) AS col_idx,
                 TRUE AS is_header
          FROM dims
        ),
        dat AS (
          SELECT doc_id, unnest(generate_series(1, r)) AS row_idx, c
          FROM dims
        ),
        datc AS (
          SELECT doc_id, row_idx,
                 unnest(generate_series(0, c - 1)) AS col_idx,
                 FALSE AS is_header
          FROM dat
        )
        SELECT doc_id, CAST(0 AS BIGINT) AS table_idx,
               CAST(row_idx AS BIGINT) AS row_idx,
               CAST(col_idx AS BIGINT) AS col_idx,
               printf('h%d-%d', doc_id, col_idx) AS cell, is_header
        FROM hdr
        UNION ALL
        SELECT doc_id, CAST(0 AS BIGINT), CAST(row_idx AS BIGINT),
               CAST(col_idx AS BIGINT),
               printf('c%d-%d-%d', doc_id, row_idx, col_idx), is_header
        FROM datc
    """,
    "q183_readability": _readability_sql(
        table="documents", id_col="doc_id", text_col="text"
    ),
    "q184_host_churn": """
        WITH olds AS (
          SELECT printf('https://h%03d.example.org/p/%d',
                        (doc_id*48271)%97, doc_id) AS url,
                 md5(CASE WHEN doc_id%5=0 THEN 'old:'||text ELSE text END) AS h
          FROM documents WHERE doc_id%17<>0
        ), news AS (
          SELECT printf('https://h%03d.example.org/p/%d',
                        (doc_id*48271)%97, doc_id) AS url,
                 md5(text) AS h
          FROM documents WHERE doc_id%13<>0
        ), d AS (
          SELECT regexp_extract(coalesce(o.url, n.url),
                                '^[^/]*//([^/?#]*)', 1) AS host,
                 CASE WHEN o.url IS NULL THEN 'added'
                      WHEN n.url IS NULL THEN 'removed'
                      WHEN o.h = n.h THEN 'unchanged'
                      ELSE 'changed' END AS change
          FROM olds o FULL JOIN news n ON o.url = n.url
        )
        SELECT host,
               CAST(sum(CASE WHEN change = 'added' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_added,
               CAST(sum(CASE WHEN change = 'removed' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_removed,
               CAST(sum(CASE WHEN change = 'changed' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_changed,
               CAST(sum(CASE WHEN change = 'unchanged' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_unchanged,
               round(sum(CASE WHEN change <> 'unchanged' THEN 1 ELSE 0 END)
                     / CAST(count(*) AS DOUBLE), 6) AS churn_rate
        FROM d GROUP BY host
    """,
    "q185_daily_activity": """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
               round(count(*) / CAST(count(DISTINCT user_id) AS DOUBLE), 6)
                 AS events_per_user,
               round(1.0 - count(DISTINCT user_id) / CAST(count(*) AS DOUBLE), 6)
                 AS repeat_rate
        FROM events GROUP BY date_trunc('day', ts)
    """,
    "q176_head_meta": """
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 3 THEN ''
                    ELSE printf('Doc %d overview', doc_id) END AS title,
               CASE WHEN doc_id % 2 = 0
                    THEN printf('https://canon.example.org/c/%d', doc_id // 4)
                    ELSE '' END AS canonical,
               CASE WHEN doc_id % 3 = 0
                    THEN printf('summary %d of document', doc_id % 13)
                    WHEN doc_id % 3 = 2
                    THEN printf('alt summary %d of document', doc_id % 13)
                    ELSE '' END AS description,
               doc_id % 2 = 0 AS has_canonical
        FROM documents
    """,
    "q177_politeness_schedule": f"""
        WITH f AS (
          SELECT printf('h%02d.example.org', doc_id % 37) AS host,
                 printf('https://h%02d.example.org/p/%d', doc_id % 37,
                        doc_id) AS url,
                 CAST((doc_id * 17) % 10 AS BIGINT) AS priority
          FROM documents
        )
        SELECT url, host, priority,
               CAST(row_number() OVER (PARTITION BY host
                 ORDER BY priority DESC, url) - 1 AS BIGINT) AS slot,
               CAST((row_number() OVER (PARTITION BY host
                 ORDER BY priority DESC, url) - 1) * {_Q177_DELAY_S}
                 AS BIGINT) AS fetch_offset_s
        FROM f
    """,
    "q178_recency_reputation": _recency_sql(
        table="events", key_col="event_type", value_col="value",
        ts_col="ts", half_life_days=7.0,
    ),
    "q179_source_lang_entropy": _catent_sql(
        table="documents", group_col="source", cat_col="lang"
    ),
    "q180_nucleus_sources": _nucleus_sql(
        table="documents", group_col="source", weight_col="n_chars",
        p_num=4, p_den=5,
    ),
    "q168_cube_lang_source": """
        SELECT coalesce(lang, 'ALL') AS lang,
               coalesce(source, 'ALL') AS source,
               CAST(sum(n_chars) AS BIGINT) AS n_chars_sum,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY CUBE(lang, source)
    """,
    "q169_classifier_eval": _eval_sql(
        """s AS (
          SELECT ((doc_id * 37) % 33) / 32.0 AS score,
                 ((doc_id * 37) % 33 + doc_id % 11) >= 22 AS label
          FROM documents
        )""",
        threshold=_Q169_THRESHOLD,
    ),
    "q170_source_gini": _gini_sql(
        "v AS (SELECT source, CAST(n_chars AS BIGINT) AS val FROM documents)",
        group_col="source",
    ),
    "q171_degree_distribution": _degree_sql(_Q118_EDGES),
    "q172_c4_line_filter": _c4_sql(
        _Q172_LINES_CTE, min_words=5, min_kept_lines=1
    ),
    "q173_novelty": _novelty_sql(
        """docs AS (
          SELECT doc_id, text, source IN ('src0', 'src1') AS is_ref
          FROM documents
        )""",
        n=3,
    ),
    "q174_fix_encoding": """
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0
                    THEN printf('caf%s and r%ssum%s %d %s it%ss fine.',
                                chr(233), chr(233), chr(233), doc_id,
                                chr(8212), chr(8217))
                    ELSE text END AS text,
               doc_id % 3 = 0 AS fixed
        FROM documents
    """,
    "q175_rrf_fusion": None,  # assigned below (needs _bm25_sql defined)
    "q158_naive_bayes": """
        WITH w AS (
          SELECT doc_id, source AS label,
                 unnest(string_split(text, ' ')) AS tok
          FROM documents
        ), c AS (
          SELECT label, tok, CAST(count(*) AS DOUBLE) AS n
          FROM w GROUP BY label, tok
        ), tot AS (
          SELECT label, sum(n) AS tot FROM c GROUP BY label
        ), v AS (
          SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v FROM w
        ), pr AS (
          SELECT source AS label, CAST(count(*) AS DOUBLE) AS ndl
          FROM documents GROUP BY source
        ), nd AS (
          SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents
        ), sc AS (
          SELECT w2.doc_id, t.label AS label,
                 sum(ln((coalesce(c.n, 0) + 1) / (t.tot + (SELECT v FROM v))))
                   AS s
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                FROM documents) w2
          CROSS JOIN tot t
          LEFT JOIN c ON c.label = t.label AND c.tok = w2.tok
          GROUP BY w2.doc_id, t.label, t.tot
        )
        SELECT sc.doc_id, sc.label AS label,
               round(sc.s + ln(pr.ndl / (SELECT nd FROM nd)), 4) AS nb_logprob
        FROM sc JOIN pr ON pr.label = sc.label
    """,
    "q159_markov_transitions": """
        WITH o AS (
          SELECT user_id, event_type,
                 lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                 ) AS nxt
          FROM events
        ), pr AS (
          SELECT event_type AS cur, nxt, CAST(count(*) AS BIGINT) AS n
          FROM o WHERE nxt IS NOT NULL GROUP BY event_type, nxt
        )
        SELECT cur, nxt, n,
               round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY cur), 6)
                 AS p
        FROM pr
    """,
    "q160_rollup_lang_source": """
        SELECT coalesce(lang, 'ALL') AS lang,
               coalesce(source, 'ALL') AS source,
               CAST(sum(n_chars) AS BIGINT) AS n_chars_sum,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY ROLLUP(lang, source)
    """,
    "q161_pareto_skyline": """
        WITH w AS (
          SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
                 max(l_discount) OVER (
                   ORDER BY l_extendedprice DESC, l_discount DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS md,
                 max(l_extendedprice) OVER (
                   PARTITION BY l_discount ORDER BY l_extendedprice DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mp
          FROM lineitem
        )
        SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
               l_extendedprice, l_discount
        FROM w
        WHERE (md IS NULL OR md <= l_discount)
          AND (mp IS NULL OR mp <= l_extendedprice)
    """,
    "q162_mad_outliers": """
        WITH r1 AS (
          SELECT event_id, event_type, value,
                 row_number() OVER (PARTITION BY event_type ORDER BY value)
                   AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM events
        ), med AS (
          SELECT event_type,
                 max(CASE WHEN rn = CAST(ceil(n / 2.0) AS BIGINT)
                          THEN value END) AS med
          FROM r1 GROUP BY event_type
        ), d AS (
          SELECT e.event_id, e.event_type, e.value,
                 abs(e.value - m.med) AS adev
          FROM events e JOIN med m USING (event_type)
        ), r2 AS (
          SELECT event_type, adev,
                 row_number() OVER (PARTITION BY event_type ORDER BY adev)
                   AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM d
        ), mad AS (
          SELECT event_type,
                 max(CASE WHEN rn = CAST(ceil(n / 2.0) AS BIGINT)
                          THEN adev END) AS mad
          FROM r2 GROUP BY event_type
        )
        SELECT d.event_id, d.event_type, d.value
        FROM d JOIN mad USING (event_type)
        WHERE d.adev > 3 * 1.4826 * mad.mad
    """,
    "q163_url_param_profile": """
        WITH u AS (
          SELECT printf('https://h%02d.example.org/p/%d',
                        doc_id % 37, doc_id % 11)
                 || CASE WHEN doc_id % 7 = 0 THEN ''
                         ELSE printf('?sid=%d&page=%d&ref=%s', doc_id,
                                     doc_id % 5,
                                     CASE WHEN doc_id % 3 = 0 THEN 'ads'
                                          ELSE 'organic' END)
                    END AS url
          FROM documents
        ), q AS (
          SELECT regexp_extract(url, '^[^/]*//([^/?#]*)', 1) AS host,
                 CASE WHEN strpos(url, '?') > 0
                      THEN substr(url, strpos(url, '?') + 1)
                      ELSE '' END AS qs
          FROM u
        ), kv AS (
          SELECT host, unnest(string_split(qs, '&')) AS pair
          FROM q WHERE qs <> ''
        ), p AS (
          SELECT host, split_part(pair, '=', 1) AS pkey,
                 CASE WHEN strpos(pair, '=') > 0
                      THEN substr(pair, strpos(pair, '=') + 1)
                      ELSE '' END AS pval
          FROM kv
        )
        SELECT host, pkey, CAST(count(*) AS BIGINT) AS n,
               CAST(count(DISTINCT pval) AS BIGINT) AS n_distinct,
               count(DISTINCT pval) / CAST(count(*) AS DOUBLE)
                 AS distinct_ratio,
               (count(DISTINCT pval) / CAST(count(*) AS DOUBLE)) > 0.5
                 AND count(*) >= 10 AS is_trap
        FROM p GROUP BY host, pkey
    """,
    "q164_left_outer_join": """
        SELECT o.o_orderkey, o.o_orderstatus,
               CAST(coalesce(l.l_linenumber, -1) AS BIGINT) AS l_linenumber,
               coalesce(l.l_quantity, 0.0) AS l_quantity
        FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    """,
    "q165_grouped_histogram": f"""
        WITH b AS (
          SELECT event_type,
                 CAST(least(greatest(floor((value - {_Q165_LO!r})
                        / {(_Q165_HI - _Q165_LO) / _Q165_BINS!r}), 0),
                      {_Q165_BINS - 1}) AS BIGINT) AS bin
          FROM events
        )
        SELECT event_type, bin, CAST(count(*) AS BIGINT) AS n
        FROM b GROUP BY event_type, bin
    """,
    "q166_day_over_day": """
        WITH m AS (
          SELECT event_type, date_trunc('day', ts) AS period,
                 sum(value) AS t
          FROM events GROUP BY event_type, date_trunc('day', ts)
        ), l AS (
          SELECT event_type, period, t,
                 lag(t) OVER (PARTITION BY event_type ORDER BY period)
                   AS pt
          FROM m
        )
        SELECT event_type, CAST(period AS TIMESTAMP) AS period,
               round(t, 4) AS total,
               round(pt, 4) AS prev_total,
               round((t - pt) / pt, 6) AS pct_change
        FROM l WHERE pt IS NOT NULL
    """,
    "q167_fuzzy_linkage": """
        WITH nm AS (
          SELECT doc_id,
                 printf('%06d entity record', doc_id // 2) AS base,
                 doc_id % 7 + 9 AS p
          FROM documents
        ), n2 AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 2 = 1
                      THEN substr(base, 1, CAST(p - 1 AS INT))
                           || substr(base, CAST(p + 1 AS INT))
                      ELSE base END AS name
          FROM nm
        )
        SELECT x.doc_id AS a, y.doc_id AS b,
               CAST(levenshtein(x.name, y.name) AS BIGINT) AS dist
        FROM n2 x JOIN n2 y
          ON substr(x.name, 1, 4) = substr(y.name, 1, 4)
         AND x.doc_id < y.doc_id
        WHERE levenshtein(x.name, y.name) <= 1
    """,
    "q151_cohort_retention": (
        "WITH ev AS (\n"
        "  SELECT user_id,\n"
        "         date_trunc('month', ts)\n"
        "           + to_months(CAST(12 * (user_id % 3) + (event_id * 7) % 40"
        " AS INT))\n"
        "           + (ts - date_trunc('month', ts)) AS ts\n"
        "  FROM events\n"
        "),\n" + _cohort_sql("ev")
    ),
    "q150_funnel": _funnel_sql(_Q150_STEPS, window_us=_Q150_WINDOW_US),
    "q149_profile_events": _prof_sql("events", _Q149_KINDS),
    "q148_quantize_embeddings": _quant_sql(),
    "q147_registrable_domains": f"""
        WITH docs AS (SELECT doc_id, source, lang, {_URL_CASE} AS url
                      FROM documents),
        h AS (
          SELECT CASE
            WHEN doc_id % 9 = 0 THEN
              'shop' || CAST(doc_id % 3 AS VARCHAR) || '.megacorp' ||
              CAST(doc_id % 5 AS VARCHAR) || '.co.uk'
            WHEN doc_id % 9 = 1 THEN
              'a.b.site' || CAST(doc_id % 4 AS VARCHAR) || '.com.au'
            WHEN doc_id % 9 = 2 THEN 'intranet-host'
            ELSE regexp_extract(url, '^[^/]*//([^/?#]*)', 1)
          END AS host
          FROM docs
        ),
        d AS (SELECT host, {_dom_sql("host")} AS domain FROM h)
        SELECT domain, count(*) AS n_docs,
               count(DISTINCT host) AS n_hosts
        FROM d GROUP BY domain
    """,
    "q146_crawl_frontier": f"""
        WITH {_Q146_URLS},
        kept AS (
          SELECT url, min(host) AS host, max(doc_id) AS doc_id
          FROM hosts GROUP BY url
        ),
        scored AS (
          SELECT k.url, k.host, {_Q146_PRIO} AS priority
          FROM kept k
          JOIN ({_pr_sql(_Q146_EDGES, damping=0.85, n_iter=3,
                         node_alias="host")}) pr USING (host)
        ),
        ranked AS (
          SELECT *, row_number() OVER
            (PARTITION BY host ORDER BY priority DESC, url) AS rn
          FROM scored
        )
        SELECT url, host, priority, CAST(rn AS BIGINT) AS host_rank
        FROM ranked WHERE rn <= {_Q146_K}
    """,
    "q145_script_mix": "WITH " + _Q145_AUG + "\n"
    + _script_sql(table="aug").lstrip().replace("WITH chars", ", chars", 1),
    "q142_pmi_collocations": _pmi_sql(
        window=_Q142_WINDOW, min_count=_Q142_MIN_COUNT
    ),
    "q143_host_components": """
        WITH RECURSIVE e AS (
          SELECT DISTINCT
                 printf('c%03d.example.org', CAST(doc_id % 120 AS INT)) AS src,
                 printf('c%03d.example.org', CAST(doc_id % 120 + 1 AS INT)) AS dst
          FROM documents WHERE (doc_id % 120) % 10 <> 9
        ),
        sym AS (SELECT src, dst FROM e UNION SELECT dst AS src, src AS dst FROM e),
        nodes AS (SELECT DISTINCT src AS node FROM sym),
        reach AS (
          SELECT node, node AS lbl FROM nodes
          UNION
          SELECT s.dst AS node, r.lbl FROM reach r JOIN sym s ON s.src = r.node
        )
        SELECT node AS host, min(lbl) AS component FROM reach GROUP BY node
    """,
    "q141_inverted_index": _inv_sql(
        min_df=_Q141_MIN_DF,
        max_df=f"floor({_Q141_MAXDF_FRAC} * (SELECT count(*) FROM documents))",
    ),
    "q140_host_disjoint_split": (
        f"WITH RECURSIVE docs AS (SELECT doc_id, {_URL_CASE} AS url"
        " FROM documents),\n"
        "hosts AS (SELECT doc_id,"
        " regexp_extract(url, '^[^/]*//([^/?#]*)', 1) AS host FROM docs),\n"
        + _split_sql(
            "hosts", "host",
            pcts=_Q140_PCTS, names=_Q140_NAMES, seed=_Q140_SEED,
        )
        + "\nSELECT h.doc_id, h.host, s.split"
        " FROM hosts h JOIN __split s USING (host)"
    ),
    "q139_char_entropy": r"""
        WITH chars AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS ch
          FROM documents
        ), counts AS (
          SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch
        ), tot AS (
          SELECT doc_id, CAST(SUM(c) AS DOUBLE) AS L,
                 count(*) AS u
          FROM counts GROUP BY doc_id
        ), ent AS (
          SELECT c.doc_id, -SUM((c.c / t.L) * log2(c.c / t.L)) AS e
          FROM counts c JOIN tot t USING (doc_id) GROUP BY c.doc_id
        )
        SELECT d.doc_id,
               CAST(length(d.text) AS BIGINT) AS n_chars_exact,
               CAST(coalesce(t.u, 0) AS BIGINT) AS n_unique_chars,
               round(coalesce(e.e, 0) + 0, 4) AS char_entropy
        FROM documents d
        LEFT JOIN tot t USING (doc_id)
        LEFT JOIN ent e USING (doc_id)
    """,
    "q130_bm25_rank": _bm25_sql(_BM25_TERMS),
    "q131_weighted_sample": _ws_sql(k=50, weight_col="n_chars", seed=7),
    "q137_resolve_redirects": """
        WITH RECURSIVE e AS (
          SELECT printf('https://r.example.org/%d', doc_id) AS src,
                 printf('https://r.example.org/%d', doc_id - 1) AS dst
          FROM documents WHERE doc_id % 10 <> 0
          UNION ALL
          SELECT printf('https://rx.example.org/%d', doc_id),
                 printf('https://ry.example.org/%d', doc_id)
          FROM documents WHERE doc_id % 40 = 0
          UNION ALL
          SELECT printf('https://ry.example.org/%d', doc_id),
                 printf('https://rx.example.org/%d', doc_id)
          FROM documents WHERE doc_id % 40 = 0
        ),
        walk(src, cur, hops) AS (
          SELECT src, dst, 1 FROM e
          UNION ALL
          SELECT w.src, e.dst, w.hops + 1
          FROM walk w JOIN e ON w.cur = e.src WHERE w.hops < 8
        ),
        last AS (
          SELECT src, cur, hops,
                 row_number() OVER (PARTITION BY src ORDER BY hops DESC) AS rn
          FROM walk
        )
        SELECT l.src,
               CASE WHEN t.src IS NULL THEN l.cur ELSE '' END AS final_url,
               CAST(CASE WHEN t.src IS NULL THEN l.hops ELSE 0 END AS BIGINT) AS n_hops,
               CASE WHEN t.src IS NULL THEN 'resolved' ELSE 'unresolved' END AS status
        FROM last l LEFT JOIN (SELECT DISTINCT src FROM e) t ON l.cur = t.src
        WHERE l.rn = 1
    """,
    "q136_sitemap_freshness": r"""
        WITH ex AS (
          SELECT doc_id,
                 unnest(generate_series(0, doc_id % 3)) AS j
          FROM documents
        ), ent AS (
          SELECT doc_id, j,
                 '<url><loc>'
                 || printf('https://h%03d.example.org/s/%d/%d',
                           (doc_id*48271)%97, doc_id, j)
                 || '</loc>'
                 || CASE WHEN (doc_id + j) % 4 <> 0
                         THEN '<lastmod>'
                              || printf('2024-%02d-%02d',
                                        (doc_id+j)%12 + 1, (doc_id*7+j)%28 + 1)
                              || '</lastmod>'
                         ELSE '' END
                 || '</url>' AS entry
          FROM ex
        ), sm AS (
          SELECT doc_id,
                 '<urlset>' || string_agg(entry, '' ORDER BY j) || '</urlset>' AS xml
          FROM ent GROUP BY doc_id
        ), blk AS (
          SELECT unnest(regexp_extract_all(xml, '<url>.*?</url>', 0)) AS b FROM sm
        ), f AS (
          SELECT regexp_extract(b, '<loc>\s*([^<]*?)\s*</loc>', 1) AS loc,
                 regexp_extract(b, '<lastmod>\s*([^<]*?)\s*</lastmod>', 1) AS lastmod
          FROM blk
        ), h AS (
          SELECT regexp_extract(loc, '^[^/]*//([^/?#]*)', 1) AS host, lastmod FROM f
        )
        SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
               CAST(count(*) FILTER (lastmod <> '') AS BIGINT) AS n_dated,
               max(lastmod) AS last_mod
        FROM h GROUP BY host
    """,
    "q135_unicode_normalize": r"""
        WITH raws AS (
          SELECT doc_id,
                 text || ' ' || repeat(chr(101) || chr(769), doc_id % 3 + 1)
                      || chr(7) || chr(8491) AS raw
          FROM documents
        ), n AS (
          SELECT doc_id, raw,
                 regexp_replace(nfc_normalize(raw),
                                '[\x00-\x08\x0b-\x1f\x7f]', '', 'g') AS text_norm
          FROM raws
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id, text_norm,
               CAST(length(raw) AS BIGINT) AS n_cp_raw,
               CAST(length(text_norm) AS BIGINT) AS n_cp_norm
        FROM n
    """,
    "q133_snapshot_diff": """
        WITH olds AS (
          SELECT printf('https://h%03d.example.org/p/%d',
                        (doc_id*48271)%97, doc_id) AS url,
                 md5(CASE WHEN doc_id%5=0 THEN 'old:'||text ELSE text END) AS h
          FROM documents WHERE doc_id%17<>0
        ), news AS (
          SELECT printf('https://h%03d.example.org/p/%d',
                        (doc_id*48271)%97, doc_id) AS url,
                 md5(text) AS h
          FROM documents WHERE doc_id%13<>0
        )
        SELECT coalesce(o.url, n.url) AS url,
               CASE WHEN o.url IS NULL THEN 'added'
                    WHEN n.url IS NULL THEN 'removed'
                    WHEN o.h = n.h THEN 'unchanged'
                    ELSE 'changed' END AS change,
               coalesce(o.h, '') AS old_hash, coalesce(n.h, '') AS new_hash
        FROM olds o FULL JOIN news n ON o.url = n.url
    """,
    "q132_host_template_removal": """
        WITH w AS (
          SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
        ), ex AS (
          SELECT doc_id, source, ws,
                 unnest(generate_series(0, CAST(ceil(len(ws)/2.0) AS BIGINT)-1)) AS s
          FROM w
        ), seg AS (
          SELECT doc_id, source, s,
                 array_to_string(ws[(s*2+1):(s*2+2)], ' ') AS segment
          FROM ex
        ), tmpl AS (
          SELECT source, segment FROM seg GROUP BY source, segment
          HAVING count(DISTINCT doc_id) >= 5
        ), kept AS (
          SELECT seg.doc_id, seg.s, seg.segment
          FROM seg LEFT JOIN tmpl
            ON seg.source = tmpl.source AND seg.segment = tmpl.segment
          WHERE tmpl.segment IS NULL
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               string_agg(segment, ' ' ORDER BY s) AS text_clean,
               CAST(count(*) AS BIGINT) AS n_segs_kept
        FROM kept GROUP BY doc_id
    """,
    "q126_chunk_documents": _chunk_sql(chunk_words=64, overlap=16),
    "q129_surt_cdx_dedup": _Q129_SQL,
    # recursive-CTE transitive closure == min-label connected components:
    # the full SQL check of the distributed cluster finish (q128)
    "q128_connected_components": """
        WITH RECURSIVE
        e0 AS (
          SELECT doc_id AS a, doc_id - 1 AS b FROM documents WHERE doc_id % 6 <> 0
          UNION ALL
          SELECT doc_id, (doc_id // 36) * 36 FROM documents
          WHERE doc_id % 6 = 0 AND doc_id % 36 <> 0
        ),
        ed AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
        nodes AS (SELECT DISTINCT a AS n FROM ed),
        reach(n, m) AS (
          SELECT n, n FROM nodes
          UNION
          SELECT r.n, ed.b FROM reach r JOIN ed ON r.m = ed.a
        ),
        lab AS (SELECT n, MIN(m) AS component FROM reach GROUP BY n)
        SELECT CAST(component AS BIGINT) AS component,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(MIN(n) AS BIGINT) AS min_id,
               CAST(MAX(n) AS BIGINT) AS max_id,
               CAST(SUM(n) AS BIGINT) AS sum_id
        FROM lab GROUP BY component ORDER BY component
    """,
    "q118_host_pagerank": _pr_sql(
        _Q118_EDGES, damping=0.85, n_iter=3, node_alias="host"
    ),
    "q138_host_hits": _hits_sql(_Q118_EDGES, n_iter=3, node_alias="host"),
    "q152_triangle_clustering": _tri_sql(_Q118_EDGES, node_alias="host"),
    "q153_resample_ffill": _resample_sql(every_us=_Q153_EVERY_US),
    "q154_rolling_window": _rolling_sql(window=4),
    "q155_similarity_join": _simjoin_sql(threshold=(1, 2), ngram=3),
    "q156_crawl_depth": _bfs_sql(
        _Q118_EDGES, _Q156_SEEDS, max_hops=3, node_alias="host"
    ),
    "q157_user_trend": _trend_sql(),
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_quantity) / count(*), 4) AS avg_qty,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "q02_high_quantity_items": """
        SELECT l_orderkey, l_partkey, l_quantity
        FROM lineitem WHERE l_quantity >= 45
    """,
    "q03_top_revenue_orders": """
        SELECT o.o_orderkey, o.o_orderpriority,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority
        ORDER BY revenue DESC, o.o_orderkey ASC LIMIT 10
    """,
    "q04_orders_by_status": """
        SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
               round(sum(o_totalprice), 2) AS total_price,
               round(sum(o_totalprice) / count(*), 4) AS avg_price
        FROM orders GROUP BY o_orderstatus
    """,
    "q05_orders_by_segment": """
        SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o.o_totalprice), 2) AS total
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    "q06_customers_with_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
    "q07_customers_without_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    "q08_top_customers": """
        SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal
        FROM customer ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 10
    """,
    "q09_distinct_segments": """
        SELECT DISTINCT c_mktsegment FROM customer
    """,
    "q10_customers_per_region": """
        SELECT r.r_name, CAST(count(*) AS BIGINT) AS n_customers
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
    """,
    "q11_events_hourly": """
        SELECT event_type,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 3) AS sum_value
        FROM events GROUP BY event_type, hour
    """,
    "q12_sessionize": """
        WITH o AS (
          SELECT user_id, event_id, ts,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events
        ), m AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > 1800
                      THEN 1 ELSE 0 END AS new_s
          FROM o
        ), s AS (
          SELECT user_id, event_id,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
          FROM m
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               CAST(count(*) AS BIGINT) AS n_events
        FROM s GROUP BY user_id, session_id
    """,
    "q13_part_brand_stats": """
        SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
               CAST(max(p_size) AS BIGINT) AS max_size,
               round(sum(p_retailprice) / count(*), 4) AS avg_price
        FROM part GROUP BY p_brand
    """,
    "q14_doc_token_counts": """
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT)
                 AS ws_tokens
        FROM documents
    """,
    "q15_doc_quality": """
        WITH b AS (
          SELECT doc_id,
                 CAST(length(text) AS BIGINT) AS n_chars_text,
                 CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT)
                   AS n_words,
                 CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS n_nonspace
          FROM documents
        )
        SELECT doc_id, n_chars_text, n_words,
               round(CASE WHEN n_words = 0 THEN 0.0
                          ELSE CAST(n_nonspace AS DOUBLE) / n_words END, 4) AS mean_word_len
        FROM b
    """,
    "q16_dedup_docs_exact": """
        SELECT text, CAST(min(doc_id) AS BIGINT) AS keep_id,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM documents GROUP BY text
    """,
    "q17_lang_counts": """
        SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
    """,
    "q18_docs_en_long": """
        SELECT doc_id, source, n_chars FROM documents
        WHERE lang = 'en' AND n_chars > 300
    """,
    "q19_events_type_stats": """
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 3) AS sum_value,
               round(min(value), 3) AS min_value,
               round(max(value), 3) AS max_value
        FROM events GROUP BY event_type
    """,
    "q20_knn_brute": """
        SELECT query_id, vec_id FROM (
          SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(e.embedding, q.embedding) DESC,
                            e.vec_id ASC
                 ) AS rn
          FROM embeddings e
          CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 2) q
        ) WHERE rn <= 10
    """,
    "q21_label_counts": """
        SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n
        FROM embeddings GROUP BY label
    """,
    "q22_supplier_nation_rollup": """
        SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
               round(sum(s.s_acctbal), 2) AS total_bal
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    "q23_events_user_first": """
        SELECT user_id, event_id, event_type FROM (
          SELECT user_id, event_id, event_type,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events
        ) WHERE rn = 1
    """,
    "q24_credit_reducer": """
        SELECT c.c_custkey AS user_id,
               round(c.c_acctbal - count(o.o_orderkey) / 10.0, 2) AS credits,
               CAST(count(o.o_orderkey) AS BIGINT) AS n_generated
        FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_acctbal
    """,
    "q25_salted_user_counts": """
        SELECT user_id, CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 3) AS sum_value
        FROM events GROUP BY user_id
    """,
    "q27_props_json_extract": """
        SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
        FROM events
    """,
    "q28_streaming_window": """
        SELECT event_type,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS "window",
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 3) AS sum_value
        FROM events GROUP BY event_type, "window"
    """,
    "q29_topk_per_group": """
        SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS c_acctbal FROM (
          SELECT c_custkey, c_mktsegment, c_acctbal,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
          FROM customer
        ) WHERE rn <= 2
    """,
    "q43_event_median": """
        SELECT event_type, round(median(value), 4) AS median_value
        FROM events GROUP BY event_type
    """,
    "q44_train_split": """
        SELECT doc_id, lang FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
    """,
    "q45_stratified_sample_counts": """
        SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4'
        GROUP BY lang
    """,
    "q47_asof_join": """
        SELECT e.event_id, e.user_id, CAST(o.o_orderkey AS BIGINT) AS o_orderkey
        FROM events e
        ASOF JOIN (
          SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
          FROM orders GROUP BY o_custkey, o_orderdate
        ) o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    "q50_bucketed_join": """
        SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o.o_totalprice), 2) AS total
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    "q51_redact_pii": """
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     array_to_string(list_slice(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''), 1, 6), ' ')
                       || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com or 555-000-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' end',
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\\+?[0-9][0-9()\\-\\s]{7,}[0-9]', '<PHONE>', 'g'),
                 '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>', 'g') AS redacted
        FROM documents
    """,
    "q53_bloom_semi_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
    "q55_range_join": """
        WITH bands(band, lo, hi) AS (
          VALUES ('b0', 0.0, 20.0), ('b20', 20.0, 40.0), ('b40', 40.0, 60.0),
                 ('b60', 60.0, 80.0), ('b80', 80.0, 1e18)
        )
        SELECT b.band, CAST(count(*) AS BIGINT) AS n,
               round(sum(e.value), 3) AS sum_value
        FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
        GROUP BY b.band
    """,
    "q57_group_zscore": """
        SELECT event_id, user_id,
               round(CASE WHEN sd IS NULL OR sd = 0 THEN 0.0
                          ELSE (value - mu) / sd END, 4) AS value_z
        FROM (
          SELECT event_id, user_id, value,
                 avg(value) OVER (PARTITION BY user_id) AS mu,
                 stddev_samp(value) OVER (PARTITION BY user_id) AS sd
          FROM events
        )
    """,
    "q58_pivot_events": """
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
        FROM events GROUP BY user_id
    """,
    "q59_rollup_orders": """
        SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
               coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "q60_above_nation_avg": """
        SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
               round(c_acctbal, 2) AS c_acctbal
        FROM customer c
        WHERE c_acctbal > (
          SELECT avg(c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
        )
    """,
    "q61_set_ops": """
        SELECT c_custkey, 'intersect' AS set_op FROM (
          SELECT DISTINCT o_custkey AS c_custkey FROM orders
          INTERSECT
          SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 200000
        )
        UNION ALL
        SELECT c_custkey, 'except' AS set_op FROM (
          SELECT DISTINCT o_custkey AS c_custkey FROM orders
          EXCEPT
          SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 200000
        )
    """,
    "q62_weighted_avg": """
        SELECT l_suppkey,
               round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
                 AS weighted_avg_price
        FROM lineitem GROUP BY l_suppkey
    """,
    "q63_percentiles": """
        SELECT event_type,
               round(quantile_cont(value, 0.5), 4) AS p50,
               round(quantile_cont(value, 0.9), 4) AS p90,
               round(quantile_cont(value, 0.99), 4) AS p99
        FROM events GROUP BY event_type
    """,
    "q64_string_functions": """
        SELECT p_partkey,
               upper(p_name) AS upper_name,
               substr(p_name, 1, 5) AS first5,
               p_brand || ': ' || p_name AS branded,
               CAST(length(p_name) AS BIGINT) AS name_len,
               replace(p_name, ' ', '-') AS dashed
        FROM part
    """,
    "q65_orders_by_year": """
        SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS year,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY year
    """,
    "q66_union_sources": """
        SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM (
          SELECT event_type FROM events WHERE ts <  TIMESTAMP '2024-01-15 00:00:00'
          UNION ALL
          SELECT event_type FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
        ) GROUP BY event_type
    """,
    "q67_bloom_anti_join": """
        SELECT p_partkey, p_name FROM part
        WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_partkey < 50)
    """,
    "q68_props_stats": """
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               round(CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS DOUBLE)
                     / count(*), 4) AS avg_k
        FROM events GROUP BY event_type
    """,
    "q69_filtered_revenue": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    "q71_month_over_month": """
        SELECT year, month, revenue,
               round(coalesce(revenue - lag(revenue) OVER (ORDER BY year, month), 0.0), 2) AS delta
        FROM (
          SELECT CAST(date_part('year', o_orderdate) AS BIGINT) AS year,
                 CAST(date_part('month', o_orderdate) AS BIGINT) AS month,
                 round(sum(o_totalprice), 2) AS revenue
          FROM orders GROUP BY year, month
        )
    """,
    "q72_distinct_per_group": """
        SELECT l_suppkey, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_distinct_parts
        FROM lineitem GROUP BY l_suppkey
    """,
    "q73_split_priority": """
        SELECT CAST(regexp_extract(o_orderpriority, '^([0-9]+)-(.+)$', 1) AS BIGINT) AS code,
               regexp_extract(o_orderpriority, '^([0-9]+)-(.+)$', 2) AS label,
               CAST(count(*) AS BIGINT) AS n
        FROM orders GROUP BY code, label
    """,
    "q74_string_agg": """
        SELECT CAST(n_regionkey AS BIGINT) AS n_regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM nation GROUP BY n_regionkey
    """,
    "q48_ngram_jaccard_pairs": """
        WITH base AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS w
          FROM documents WHERE doc_id % 7 = 0
        ), pair AS (
          SELECT doc_id, w,
                 list_transform(
                   list_filter(range(1, len(w) + 1), i -> (i - 1) % 5 != 0),
                   i -> w[i]) AS wv
          FROM base
        ), sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(1, len(w) - 1),
                   i -> array_to_string(list_slice(w, i, i + 2), ' '))) AS s1,
                 list_distinct(list_transform(range(1, len(wv) - 1),
                   i -> array_to_string(list_slice(wv, i, i + 2), ' '))) AS s2
          FROM pair
        )
        SELECT doc_id,
               round(CAST(len(list_intersect(s1, s2)) AS DOUBLE)
                     / (len(s1) + len(s2) - len(list_intersect(s1, s2))), 4) AS jaccard
        FROM sh
    """,
    "q86_decontaminate": """
        WITH bmin AS (
          SELECT min(doc_id) AS id FROM documents WHERE doc_id % 97 = 0
        ),
        snip AS (
          SELECT array_to_string(
                   list_slice(
                     list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''),
                     1, 12),
                   ' ') AS s
          FROM documents, bmin WHERE doc_id = bmin.id
        ),
        corpus AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 13 = 5
                      THEN coalesce(text, '') || ' ' || (SELECT s FROM snip)
                      ELSE text END AS text
          FROM documents
        ),
        words AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
          FROM corpus
        ),
        g_rows AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(ws) - 7),
                                       i -> array_to_string(list_slice(ws, i, i + 7), ' '))) AS g
          FROM words WHERE len(ws) >= 8
        ),
        bench AS (SELECT DISTINCT g FROM g_rows WHERE doc_id % 97 = 0)
        SELECT r.doc_id, CAST(count(b.g) > 0 AS BOOLEAN) AS contaminated
        FROM g_rows r LEFT JOIN bench b USING (g)
        WHERE r.doc_id % 97 <> 0
        GROUP BY r.doc_id
        ORDER BY r.doc_id
    """,
    "q26_field_extractors": """
        SELECT doc_id,
               array_to_string(
                 list_slice(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''), 1, 5),
                 ' ') AS ocr_text,
               '{"k": ' || CAST(doc_id % 5 AS VARCHAR) || '}' AS json_block
        FROM documents
    """,
    "q75_inverted_index": """
        WITH p AS (
          SELECT DISTINCT doc_id,
                 unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS token
          FROM documents
        )
        SELECT token, CAST(count(*) AS BIGINT) AS df,
               array_to_string(list_slice(list_sort(list(doc_id)), 1, 10), ',') AS postings
        FROM p GROUP BY token HAVING count(*) >= 20
    """,
    "q76_top_bigrams": """
        WITH w AS (
          SELECT list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
          FROM documents
        ), b AS (
          SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bigram
          FROM w
        )
        SELECT bigram, CAST(count(*) AS BIGINT) AS n
        FROM b GROUP BY bigram ORDER BY n DESC, bigram ASC LIMIT 20
    """,
    "q77_hash_sample": """
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents ORDER BY h ASC, doc_id ASC LIMIT 64
    """,
    "q85_string_key_join": """
        SELECT lang, upper(lang) || '-LBL' AS lang_label,
               CAST(count(*) AS BIGINT) AS n
        FROM documents GROUP BY lang
    """,
    "q84_streaming_sessionize": """
        WITH o AS (
          SELECT user_id, event_id, ts,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events
        ), m AS (
          SELECT user_id, event_id, ts,
                 CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > 1800
                      THEN 1 ELSE 0 END AS new_s
          FROM o
        ), s AS (
          SELECT user_id, event_id,
                 sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
          FROM m
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               CAST(count(*) AS BIGINT) AS n_events
        FROM s GROUP BY user_id, session_id
    """,
    "q83_skewed_join": """
        SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n,
               round(sum(e.value), 3) AS sum_value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    "q81_doc_chunks": """
        WITH w AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
          FROM documents
        ), d AS (
          SELECT doc_id, ws, len(ws) AS n FROM w WHERE len(ws) > 0
        ), k AS (
          SELECT doc_id, ws, n,
                 unnest(range(0, 1 + CAST(ceil(greatest(n - 64, 0) / 56.0) AS BIGINT)))
                   AS cid
          FROM d
        )
        SELECT doc_id, cid AS chunk_id,
               CAST(least(n - cid * 56, 64) AS BIGINT) AS n_words,
               ws[cid * 56 + 1] AS first_word
        FROM k
    """,
    "q82_source_quota": """
        SELECT doc_id, source FROM (
          SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
          FROM documents
        ) WHERE rn <= 50
    """,
    "q80_sliding_window": """
        WITH e AS (
          SELECT event_type, value, CAST(epoch_us(ts) AS BIGINT) AS t
          FROM events
        ), x AS (
          SELECT event_type, value,
                 unnest(range((t - 3600000000) // 900000000 + 1,
                              t // 900000000 + 1)) AS k
          FROM e
        )
        SELECT event_type, CAST(k * 900 AS BIGINT) AS window_start,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 3) AS sum_value
        FROM x GROUP BY event_type, window_start
    """,
    "q79_quantile_sketch": """
        WITH mm AS (
          SELECT min(value) AS lo, max(value) AS hi,
                 CAST(count(*) AS BIGINT) AS n
          FROM events
        ), h AS (
          SELECT least(greatest(CAST(floor((value - mm.lo) / (mm.hi - mm.lo) * 4096)
                                     AS BIGINT), 0), 4095) AS b,
                 count(*) AS cnt
          FROM events, mm GROUP BY b
        ), c AS (
          SELECT b, sum(cnt) OVER (ORDER BY b) AS cum FROM h
        ), qs(q) AS (
          VALUES (CAST(0.1 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
                 (CAST(0.9 AS DOUBLE)), (CAST(0.99 AS DOUBLE))
        )
        SELECT qs.q AS q,
               round(mm.lo + (least(
                 (SELECT min(c.b) FROM c WHERE c.cum >= qs.q * (mm.n - 1) + 1),
                 4095) + 0.5) / 4096 * (mm.hi - mm.lo), 6) AS value
        FROM qs, mm
    """,
    "q78_tfidf_top_term": """
        WITH w AS (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS term
          FROM documents
        ), tf AS (
          SELECT doc_id, term, count(*) AS tf FROM w GROUP BY doc_id, term
        ), df AS (
          SELECT term, count(DISTINCT doc_id) AS df FROM w GROUP BY term
        ), nd AS (
          SELECT count(*) AS n FROM documents
        ), s AS (
          SELECT tf.doc_id, tf.term,
                 tf.tf * ln(CAST(nd.n AS DOUBLE) / df.df) AS score
          FROM tf JOIN df USING (term) CROSS JOIN nd
        )
        SELECT doc_id, term AS top_term FROM (
          SELECT doc_id, term,
                 row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rn
          FROM s
        ) WHERE rn = 1
    """,
    "q87_normalized_dedup": """
        WITH n AS (
          SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
          FROM documents
        ), r AS (
          SELECT doc_id, n_chars,
                 row_number() OVER (PARTITION BY norm ORDER BY n_chars DESC, doc_id) AS rn,
                 count(*) OVER (PARTITION BY norm) AS n_copies
          FROM n
        )
        SELECT CAST(doc_id AS BIGINT) AS keep_id, n_chars,
               CAST(n_copies AS BIGINT) AS n_copies
        FROM r WHERE rn = 1
    """,
    "q89_remove_frequent_segments": """
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), ex AS (
          SELECT doc_id, ws,
                 unnest(generate_series(0, CAST(ceil(len(ws)/2.0) AS BIGINT)-1)) AS s
          FROM w
        ), seg AS (
          SELECT doc_id, s, array_to_string(ws[(s*2+1):(s*2+2)], ' ') AS segment FROM ex
        ), freq AS (
          SELECT segment FROM seg GROUP BY segment
          HAVING count(DISTINCT doc_id) >= 20
        ), kept AS (
          SELECT doc_id, s, segment FROM seg
          WHERE segment NOT IN (SELECT segment FROM freq)
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               string_agg(segment, ' ' ORDER BY s) AS text_clean,
               CAST(count(*) AS BIGINT) AS n_segs_kept
        FROM kept GROUP BY doc_id
    """,
    "q90_unigram_logprob": """
        WITH w AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        ), c AS (
          SELECT tok, count(*) AS n FROM w GROUP BY tok
        ), t AS (
          SELECT CAST(sum(n) AS DOUBLE) AS total FROM c
        )
        SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               round(avg(ln(c.n / t.total)), 4) AS avg_logprob
        FROM w JOIN c USING (tok) CROSS JOIN t
        GROUP BY w.doc_id
    """,
    "q113_bigram_logprob": """
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), b AS (
          SELECT doc_id, unnest(list_transform(
                   generate_series(1, len(ws) - 1),
                   i -> struct_pack(w1 := ws[i], w2 := ws[i + 1]))) AS p
          FROM w WHERE len(ws) >= 2
        ), pairs AS (
          SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM b
        ), c AS (
          SELECT w1, w2, CAST(count(*) AS DOUBLE) AS n
          FROM pairs GROUP BY w1, w2
        ), pfx AS (
          SELECT w1, sum(n) AS cp FROM c GROUP BY w1
        )
        SELECT pairs.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               round(avg(ln(c.n / pfx.cp)), 4) AS avg_logprob2
        FROM pairs JOIN c USING (w1, w2) JOIN pfx USING (w1)
        GROUP BY pairs.doc_id
    """,
    "q114_winsorize": """
        WITH r AS (
          SELECT event_id, event_type, value,
                 row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM events
        ), q AS (
          SELECT event_type,
                 max(CASE WHEN rn = CAST(ceil(n / 20.0) AS BIGINT)
                          THEN value END) AS qlo,
                 max(CASE WHEN rn = CAST(ceil(19 * n / 20.0) AS BIGINT)
                          THEN value END) AS qhi
          FROM r GROUP BY event_type
        )
        SELECT r.event_id, r.event_type,
               round(least(greatest(r.value, q.qlo), q.qhi), 3) AS value_w
        FROM r JOIN q USING (event_type)
    """,
    "q115_curriculum_order": f"""
        WITH t AS (
          SELECT doc_id, n_chars,
                 CASE WHEN n_chars < 600 THEN 0
                      WHEN n_chars < 900 THEN 1 ELSE 2 END AS tier,
                 {_sm_sql("doc_id", 7)} AS h
          FROM documents
        )
        SELECT doc_id, n_chars, CAST(tier AS BIGINT) AS tier,
               CAST(row_number() OVER (ORDER BY tier, h, doc_id) - 1
                    AS BIGINT) AS pos
        FROM t
    """,
    "q116_snapshot_dedup": """
        SELECT event_id, user_id, snapshot_window FROM (
          SELECT event_id, user_id,
                 CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT)
                   AS snapshot_window,
                 row_number() OVER (
                   PARTITION BY user_id,
                                CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT)
                   ORDER BY ts, event_id) AS rn
          FROM events
        ) WHERE rn = 1
    """,
    "q125_interval_join": """
        WITH iv AS (
          SELECT p_partkey,
                 (CAST(floor(p_retailprice) AS BIGINT) % 90) AS lo,
                 (CAST(floor(p_retailprice) AS BIGINT) % 90) + 3 + p_partkey % 7 AS hi
          FROM part
          WHERE p_partkey % 41 = 0
        )
        SELECT iv.p_partkey,
               count(*) AS n_events,
               round(sum(e.value), 3) AS sum_value
        FROM iv JOIN events e ON e.value BETWEEN iv.lo AND iv.hi
        GROUP BY iv.p_partkey
        ORDER BY iv.p_partkey
    """,
    "q127_robots_gate": """
        WITH u AS (
          SELECT doc_id,
                 (doc_id * 48271) % 97 AS k,
                 (CASE WHEN doc_id % 19 = 0 THEN '/casino/x/'
                       WHEN doc_id % 23 = 0 THEN '/t/'
                       ELSE '/p/' END) || doc_id AS path
          FROM documents
        )
        SELECT doc_id,
               'https://' || printf('h%03d.example.org', k) || path AS url,
               CASE
                 WHEN k % 7 = 0 THEN 'disallowed'
                 WHEN k % 5 = 0 AND (path LIKE '/casino%' OR path LIKE '/t/%')
                   THEN 'disallowed'
                 WHEN k % 5 = 0 THEN 'allowed'
                 WHEN k % 3 = 0 AND path LIKE '/p/9%' THEN 'disallowed'
                 ELSE 'allowed'
               END AS robots_verdict
        FROM u
        ORDER BY doc_id
    """,
    "q123_url_filter": """
        WITH u AS (
          SELECT doc_id,
                 (CASE WHEN doc_id % 29 = 0 THEN 'ftp' ELSE 'https' END)
                 || '://'
                 || (CASE WHEN doc_id % 17 = 0 THEN 'ads.tracker.example.org'
                          ELSE printf('h%03d.example.org', (doc_id * 48271) % 97) END)
                 || (CASE WHEN doc_id % 19 = 0 THEN '/casino/x'
                          WHEN doc_id % 23 = 0 THEN '/a/b/c/d/e/f/g/h/i'
                          ELSE '/p' END)
                 || '/' || doc_id
                 || (CASE WHEN doc_id % 13 = 0 THEN '?a=1&b=2&c=3&d=4&e=5' ELSE '' END)
                 AS url
          FROM documents
        ), parts AS (
          SELECT doc_id, url,
                 regexp_extract(url, '^([^:/?#]+)://([^/?#]*)([^?#]*)', 1) AS scheme,
                 regexp_extract(url, '^([^:/?#]+)://([^/?#]*)([^?#]*)', 2) AS host,
                 regexp_extract(url, '^([^:/?#]+)://([^/?#]*)([^?#]*)', 3) AS path,
                 coalesce(nullif(regexp_extract(url, '\\?([^#]*)', 1), ''), '') AS query
          FROM u
        )
        SELECT doc_id, url,
               CASE
                 WHEN scheme NOT IN ('http', 'https') THEN 'bad_scheme'
                 WHEN host = 'ads.tracker.example.org' THEN 'blocked_host'
                 WHEN contains(lower(path), 'casino')
                      OR contains(lower(path), 'viagra') THEN 'blocked_keyword'
                 WHEN (CASE WHEN length(query) > 0
                            THEN length(query) - length(replace(query, '&', '')) + 1
                            ELSE 0 END) > 4 THEN 'query_spam'
                 WHEN (length(path) - length(replace(path, '/', ''))
                       - (CASE WHEN path LIKE '%/' THEN 1 ELSE 0 END)) > 8
                      THEN 'deep_path'
                 ELSE 'ok'
               END AS url_verdict
        FROM parts
        ORDER BY doc_id
    """,
    "q117_gopher_quality": """
        WITH w AS (
          SELECT doc_id, coalesce(text, '') AS text,
                 string_split(coalesce(text, ''), ' ') AS ws
          FROM documents
        ), m AS (
          SELECT doc_id,
                 CAST(len(ws) AS BIGINT) AS n_words,
                 list_sum(list_transform(ws, x -> length(x))) * 1.0
                   / len(ws) AS mean_word_len,
                 list_sum(list_transform(ws, x ->
                   CASE WHEN regexp_matches(x, '[A-Za-z]')
                        THEN 1 ELSE 0 END)) * 1.0 / len(ws)
                   AS frac_alpha_words,
                 ((length(text) - length(replace(text, '#', '')))
                  + (length(text) - length(replace(text, '...', ''))) / 3)
                   * 1.0 / len(ws) AS symbol_word_ratio,
                 CAST(len(list_intersect(list_distinct(ws),
                   ['the','be','to','of','and','that','have','with']))
                   AS BIGINT) AS n_stop_words
          FROM w
        )
        SELECT doc_id, n_words,
               round(mean_word_len, 4) AS mean_word_len,
               round(frac_alpha_words, 4) AS frac_alpha_words,
               round(symbol_word_ratio, 4) AS symbol_word_ratio,
               n_stop_words,
               CAST(CASE WHEN n_words >= 50 AND n_words <= 100000
                         AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                         AND symbol_word_ratio < 0.1
                         AND frac_alpha_words > 0.8
                         AND n_stop_words >= 2
                    THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM m
    """,
    "q91_badword_filter": """
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
        WHERE NOT list_has_any(string_split(text, ' '),
                               ['spark', 'vector', 'stream'])
    """,
    "q97_token_quota_mix": """
        WITH t AS (
          SELECT doc_id, source,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents
        ), o AS (
          SELECT doc_id, source, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS tok_offset
          FROM t
        )
        SELECT doc_id, source, n_tokens, CAST(tok_offset AS BIGINT) AS tok_offset
        FROM o WHERE tok_offset < 800
    """,
    "q95_segment_dedup_keep_first": """
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), ex AS (
          SELECT doc_id, ws,
                 unnest(generate_series(0, CAST(ceil(len(ws)/2.0) AS BIGINT)-1)) AS s
          FROM w
        ), seg AS (
          SELECT doc_id, s, array_to_string(ws[(s*2+1):(s*2+2)], ' ') AS segment FROM ex
        ), k AS (
          SELECT segment, min(doc_id) AS keeper FROM seg GROUP BY segment
        ), kept AS (
          SELECT seg.doc_id, seg.s, seg.segment
          FROM seg JOIN k USING (segment)
          WHERE seg.doc_id = k.keeper
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               string_agg(segment, ' ' ORDER BY s) AS text_clean,
               CAST(count(*) AS BIGINT) AS n_segs_kept
        FROM kept GROUP BY doc_id
    """,
    "q96_fused_quality_filter": """
        WITH w AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        ), c AS (
          SELECT tok, count(*) AS n FROM w GROUP BY tok
        ), t AS (
          SELECT CAST(sum(n) AS DOUBLE) AS total FROM c
        ), lp AS (
          SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 avg(ln(c.n / t.total)) AS avg_lp
          FROM w JOIN c USING (tok) CROSS JOIN t
          GROUP BY w.doc_id
        ), wc AS (
          SELECT doc_id, tok, count(*) AS cnt FROM w GROUP BY doc_id, tok
        ), rep AS (
          SELECT doc_id,
                 max(cnt) AS top_c,
                 sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_c,
                 sum(cnt) AS n_tok
          FROM wc GROUP BY doc_id
        )
        SELECT lp.doc_id, lp.n_tokens,
               round(rep.top_c / rep.n_tok, 4) AS frac_top_word,
               round(rep.dup_c / rep.n_tok, 4) AS frac_dup_words,
               round(lp.avg_lp, 4) AS avg_logprob,
               CAST(CASE WHEN lp.n_tokens BETWEEN 30 AND 90
                          AND rep.dup_c / rep.n_tok <= 0.9
                          AND lp.avg_lp >= -3.42
                     THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM lp JOIN rep USING (doc_id)
    """,
    "q93_repetition_signals": """
        WITH w AS (
          SELECT doc_id,
                 unnest(string_split(text, ' ')) AS tok,
                 unnest(range(len(string_split(text, ' ')))) AS pos
          FROM documents
        ), wc AS (
          SELECT doc_id, tok, count(*) AS c FROM w GROUP BY doc_id, tok
        ), ws AS (
          SELECT doc_id,
                 CAST(sum(c) AS BIGINT) AS n_tokens,
                 max(c) AS top_c,
                 sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_c
          FROM wc GROUP BY doc_id
        ), g AS (
          SELECT a.doc_id, a.tok || ' ' || b.tok AS gram
          FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        ), gc AS (
          SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram
        ), gs AS (
          SELECT doc_id, sum(c) AS n2,
                 sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup2
          FROM gc GROUP BY doc_id
        )
        SELECT ws.doc_id, ws.n_tokens,
               round(ws.top_c / ws.n_tokens, 4) AS frac_top_word,
               round(ws.dup_c / ws.n_tokens, 4) AS frac_dup_words,
               round(COALESCE(gs.dup2 / gs.n2, 0), 4) AS frac_dup_2grams
        FROM ws LEFT JOIN gs USING (doc_id)
    """,
    "q94_dsir_weights": """
        WITH w AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        ), raw AS (
          SELECT tok, count(*) AS n FROM w GROUP BY tok
        ), rt AS (
          SELECT CAST(sum(n) AS DOUBLE) AS total FROM raw
        ), tw AS (
          SELECT unnest(string_split(text, ' ')) AS tok
          FROM documents WHERE lang = 'en'
        ), tgt AS (
          SELECT tok, count(*) AS n FROM tw GROUP BY tok
        ), tt AS (
          SELECT CAST(sum(n) AS DOUBLE) AS total FROM tgt
        )
        SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               round(avg(
                 COALESCE(ln(tgt.n / tt.total), ln(0.5 / tt.total))
                 - ln(raw.n / rt.total)
               ), 4) AS dsir_weight
        FROM w
        JOIN raw USING (tok) CROSS JOIN rt
        LEFT JOIN tgt USING (tok) CROSS JOIN tt
        GROUP BY w.doc_id
    """,
    "q98_corpus_build": """
        WITH nn AS (
          SELECT greatest(20, CAST(round(0.05 * count(*)) AS BIGINT)) AS min_docs
          FROM documents
        ), dd AS (
          SELECT doc_id, source, text FROM (
            SELECT doc_id, source, text,
                   row_number() OVER (
                     PARTITION BY substr(text, 1, 30) ORDER BY doc_id
                   ) AS rn
            FROM documents) WHERE rn = 1
        ), w AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM dd
        ), ex AS (
          SELECT doc_id, ws,
                 unnest(generate_series(0, CAST(ceil(len(ws)/2.0) AS BIGINT)-1)) AS s
          FROM w
        ), seg AS (
          SELECT doc_id, s, array_to_string(ws[(s*2+1):(s*2+2)], ' ') AS segment FROM ex
        ), freq AS (
          SELECT segment FROM seg GROUP BY segment
          HAVING count(DISTINCT doc_id) >= (SELECT min_docs FROM nn)
        ), kept AS (
          SELECT doc_id, s, segment FROM seg
          WHERE segment NOT IN (SELECT segment FROM freq)
        ), clean AS (
          SELECT doc_id, string_agg(segment, ' ' ORDER BY s) AS text_clean
          FROM kept GROUP BY doc_id
        ), cw AS (
          SELECT doc_id, unnest(string_split(text_clean, ' ')) AS tok FROM clean
        ), lmc AS (
          SELECT tok, count(*) AS n FROM cw GROUP BY tok
        ), t AS (
          SELECT CAST(sum(n) AS DOUBLE) AS total FROM lmc
        ), lp AS (
          SELECT cw.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 avg(ln(lmc.n / t.total)) AS avg_lp
          FROM cw JOIN lmc USING (tok) CROSS JOIN t
          GROUP BY cw.doc_id
        ), wc AS (
          SELECT doc_id, tok, count(*) AS cnt FROM cw GROUP BY doc_id, tok
        ), rep AS (
          SELECT doc_id,
                 sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_c,
                 sum(cnt) AS n_tok
          FROM wc GROUP BY doc_id
        ), q AS (
          SELECT lp.doc_id, dd.source, lp.n_tokens
          FROM lp JOIN rep USING (doc_id) JOIN dd USING (doc_id)
          WHERE lp.n_tokens BETWEEN 20 AND 80
            AND rep.dup_c / rep.n_tok <= 0.92
            AND lp.avg_lp >= -3.41
        ), o AS (
          SELECT doc_id, source, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS tok_offset
          FROM q
        )
        SELECT doc_id, source, n_tokens,
               CAST(tok_offset AS BIGINT) AS tok_offset,
               CAST(floor(tok_offset / 256) AS BIGINT) AS seq_id
        FROM o
    """,
    "q92_pack_sequences": """
        WITH t AS (
          SELECT doc_id, source,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents
        ), o AS (
          SELECT doc_id, source, n_tokens,
                 COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS tok_offset
          FROM t
        )
        SELECT doc_id, source, n_tokens,
               CAST(tok_offset AS BIGINT) AS tok_offset,
               CAST(floor(tok_offset / 256) AS BIGINT) AS seq_id
        FROM o
    """,
    "q99_perplexity_tiers": """
        WITH w AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
        ), c AS (
          SELECT tok, count(*) AS n FROM w GROUP BY tok
        ), t AS (
          SELECT CAST(sum(n) AS DOUBLE) AS total FROM c
        ), scored AS (
          SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 round(avg(ln(c.n / t.total)), 4) AS avg_logprob
          FROM w JOIN c USING (tok) CROSS JOIN t
          GROUP BY w.doc_id
        ), sl AS (
          SELECT s.doc_id, s.n_tokens, s.avg_logprob, d.lang
          FROM scored s JOIN documents d USING (doc_id)
        ), ranked AS (
          SELECT sl.*,
                 row_number() OVER (PARTITION BY lang ORDER BY avg_logprob) AS rn,
                 count(*) OVER (PARTITION BY lang) AS n
          FROM sl
        ), th AS (
          SELECT lang,
                 max(CASE WHEN rn = CAST(ceil(n / 3.0) AS BIGINT)
                     THEN avg_logprob END) AS v1,
                 max(CASE WHEN rn = CAST(ceil(2 * n / 3.0) AS BIGINT)
                     THEN avg_logprob END) AS v2
          FROM ranked GROUP BY lang
        )
        SELECT r.doc_id, r.n_tokens, r.avg_logprob, r.lang,
               CASE WHEN r.avg_logprob > th.v2 THEN 'head'
                    WHEN r.avg_logprob > th.v1 THEN 'middle'
                    ELSE 'tail' END AS tier
        FROM ranked r JOIN th USING (lang)
    """,
    "q100_temperature_mix": """
        WITH ns AS (
          SELECT source, CAST(count(*) AS DOUBLE) AS n
          FROM documents GROUP BY source
        ), z AS (
          SELECT sum(pow(n, 0.5)) AS z FROM ns
        ), r AS (
          SELECT source, least(1.0, 240.0 * pow(n, 0.5) / z.z / n) AS rate
          FROM ns CROSS JOIN z
        ), t AS (
          SELECT source,
                 CASE WHEN rate >= 1.0 THEN 'g'
                      ELSE lower(lpad(to_hex(CAST(floor(rate * 4294967296.0)
                                                  AS BIGINT)), 8, '0'))
                 END AS thr
          FROM r
        )
        SELECT d.doc_id, d.source
        FROM documents d JOIN t USING (source)
        WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) < t.thr
    """,
    "q102_dup_ngram_coverage": """
        WITH words AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '') AS ws
          FROM documents
        ), g_rows AS (
          SELECT doc_id,
                 unnest(list_transform(
                   generate_series(1, len(ws) - 7),
                   i -> struct_pack(
                          pos := i,
                          g := array_to_string(list_slice(ws, i, i + 7), ' ')
                        ))) AS pg
          FROM words WHERE len(ws) >= 8
        ), g2 AS (
          SELECT doc_id, pg.pos AS pos, pg.g AS g FROM g_rows
        ), d AS (
          SELECT g FROM g2 GROUP BY g HAVING count(*) > 1
        ), hits AS (
          SELECT r.doc_id, unnest(generate_series(r.pos, r.pos + 7)) AS p
          FROM g2 r JOIN d USING (g)
        ), cov AS (
          SELECT doc_id, count(DISTINCT p) AS covered FROM hits GROUP BY doc_id
        )
        SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_tokens,
               CASE WHEN len(w.ws) = 0 THEN 0.0
                    ELSE round(coalesce(cov.covered, 0)
                               / CAST(len(w.ws) AS DOUBLE), 4)
               END AS frac_dup_ngrams
        FROM words w LEFT JOIN cov USING (doc_id)
    """,
    "q103_remove_dup_spans": """
        WITH words AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '') AS lws,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS ws
          FROM documents
        ), g_rows AS (
          SELECT doc_id,
                 unnest(list_transform(
                   generate_series(1, len(lws) - 7),
                   i -> struct_pack(
                          pos := i,
                          g := array_to_string(list_slice(lws, i, i + 7), ' ')
                        ))) AS pg
          FROM words WHERE len(lws) >= 8
        ), g2 AS (
          SELECT doc_id, pg.pos AS pos, pg.g AS g FROM g_rows
        ), d AS (
          SELECT g FROM g2 GROUP BY g HAVING count(*) > 1
        ), hits AS (
          SELECT DISTINCT doc_id, p FROM (
            SELECT r.doc_id, unnest(generate_series(r.pos, r.pos + 7)) AS p
            FROM g2 r JOIN d USING (g)
          )
        ), toks AS (
          SELECT doc_id, unnest(ws) AS w, generate_subscripts(ws, 1) AS p
          FROM words
        ), kept AS (
          SELECT t.doc_id,
                 coalesce(string_agg(t.w, ' ' ORDER BY t.p)
                          FILTER (WHERE h.p IS NULL), '') AS text,
                 count(*) FILTER (WHERE h.p IS NULL) AS n_kept
          FROM toks t
          LEFT JOIN hits h ON t.doc_id = h.doc_id AND t.p = h.p
          GROUP BY t.doc_id
        )
        SELECT w.doc_id, coalesce(k.text, '') AS text,
               CAST(len(w.ws) AS BIGINT) AS n_tokens,
               CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
        FROM words w LEFT JOIN kept k USING (doc_id)
    """,
    "q104_kmeans_assign": """
        WITH c0 AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cl,
                 CAST(embedding AS DOUBLE[]) AS cen
          FROM embeddings ORDER BY vec_id LIMIT 4
        ), a0 AS (
          SELECT vec_id, cl FROM (
            SELECT e.vec_id, c.cl,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_inner_product(c.cen, c.cen)
                              - 2 * list_inner_product(
                                      CAST(e.embedding AS DOUBLE[]), c.cen),
                              c.cl
                   ) AS rn
            FROM embeddings e CROSS JOIN c0 c
          ) WHERE rn = 1
        ), dims AS (
          SELECT a0.cl, generate_subscripts(e.embedding, 1) AS dim,
                 unnest(CAST(e.embedding AS DOUBLE[])) AS val
          FROM embeddings e JOIN a0 USING (vec_id)
        ), m AS (
          SELECT cl, dim, avg(val) AS mu FROM dims GROUP BY cl, dim
        ), c1 AS (
          SELECT c0.cl,
                 CASE WHEN count(m.mu) = 0 THEN any_value(c0.cen)
                      ELSE list(m.mu ORDER BY m.dim) END AS cen
          FROM c0 LEFT JOIN m ON c0.cl = m.cl
          GROUP BY c0.cl
        )
        SELECT vec_id, cl AS cluster FROM (
          SELECT e.vec_id, c.cl,
                 row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY list_inner_product(c.cen, c.cen)
                            - 2 * list_inner_product(
                                    CAST(e.embedding AS DOUBLE[]), c.cen),
                            c.cl
                 ) AS rn
          FROM embeddings e CROSS JOIN c1 c
        ) WHERE rn = 1
        ORDER BY vec_id
    """,
    "q105_cluster_prune": """
        WITH c0 AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cl,
                 CAST(embedding AS DOUBLE[]) AS cen
          FROM embeddings ORDER BY vec_id LIMIT 4
        ), a0 AS (
          SELECT vec_id, cl FROM (
            SELECT e.vec_id, c.cl,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_inner_product(c.cen, c.cen)
                              - 2 * list_inner_product(
                                      CAST(e.embedding AS DOUBLE[]), c.cen),
                              c.cl
                   ) AS rn
            FROM embeddings e CROSS JOIN c0 c
          ) WHERE rn = 1
        ), dims AS (
          SELECT a0.cl, generate_subscripts(e.embedding, 1) AS dim,
                 unnest(CAST(e.embedding AS DOUBLE[])) AS val
          FROM embeddings e JOIN a0 USING (vec_id)
        ), m AS (
          SELECT cl, dim, avg(val) AS mu FROM dims GROUP BY cl, dim
        ), c1 AS (
          SELECT c0.cl,
                 CASE WHEN count(m.mu) = 0 THEN any_value(c0.cen)
                      ELSE list(m.mu ORDER BY m.dim) END AS cen
          FROM c0 LEFT JOIN m ON c0.cl = m.cl
          GROUP BY c0.cl
        ), ad AS (
          SELECT vec_id, cl, d2 FROM (
            SELECT e.vec_id, c.cl,
                   list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[]))
                   + list_inner_product(c.cen, c.cen)
                   - 2 * list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                            c.cen) AS d2,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_inner_product(c.cen, c.cen)
                              - 2 * list_inner_product(
                                      CAST(e.embedding AS DOUBLE[]), c.cen),
                              c.cl
                   ) AS rn
            FROM embeddings e CROSS JOIN c1 c
          ) WHERE rn = 1
        ), ranked AS (
          SELECT ad.*,
                 row_number() OVER (PARTITION BY cl ORDER BY d2) AS rn,
                 count(*) OVER (PARTITION BY cl) AS n
          FROM ad
        ), th AS (
          SELECT cl, max(CASE WHEN rn = CAST(ceil(n / 2.0) AS BIGINT)
                         THEN d2 END) AS thr
          FROM ranked GROUP BY cl
        )
        SELECT r.vec_id, r.cl AS cluster
        FROM ranked r JOIN th USING (cl)
        WHERE r.d2 <= th.thr
        ORDER BY r.vec_id
    """,
    "q106_shuffle_positions": f"""
        WITH h AS (
          SELECT doc_id, {_sm_sql('doc_id', 42)} AS h FROM documents
        )
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY h, doc_id) - 1 AS BIGINT) AS pos
        FROM h ORDER BY doc_id
    """,
    "q107_epoch_mix": f"""
        WITH hh AS (
          SELECT doc_id, source, {_sm_sql('doc_id', 7)} AS h,
                 CAST(substr(source, 4) AS INTEGER) % 4 AS m
          FROM documents
        ), n AS (
          SELECT doc_id, source,
                 CASE WHEN m >= 2 THEN 2 ELSE 1 END
                 + CASE WHEN (m % 2) = 1 AND h < 9223372036854775808
                        THEN 1 ELSE 0 END AS reps
          FROM hh
        )
        SELECT doc_id, source,
               unnest(generate_series(0, reps - 1)) AS epoch
        FROM n
    """,
    "q108_within_doc_segment_dedup": """
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ), ex AS (
          SELECT doc_id, ws,
                 unnest(generate_series(0, CAST(ceil(len(ws)/2.0) AS BIGINT)-1)) AS s
          FROM w
        ), seg AS (
          SELECT doc_id, s, array_to_string(ws[(s*2+1):(s*2+2)], ' ') AS segment FROM ex
        ), firsts AS (
          SELECT doc_id, segment, min(s) AS s0 FROM seg GROUP BY doc_id, segment
        )
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               string_agg(segment, ' ' ORDER BY s0) AS text_clean,
               CAST(count(*) AS BIGINT) AS n_segs_kept
        FROM firsts GROUP BY doc_id
    """,
    "q109_cap_per_source": f"""
        WITH hh AS (
          SELECT doc_id, source, {_sm_sql('doc_id', 11)} AS h FROM documents
        )
        SELECT doc_id, source FROM (
          SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
          FROM hh
        ) WHERE rn <= 7 ORDER BY doc_id
    """,
    "q111_covariance": """
        WITH e AS (
          SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                 unnest(CAST(embedding AS DOUBLE[])) AS v
          FROM embeddings
        ), m AS (
          SELECT i, avg(v) AS mu FROM e GROUP BY i
        ), p AS (
          SELECT a.i AS i, b.i AS j, avg(a.v * b.v) AS exy
          FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
          GROUP BY a.i, b.i
        )
        SELECT CAST(p.i - 1 AS BIGINT) AS i, CAST(p.j - 1 AS BIGINT) AS j,
               round(p.exy - ma.mu * mb.mu, 6) AS cov
        FROM p JOIN m ma ON p.i = ma.i JOIN m mb ON p.j = mb.i
        ORDER BY i, j
    """,
    "q110_subtract_corpus": """
        SELECT doc_id, source FROM documents
        WHERE text NOT IN (
          SELECT text FROM documents WHERE doc_id % 10 = 0
        )
        ORDER BY doc_id
    """,
}

ORACLE_SQL["q188_personalized_pagerank"] = _ppr_sql(
    _Q118_EDGES, _Q188_SEEDS, damping=0.85, n_iter=3, node_alias="host"
)

# q175 composes the q130 bm25_sql generator output as a derived table
# (assigned post-dict so the generator call sits next to its parameters).
ORACLE_SQL["q175_rrf_fusion"] = f"""
    WITH bm AS (SELECT * FROM ({_bm25_sql(_BM25_TERMS)})),
    r1 AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
               AS r
      FROM bm QUALIFY r <= {_Q175_TOPK}
    ),
    r2 AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT)
               AS r
      FROM documents QUALIFY r <= {_Q175_TOPK}
    )
    SELECT CAST(coalesce(r1.doc_id, r2.doc_id) AS BIGINT) AS doc_id,
           coalesce(r1.r, 0) AS r_bm25,
           coalesce(r2.r, 0) AS r_len,
           round((CASE WHEN r1.r IS NOT NULL THEN 1.0 / (60 + r1.r)
                       ELSE 0.0 END)
               + (CASE WHEN r2.r IS NOT NULL THEN 1.0 / (60 + r2.r)
                       ELSE 0.0 END), 6) AS rrf
    FROM r1 FULL JOIN r2 ON r1.doc_id = r2.doc_id
"""


# --- round-5 additions (q268-q271) -----------------------------------------


def q268_assoc_rules(sf_dir: str) -> pd.DataFrame:
    """Pairwise association rules over per-user event-type sets
    (stages/itemsets.association_rules): support / confidence / lift
    for every x→y with ≥2 supporting baskets — the market-basket
    co-occurrence screen ("users who search also purchase").  Exact
    int64 basket counts; confidence then lift divide in the same order
    on both engines.  Scale shape: ONE (basket, item) distinct groupby,
    per-basket pair expansion inside a coarse basket-hash cogroup, ONE
    item²-bounded support groupby, driver rule fold (loud cap).
    Oracle: GENERATED by association_rules_sql."""
    from ..stages.itemsets import association_rules

    return association_rules(
        _read(sf_dir, "events", ["user_id", "event_type"]),
        basket_col="user_id", item_col="event_type", min_support=2,
    )


def q269_fd_audit(sf_dir: str) -> pd.DataFrame:
    """Approximate-functional-dependency audit source → lang
    (stages/profile.fd_audit): per-source majority-language fold giving
    exact-group count and the g3 violation rows (min deletions for the
    FD to hold) — the "is this column safe as a partition key?" profile
    check.  Scale shape: per-batch (det, dep) Arrow count partials, ONE
    tiny grid groupby, coarse det-hash cogroup, one-row driver fold.
    Oracle: GENERATED by fd_audit_sql."""
    from ..stages.profile import fd_audit

    return fd_audit(
        _read(sf_dir, "documents", ["source", "lang"]),
        det_col="source", dep_col="lang",
    )


def q270_binned_quantiles(sf_dir: str) -> pd.DataFrame:
    """Mergeable fixed-bin quantile sketch over event values
    (stages/histogram.binned_quantiles): p50/p90/p99 with value error
    ≤ one bin width — the one-pass-mergeable scale path next to the
    exact refinement quantiles (q193), deterministic and SQL-replayable
    where t-digest/KLL are not.  Scale shape: two shuffle-free scans
    (min/max partials, then 512 int64 bin counts folded on the
    driver).  Oracle: GENERATED by binned_quantiles_sql (identical
    bucket formula and interpolation order)."""
    from ..stages.histogram import binned_quantiles

    return binned_quantiles(
        _read(sf_dir, "events", ["value"]),
        value_col="value", qs=(0.5, 0.9, 0.99), n_bins=512,
    )


def q271_kcenter_coreset(sf_dir: str) -> pd.DataFrame:
    """Greedy k-center coreset over the embeddings table
    (stages/clustering.kcenter_coreset): 8 maximally-diverse vectors
    (Gonzalez 2-approximation), deterministic seed = min id, ties to
    the smaller id — the diversity sample / cluster seeding primitive.
    Scale shape: k shuffle-free argmax scans with the (k × d) centers
    matrix broadcast per round; one row per batch reaches the driver.
    Iterative — no SQL oracle (rows-only driver check); invariants are
    pytest-verified (tests/test_itemsets_fd_quantiles.py)."""
    from ..stages.clustering import kcenter_coreset

    out = kcenter_coreset(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        id_col="vec_id", vec_col="embedding", k=8,
    )
    out["id"] = out["id"].astype(np.int64)
    out["radius_before"] = np.round(out["radius_before"], 6)
    return out


QUERIES["q268_assoc_rules"] = q268_assoc_rules
QUERIES["q269_fd_audit"] = q269_fd_audit
QUERIES["q270_binned_quantiles"] = q270_binned_quantiles
QUERIES["q271_kcenter_coreset"] = q271_kcenter_coreset

from ..stages.itemsets import association_rules_sql as _assoc_sql
from ..stages.profile import fd_audit_sql as _fd_sql
from ..stages.histogram import binned_quantiles_sql as _bq_sql

ORACLE_SQL["q268_assoc_rules"] = _assoc_sql(
    table="events", basket_col="user_id", item_col="event_type",
    min_support=2,
)
ORACLE_SQL["q269_fd_audit"] = _fd_sql(
    table="documents", det_col="source", dep_col="lang"
)
ORACLE_SQL["q270_binned_quantiles"] = _bq_sql(
    table="events", value_col="value", qs=(0.5, 0.9, 0.99), n_bins=512
)

# round-5-new entries lead the driver window, ahead of the hoisted
# never-sampled block (VERDICT r4 #3: "interleave ... with new ones")
_R5_NEW = [
    "q268_assoc_rules", "q269_fd_audit", "q270_binned_quantiles",
    "q271_kcenter_coreset",
]
QUERIES = {
    **{k: QUERIES[k] for k in _R5_NEW},
    **{k: v for k, v in QUERIES.items() if k not in set(_R5_NEW)},
}


def q272_golden_record(sf_dir: str) -> rd.Dataset:
    """Survivorship merge per user (sequence.golden_record): one golden
    row per user_id with each column's most recent non-null value by
    (ts, event_id) plus n_versions — the MDM field-wise-latest rule a
    CDC consumer applies when consolidating entity versions.  ONE
    coarse user-hash cogroup, vectorized segmented ffill inside.
    Oracle: GENERATED by golden_record_sql (arg_max FILTER per
    column)."""
    from ..stages.sequence import golden_record

    return golden_record(
        _read(sf_dir, "events", ["event_id", "ts", "user_id",
                                 "event_type", "value"]),
        key_col="user_id", ts_col="ts", id_col="event_id",
        value_cols=["event_type", "value"],
    )


def q273_dow_seasonality(sf_dir: str) -> pd.DataFrame:
    """Day-of-week seasonal profile of daily event-value totals
    (trend.dow_seasonality): seasonal mean + residual RMS per weekday
    (DuckDB dayofweek convention) — the STL-lite screen run before
    alerting on a daily series.  Per-batch day partials, ONE day-keyed
    groupby, ≤7-row driver fold.  Oracle: GENERATED by
    dow_seasonality_sql."""
    from ..stages.trend import dow_seasonality

    return dow_seasonality(
        _read(sf_dir, "events", ["ts", "value"]),
        ts_col="ts", value_col="value",
    )


def q274_pca_project(sf_dir: str) -> rd.Dataset:
    """Distributed PCA (linalg.pca_fit + pca_project): population
    covariance from one moment scan, top-4 eigenvectors
    (sign-normalized: largest-|coefficient| entry positive — the
    deterministic convention), then a shuffle-free broadcast projection
    appending ``pca`` (list<double>, rounded) per vector.  Iterative
    linear algebra (eigh) → no SQL oracle; orthonormality /
    reconstruction invariants in tests/test_golden_dow_pca.py."""
    from ..stages.linalg import pca_fit, pca_project

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    mu, comps = pca_fit(ds, 4, vec_col="embedding")
    out = pca_project(ds, mu, comps, vec_col="embedding",
                      keep_cols=["vec_id"])

    def rnd(t: pa.Table) -> pa.Table:
        p = t["pca"].combine_chunks()
        vals = np.round(
            p.flatten().to_numpy(zero_copy_only=False).astype(np.float64), 6
        )
        off = p.offsets
        return pa.table(
            {"vec_id": t["vec_id"],
             "pca": pa.ListArray.from_arrays(off, pa.array(vals))}
        )

    return out.map_batches(rnd, batch_format="pyarrow")


QUERIES["q272_golden_record"] = q272_golden_record
QUERIES["q273_dow_seasonality"] = q273_dow_seasonality
QUERIES["q274_pca_project"] = q274_pca_project

from ..stages.sequence import golden_record_sql as _golden_sql
from ..stages.trend import dow_seasonality_sql as _dow_sql

ORACLE_SQL["q272_golden_record"] = _golden_sql(
    table="events", key_col="user_id", ts_col="ts", id_col="event_id",
    value_cols=["event_type", "value"],
)
ORACLE_SQL["q273_dow_seasonality"] = _dow_sql(
    table="events", ts_col="ts", value_col="value"
)

_R5_NEW_B = ["q272_golden_record", "q273_dow_seasonality", "q274_pca_project"]
QUERIES = {
    **{k: QUERIES[k] for k in _R5_NEW_B},
    **{k: v for k, v in QUERIES.items() if k not in set(_R5_NEW_B)},
}


def q275_ref_integrity(sf_dir: str) -> pd.DataFrame:
    """Referential-integrity audit events.user_id → customer.c_custkey
    (stages/profile.ref_integrity): orphan rows, distinct missing keys,
    orphan share — the cross-table data-quality gate before a join key
    is trusted (the synthetic events deliberately reference users
    beyond the customer table, so the audit is non-trivial).  Parent
    keys fold through ONE groupby and broadcast once; one child scan
    with per-batch orphan partials.  Oracle: GENERATED by
    ref_integrity_sql (LEFT JOIN orphan count)."""
    from ..stages.profile import ref_integrity

    return ref_integrity(
        _read(sf_dir, "events", ["user_id"]),
        _read(sf_dir, "customer", ["c_custkey"]),
        fk_col="user_id", pk_col="c_custkey",
    )


def q276_cdc_chunks(sf_dir: str) -> pd.DataFrame:
    """Content-defined-chunking dedup audit over document texts
    (stages/cdc.cdc_chunk_stats): gear-hash CDC cut points (64-byte
    window, mask 2^-8, 64..1024-byte chunks for these short docs) →
    chunk-store dedup ratio = 1 − distinct/total bytes — the storage
    saving a content-addressed chunk store would realize.  Rolling
    hash → no SQL oracle (rows-only); boundary determinism /
    shift-resync invariants in tests/test_cdc_refint_split.py.  Payload bytes never
    outlive their task; only slim (hash, size) rows shuffle."""
    from ..stages.cdc import cdc_chunk_stats

    return cdc_chunk_stats(
        _read(sf_dir, "documents", ["text"]),
        payload_col="text",
        mask_bits=8, min_size=64, max_size=1024,
    )


def q277_stratified_split(sf_dir: str) -> rd.Dataset:
    """Stratified split with EXACT per-stratum quotas over documents by
    lang (stages/sampling.stratified_exact_split): within every lang,
    rank by splitmix64(doc_id) and take exactly ceil(4n/5) for train —
    the evaluation-design guarantee hash-threshold splits only meet in
    expectation.  ONE stratum-hash cogroup, vectorized multi-stratum
    rank inside.  Oracle: GENERATED by stratified_exact_split_sql
    (row_number over the identical splitmix64 order)."""
    from ..stages.sampling import stratified_exact_split

    return stratified_exact_split(
        _read(sf_dir, "documents", ["doc_id", "lang"]),
        id_col="doc_id", stratum_col="lang", train_frac=(4, 5),
    )


QUERIES["q275_ref_integrity"] = q275_ref_integrity
QUERIES["q276_cdc_chunks"] = q276_cdc_chunks
QUERIES["q277_stratified_split"] = q277_stratified_split

from ..stages.profile import ref_integrity_sql as _ri_sql
from ..stages.sampling import stratified_exact_split_sql as _ses_sql

ORACLE_SQL["q275_ref_integrity"] = _ri_sql(
    child_table="events", parent_table="customer",
    fk_col="user_id", pk_col="c_custkey",
)
ORACLE_SQL["q277_stratified_split"] = _ses_sql(
    table="documents", id_col="doc_id", stratum_col="lang",
    train_frac=(4, 5), columns=("doc_id", "lang"),
)

_R5_NEW_C = ["q275_ref_integrity", "q276_cdc_chunks", "q277_stratified_split"]
QUERIES = {
    **{k: QUERIES[k] for k in _R5_NEW_C},
    **{k: v for k, v in QUERIES.items() if k not in set(_R5_NEW_C)},
}


def q278_truncation_audit(sf_dir: str) -> pd.DataFrame:
    """Matryoshka truncation-quality audit over embeddings
    (stages/linalg.truncation_audit): mean |Δcosine| and mean cosine at
    prefix dims 16/8/4 vs full, over the deterministic (id, id+7) pair
    probe — the "can we search at d/4?" screen before committing to a
    truncated index.  ONE id-hash cogroup, vectorized per-dim partials,
    |dims|-sized driver fold.  Oracle: GENERATED by
    truncation_audit_sql (list_slice + explicit double arithmetic,
    identical zero-norm rule)."""
    from ..stages.linalg import truncation_audit

    return truncation_audit(
        _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
        id_col="vec_id", vec_col="embedding", dims=(16, 8, 4), stride=7,
    )


QUERIES["q278_truncation_audit"] = q278_truncation_audit

from ..stages.linalg import truncation_audit_sql as _trunc_sql

ORACLE_SQL["q278_truncation_audit"] = _trunc_sql(
    table="embeddings", id_col="vec_id", vec_col="embedding",
    dims=(16, 8, 4), stride=7,
)

QUERIES = {
    "q278_truncation_audit": QUERIES["q278_truncation_audit"],
    **{k: v for k, v in QUERIES.items() if k != "q278_truncation_audit"},
}


def q279_winnow_overlap(sf_dir: str) -> rd.Dataset:
    """Winnowing fingerprint overlap (stages/winnow.py — Schleimer et
    al.'s MOSS selection): documents plus derived QUOTE docs (the q204
    fixture derivation) → all pairs sharing ≥ 2 robust-winnowing
    fingerprints — the sub-quadratic shared-passage detector whose
    guarantee (any common run of window+ngram−1 = 6 words yields a
    shared fingerprint) the full-postings containment join buys with
    far more shuffle volume.  Shuffle-free fingerprint scan, ONE slim
    fp-hash cogroup with vectorized pair expansion (loud cap), ONE
    (a, b) pair-count groupby.  Oracle: GENERATED by
    winnow_overlap_sql — exact polyhash64+splitmix64 replay including
    the rightmost-min picks."""
    from ..stages.winnow import winnow_overlap

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def derive(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        out_id, out_tx = [], []
        for i, tx in zip(ids, texts):
            out_id.append(i)
            out_tx.append(tx)
            if i % 11 == 0:
                words = (tx or "").split()
                keep = max(1, (3 * len(words) + 4) // 5)
                out_id.append(i + 1_000_000)
                out_tx.append(" ".join(words[:keep]))
        return pa.table(
            {"doc_id": pa.array(out_id, type=pa.int64()),
             "text": pa.array(out_tx, type=pa.string())}
        )

    return winnow_overlap(
        ds.map_batches(derive, batch_format="pyarrow"),
        id_col="doc_id", text_col="text", ngram=3, window=4, min_shared=2,
    )


QUERIES["q279_winnow_overlap"] = q279_winnow_overlap

from ..stages.winnow import winnow_overlap_sql as _winnow_sql

ORACLE_SQL["q279_winnow_overlap"] = f"""
    WITH RECURSIVE __derived AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               array_to_string(list_slice(
                   list_filter(string_split_regex(text, '\\s+'),
                               x -> x <> ''),
                   1, greatest(1, (3 * len(list_filter(
                       string_split_regex(text, '\\s+'), x -> x <> '')) + 4)
                       // 5)), ' ') AS text
        FROM documents WHERE doc_id % 11 = 0
    )
    {_winnow_sql(table="__derived", id_col="doc_id", text_col="text",
                 ngram=3, window=4, min_shared=2)
     .replace("WITH RECURSIVE", ",", 1)}
"""

QUERIES = {
    "q279_winnow_overlap": QUERIES["q279_winnow_overlap"],
    **{k: v for k, v in QUERIES.items() if k != "q279_winnow_overlap"},
}


def q280_changepoints(sf_dir: str) -> pd.DataFrame:
    """Changepoint locator over the daily event-count series
    (trend.changepoint_detect): binary segmentation on the CUSUM
    statistic, depth 2 — the day the series' level shifted, then the
    strongest shift inside each half.  The argmax is INTEGER-exact
    (n·S_k is an integer for count series), so the located days cannot
    flip on float fold order.  Per-batch day partials, ONE tiny
    day groupby, series-length driver fold.  Oracle: GENERATED by
    changepoint_sql (identical HUGEINT window argmax)."""
    from ..stages.trend import changepoint_detect

    return changepoint_detect(_read(sf_dir, "events", ["ts"]), ts_col="ts")


QUERIES["q280_changepoints"] = q280_changepoints

from ..stages.trend import changepoint_sql as _cp_sql

ORACLE_SQL["q280_changepoints"] = _cp_sql(table="events", ts_col="ts")

QUERIES = {
    "q280_changepoints": QUERIES["q280_changepoints"],
    **{k: v for k, v in QUERIES.items() if k != "q280_changepoints"},
}


def q281_sprt(sf_dir: str) -> pd.DataFrame:
    """Wald SPRT over the event stream (abtest.sprt_bernoulli): each
    event ordered by (ts, id) is a Bernoulli trial (success =
    purchase); the log-likelihood walk stops at the FIRST crossing of
    the Wald thresholds — the minimal-sample sequential test the
    fixed-horizon z-test (q230) cannot match.  Scale shape: day-count
    partials → tiny day groupby → driver day-boundary envelope walk →
    ONE pruned scan of only the crossing day's events (no global
    sort).  The llr expression and crossing order replay exactly in
    SQL.  Oracle: GENERATED by sprt_sql."""
    from ..stages.abtest import sprt_bernoulli

    return sprt_bernoulli(
        _read(sf_dir, "events", ["event_id", "ts", "event_type"]),
        ts_col="ts", id_col="event_id", type_col="event_type",
        success_type="purchase", p0=0.18, p1=0.22,
    )


QUERIES["q281_sprt"] = q281_sprt

from ..stages.abtest import sprt_sql as _sprt_sql

ORACLE_SQL["q281_sprt"] = _sprt_sql(
    table="events", ts_col="ts", id_col="event_id",
    type_col="event_type", success_type="purchase", p0=0.18, p1=0.22,
)

QUERIES = {
    "q281_sprt": QUERIES["q281_sprt"],
    **{k: v for k, v in QUERIES.items() if k != "q281_sprt"},
}


def q282_runs_test(sf_dir: str) -> pd.DataFrame:
    """Wald–Wolfowitz runs test on the daily event-count series
    (trend.runs_test_daily): clustering vs alternation of
    above/below-median days — the "is the series i.i.d. enough to
    alert on?" pre-check before the drift detectors.  Lower-median
    threshold at 1-indexed position ceil(n/2) (exact, ties drop), run
    count over day order, closed-form z.  Per-batch day partials, ONE
    tiny day groupby, series-length driver fold.  Oracle: GENERATED by
    runs_test_sql."""
    from ..stages.trend import runs_test_daily

    return runs_test_daily(_read(sf_dir, "events", ["ts"]), ts_col="ts")


QUERIES["q282_runs_test"] = q282_runs_test

from ..stages.trend import runs_test_sql as _runs_sql

ORACLE_SQL["q282_runs_test"] = _runs_sql(table="events", ts_col="ts")

QUERIES = {
    "q282_runs_test": QUERIES["q282_runs_test"],
    **{k: v for k, v in QUERIES.items() if k != "q282_runs_test"},
}
