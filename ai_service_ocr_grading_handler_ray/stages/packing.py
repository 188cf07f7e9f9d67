"""Sequence packing: assign documents to fixed-token-budget training
sequences (the example-assembly step between curation and tokenizer
sharding in an LLM data pipeline).

Offset packing semantics (deterministic, join-free): within each group
(source / host / shard key), documents ordered by ``order_col`` fill a
token tape; a document belongs to the sequence its FIRST token lands in,
``seq_id = floor(prior_group_tokens / budget)``.  This is the
concatenate-then-chunk packing used by GPT-style pretraining loaders
(documents are not reordered to minimize padding — bin-packing
reordering would destroy the deterministic doc→sequence mapping that
makes packing resumable and oracle-checkable).

Scale shape: the text column is pruned to an int token count BEFORE any
movement, so the single coarse hash shuffle moves (id, group, n_tokens)
triples only — never text.  Per-group ordered prefix sums need all rows
of a group co-located: ``add_key_partition(group)`` routes each group to
one of ``num_parts`` partitions (ONE groupby whose key has num_parts
distinct values), and each partition computes sorted per-group exclusive
cumsums with vectorized pandas.  Partitioning assumption (documented
contract): a single group is host/source-sized — it must fit in one
partition's memory as a (id, group, count) triple table, NOT as text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def add_ws_token_count(
    batch: pa.Table, *, text_col: str = "text", out: str = "n_tokens"
) -> pa.Table:
    """Whitespace token count as one Arrow kernel: count(' ') + 1 —
    exactly ``len(string_split(text, ' '))`` in SQL, including the
    empty-text case ('' → 1)."""
    n = pc.add(
        pc.count_substring(pc.fill_null(batch[text_col], ""), " "),
        pa.scalar(1, type=pa.int64()),
    )
    return batch.append_column(out, n.cast(pa.int64()))


def pack_sequences(
    ds,
    *,
    budget: int,
    group_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    num_parts: int = 32,
):
    """Offset packing over a Dataset (see module docstring).

    ``token_col``: use a precomputed token-count column; otherwise the
    whitespace count of ``text_col`` is computed (and text dropped)
    before the shuffle.  Output: (order_col, group_col, n_tokens,
    tok_offset, seq_id), one row per input document.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    from .dedup import add_key_partition

    if token_col is None:

        def project(t: pa.Table) -> pa.Table:
            t = add_ws_token_count(t, text_col=text_col, out="n_tokens")
            return t.select([order_col, group_col, "n_tokens"])

        slim = ds.map_batches(project, batch_format="pyarrow")
    else:

        def rename(t: pa.Table) -> pa.Table:
            t = t.select([order_col, group_col, token_col])
            return t.rename_columns([order_col, group_col, "n_tokens"])

        slim = ds.map_batches(rename, batch_format="pyarrow")

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, order_col], kind="mergesort").reset_index(
            drop=True
        )
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        # exclusive per-group cumsum: inclusive minus own
        offset = g.groupby(group_col, sort=False)["n_tokens"].cumsum().to_numpy() - n
        return pd.DataFrame(
            {
                order_col: g[order_col],
                group_col: g[group_col],
                "n_tokens": n,
                "tok_offset": offset.astype(np.int64),
                "seq_id": (offset // budget).astype(np.int64),
            }
        )

    return (
        slim.map_batches(
            lambda t: add_key_partition(t, group_col, num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(pack, batch_format="pandas")
    )


def select_token_quota(
    ds,
    quota,
    *,
    group_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    num_parts: int = 32,
):
    """Token-budget corpus mixing: within each group (source / domain /
    shard), documents ordered by ``order_col`` fill a token tape and a
    document is selected iff its FIRST token lands under the group's
    quota (the deterministic greedy-prefix rule DoReMi-style static
    mixtures reduce to once per-source weights are fixed).

    ``quota`` is an int (same budget per group) or a dict
    ``{group: budget}`` (dimension-sized — ships in the task closure;
    groups absent from the dict get quota 0, i.e. excluded).

    Same scale shape as ``pack_sequences``: text prunes to an int count
    before the ONE coarse group-hash shuffle; per-group exclusive
    cumsums + the quota filter are vectorized pandas.  Output:
    (order_col, group_col, n_tokens, tok_offset) for selected docs.
    """
    from .dedup import add_key_partition

    if isinstance(quota, dict):
        quota_map, default_quota = dict(quota), 0
    else:
        quota_map, default_quota = {}, int(quota)

    if token_col is None:

        def project(t: pa.Table) -> pa.Table:
            t = add_ws_token_count(t, text_col=text_col, out="n_tokens")
            return t.select([order_col, group_col, "n_tokens"])

        slim = ds.map_batches(project, batch_format="pyarrow")
    else:

        def rename(t: pa.Table) -> pa.Table:
            t = t.select([order_col, group_col, token_col])
            return t.rename_columns([order_col, group_col, "n_tokens"])

        slim = ds.map_batches(rename, batch_format="pyarrow")

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, order_col], kind="mergesort").reset_index(
            drop=True
        )
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        offset = g.groupby(group_col, sort=False)["n_tokens"].cumsum().to_numpy() - n
        lim = (
            g[group_col].map(quota_map).fillna(default_quota).to_numpy(np.int64)
            if quota_map
            else np.full(len(g), default_quota, dtype=np.int64)
        )
        keep = offset < lim
        return pd.DataFrame(
            {
                order_col: g[order_col][keep],
                group_col: g[group_col][keep],
                "n_tokens": n[keep],
                "tok_offset": offset[keep].astype(np.int64),
            }
        )

    return (
        slim.map_batches(
            lambda t: add_key_partition(t, group_col, num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(pick, batch_format="pandas")
    )


def lpt_shard_assign(
    ds,
    *,
    group_col: str = "source",
    weight_col: str = "n_tokens",
    n_shards: int = 8,
) -> "pd.DataFrame":
    """Longest-processing-time bin packing of groups into ``n_shards``
    balanced training shards: groups sorted by total weight DESC (ties
    by name ASC) are assigned greedily to the currently-lightest shard
    (ties by shard id) — the classic 4/3-approximation that keeps any
    one shard from dominating epoch wall-time when shards execute in
    parallel.  Deterministic: a pure function of the (group, weight)
    table.

    Scale shape: :func:`sampling.group_weight_table` (ONE
    group-cardinality groupby) + a |groups|-sized driver heap fold (the
    greedy is inherently sequential but runs over GROUPS, not rows —
    sources/hosts, not documents).  Output: (group, w, shard,
    shard_total) for every group.  Not SQL-expressible (stepwise
    argmin); invariants pinned by tests/test_packing.py."""
    import heapq

    from .sampling import group_weight_table

    out = group_weight_table(ds, group_col=group_col, weight_col=weight_col)
    heap = [(0, s) for s in range(n_shards)]  # (load, shard id)
    heapq.heapify(heap)
    shard = np.empty(len(out), dtype=np.int64)
    for i, w in enumerate(out["w"].to_numpy()):
        load, s = heapq.heappop(heap)
        shard[i] = s
        heapq.heappush(heap, (load + int(w), s))
    out["w"] = out["w"].astype(np.int64)
    out["shard"] = shard
    totals = out.groupby("shard")["w"].transform("sum")
    out["shard_total"] = totals.astype(np.int64)
    return out
