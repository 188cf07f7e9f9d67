"""Webtext cleaning operators: PII redaction, URL canonicalization,
intra-document repetition signals.

Standard training-data curation steps (C4/Gopher-style) as vectorized
``map_batches`` stages; deterministic, regex patterns RE2-compatible so
the redaction oracle can run the same patterns in DuckDB.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
from .collect import collect_tables

# RE2-compatible (no backrefs/lookarounds) so DuckDB regexp_replace agrees
EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
PHONE_RE = re.compile(r"\+?[0-9][0-9()\-\s]{7,}[0-9]")
IPV4_RE = re.compile(r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b")

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"
IP_TOKEN = "<IP>"


def redact_pii(text: str) -> str:
    """Emails → phones → IPs, in that fixed order (order matters: a phone
    pattern could otherwise eat digits inside an already-redacted span)."""
    text = EMAIL_RE.sub(EMAIL_TOKEN, text)
    text = PHONE_RE.sub(PHONE_TOKEN, text)
    text = IPV4_RE.sub(IP_TOKEN, text)
    return text


def add_redacted(batch: pa.Table, text_col: str = "text", out: str = "redacted") -> pa.Table:
    vals = [redact_pii(t or "") for t in batch[text_col].to_pylist()]
    return batch.append_column(out, pa.array(vals, type=pa.string()))


# --- URL canonicalization ---------------------------------------------------

_TRACKING_PARAMS = frozenset(
    "utm_source utm_medium utm_campaign utm_term utm_content gclid fbclid ref".split()
)


def normalize_url(url: str) -> str:
    """Deterministic canonical form: lowercase scheme+host, default ports
    dropped, tracking params removed, params sorted, trailing slash
    stripped (except root), fragment dropped."""
    from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = parts.scheme.lower()
    host = parts.netloc.lower()
    for port, sch in ((":80", "http"), (":443", "https")):
        if host.endswith(port) and scheme == sch:
            host = host[: -len(port)]
    path = parts.path or "/"
    if path != "/" and path.endswith("/"):
        path = path.rstrip("/") or "/"  # '//' collapses to root, not empty
    params = [
        (k, v)
        for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if k.lower() not in _TRACKING_PARAMS
    ]
    query = urlencode(sorted(params))
    return urlunsplit((scheme, host, path, query, ""))


def add_canonical_url(batch: pa.Table, url_col: str = "url", out: str = "canonical_url") -> pa.Table:
    vals = [normalize_url(u or "") for u in batch[url_col].to_pylist()]
    return batch.append_column(out, pa.array(vals, type=pa.string()))


# --- intra-document repetition (Gopher-style) -------------------------------


def repetition_ratio(text: str, ngram: int = 3) -> float:
    """Fraction of word n-gram occurrences that are repeats of an earlier
    n-gram (0 = no repetition; high values indicate boilerplate loops)."""
    words = text.lower().split()
    if len(words) < ngram:
        return 0.0
    total = len(words) - ngram + 1
    distinct = len({tuple(words[i : i + ngram]) for i in range(total)})
    return (total - distinct) / total


def add_repetition_ratio(batch: pa.Table, text_col: str = "text") -> pa.Table:
    vals = np.array(
        [repetition_ratio(t or "") for t in batch[text_col].to_pylist()], dtype=np.float64
    )
    return batch.append_column("repetition_ratio", pa.array(vals))


# --- corpus-frequency segment removal (CCNet-style) -------------------------
#
# CCNet / RefinedWeb drop paragraphs that recur across many documents
# (nav bars, cookie banners, license footers).  The test corpus has no
# newlines, so "segment" here is a deterministic resegmentation: split
# on single spaces, group ``words_per_seg`` consecutive words (the same
# rule is replayable in SQL with list slicing, so the whole operator is
# oracle-checkable).  Two passes:
#
#   pass 1: explode → distinct (doc, segment) per doc → hash-partition
#           by segment → vectorized per-partition doc-frequency count
#   pass 2: frequent set (df ≥ min_docs) broadcasts once via ray.put —
#           at web scale it is the boilerplate vocabulary, orders of
#           magnitude smaller than the corpus (cap enforced; for a
#           frequent set too big to broadcast exactly, swap in a Bloom
#           filter from stages.sketches — over-removal is the safe
#           direction for boilerplate) — and one shuffle-free
#           map_batches rewrites every document.

_SEG_BROADCAST_CAP = 5_000_000


def _doc_segments(text: str, words_per_seg: int) -> list:
    ws = (text or "").split(" ")
    return [
        " ".join(ws[i : i + words_per_seg]) for i in range(0, len(ws), words_per_seg)
    ]


def segment_doc_frequency(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_seg: int = 2,
    num_parts: int = 32,
):
    """Dataset of (segment, n_docs): how many distinct documents contain
    each ``words_per_seg``-word segment."""
    import pandas as pd

    from .dedup import add_key_partition

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        texts = t[text_col].to_pylist()
        out_id: list = []
        out_seg: list = []
        for i, txt in zip(ids, texts):
            # set(): distinct within doc — a doc counts once per segment
            segs = set(_doc_segments(txt, words_per_seg))
            out_id.extend([i] * len(segs))
            out_seg.extend(segs)
        return pa.table({id_col: out_id, "segment": out_seg})

    def count(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("segment", sort=False)[id_col].size().reset_index(name="n_docs")
        r["n_docs"] = r["n_docs"].astype("int64")
        return r

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .map_batches(
            lambda t: add_key_partition(t, "segment", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(count, batch_format="pandas")
    )


def remove_frequent_segments(
    ds,
    *,
    min_docs: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_seg: int = 2,
    num_parts: int = 32,
    method: str = "broadcast",
    bloom_fp_rate: float = 0.001,
    passthrough_cols: tuple = (),
):
    """Drop every segment whose document frequency ≥ ``min_docs``;
    reassemble the survivors in order.  Documents left with zero
    segments are dropped (fully-boilerplate pages).  Output:
    (doc_id, *passthrough_cols, text_clean, n_segs_kept).

    ``method="broadcast"`` ships the exact frequent-segment set (capped
    at ``_SEG_BROADCAST_CAP``).  ``method="bloom"`` is the cap-free
    scale path: the frequent set folds into a Bloom filter
    (distributed build + tree merge, ``stages.sketches.build_bloom``)
    whose broadcast size is bits-per-segment, not strings — at the cost
    of ``bloom_fp_rate`` over-removal of innocent segments (the safe
    direction for boilerplate stripping; removal is a superset of the
    exact path's, never a miss)."""
    import pyarrow.compute as pc
    import ray

    if method not in ("broadcast", "bloom"):
        raise ValueError(f"unknown method {method!r}")

    freq = segment_doc_frequency(
        ds,
        text_col=text_col,
        id_col=id_col,
        words_per_seg=words_per_seg,
        num_parts=num_parts,
    ).map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_docs"], min_docs)),
        batch_format="pyarrow",
    )

    if method == "bloom":
        from .sketches import build_bloom

        freq = freq.materialize()
        n_freq = freq.count()
        bf_ref = ray.put(
            build_bloom(freq, "segment", max(n_freq, 1), bloom_fp_rate)
        )

        def rewrite_bloom(t: pa.Table) -> pa.Table:
            bf = ray.get(bf_ref)
            texts = t[text_col].to_pylist()
            seg_lists = [_doc_segments(txt, words_per_seg) for txt in texts]
            flat = [s for segs in seg_lists for s in segs]
            hit = bf.contains_many(flat) if flat else np.empty(0, dtype=bool)
            keep_mask: list = []
            out_text: list = []
            out_n: list = []
            pos = 0
            for segs in seg_lists:
                m = hit[pos : pos + len(segs)]
                pos += len(segs)
                kept = [s for s, h in zip(segs, m) if not h]
                keep_mask.append(bool(kept))
                if kept:
                    out_text.append(" ".join(kept))
                    out_n.append(len(kept))
            base = t.filter(pa.array(keep_mask, type=pa.bool_()))
            cols = {id_col: base[id_col]}  # id type flows through (string ids work)
            for c in passthrough_cols:
                cols[c] = base[c]
            cols["text_clean"] = pa.array(out_text, type=pa.string())
            cols["n_segs_kept"] = pa.array(out_n, type=pa.int64())
            return pa.table(cols)

        return ds.map_batches(rewrite_bloom, batch_format="pyarrow")

    frequent = [
        s
        for b in collect_tables(freq, drop_empty=False)
        if b.num_rows
        for s in b.column("segment").to_pylist()
    ]
    if len(frequent) > _SEG_BROADCAST_CAP:
        raise ValueError(
            f"frequent-segment set ({len(frequent)}) exceeds broadcast cap "
            f"{_SEG_BROADCAST_CAP}; use method='bloom'"
        )
    freq_ref = ray.put(frozenset(frequent))

    def rewrite(t: pa.Table) -> pa.Table:
        fset = ray.get(freq_ref)
        texts = t[text_col].to_pylist()
        keep_mask: list = []
        out_text: list = []
        out_n: list = []
        for txt in texts:
            kept = [s for s in _doc_segments(txt, words_per_seg) if s not in fset]
            keep_mask.append(bool(kept))
            if kept:
                out_text.append(" ".join(kept))
                out_n.append(len(kept))
        base = t.filter(pa.array(keep_mask, type=pa.bool_()))
        cols = {id_col: base[id_col]}  # id type flows through (string ids work)
        for c in passthrough_cols:
            cols[c] = base[c]
        cols["text_clean"] = pa.array(out_text, type=pa.string())
        cols["n_segs_kept"] = pa.array(out_n, type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(rewrite, batch_format="pyarrow")


def filter_blocked_words(
    ds,
    blocklist,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """C4-style bad-word document filter: drop every document containing
    at least one blocklisted token.  The blocklist is dimension-sized by
    nature (C4's list is ~400 terms) and ships once in the task closure;
    the scan is shuffle-free.  Membership is exact ``np.isin`` over the
    batch's concatenated token array (vectorized; O(tokens × log b)),
    with per-doc hit counts folded by ``reduceat`` — no per-row Python.
    Output: the input columns (minus text) + n_tokens for surviving
    documents."""
    from .text_analysis import batch_words

    blocked = np.array(sorted(set(blocklist)), dtype=object)

    def keep(t: pa.Table) -> pa.Table:
        words, lens = batch_words(t[text_col].to_pylist())
        if len(words):
            bad = np.isin(words, blocked)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            n_bad = np.add.reduceat(bad.astype(np.int64), starts)
        else:
            n_bad = np.empty(0, dtype=np.int64)
        mask = pa.array(n_bad == 0)
        kept = t.drop_columns([text_col]).append_column(
            "n_tokens", pa.array(lens)
        )
        return kept.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def segment_keepers(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_seg: int = 2,
    num_parts: int = 32,
):
    """Dataset of (segment, keeper_id, n_docs): for every distinct
    segment, the smallest ``id_col`` of a document containing it and its
    document frequency.  Same explode + ONE segment-hash shuffle shape
    as ``segment_doc_frequency``."""
    import pandas as pd

    from .dedup import add_key_partition

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        texts = t[text_col].to_pylist()
        out_id: list = []
        out_seg: list = []
        for i, txt in zip(ids, texts):
            segs = set(_doc_segments(txt, words_per_seg))
            out_id.extend([i] * len(segs))
            out_seg.extend(segs)
        return pa.table({id_col: out_id, "segment": out_seg})

    def reduce(g: pd.DataFrame) -> pd.DataFrame:
        r = (
            g.groupby("segment", sort=False)[id_col]
            .agg(keeper_id="min", n_docs="size")
            .reset_index()
        )
        r["keeper_id"] = r["keeper_id"].astype("int64")
        r["n_docs"] = r["n_docs"].astype("int64")
        return r

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .map_batches(
            lambda t: add_key_partition(t, "segment", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(reduce, batch_format="pandas")
    )


def dedup_segments_keep_first(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_seg: int = 2,
    num_parts: int = 32,
    method: str = "auto",
):
    """RefinedWeb-style exact segment dedup across the corpus, keeping
    the FIRST occurrence: a segment survives only inside the document
    with the smallest ``id_col`` that contains it (one deterministic
    rule: keep ⇔ doc_id == min doc_id over the segment).

    Two scale regimes, selected by ``method``:

    - ``"broadcast"`` — ONE segment-hash shuffle computes (segment,
      keeper_id, n_docs); only segments with ``n_docs ≥ 2`` ship back
      (the duplicated-segment table is boilerplate-sized in typical web
      corpora) and the rewrite pass is shuffle-free.  Capped at
      ``_SEG_BROADCAST_CAP`` duplicated segments.
    - ``"join"`` — cap-free: every segment OCCURRENCE cogroups with the
      keeper table by segment hash (vectorized pandas merge per
      partition), then survivors regroup by document to reassemble
      ordered text.  Three shuffles total (keepers, verdicts,
      reassembly), each bounded by corpus segments — the honest cost of
      a global rewrite whose duplicate set exceeds broadcast.
    - ``"auto"`` (default) — counts duplicated segments with a
      distributed Sum over the (materialized) keeper table and picks.

    Documents left with zero segments are dropped.  Output:
    (doc_id, text_clean, n_segs_kept)."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray

    from .dedup import add_key_partition

    if method not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown method {method!r}")

    keepers = segment_keepers(
        ds,
        text_col=text_col,
        id_col=id_col,
        words_per_seg=words_per_seg,
        num_parts=num_parts,
    )

    if method == "auto":
        keepers = keepers.materialize()
        n_dup = keepers.map_batches(
            lambda t: pa.table(
                {
                    "c": pa.array(
                        [
                            pc.sum(
                                pc.cast(
                                    pc.greater_equal(t["n_docs"], 2), pa.int64()
                                )
                            ).as_py()
                            or 0
                        ],
                        type=pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        ).sum("c")
        method = "broadcast" if (n_dup or 0) <= _SEG_BROADCAST_CAP else "join"

    if method == "broadcast":
        dup_map: dict = {}
        for b in collect_tables(keepers, drop_empty=False):
            if b.num_rows:
                dup = b.filter(pc.greater_equal(b["n_docs"], 2))
                dup_map.update(
                    zip(
                        dup.column("segment").to_pylist(),
                        dup.column("keeper_id").to_pylist(),
                    )
                )
        if len(dup_map) > _SEG_BROADCAST_CAP:
            raise ValueError(
                f"duplicated-segment set ({len(dup_map)}) exceeds broadcast "
                f"cap {_SEG_BROADCAST_CAP}; use method='join'"
            )
        map_ref = ray.put(dup_map)

        def rewrite(t: pa.Table) -> pa.Table:
            dmap = ray.get(map_ref)
            ids = t[id_col].to_pylist()
            texts = t[text_col].to_pylist()
            out_id: list = []
            out_text: list = []
            out_n: list = []
            for i, txt in zip(ids, texts):
                kept = [
                    s
                    for s in _doc_segments(txt, words_per_seg)
                    if dmap.get(s, i) == i
                ]
                if kept:
                    out_id.append(i)
                    out_text.append(" ".join(kept))
                    out_n.append(len(kept))
            return pa.table(
                {
                    id_col: pa.array(out_id, type=pa.int64()),
                    "text_clean": pa.array(out_text, type=pa.string()),
                    "n_segs_kept": pa.array(out_n, type=pa.int64()),
                }
            )

        return ds.map_batches(rewrite, batch_format="pyarrow")

    # --- join path: occurrences ∪ keepers cogrouped by segment hash ---
    def explode_occurrences(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        texts = t[text_col].to_pylist()
        out_id: list = []
        out_s: list = []
        out_seg: list = []
        for i, txt in zip(ids, texts):
            segs = _doc_segments(txt, words_per_seg)
            out_id.extend([i] * len(segs))
            out_s.extend(range(len(segs)))
            out_seg.extend(segs)
        return pa.table(
            {
                id_col: pa.array(out_id, type=pa.int64()),
                "s": pa.array(out_s, type=pa.int64()),
                "segment": pa.array(out_seg, type=pa.string()),
                "keeper_id": pa.array([None] * len(out_id), type=pa.int64()),
            }
        )

    def widen_keepers(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {
                id_col: pa.array([None] * n, type=pa.int64()),
                "s": pa.array([None] * n, type=pa.int64()),
                "segment": t["segment"],
                "keeper_id": t["keeper_id"].cast(pa.int64()),
            }
        )

    occurrences = ds.map_batches(explode_occurrences, batch_format="pyarrow")
    keeper_rows = keepers.map_batches(widen_keepers, batch_format="pyarrow")

    def verdict(g: pd.DataFrame) -> pd.DataFrame:
        occ = g[g["keeper_id"].isna()][[id_col, "s", "segment"]]
        kp = g[g["keeper_id"].notna()][["segment", "keeper_id"]]
        m = occ.merge(kp, on="segment", how="inner")
        m = m[m[id_col] == m["keeper_id"]]
        return pd.DataFrame(
            {
                id_col: m[id_col].astype("int64"),
                "s": m["s"].astype("int64"),
                "segment": m["segment"].astype(str),
            }
        )

    survivors = (
        occurrences.union(keeper_rows)
        .map_batches(
            lambda t: add_key_partition(t, "segment", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(verdict, batch_format="pandas")
    )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "s"], kind="mergesort")
        agg = g.groupby(id_col, sort=False)["segment"].agg([" ".join, "size"])
        return pd.DataFrame(
            {
                id_col: agg.index.to_numpy(dtype="int64"),
                "text_clean": agg["join"].astype(str),
                "n_segs_kept": agg["size"].astype("int64"),
            }
        )

    return (
        survivors.map_batches(
            lambda t: add_key_partition(t, id_col, num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(assemble, batch_format="pandas")
    )


def dedup_segments_within_doc(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_seg: int = 20,
    out_col: str = "text_clean",
):
    """Intra-document segment dedup (Dolma's within-doc paragraph rule):
    inside each document, keep only the FIRST occurrence of every
    distinct segment (the ``_doc_segments`` resegmentation — the same
    rule as the corpus-level q95, so the two compose), preserving
    segment order.  Repeated nav blocks / chorus-style repetition
    collapse without touching cross-document state.

    Shuffle-FREE: purely per-document — one map_batches scan, the
    dedup itself a single vectorized pandas ``drop_duplicates`` over the
    batch's exploded (row, segment) table.  Output: (id_col, out_col,
    n_segs_kept) for every input row."""
    import pandas as pd

    def rewrite(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        rows: list[int] = []
        segs: list[str] = []
        for i, txt in enumerate(texts):
            ss = _doc_segments(txt, words_per_seg)
            rows.extend([i] * len(ss))
            segs.extend(ss)
        df = pd.DataFrame({"r": np.array(rows, dtype=np.int64), "seg": segs})
        kept = df.drop_duplicates(subset=["r", "seg"], keep="first")
        g = kept.groupby("r", sort=True)["seg"]
        # every text yields >= 1 segment ('' -> ['']), so reindex is total
        joined = g.agg(" ".join).reindex(range(len(texts)))
        n_kept = g.size().reindex(range(len(texts))).to_numpy(dtype=np.int64)
        return pa.table(
            {
                id_col: t[id_col],
                out_col: pa.array(joined.to_numpy(dtype=object), type=pa.string()),
                "n_segs_kept": pa.array(n_kept),
            }
        )

    return ds.map_batches(rewrite, batch_format="pyarrow")


_TKEY_SEP = "\x1f"  # unit separator: cannot appear in whitespace-tokenized text


def host_template_frequency(
    ds,
    *,
    host_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_seg: int = 2,
    num_parts: int = 32,
):
    """Dataset of (host, segment, n_docs): how many distinct documents OF
    THAT HOST contain each segment — the per-site twin of
    ``segment_doc_frequency``.  One shuffle keyed by the composite
    (host ␟ segment); shuffled volume is corpus segments, the output is
    per-host-template-vocabulary-sized."""
    import pandas as pd

    from .dedup import add_key_partition

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        hosts = t[host_col].to_pylist()
        texts = t[text_col].to_pylist()
        out_id: list = []
        out_key: list = []
        for i, h, txt in zip(ids, hosts, texts):
            segs = set(_doc_segments(txt, words_per_seg))
            out_id.extend([i] * len(segs))
            out_key.extend(f"{h}{_TKEY_SEP}{s}" for s in segs)
        return pa.table({id_col: out_id, "tkey": out_key})

    def count(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("tkey", sort=False)[id_col].size().reset_index(name="n_docs")
        r["n_docs"] = r["n_docs"].astype("int64")
        return r

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .map_batches(
            lambda t: add_key_partition(t, "tkey", num_parts=num_parts),
            batch_format="pyarrow",
        )
        .groupby("_part")
        .map_groups(count, batch_format="pandas")
    )


def remove_host_templates(
    ds,
    *,
    min_docs: int,
    host_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_seg: int = 2,
    num_parts: int = 32,
    method: str = "broadcast",
    bloom_fp_rate: float = 0.001,
    passthrough_cols: tuple = (),
):
    """Per-host boilerplate stripping (the CCNet/trafilatura 'same lines
    on every page of a site' rule): a segment is a TEMPLATE of host h
    when ≥ ``min_docs`` distinct documents of h contain it, and it is
    removed only from h's documents — a nav bar shared by one site's
    pages disappears there without touching an unrelated site that
    legitimately quotes the same words.  ``remove_frequent_segments`` is
    the global-frequency cousin; this one keys frequency AND removal by
    (host, segment).

    Same scale shape as the cousin: one composite-key shuffle to count,
    then either the exact template set broadcast (capped, loud) or a
    cap-free Bloom with ``bloom_fp_rate`` over-removal (the safe
    direction), then one shuffle-free rewrite scan.  Documents reduced
    to zero segments (fully-templated pages) are dropped.
    Output: (id, *passthrough_cols, text_clean, n_segs_kept)."""
    import pyarrow.compute as pc
    import ray

    if method not in ("broadcast", "bloom"):
        raise ValueError(f"unknown method {method!r}")

    freq = host_template_frequency(
        ds,
        host_col=host_col,
        text_col=text_col,
        id_col=id_col,
        words_per_seg=words_per_seg,
        num_parts=num_parts,
    ).map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_docs"], min_docs)),
        batch_format="pyarrow",
    )

    if method == "bloom":
        from .sketches import build_bloom

        freq = freq.materialize()
        n_freq = freq.count()
        bf_ref = ray.put(build_bloom(freq, "tkey", max(n_freq, 1), bloom_fp_rate))

        def templated_mask(bf, hosts, seg_lists):
            flat = [
                f"{h}{_TKEY_SEP}{s}"
                for h, segs in zip(hosts, seg_lists)
                for s in segs
            ]
            return (
                bf.contains_many(flat) if flat else np.empty(0, dtype=bool)
            )

        membership = ("bloom", bf_ref, templated_mask)
    else:
        templates = [
            s
            for b in collect_tables(freq, drop_empty=False)
            if b.num_rows
            for s in b.column("tkey").to_pylist()
        ]
        if len(templates) > _SEG_BROADCAST_CAP:
            raise ValueError(
                f"template set ({len(templates)}) exceeds broadcast cap "
                f"{_SEG_BROADCAST_CAP}; use method='bloom'"
            )
        membership = ("exact", ray.put(frozenset(templates)), None)

    kind, ref, mask_fn = membership

    def rewrite(t: pa.Table) -> pa.Table:
        state = ray.get(ref)
        hosts = t[host_col].to_pylist()
        texts = t[text_col].to_pylist()
        seg_lists = [_doc_segments(txt, words_per_seg) for txt in texts]
        if kind == "bloom":
            hit = mask_fn(state, hosts, seg_lists)
            pos = 0
        keep_mask: list = []
        out_text: list = []
        out_n: list = []
        for h, segs in zip(hosts, seg_lists):
            if kind == "bloom":
                m = hit[pos : pos + len(segs)]
                pos += len(segs)
                kept = [s for s, bad in zip(segs, m) if not bad]
            else:
                kept = [
                    s for s in segs if f"{h}{_TKEY_SEP}{s}" not in state
                ]
            keep_mask.append(bool(kept))
            if kept:
                out_text.append(" ".join(kept))
                out_n.append(len(kept))
        base = t.filter(pa.array(keep_mask, type=pa.bool_()))
        cols = {id_col: base[id_col]}  # id type flows through
        for c in passthrough_cols:
            cols[c] = base[c]
        cols["text_clean"] = pa.array(out_text, type=pa.string())
        cols["n_segs_kept"] = pa.array(out_n, type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(rewrite, batch_format="pyarrow")


# C0 controls except \t\n (+ DEL): the layout-bearing whitespace stays
_CTRL_RE = re.compile(r"[\x00-\x08\x0b-\x1f\x7f]")


def normalize_unicode(text: str) -> str:
    """Canonical text form for hashing/dedup/tokenization: Unicode NFC
    (combining sequences compose, compatibility singletons like U+212B
    ANGSTROM SIGN map to their canonical letter) THEN control-character
    strip — fixed order, replayed identically by the SQL oracle
    (DuckDB ``nfc_normalize`` + the same RE2 class).  Without this,
    byte-identical-content checks miss e+COMBINING-ACUTE vs é twins."""
    import unicodedata

    return _CTRL_RE.sub("", unicodedata.normalize("NFC", text or ""))


def add_normalized_text(
    batch: pa.Table, text_col: str = "text", out: str = "text_norm"
) -> pa.Table:
    """Vectorizable wrapper: (text) → (+ text_norm, n_cp_raw, n_cp_norm)
    codepoint counts on both sides of the normalization (the audit
    columns a cleaning report wants)."""
    texts = batch[text_col].to_pylist()
    norm = [normalize_unicode(t) for t in texts]
    return (
        batch.append_column(out, pa.array(norm, type=pa.string()))
        .append_column(
            "n_cp_raw",
            pa.array([len(t or "") for t in texts], type=pa.int64()),
        )
        .append_column(
            "n_cp_norm", pa.array([len(t) for t in norm], type=pa.int64())
        )
    )


# --- C4-style line-level quality rewrite ------------------------------------

# C4's line rules (Raffel et al. 2020 §2.2): keep lines that end in a
# terminal punctuation mark and have enough words; drop boilerplate /
# code-ish lines by substring.  Tuple order is the documented rule order.
C4_TERMINAL_CHARS = (".", "!", "?", '"')
C4_BLOCKED_SUBSTRINGS = ("javascript", "lorem ipsum", "{")


def c4_line_filter(
    ds,
    *,
    text_col: str = "text",
    min_words: int = 5,
    min_kept_lines: int = 1,
):
    """C4-style LINE-level quality rewrite: split each document on
    newlines, keep a (stripped) line iff it has >= ``min_words``
    whitespace words, ends in one of ``C4_TERMINAL_CHARS``, and its
    lowercase form contains none of ``C4_BLOCKED_SUBSTRINGS``; rejoin
    kept lines with a newline and DROP documents with fewer than
    ``min_kept_lines`` survivors.  This is the line-structured rewrite
    the document-level gates (q91 blocklist, q96 quality cascade) can't
    express — C4 removed ~5× more text with these rules than with its
    document filters.

    Scale shape: ONE shuffle-free ``map_batches`` scan; all kernels are
    vectorized pandas str ops over the exploded line table of one batch
    (lines never leave their task).  Output: input columns with
    ``text_col`` rewritten plus (n_lines, n_kept), filtered.

    Oracle domain note: word counts use Python ``str.split()``
    (any-whitespace); a SQL replay with ``string_split(line, ' ')``
    agrees on single-space text, which the parity fixture guarantees.
    """
    import pandas as pd
    import ray.data as rd  # noqa: F401  (ds is a Dataset; keep sig duck-typed)

    def rewrite(t: pa.Table) -> pa.Table:
        s = pd.Series(t[text_col].to_pylist(), dtype=object).fillna("")
        lines = s.str.split("\n")
        ex = lines.explode()
        st = ex.str.strip()
        low = st.str.lower()
        keep = (
            st.str.split().str.len().fillna(0).ge(min_words)
            & st.str[-1:].isin(list(C4_TERMINAL_CHARS))
        )
        for sub in C4_BLOCKED_SUBSTRINGS:
            keep &= ~low.str.contains(sub, regex=False)
        kept = st[keep]
        grouped = kept.groupby(level=0)
        n_kept = grouped.size().reindex(s.index, fill_value=0)
        cleaned = grouped.agg("\n".join).reindex(s.index, fill_value="")
        cols = {c: t[c] for c in t.column_names}
        cols[text_col] = pa.array(cleaned.to_numpy(dtype=object), type=pa.string())
        out = pa.table(cols).append_column(
            "n_lines", pa.array(lines.str.len().to_numpy(np.int64))
        ).append_column("n_kept", pa.array(n_kept.to_numpy(np.int64)))
        return out.filter(pa.array((n_kept >= min_kept_lines).to_numpy()))

    return ds.map_batches(rewrite, batch_format="pyarrow")


def c4_line_filter_sql(
    lines_cte: str,
    *,
    id_col: str = "doc_id",
    min_words: int = 5,
    min_kept_lines: int = 1,
) -> str:
    """DuckDB replay of :func:`c4_line_filter` (single-generator policy;
    the rule constants interpolate from the same tuples the engine
    uses).  ``lines_cte`` must define a CTE ``lines`` with columns
    (``id_col``, line_no BIGINT, line VARCHAR, n_lines BIGINT) — the
    already-split line table (single-space words, no empty lines)."""
    terms = ", ".join(
        "'" + c.replace("'", "''") + "'" for c in C4_TERMINAL_CHARS
    )
    blocked = " AND ".join(
        "NOT contains(lower(trim(line)), '" + b.replace("'", "''") + "')"
        for b in C4_BLOCKED_SUBSTRINGS
    )
    return f"""
        WITH {lines_cte},
        k AS (
          SELECT {id_col}, line_no, trim(line) AS line, n_lines
          FROM lines
          WHERE len(string_split(trim(line), ' ')) >= {min_words}
            AND right(trim(line), 1) IN ({terms})
            AND {blocked}
        )
        SELECT {id_col},
               string_agg(line, chr(10) ORDER BY line_no) AS text,
               CAST(max(n_lines) AS BIGINT) AS n_lines,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM k GROUP BY {id_col}
        HAVING count(*) >= {min_kept_lines}
    """


# --- double-encoding (mojibake) repair --------------------------------------

# UTF-8 bytes read back as latin-1/cp1252: a lead byte C2..F4 decodes to
# U+00C2..U+00F4 and every continuation byte 80..BF lands in
# U+0080..U+00BF (latin-1 view) or in cp1252's punctuation block
# ('é' -> 'Ã©', em dash -> 'â€”').  The
# continuation class below is built from the byte range itself, so the
# signature matches both views and no clean ASCII / clean single-accent
# text ('café' has the accent followed by a space).
_MOJIBAKE_CONT = "".join(chr(c) for c in range(0x80, 0xC0)) + "".join(
    bytes([b]).decode("cp1252")
    for b in range(0x80, 0xC0)
    if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)  # unmapped in cp1252
)
_MOJIBAKE_RE = re.compile("[Â-ô][" + re.escape(_MOJIBAKE_CONT) + "]")


def fix_double_encoding(text: str) -> tuple:
    """Repair one round of UTF-8-read-as-cp1252/latin-1 mojibake
    (ftfy's most common case): if ``text`` shows the lead+continuation
    signature, re-encode via cp1252 (falling back to latin-1 for the 5
    bytes cp1252 leaves unmapped) and decode as UTF-8.  Returns
    (repaired, fixed).  Anything that does not round-trip cleanly is
    returned unchanged — the repair can never corrupt a clean string."""
    if not text or not _MOJIBAKE_RE.search(text):
        return text, False
    for codec in ("cp1252", "latin-1"):
        try:
            fixed = text.encode(codec, errors="strict").decode(
                "utf-8", errors="strict"
            )
        except (UnicodeEncodeError, UnicodeDecodeError):
            continue
        if fixed != text:
            return fixed, True
        return text, False
    return text, False


def add_fixed_encoding(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Shuffle-free mojibake-repair scan: detection is ONE vectorized
    regex pass (pandas ``str.contains`` over the batch); the per-row
    encode/decode repair runs ONLY on flagged rows (a small fraction of
    any real corpus).  Rewrites ``text_col`` in place and appends a
    boolean ``fixed`` column."""
    import pandas as pd

    s = pd.Series(batch[text_col].to_pylist(), dtype=object).fillna("")
    flagged = s.str.contains(_MOJIBAKE_RE, regex=True, na=False)
    out = s.to_numpy(dtype=object).copy()
    fixed = np.zeros(len(s), dtype=bool)
    for i in np.flatnonzero(flagged.to_numpy()):
        out[i], fixed[i] = fix_double_encoding(out[i])
    cols = {c: batch[c] for c in batch.column_names}
    cols[text_col] = pa.array(out, type=pa.string())
    return pa.table(cols).append_column("fixed", pa.array(fixed))


# --- k-anonymity small-group suppression -------------------------------------


def suppress_small_groups(
    ds,
    *,
    group_cols,
    k: int = 10,
):
    """k-anonymity gate: drop every row whose quasi-identifier
    combination (``group_cols``) occurs fewer than ``k`` times — the
    privacy-release rule (a (lang, source, day) combination with 3
    documents can identify its author; with 10 000 it can't).

    Scale shape: ONE group-cardinality count groupby → the keep-set
    broadcasts via ``ray.put`` (combination-sized) → one shuffle-free
    membership filter scan ("␟"-joined composite keys, the host-template
    convention).  NULL group values RAISE (fail closed — str(None) would
    silently pool a null group with a literal 'None' string group, and a
    privacy gate must never widen a group by accident)."""
    import ray
    import ray.data as rd  # noqa: F401
    from ray.data.aggregate import Count

    from .collect import cached_ref

    SEP = "␟"

    def _key(t: pa.Table):
        import pandas as pd

        for c in group_cols:
            if t[c].null_count:
                raise ValueError(
                    f"NULL in k-anonymity group column {c!r} (fail-closed: "
                    "fill_null to an explicit sentinel first)"
                )
        key = pd.Series(t[group_cols[0]].to_pylist(), dtype=object).astype(str)
        for c in group_cols[1:]:
            key = key + SEP + pd.Series(
                t[c].to_pylist(), dtype=object
            ).astype(str)
        return key

    counts = (
        ds.groupby(list(group_cols))
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    keep = counts[counts["n"] >= k]
    keyset = set()
    for row in keep[list(group_cols)].itertuples(index=False):
        keyset.add(SEP.join(str(x) for x in row))
    keep_ref = ray.put(frozenset(keyset))

    def gate(t: pa.Table, _ref=keep_ref) -> pa.Table:
        ks = cached_ref(_ref)
        key = _key(t)
        mask = key.map(lambda s: s in ks).to_numpy(dtype=bool)
        return t.filter(pa.array(mask))

    return ds.map_batches(gate, batch_format="pyarrow")
