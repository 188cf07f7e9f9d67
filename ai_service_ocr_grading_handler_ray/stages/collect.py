"""Driver-side bounded-merge collection.

Every bounded driver merge in the engine (k x blocks top-k rows,
bins-sized histogram counts, sparse gradient / centroid partials,
vocab-capped frequency tables) ends by pulling a SMALL Dataset's blocks
to the driver.  The obvious call — ``ray.get(ds.to_arrow_refs())`` —
executes the plan TWICE on a lazy Dataset: once for the blocks, then
Ray Data's ``to_arrow_refs`` calls ``self.schema(fetch_if_missing=True)``
which (schema not being cached by the iterator path) re-runs the whole
upstream plan under a ``limit=1`` probe.  For iterative algorithms
(logreg / PageRank / k-means: one fold per iteration) that doubles the
number of executions; for plans with an all-to-all upstream the probe
can replay a shuffle.

``collect_tables`` streams the blocks through
``iter_batches(batch_size=None, batch_format="pyarrow")`` instead —
exactly ONE execution, zero-copy per block, identical contents.  Use it
for every bounded merge; never call it on a corpus-sized Dataset (the
same rule as ``to_pandas``).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def collect_tables(ds: rd.Dataset, *, drop_empty: bool = True) -> list[pa.Table]:
    """All blocks of ``ds`` as driver-local Arrow tables via a single
    streaming execution (``batch_size=None`` = one batch per block)."""
    out: list[pa.Table] = []
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        if b.num_rows or not drop_empty:
            out.append(b)
    return out


def collect_table(ds: rd.Dataset) -> pa.Table:
    """``ds`` concatenated into one driver-local Arrow table (single
    execution).  Zero-row blocks can surface with an EMPTY schema (an
    empty sort partition, a filter that drained a block), which
    ``pa.concat_tables`` rejects — non-empty blocks are cast to the
    first block's schema and empty ones dropped; an all-empty result
    keeps whatever schema the first block carried."""
    tbls = collect_tables(ds, drop_empty=False)
    live = [t for t in tbls if t.num_rows]
    if live:
        return pa.concat_tables([t.cast(live[0].schema) for t in live]).combine_chunks()
    return tbls[0] if tbls else pa.table({})


_REF_CACHE: dict = {}


def cached_ref(ref):
    """Per-worker-process cache of a broadcast object ref: non-numeric
    payloads (dicts, frozensets, object arrays) are pickle-deserialized
    by EVERY ``ray.get``, so a bare get per batch rebuilds a large
    broadcast thousands of times per run.  One entry per object ref —
    the ref pins the object, the cache pins the deserialized view (the
    cached-task twin of actor ``__init__`` warm-up)."""
    import ray

    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _REF_CACHE:
        if len(_REF_CACHE) > 8:  # a worker only ever sees a few refs
            _REF_CACHE.clear()
        _REF_CACHE[key] = ray.get(ref)
    return _REF_CACHE[key]
