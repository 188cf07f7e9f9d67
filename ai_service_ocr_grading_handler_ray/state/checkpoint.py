"""Stage-boundary checkpoints for multiply-consumed Dataset intermediates.

A lazy ``ray.data.Dataset`` re-executes its whole upstream lineage once
per consumer.  When a stage output feeds two or more downstream stages
there are three strategies, in increasing durability:

``mode=None``
    Stream: each consumer re-scans the (column-pruned) lineage.  The
    right default when the source is a parquet read — re-reading pruned
    columns from storage is cheaper at scale than pinning the corpus in
    the object store.
``mode=True``
    In-memory ``materialize()`` — object-store resident, lost on driver
    crash.  Right for SLIM projections (ids, fingerprints) that many
    consumers share.
``mode="parquet"``
    DURABLE checkpoint: the stage output is written once to
    ``ckpt_dir/name/data`` (written to ``data.tmp`` and renamed, then a
    ``_COMPLETE.json`` manifest with row count + the stage parameters is
    committed last — the same atomic rename-then-manifest protocol as
    ``state/manifest.py``).  A rerun that finds a manifest whose params
    match READS the parquet instead of re-executing upstream shuffles; a
    params mismatch or missing manifest discards the directory and
    recomputes.  This is the 100-TB path: consumers re-read pruned
    columns from disk and the object store never pins the corpus.
"""

from __future__ import annotations

import json
import os
import shutil

import ray.data as rd


def stage_checkpoint(
    ds: rd.Dataset,
    mode,
    ckpt_dir: str | None,
    name: str,
    params: dict,
) -> rd.Dataset:
    """Checkpoint ``ds`` per ``mode`` (see module docstring) and return
    the Dataset consumers should read."""
    if mode is None or mode is False:
        return ds
    if mode != "parquet":
        return ds.materialize()
    if not ckpt_dir:
        raise ValueError("checkpoint='parquet' requires checkpoint_dir")
    d = os.path.join(ckpt_dir, name)
    data = os.path.join(d, "data")
    marker = os.path.join(d, "_COMPLETE.json")
    if os.path.isfile(marker):
        with open(marker) as f:
            meta = json.load(f)
        if meta.get("params") == params:
            return rd.read_parquet(data)
    shutil.rmtree(d, ignore_errors=True)
    tmp = os.path.join(d, "data.tmp")
    os.makedirs(tmp, exist_ok=True)
    ds.write_parquet(tmp)
    os.rename(tmp, data)
    n = rd.read_parquet(data).count()  # parquet-metadata count, no scan
    tmp_marker = marker + ".tmp"
    with open(tmp_marker, "w") as f:
        json.dump({"rows": n, "params": params}, f)
    os.replace(tmp_marker, marker)
    return rd.read_parquet(data)
