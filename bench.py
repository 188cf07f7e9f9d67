"""Benchmark harness (driver-run per round; see BASELINE.md).

Headline: the flagship extraction pipeline (synthesize pages from the
documents table, replicated deterministically → classify → extract →
write parquet), measured end-to-end over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "docs": N, "docs_per_sec": N}

--scaling: runs the headline twice in fresh processes (num_cpus=8 and 32)
on the same input and prints throughput at both plus scaling efficiency
(rate_32 / rate_8) / 4  — the sandbox substitute for N vs 4N nodes
(BASELINE.md / SURVEY.md §4).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("GRAFT_REPLICATE", "48"))

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q05_orders_by_segment",
    "q11_events_hourly",
    "q12_sessionize",
    "q16_dedup_docs_exact",
    "q20_knn_brute",
    "q31_grading",
    "q32_minhash_dedup",
]


def _consume(result) -> int:
    """Force execution; return row count."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    if isinstance(result, rd.Dataset):
        return result.count()
    if isinstance(result, (pd.DataFrame, pa.Table)):
        return len(result)
    return 0


def build_replicated_pages(sf_dir: str, replicate: int):
    """documents → pages, replicated deterministically (distinct urls per
    replica) so the benchmark workload is ≫ the tiny source table."""
    import pyarrow as pa
    import ray.data as rd

    from ai_service_ocr_grading_handler_ray.synth import docs_to_pages

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )

    def explode(batch: pa.Table) -> pa.Table:
        tables = []
        for r in range(replicate):
            t = batch.set_column(
                0,
                "doc_id",
                pa.array(
                    [d + r * 10_000_000 for d in batch["doc_id"].to_pylist()],
                    type=pa.int64(),
                ),
            )
            tables.append(docs_to_pages(t))
        return pa.concat_tables(tables)

    # small input batches: each input row fans out ×replicate, so 32 doc
    # rows → ~384 pages per fused task; ~160 tasks keeps every CPU busy
    return ds.map_batches(explode, batch_format="pyarrow", batch_size=32)


def run_headline() -> tuple[float, int]:
    from ai_service_ocr_grading_handler_ray.pipelines.extract import extract_pages

    out_dir = f"/tmp/bench_out_{NUM_CPUS}"
    shutil.rmtree(out_dir, ignore_errors=True)

    # warm the page cache (untimed tiny read)
    with open(f"{SF_DIR}/documents.parquet", "rb") as f:
        f.read()

    t0 = time.perf_counter()
    pages = build_replicated_pages(SF_DIR, REPLICATE)
    result = extract_pages(pages, batch_size=32)
    result.write_parquet(out_dir)
    elapsed = time.perf_counter() - t0

    import pyarrow.dataset as pads

    n_docs = pads.dataset(out_dir, format="parquet").count_rows()
    shutil.rmtree(out_dir, ignore_errors=True)
    return elapsed, n_docs


def run_queries() -> dict[str, float]:
    from ai_service_ocr_grading_handler_ray.pipelines.queries import QUERIES

    out: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        _consume(QUERIES[name](SF_DIR))
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.preserve_order = False

    headline_sec, n_docs = run_headline()
    queries = {} if "--headline-only" in sys.argv else run_queries()

    print(
        json.dumps(
            {
                "metric": "flagship extraction wall time (synthesize+classify+extract+write)",
                "value": round(headline_sec, 3),
                "unit": "sec",
                "queries": queries,
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
                "docs": n_docs,
                "docs_per_sec": round(n_docs / headline_sec, 1),
            }
        )
    )
    ray.shutdown()


def scaling() -> None:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = run(8), run(32)
    rate_lo, rate_hi = lo["docs_per_sec"], hi["docs_per_sec"]
    eff = (rate_hi / rate_lo) / (32 / 8)
    print(
        json.dumps(
            {
                "sec_8cpu": lo["value"],
                "sec_32cpu": hi["value"],
                "docs": hi["docs"],
                "docs_per_sec_8cpu": rate_lo,
                "docs_per_sec_32cpu": rate_hi,
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
