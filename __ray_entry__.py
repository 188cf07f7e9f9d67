"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in the library) calls ``ray.init``/``ray.shutdown``.

- ``entry()``: flagship extraction pipeline over sf0.001 (pages synthesized
  deterministically from the documents table → classify → extract).
- ``queries()``: one entry per implemented operator/pipeline from
  SURVEY.md §2 (see ai_service_ocr_grading_handler_ray/pipelines/queries.py).
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible entry;
  engine-specific entries (extraction, grading, near-dup clustering, LSH
  ANN) are intentionally absent → driver records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from ai_service_ocr_grading_handler_ray.pipelines.queries import ORACLE_SQL, QUERIES


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from ai_service_ocr_grading_handler_ray.pipelines.extract import flagship

    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
