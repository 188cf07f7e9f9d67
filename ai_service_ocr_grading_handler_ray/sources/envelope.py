"""Event-envelope parsing (SURVEY.md S1/S2) — the reference's SQS/HTTP
entry surface (``service_handler.py:153-184`` create_reqobj_scan,
``:31-101`` path router) as pure functions + a Ray reader.

In the engine Parquet is the envelope, so this module exists for parity
with the reference's ingestion surface: JSON event files (SQS-record or
HTTP shapes) → normalized record lists → ``ray.data`` datasets.
"""

from __future__ import annotations

import json
from typing import Any

import ray.data as rd

ROUTES = {
    "/generate": "grading",
    "/generateQuestion": "question_generation",
    "/latexToImage": "latex_to_image",
    "/asciiMathToImage": "ascii_to_image",
}


def as_bool(x: Any) -> Any:
    """Reference truthiness quirk (service_handler.py:156-163): '' passes
    through; only "1"/"true"/"True"/"t"/"T" are True; everything else —
    including "yes" and 1 (int) — is False."""
    if x == "":
        return ""
    return x in ("1", "true", "True", "t", "T")


def create_reqobj_scan(body: dict, reqtype: str) -> list[dict]:
    """Envelope → list of records; scalars wrap into a 1-list
    (service_handler.py:166-184).  Unknown reqtype raises, as the
    reference does."""
    if reqtype == "json":
        reqobj_body = json.loads(body["Records"][0]["body"])
    elif reqtype in ("question_generation", "latex_to_image", "ascii_to_image"):
        reqobj_body = json.loads(body["body"])
    else:
        raise ValueError("Invalid request type!")
    return reqobj_body if isinstance(reqobj_body, list) else [reqobj_body]


def route_for_path(path: str) -> str:
    """URL-path router (service_handler.py:31-37): path → job kind."""
    return ROUTES.get(path, "unknown")


def read_event_records(events: list[dict]) -> rd.Dataset:
    """Parse a batch of captured envelopes into one Dataset of records.

    Driver-side (envelopes are tiny control data); the resulting Dataset
    streams through the normal grading pipeline."""
    records: list[dict] = []
    for event in events:
        path = event.get("requestContext", {}).get("http", {}).get("path", "/generate")
        reqtype = "json" if path == "/generate" else ROUTES.get(path, "json")
        if reqtype == "grading":
            reqtype = "json"
        for rec in create_reqobj_scan(event, reqtype):
            rec["_route"] = route_for_path(path)
            records.append(rec)
    return rd.from_items(records)
