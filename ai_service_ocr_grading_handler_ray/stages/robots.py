"""robots.txt gating: the crawl-politeness filter that runs beside the
URL-rule gate (stages/url_rules.py) before any fetch.

Scope: the subset of the robots exclusion protocol that covers the
overwhelming majority of real files — ``User-agent`` groups and
``Disallow`` path-prefix records for the wildcard agent, default-allow
otherwise.  ``Allow`` records, ``$`` anchors and ``*`` wildcards are
out of scope (documented; the parser ignores them loudly rather than
mis-applying them).  Within that scope the semantics equal stdlib
``urllib.robotparser`` (equivalence-tested in tests/test_robots.py),
and — deliberately — equal SQL prefix LIKE matching, so q127's oracle
can replay the whole gate.

Scale shape: the robots side is host-cardinality (a dimension table) —
parse once, broadcast the {host: (prefix, …)} dict via ``ray.put``,
then ONE shuffle-free scan of the url side; per row the check is one
C-level ``str.startswith(tuple)``.  A registry too large to broadcast
would hash-partition both sides on host instead (the bucketed-join
fallback documented in stages/joins.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .skew import hosts_of_urls


def parse_robots(text: str) -> tuple[str, ...]:
    """Disallow path prefixes applying to agent ``*`` (lowercased field
    names, comments stripped, empty Disallow = allow-all record
    ignored).  Unsupported directives (Allow, Crawl-delay, Sitemap) are
    skipped."""
    prefixes: list[str] = []
    applies = False
    in_rules = False  # rules seen since the last User-agent line
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_rules:  # an agent line after rules starts a NEW group
                applies = False
                in_rules = False
            applies = applies or value == "*"
        elif field == "disallow":
            in_rules = True
            if applies and value:
                prefixes.append(value)
        elif field in ("allow", "crawl-delay"):
            in_rules = True  # closes the agent-accumulation phase
    return tuple(prefixes)


def _path_of(url: str) -> str:
    """Path + query of a scheme://host/... url ('' when absent) —
    robots Disallow prefixes match from the first '/' after the host."""
    i = url.find("://")
    if i < 0:
        return url
    j = url.find("/", i + 3)
    return url[j:] if j >= 0 else "/"


def robots_gate(
    urls_ds: rd.Dataset,
    robots_ds: rd.Dataset,
    *,
    url_col: str = "url",
    host_col: str = "host",
    robots_col: str = "robots_txt",
    keep: bool = True,
    verdict_col: str | None = None,
) -> rd.Dataset:
    """Filter (or label, via ``verdict_col``) urls against a
    (host, robots_txt) dimension table.  Hosts with no robots entry
    default-allow."""
    rules: dict[str, tuple[str, ...]] = {}
    for blk in robots_ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        for h, txt in zip(blk[host_col].to_pylist(), blk[robots_col].to_pylist()):
            rules[h or ""] = parse_robots(txt or "")
    rules_ref = ray.put(rules)

    def verdicts(t: pa.Table) -> np.ndarray:
        r = ray.get(rules_ref)
        urls = t[url_col].to_pylist()
        hosts = hosts_of_urls(t[url_col]).to_pylist()
        out = np.ones(len(urls), dtype=bool)
        for i, (u, h) in enumerate(zip(urls, hosts)):
            pref = r.get(h or "")
            if pref:
                out[i] = not _path_of(u or "").startswith(pref)
        return out

    if verdict_col is not None:
        def label(t: pa.Table) -> pa.Table:
            ok = verdicts(t)
            return t.append_column(
                verdict_col,
                pa.array(np.where(ok, "allowed", "disallowed")),
            )

        return urls_ds.map_batches(label, batch_format="pyarrow")

    def gate(t: pa.Table) -> pa.Table:
        ok = verdicts(t)
        return t.filter(pa.array(ok if keep else ~ok))

    return urls_ds.map_batches(gate, batch_format="pyarrow")
