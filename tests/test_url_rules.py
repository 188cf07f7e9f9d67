"""URL-rule gate (stages/url_rules.py): vectorized kernel semantics,
rule precedence, and the Dataset gate/audit/label plumbing."""

import pyarrow as pa
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.url_rules import (
    DEFAULT_RULES,
    UrlRules,
    classify_urls,
    filter_urls,
)


def test_verdicts_per_rule():
    urls = [
        "https://ok.example.org/p/1",
        "ftp://ok.example.org/p/2",
        "https://ads.tracker.example.org/p/3",
        "https://ok.example.org/casino/x/4",
        "https://ok.example.org/p/5?a=1&b=2&c=3&d=4&e=5",
        "https://ok.example.org/a/b/c/d/e/f/g/h/i/6",
    ]
    got = classify_urls(urls).tolist()
    assert got == [
        "ok", "bad_scheme", "blocked_host", "blocked_keyword",
        "query_spam", "deep_path",
    ]


def test_precedence_first_rule_wins():
    # tracker host AND casino path AND spam query AND ftp: scheme first
    u = "ftp://ads.tracker.example.org/casino/x?a=1&b=2&c=3&d=4&e=5"
    assert classify_urls([u]).tolist() == ["bad_scheme"]
    u2 = "https://ads.tracker.example.org/casino/x?a=1&b=2&c=3&d=4&e=5"
    assert classify_urls([u2]).tolist() == ["blocked_host"]


def test_query_and_fragment_do_not_extend_host_or_path():
    # urlsplit netloc semantics (the ADVICE r3 host fix): '?' terminates
    # the authority, '#' terminates the query
    assert classify_urls(["https://ads.tracker.example.org?x=1"]).tolist() == ["blocked_host"]
    assert classify_urls(["https://h.example.org/p?a=1&b=2&c=3&d=4&e=5#f=1&g=2"]).tolist() == ["query_spam"]
    # exactly max_query_params passes
    assert classify_urls(["https://h.example.org/p?a=1&b=2&c=3&d=4"]).tolist() == ["ok"]


def test_none_and_empty_are_bad_scheme():
    assert classify_urls([None, "", "not a url"]).tolist() == [
        "bad_scheme", "bad_scheme", "bad_scheme",
    ]


def test_trailing_slash_does_not_count_as_depth():
    rules = UrlRules(max_path_depth=2)
    assert classify_urls(["https://h/a/b/"], rules).tolist() == ["ok"]
    assert classify_urls(["https://h/a/b/c"], rules).tolist() == ["deep_path"]


def test_dataset_gate_and_audit_partition():
    urls = [
        "https://ok.example.org/p/1",
        "https://ads.tracker.example.org/p/2",
        "https://ok.example.org/casino/3",
    ]
    ds = rd.from_arrow(pa.table({"url": urls, "doc_id": [1, 2, 3]}))
    kept = filter_urls(ds, rules=DEFAULT_RULES).to_pandas()
    rejected = filter_urls(ds, rules=DEFAULT_RULES, keep=False).to_pandas()
    assert kept.doc_id.tolist() == [1]
    assert sorted(rejected.doc_id) == [2, 3]
    labeled = filter_urls(ds, rules=DEFAULT_RULES, verdict_col="v").to_pandas()
    assert labeled.sort_values("doc_id").v.tolist() == [
        "ok", "blocked_host", "blocked_keyword",
    ]
