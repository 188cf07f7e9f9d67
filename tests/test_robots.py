"""robots.txt gate (stages/robots.py): parser group semantics, stdlib
urllib.robotparser equivalence on the q127 corpus, gate plumbing."""

import io
import urllib.robotparser

import pyarrow as pa
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.robots import (
    _path_of,
    parse_robots,
    robots_gate,
)


def test_parse_groups_and_wildcards():
    txt = (
        "# comment\n"
        "User-agent: googlebot\nDisallow: /g\n\n"
        "User-agent: *\nUser-agent: extra\nDisallow: /a\nDisallow: /b/\n\n"
        "User-agent: otherbot\nDisallow: /c\n"
    )
    assert parse_robots(txt) == ("/a", "/b/")


def test_empty_disallow_is_allow_all():
    assert parse_robots("User-agent: *\nDisallow:\n") == ()
    assert parse_robots("") == ()
    assert parse_robots(None) == ()


def test_allow_lines_close_group_but_are_ignored():
    txt = "User-agent: *\nAllow: /open\nDisallow: /p\nUser-agent: x\nDisallow: /q\n"
    assert parse_robots(txt) == ("/p",)


def test_path_of():
    assert _path_of("https://h.example.org/a/b?q=1") == "/a/b?q=1"
    assert _path_of("https://h.example.org") == "/"
    assert _path_of("relative") == "relative"


def _urllib_allows(txt: str, url: str) -> bool:
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(io.StringIO(txt).read().splitlines())
    return rp.can_fetch("graftbot", url)


def test_equivalence_with_urllib_on_q127_corpus():
    """Within the documented scope (wildcard-agent Disallow prefixes)
    the parser must agree with stdlib urllib.robotparser — checked over
    every robots variant q127 generates × a url battery."""
    variants = [
        "User-agent: *\nDisallow: /\n",
        "User-agent: googlebot\nDisallow: /x\n\nUser-agent: *\nDisallow: /casino\nDisallow: /t/\n",
        "User-agent: *\nAllow: /open\nDisallow: /p/9\n",
        "User-agent: *\nDisallow:\n",
    ]
    urls = [
        "https://h.example.org/p/1",
        "https://h.example.org/p/9",
        "https://h.example.org/p/90",
        "https://h.example.org/casino/x/5",
        "https://h.example.org/t/7",
        "https://h.example.org/x/anything",
        "https://h.example.org/open/page",
    ]
    for txt in variants:
        pref = parse_robots(txt)
        for u in urls:
            mine = not _path_of(u).startswith(pref) if pref else True
            assert mine == _urllib_allows(txt, u), (txt, u)


def test_gate_filters_and_labels():
    urls_ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "url": [
                    "https://a.org/ok/1",
                    "https://a.org/secret/2",
                    "https://b.org/secret/3",  # b.org has no robots entry
                ],
            }
        )
    )
    robots_ds = rd.from_arrow(
        pa.table(
            {"host": ["a.org"], "robots_txt": ["User-agent: *\nDisallow: /secret\n"]}
        )
    )
    kept = robots_gate(urls_ds, robots_ds).to_pandas()
    assert sorted(kept.doc_id) == [1, 3]
    audit = robots_gate(urls_ds, robots_ds, keep=False).to_pandas()
    assert audit.doc_id.tolist() == [2]
    labeled = robots_gate(urls_ds, robots_ds, verdict_col="v").to_pandas()
    assert labeled.sort_values("doc_id").v.tolist() == [
        "allowed", "disallowed", "allowed",
    ]
