"""Registrable-domain (eTLD+1) extraction: rule semantics, SQL replay
equivalence, null/edge handling."""

import duckdb
import pyarrow as pa

from ai_service_ocr_grading_handler_ray.stages.domains import (
    add_registrable_domain,
    registrable_domain_sql,
    registrable_domains,
)

CASES = {
    "www.example.org": "example.org",
    "example.org": "example.org",
    "shop.megacorp.co.uk": "megacorp.co.uk",
    "a.b.megacorp.co.uk": "megacorp.co.uk",  # still last 3 labels
    "megacorp.co.uk": "megacorp.co.uk",
    "x.com.au": "x.com.au",
    "deep.sub.host.example.com": "example.com",
    "localhost": "localhost",            # no dot → itself
    "co.uk": "co.uk",                    # bare suffix, only 2 labels
    "": "",
}


def test_registrable_domains_rule():
    hosts = list(CASES)
    got = registrable_domains(pa.array(hosts + [None], type=pa.string()))
    assert got.to_pylist() == list(CASES.values()) + [""]


def test_registrable_domain_sql_matches_engine():
    hosts = [h for h in CASES if h]  # VALUES('') is fine but keep simple
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"('{h}')" for h in hosts)
        + ") v(h)"
    )
    df = con.sql(
        f"SELECT h, {registrable_domain_sql('h')} AS d FROM t"
    ).df()
    eng = dict(
        zip(hosts, registrable_domains(pa.array(hosts)).to_pylist())
    )
    assert {r.h: r.d for r in df.itertuples()} == eng


def test_add_registrable_domain_column():
    t = pa.table({"host": pa.array(["a.co.uk", "b.example.org"])})
    out = add_registrable_domain(t)
    assert out["domain"].to_pylist() == ["a.co.uk", "example.org"]


def test_registrable_domain_sql_empty_label_edge():
    """'.co.uk' / 'a..co.uk' fail the last-3 regex with an EMPTY-string
    extract — the SQL fallback must fire like the engine's NaN path."""
    hosts = [".co.uk", "a..co.uk", "x.co.uk"]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ",".join(f"('{h}')" for h in hosts)
        + ") v(h)"
    )
    df = con.sql(f"SELECT h, {registrable_domain_sql('h')} AS d FROM t").df()
    eng = dict(zip(hosts, registrable_domains(pa.array(hosts)).to_pylist()))
    assert {r.h: r.d for r in df.itertuples()} == eng
    assert eng[".co.uk"] == ".co.uk"  # fallback = host itself
