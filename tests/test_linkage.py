"""Fuzzy record linkage (stages/linkage.py): Levenshtein kernel vs
DuckDB, vectorized max_dist=1 path vs DP path, blocking recall
semantics, partition invariance."""

import itertools

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from ai_service_ocr_grading_handler_ray.stages.linkage import (
    fuzzy_name_join,
    levenshtein,
)


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="abcde", max_size=9), st.text(alphabet="abcde", max_size=9))
def test_levenshtein_matches_duckdb_on_ascii(a, b):
    got = levenshtein(a, b)
    exp = duckdb.sql(
        "select levenshtein(?, ?)", params=[a, b]
    ).fetchone()[0]
    assert got == exp


def test_levenshtein_counts_codepoints_not_bytes():
    # DuckDB levenshtein counts UTF-8 bytes ('日' = 3); the engine
    # counts codepoints — the documented divergence outside ASCII
    assert levenshtein("日", "") == 1
    assert levenshtein("aß", "a") == 1
    assert duckdb.sql("select levenshtein('日', '')").fetchone()[0] == 3


def _names(n=60):
    names = []
    for i in range(n):
        base = f"{i // 2:05d} record"
        if i % 2 == 1:
            p = i % 4 + 7
            base = base[: p - 1] + base[p:]
        names.append(base)
    return names


def _brute(names, block_len, max_dist):
    exp = set()
    for i, j in itertools.combinations(range(len(names)), 2):
        if names[i][:block_len] == names[j][:block_len]:
            d = levenshtein(names[i], names[j])
            if d <= max_dist:
                exp.add((i, j, d))
    return exp


def _run(names, block_len, max_dist, blocks=1):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(names)), type=pa.int64()),
            "name": pa.array(names, type=pa.string()),
        }
    )
    ds = rd.from_arrow(t)
    if blocks > 1:
        ds = ds.repartition(blocks)
    out = fuzzy_name_join(
        ds, name_col="name", block_len=block_len, max_dist=max_dist
    ).to_pandas()
    return {(r.a, r.b, r.dist) for r in out.itertuples()}


def test_vectorized_path_matches_brute_force(ray_session):
    names = _names()
    assert _run(names, 3, 1) == _brute(names, 3, 1)


def test_dp_path_matches_brute_force(ray_session):
    names = _names(30)
    assert _run(names, 3, 2) == _brute(names, 3, 2)


def test_partition_invariant(ray_session):
    names = _names()
    assert _run(names, 3, 1, blocks=5) == _run(names, 3, 1)


def test_blocking_hides_cross_block_pairs(ray_session):
    # identical names in different blocks are NOT compared
    names = ["aaax", "bbbx"]
    assert _run(names, 4, 1) == set()


def test_empty_and_short_names(ray_session):
    names = ["", "a", "", "ab"]
    got = _run(names, 4, 1)
    exp = _brute(names, 4, 1)
    assert got == exp and ("" , ) not in got  # sanity: no crash on ''
