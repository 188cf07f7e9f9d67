"""HTML tag-frequency profiles (stages/tagstats.py): hand-computed
counts, binary-column cast, null drops, and the non-overlapping
substring-count convention shared with the SQL replay."""

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.tagstats import tag_histogram


def _run(hosts, htmls, binary=True, **kw):
    typ = pa.binary() if binary else pa.string()
    payload = [
        (h.encode() if binary and h is not None else h) for h in htmls
    ]
    t = pa.table(
        {
            "host": pa.array(hosts, type=pa.string()),
            "html": pa.array(payload, type=typ),
        }
    )
    out = tag_histogram(rd.from_arrow(t), **kw).to_pandas()
    return out.sort_values("g").reset_index(drop=True)


def test_hand_computed_counts(ray_session):
    out = _run(
        ["a", "a", "b"],
        [
            "<html><p>x</p><p>y</p><div><a href='/'>l</a></div></html>",
            "<p>solo</p>",
            "<div><div><a x><a y><a z>",
        ],
    ).set_index("g")
    assert out.loc["a"].to_list() == [2, 3, 1, 1]     # pages, p, div, a
    assert out.loc["b"].to_list() == [1, 0, 2, 3]


def test_close_tags_do_not_count(ray_session):
    # </p> and </div> and </a> must not match the openers.
    out = _run(["a"], ["</p></div></a>"])
    assert out.loc[0, ["n_p", "n_div", "n_a"]].to_list() == [0, 0, 0]


def test_null_rows_drop_and_string_col(ray_session):
    out = _run(
        ["a", None, "a"],
        ["<p>", "<p>", None],
        binary=False,
    ).set_index("g")
    assert out.loc["a", "n_pages"] == 1
    assert out.loc["a", "n_p"] == 1


def test_custom_tags(ray_session):
    out = _run(
        ["a"],
        ["<table><tr><td>1</td></tr></table>"],
        tags={"n_table": "<table", "n_tr": "<tr"},
    )
    assert out.loc[0, "n_table"] == 1
    assert out.loc[0, "n_tr"] == 1
