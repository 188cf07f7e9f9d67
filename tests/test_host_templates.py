"""Per-host template removal (stages/clean.remove_host_templates)."""

import pandas as pd
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.clean import (
    host_template_frequency,
    remove_host_templates,
)

# site A: every page carries the "nav bar home" boilerplate; site B has
# ONE page legitimately quoting the same words
ROWS = [
    {"doc_id": 1, "source": "a.com", "text": "nav bar unique one text here"},
    {"doc_id": 2, "source": "a.com", "text": "nav bar unique two words go"},
    {"doc_id": 3, "source": "a.com", "text": "nav bar unique three more pad"},
    {"doc_id": 4, "source": "b.com", "text": "nav bar quoted once only pad"},
    {"doc_id": 5, "source": "b.com", "text": "other words entirely here pad x"},
    {"doc_id": 6, "source": "a.com", "text": "nav bar"},  # fully templated
]


def _run(**kw):
    out = remove_host_templates(
        rd.from_items(ROWS), min_docs=3, host_col="source", **kw
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_template_removed_only_on_its_host():
    out = _run()
    by_id = out.set_index("doc_id")["text_clean"]
    # a.com pages lose "nav bar" (df=4 >= 3 within a.com)
    assert by_id[1] == "unique one text here"
    assert by_id[2] == "unique two words go"
    # b.com's single quote survives: df within b.com is 1
    assert by_id[4] == "nav bar quoted once only pad"


def test_fully_templated_page_dropped():
    out = _run()
    assert 6 not in set(out["doc_id"])
    assert set(out["doc_id"]) == {1, 2, 3, 4, 5}


def test_frequency_is_per_host():
    freq = host_template_frequency(rd.from_items(ROWS)).to_pandas()
    m = dict(zip(freq["tkey"], freq["n_docs"]))
    assert m["a.com\x1fnav bar"] == 4
    assert m["b.com\x1fnav bar"] == 1


def test_bloom_path_matches_exact_path():
    a = _run(method="broadcast")
    b = _run(method="bloom", bloom_fp_rate=1e-6)
    pd.testing.assert_frame_equal(a, b)


def test_string_ids_flow_through():
    rows = [dict(r, doc_id=f"u{r['doc_id']}") for r in ROWS]
    out = remove_host_templates(
        rd.from_items(rows), min_docs=3, host_col="source"
    ).to_pandas()
    assert out["doc_id"].map(type).eq(str).all()


def test_partitioning_invariance():
    one = _run()
    many = remove_host_templates(
        rd.from_items(ROWS).repartition(4), min_docs=3, host_col="source"
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(one, many)
