"""HTML table extraction (stages/html_tables.py)."""

import pyarrow as pa
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.html_tables import (
    extract_tables,
    tables_in_html,
)


def test_kernel_basic():
    html = (
        '<table class="x"><tr><th>A</th><th>B</th></tr>'
        "<tr><td>1</td><td><b>2</b></td></tr></table>"
    )
    cells = tables_in_html(html)
    assert cells == [
        (0, 0, 0, "A", True),
        (0, 0, 1, "B", True),
        (0, 1, 0, "1", False),
        (0, 1, 1, "2", False),  # inner tags stripped
    ]


def test_kernel_multiple_tables_case_and_whitespace():
    html = (
        "<TABLE><TR><TD> one </TD></TR></TABLE>"
        "<p>between</p>"
        "<table><tr><td>two</td></tr></table>"
    )
    cells = tables_in_html(html)
    assert cells == [(0, 0, 0, "one", False), (1, 0, 0, "two", False)]


def test_no_tables_and_empty():
    assert tables_in_html("<p>none</p>") == []
    assert tables_in_html("") == []
    assert tables_in_html(None) == []


def test_dataset_stage(ray_session):
    t = pa.table(
        {
            "doc_id": [1, 2],
            "html": pa.array(
                [
                    b"<table><tr><td>x</td></tr></table>",
                    b"<p>no table</p>",
                ],
                type=pa.binary(),
            ),
        }
    )
    df = extract_tables(rd.from_arrow(t)).to_pandas()
    assert len(df) == 1
    assert df.iloc[0].to_dict() == {
        "doc_id": 1, "table_idx": 0, "row_idx": 0, "col_idx": 0,
        "cell": "x", "is_header": False,
    }


def test_linearize_tables(ray_session):
    import pandas as pd
    from ai_service_ocr_grading_handler_ray.stages.html_tables import (
        linearize_tables,
    )

    cells = pd.DataFrame(
        {
            "doc_id": [1] * 6 + [2],
            "table_idx": [0] * 6 + [0],
            "row_idx": [0, 0, 1, 1, 2, 2, 0],
            "col_idx": [0, 1, 0, 1, 0, 1, 0],
            "cell": ["name", "age", "ann", "34", "bo", "9", "lonely"],
            "is_header": [True, True, False, False, False, False, False],
        }
    )
    out = (
        linearize_tables(rd.from_pandas(cells))
        .to_pandas()
        .sort_values(["doc_id", "row_idx"])
        .reset_index(drop=True)
    )
    assert list(out.text) == [
        "name: ann | age: 34",
        "name: bo | age: 9",
        "lonely",  # no header in doc 2 -> value alone
    ]
