"""HTML head-metadata extraction (stages/html_meta.py)."""

import pyarrow as pa
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.html_meta import (
    add_head_meta,
    extract_head_meta,
)


def _t(payloads, binary=True):
    if binary:
        arr = pa.array([p.encode() for p in payloads], type=pa.binary())
    else:
        arr = pa.array(payloads, type=pa.string())
    return pa.table({"doc_id": list(range(len(payloads))), "html": arr})


def test_variants_and_decoys():
    pages = [
        # rel-first double quotes, name-first description
        '<head><link rel="stylesheet" href="/s.css">'
        '<title>T one</title>'
        '<link rel="canonical" href="https://c/1">'
        '<meta name="description" content="d one"></head>',
        # href-first single quotes + bare rel, content-first description
        "<head><link href='https://c/2' rel=canonical>"
        "<TITLE> T two </TITLE>"
        "<meta content='d two' name='description'></head>",
        # nothing present
        "<head><link rel=\"stylesheet\" href=\"/x.css\"></head>",
    ]
    out = add_head_meta(_t(pages))
    assert out["title"].to_pylist() == ["T one", "T two", ""]
    assert out["canonical"].to_pylist() == ["https://c/1", "https://c/2", ""]
    assert out["description"].to_pylist() == ["d one", "d two", ""]


def test_string_column_and_multiline():
    page = "<head>\n<title>Multi\nline</title>\n</head>"
    out = add_head_meta(_t([page], binary=False))
    assert out["title"].to_pylist() == ["Multi\nline"]


def test_head_cap_truncates():
    page = "x" * 100 + "<title>late title</title>"
    out = add_head_meta(_t([page]), head_cap=50)
    assert out["title"].to_pylist() == [""]


def test_dataset_wrapper_drops_html(ray_session):
    ds = rd.from_arrow(_t(['<head><title>a.</title></head>']))
    df = extract_head_meta(ds).to_pandas()
    assert "html" not in df.columns
    assert list(df.columns) == [
        "doc_id", "title", "canonical", "description", "has_canonical"
    ]
    assert not bool(df.has_canonical.iloc[0])


# --------------------------------------------------------------------------
# JSON-LD
# --------------------------------------------------------------------------

from ai_service_ocr_grading_handler_ray.stages.html_meta import (
    add_json_ld,
    extract_json_ld,
)


def test_json_ld_first_valid_block_wins():
    t = _t([
        '<script type="application/ld+json">{"@type": "A", "name": "one"}'
        '</script><script type="application/ld+json">'
        '{"@type": "B", "name": "two"}</script>',
    ])
    out = add_json_ld(t)
    assert out["ld_type"].to_pylist() == ["A"]
    assert out["ld_name"].to_pylist() == ["one"]
    assert out["n_ld_blocks"].to_pylist() == [2]


def test_json_ld_broken_block_skipped_not_fatal():
    t = _t([
        '<script type="application/ld+json">{"@type": "X",}</script>'
        "<script type='application/ld+json'>{\"@type\": \"Y\"}</script>",
    ])
    out = add_json_ld(t)
    assert out["ld_type"].to_pylist() == ["Y"]
    assert out["n_ld_blocks"].to_pylist() == [1]


def test_json_ld_scope_and_decoys():
    t = _t([
        # top-level array: out of scope, not counted
        '<script type="application/ld+json">[{"@type": "A"}]</script>',
        # javascript decoy with braces; no ld+json at all
        '<script type="text/javascript">var x = {"@type": "nope"};</script>',
        # non-string @type / missing name → '' sentinels, still counted
        '<script type="application/ld+json">{"@type": ["A", "B"]}</script>',
    ])
    out = add_json_ld(t)
    assert out["ld_type"].to_pylist() == ["", "", ""]
    assert out["ld_name"].to_pylist() == ["", "", ""]
    assert out["n_ld_blocks"].to_pylist() == [0, 0, 1]


def test_json_ld_string_column_and_attr_order():
    t = _t(
        ['<script async type=application/ld+json>'
         '{"@type": "T", "name": "bare-attr"}</script>'],
        binary=False,
    )
    out = add_json_ld(t)
    assert out["ld_type"].to_pylist() == ["T"]
    assert out["ld_name"].to_pylist() == ["bare-attr"]


def test_json_ld_dataset_wrapper_drops_html(ray_session):
    ds = rd.from_arrow(_t([
        '<script type="application/ld+json">{"@type": "Z", "name": "n"}</script>'
    ]))
    out = extract_json_ld(ds, keep_cols=["doc_id"]).to_pandas()
    assert list(out.columns) == ["doc_id", "ld_type", "ld_name", "n_ld_blocks"]
    assert out.loc[0, "ld_type"] == "Z"


# --------------------------------------------------------------------------
# heading outline
# --------------------------------------------------------------------------

from ai_service_ocr_grading_handler_ray.stages.html_meta import extract_outline


def _outline(pages, **kw):
    out = extract_outline(rd.from_arrow(_t(pages)), **kw).to_pandas()
    if out.empty:
        return []
    return list(zip(out["doc_id"], out["pos"], out["level"], out["heading"]))


def test_outline_order_levels_and_inline_markup(ray_session):
    got = _outline([
        "<h1>Top</h1><p>x</p><h2 class='s'>Chapter <em>two</em></h2>"
        "<h3>\n  multi\n  line  </h3>",
    ])
    assert got == [(0, 1, 1, "Top"), (0, 2, 2, "Chapter two"),
                   (0, 3, 3, "multi line")]


def test_outline_entities_and_decoys(ray_session):
    got = _outline([
        # entity decode incl. the &amp;lt; double-escape order
        "<h2>A &amp; B &lt;tag&gt; &amp;lt;</h2>"
        # h7 is not a heading; unclosed h2 skipped; mismatched pair skipped
        "<h7>nope</h7><h2>dangling<h4>closed</h4>",
    ])
    assert got == [(0, 1, 2, 'A & B <tag> &lt;'), (0, 2, 4, "closed")]


def test_outline_no_headings_emits_nothing(ray_session):
    assert _outline(["<p>plain</p>", ""]) == []
