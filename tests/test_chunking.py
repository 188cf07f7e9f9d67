"""Overlapping word-window chunking (stages/chunking.py)."""

import pyarrow as pa
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.stages.chunking import (
    chunk_batch,
    chunk_documents,
)


def _tbl(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_overlap_and_stride():
    words = [f"w{i}" for i in range(10)]
    out = chunk_batch(_tbl([" ".join(words)]), chunk_words=4, overlap=2)
    # stride 2 → starts 0,2,4,6,8
    assert out["start_word"].to_pylist() == [0, 2, 4, 6, 8]
    assert out["chunk_id"].to_pylist() == [0, 1, 2, 3, 4]
    assert out["chunk_text"].to_pylist()[0] == "w0 w1 w2 w3"
    assert out["chunk_text"].to_pylist()[1] == "w2 w3 w4 w5"
    assert out["chunk_text"].to_pylist()[-1] == "w8 w9"  # short tail
    assert out["n_chunk_words"].to_pylist() == [4, 4, 4, 4, 2]


def test_lossless_coverage():
    """Dropping each chunk's overlap prefix (except the first) and
    concatenating reconstructs the document exactly."""
    words = [f"t{i}" for i in range(137)]
    out = chunk_batch(_tbl([" ".join(words)]), chunk_words=16, overlap=5)
    parts = []
    for k, txt in enumerate(out["chunk_text"].to_pylist()):
        ws = txt.split(" ")
        parts.extend(ws if k == 0 else ws[5:])
    assert parts == words


def test_short_empty_and_null_docs():
    out = chunk_batch(
        pa.table({"doc_id": [0, 1, 2], "text": ["only three words", "", None]}),
        chunk_words=8, overlap=2,
    )
    # every doc emits exactly one chunk
    assert out["doc_id"].to_pylist() == [0, 1, 2]
    assert out["chunk_text"].to_pylist() == ["only three words", "", ""]
    # '' splits to [''] — one empty word, matching SQL string_split
    assert out["n_chunk_words"].to_pylist() == [3, 1, 1]


def test_invalid_overlap_rejected():
    with pytest.raises(ValueError, match="overlap"):
        chunk_batch(_tbl(["a b"]), chunk_words=4, overlap=4)


def test_dataset_stage_preserves_id_type():
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(["a", "b"], type=pa.string()),
                  "text": ["one two three", "x"]})
    )
    out = chunk_documents(ds, chunk_words=2, overlap=0).to_pandas()
    assert sorted(out.doc_id.unique()) == ["a", "b"]
    assert out[out.doc_id == "a"].chunk_text.tolist() == ["one two", "three"]
