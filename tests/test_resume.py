"""Kill/restart resume test (SURVEY.md §5 item 4): run K partitions, stop,
restart, assert byte-identical final output and no reprocessed partitions."""

import json
import os

import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ai_service_ocr_grading_handler_ray.state.manifest import (
    completed_partitions,
    resumable_extract,
)
from ai_service_ocr_grading_handler_ray.synth import docs_to_pages


def _make_input(tmp_path, sf_dir, n_files=4):
    """Split the synthetic pages into several parquet files."""
    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    pages = docs_to_pages(docs)
    files = []
    step = pages.num_rows // n_files
    d = tmp_path / "pages"
    d.mkdir()
    for i in range(n_files):
        path = str(d / f"pages-{i}.parquet")
        pq.write_table(pages.slice(i * step, step), path)
        files.append(path)
    return files


def _digests(out_dir):
    import glob

    files = sorted(glob.glob(os.path.join(out_dir, "part=*", "*.parquet")))
    t = pads.dataset(files, format="parquet").to_table(columns=["url", "content_sha256"])
    return sorted(zip(t["url"].to_pylist(), t["content_sha256"].to_pylist()))


def test_resume_exact(tmp_path, sf_dir):
    files = _make_input(tmp_path, sf_dir)

    # full run in one go → reference result
    ref_dir = str(tmp_path / "ref")
    resumable_extract(files, ref_dir, partition_size=1, concurrency=(1, 2))
    ref = _digests(ref_dir)

    # interrupted run: only 2 of 4 partitions, then "crash"
    out_dir = str(tmp_path / "out")
    first = resumable_extract(
        files, out_dir, partition_size=1, max_partitions=2, concurrency=(1, 2)
    )
    assert len(first) == 2
    assert completed_partitions(out_dir) == {0, 1}
    mtimes = {
        p: os.path.getmtime(os.path.join(out_dir, "manifest", p))
        for p in os.listdir(os.path.join(out_dir, "manifest"))
    }

    # restart: must process exactly the remaining 2 partitions
    second = resumable_extract(files, out_dir, partition_size=1, concurrency=(1, 2))
    assert [m["partition_id"] for m in second] == [2, 3]
    # finished partitions untouched (no reprocessing)
    for p, t in mtimes.items():
        assert os.path.getmtime(os.path.join(out_dir, "manifest", p)) == t

    # byte-identical final output vs the uninterrupted run
    assert _digests(out_dir) == ref

    # manifests carry lineage + metrics
    with open(os.path.join(out_dir, "manifest", "part-0000.json")) as f:
        m = json.load(f)
    assert set(m) == {
        "partition_id", "input_files", "row_count", "n_ok", "digest",
        "wall_s", "docs_per_sec",
    }
    assert m["docs_per_sec"] > 0
    assert m["row_count"] == 125


def test_crash_between_rename_and_manifest(tmp_path, sf_dir):
    """Simulated crash window: partition dir renamed but manifest missing
    → rerun reprocesses that partition and commits an identical digest."""
    import shutil

    files = _make_input(tmp_path, sf_dir, n_files=2)
    out_dir = str(tmp_path / "crash")
    resumable_extract(files, out_dir, partition_size=1)
    m_path = os.path.join(out_dir, "manifest", "part-0001.json")
    with open(m_path) as f:
        orig_digest = json.load(f)["digest"]
    os.remove(m_path)  # crash: data present, manifest lost

    redone = resumable_extract(files, out_dir, partition_size=1)
    assert [m["partition_id"] for m in redone] == [1]
    with open(m_path) as f:
        assert json.load(f)["digest"] == orig_digest


def test_changed_input_list_reprocesses(tmp_path, sf_dir):
    """Lineage check: if the input file list changes between runs, a
    committed partition whose pid now maps to DIFFERENT files must be
    reprocessed, not silently skipped (ADVICE r01)."""
    files = _make_input(tmp_path, sf_dir, n_files=4)
    out_dir = str(tmp_path / "lineage")
    resumable_extract(files, out_dir, partition_size=2)
    assert completed_partitions(out_dir) == {0, 1}

    # drop the first file: sorted chunking shifts every pid→files mapping
    shifted = files[1:]
    redone = resumable_extract(shifted, out_dir, partition_size=2)
    assert [m["partition_id"] for m in redone] == [0, 1]
    for m in redone:
        expected = shifted[m["partition_id"] * 2 : m["partition_id"] * 2 + 2]
        assert m["input_files"] == expected

    # unchanged rerun: nothing reprocessed
    assert resumable_extract(shifted, out_dir, partition_size=2) == []


def test_shrunken_input_with_orphan_partitions_refuses(tmp_path, sf_dir):
    """If the input list shrinks below the committed partition count, the
    orphaned partitions would silently stay in the output — resume must
    refuse instead of serving stale rows."""
    import pytest

    files = _make_input(tmp_path, sf_dir, n_files=4)
    out_dir = str(tmp_path / "orphan")
    resumable_extract(files, out_dir, partition_size=1)
    assert completed_partitions(out_dir) == {0, 1, 2, 3}

    with pytest.raises(RuntimeError, match="beyond the current input"):
        resumable_extract(files[:2], out_dir, partition_size=1)


def test_resumable_extract_warc_inputs(tmp_path):
    """The resumable CLI path works over WARC archives: partitioned by
    archive file, committed with manifests, exact resume."""
    import pyarrow.parquet as pq

    from ai_service_ocr_grading_handler_ray.state.manifest import (
        completed_partitions,
        resumable_extract,
    )
    from ai_service_ocr_grading_handler_ray.sources.warc import pages_to_warc_bytes
    from ai_service_ocr_grading_handler_ray.synth import docs_to_pages

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    files = []
    for i in range(4):
        pages = docs_to_pages(docs.slice(i * 25, 25))
        f = tmp_path / f"crawl-{i}.warc.gz"
        f.write_bytes(pages_to_warc_bytes(pages))
        files.append(str(f))

    out_dir = str(tmp_path / "out")
    first = resumable_extract(
        files, out_dir, partition_size=2, max_partitions=1, input_format="warc"
    )
    assert len(first) == 1 and completed_partitions(out_dir) == {0}
    rest = resumable_extract(
        files, out_dir, partition_size=2, input_format="warc"
    )
    assert len(rest) == 1 and completed_partitions(out_dir) == {0, 1}
    import pyarrow.dataset as pads

    total = pads.dataset(out_dir + "/part=0000", format="parquet").count_rows()
    total += pads.dataset(out_dir + "/part=0001", format="parquet").count_rows()
    assert total == 100


def test_worker_kill_midrun_retries_to_identical_output(tmp_path, sf_dir, monkeypatch):
    """Failure injection (VERDICT r4 #5): a worker process dies MID-TASK
    during extraction — Ray retries the failed block task and the manifest
    protocol still commits byte-identical, no-duplicate output."""
    files = _make_input(tmp_path, sf_dir)

    ref_dir = str(tmp_path / "ref")
    resumable_extract(files, ref_dir, partition_size=2)
    ref = _digests(ref_dir)

    # kill-once poison: the first worker to claim the marker dies hard
    # mid-batch (os._exit skips all cleanup, like an OOM kill); the
    # retried task finds the marker claimed and proceeds normally
    marker = str(tmp_path / "kill-once")
    with open(marker, "w") as f:
        f.write("armed")

    from ai_service_ocr_grading_handler_ray.stages import extract as extract_mod

    orig = extract_mod.extract_batch_task

    def killing_extract(batch, **kw):
        try:
            os.rename(marker, marker + ".claimed")  # atomic claim
            os._exit(1)
        except OSError:
            pass  # already claimed -> normal path
        return orig(batch, **kw)

    monkeypatch.setattr(extract_mod, "extract_batch_task", killing_extract)
    out_dir = str(tmp_path / "killed")
    manifests = resumable_extract(files, out_dir, partition_size=2)
    monkeypatch.undo()

    assert os.path.exists(marker + ".claimed")  # the kill really fired
    assert [m["partition_id"] for m in manifests] == [0, 1]
    assert _digests(out_dir) == ref  # byte-identical, no dup/missing rows


def test_actor_kill_midrun_retries_to_identical_output(tmp_path, sf_dir, monkeypatch):
    """Same injection for the actor-pool path (compute='actors'): an
    extract actor dies mid-batch; the pool restarts it and the retried
    batch yields identical output."""
    files = _make_input(tmp_path, sf_dir, n_files=2)

    ref_dir = str(tmp_path / "ref_a")
    resumable_extract(
        files, ref_dir, partition_size=2, compute="actors", concurrency=(1, 2)
    )
    ref = _digests(ref_dir)

    marker = str(tmp_path / "kill-once-actor")
    with open(marker, "w") as f:
        f.write("armed")

    from ai_service_ocr_grading_handler_ray.pipelines import extract as pipe_mod

    class KillingActor(pipe_mod.ExtractActor):
        def __call__(self, batch):
            try:
                os.rename(marker, marker + ".claimed")
                os._exit(1)
            except OSError:
                pass
            return super().__call__(batch)

    monkeypatch.setattr(pipe_mod, "ExtractActor", KillingActor)
    out_dir = str(tmp_path / "killed_a")
    resumable_extract(
        files, out_dir, partition_size=2, compute="actors", concurrency=(1, 2)
    )
    monkeypatch.undo()

    assert os.path.exists(marker + ".claimed")
    assert _digests(out_dir) == ref
