"""Checkpoint store + resumable runs: interrupted job resumes at partition
granularity without recomputing completed fragments (north_rule)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from sciscraper_ray.sources.page_synth import synth_page_table
from sciscraper_ray.state import CheckpointStore, fragment_id, run_resumable
from sciscraper_ray.state.lineage import content_hash

SF_DIR = "/root/testdata/sf0.001"


def _pipeline(ds):
    from sciscraper_ray.pipelines.extract import extraction_pipeline

    return extraction_pipeline(ds, dedup=False, analyze=False)


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("pages")
    return synth_page_table(SF_DIR, str(out), num_files=6)


def _read_all(out_dir: str):
    t = pq.read_table(os.path.join(out_dir, "data"))
    return t.sort_by("doc_id")


def test_interrupt_then_resume_matches_full_run(pages_dir, tmp_path):
    full_dir = str(tmp_path / "full")
    part_dir = str(tmp_path / "interrupted")

    full = run_resumable(pages_dir, full_dir, _pipeline, wave_size=6)
    assert full == {"skipped": 0, "processed": 6, "waves": 1}

    # Simulate a kill after 2 of 3 waves...
    first = run_resumable(pages_dir, part_dir, _pipeline, wave_size=2, max_waves=2)
    assert first == {"skipped": 0, "processed": 4, "waves": 2}
    assert len(CheckpointStore(part_dir).completed()) == 4

    # ...then restart: only the remaining fragments run.
    second = run_resumable(pages_dir, part_dir, _pipeline, wave_size=2)
    assert second == {"skipped": 4, "processed": 2, "waves": 1}

    # Final output is identical to the uninterrupted run.
    a, b = _read_all(full_dir), _read_all(part_dir)
    assert a.column("doc_id") == b.column("doc_id")
    assert a.column("extracted_text") == b.column("extracted_text")

    # Idempotent: a third run does nothing.
    third = run_resumable(pages_dir, part_dir, _pipeline, wave_size=2)
    assert third == {"skipped": 6, "processed": 0, "waves": 0}


def test_lineage_records_are_deterministic(pages_dir, tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    run_resumable(pages_dir, d1, _pipeline, wave_size=3)
    run_resumable(pages_dir, d2, _pipeline, wave_size=2)  # different waves

    m1 = CheckpointStore(d1).manifest().sort_by("fragment_id")
    m2 = CheckpointStore(d2).manifest().sort_by("fragment_id")
    assert m1["fragment_id"] == m2["fragment_id"]
    assert m1["num_rows"] == m2["num_rows"]
    # Content hashes are order-independent and stable across wave layouts.
    assert m1["content_hash"] == m2["content_hash"]
    input_rows = sum(
        pq.read_metadata(os.path.join(pages_dir, f)).num_rows
        for f in os.listdir(pages_dir)
        if f.endswith(".parquet")
    )
    assert sum(m1["num_rows"].to_pylist()) == input_rows  # incl. dup fetches

    # The manifest hash matches a recomputation from the persisted data.
    store = CheckpointStore(d1)
    for fid, h in zip(
        m1["fragment_id"].to_pylist(), m1["content_hash"].to_pylist()
    ):
        assert content_hash(pq.read_table(store.fragment_dir(fid))) == h


def test_changed_input_fragment_gets_new_id(pages_dir):
    files = sorted(os.listdir(pages_dir))
    f0 = os.path.join(pages_dir, files[0])
    fid = fragment_id(f0, pages_dir)
    assert files[0].replace(".", "-") in fid
    assert f"-{os.path.getsize(f0)}-" in fid
    # absolute-path digest: same basename+size elsewhere -> different id
    assert fragment_id(f0, pages_dir) == fid  # deterministic
    assert fragment_id(os.path.join("/elsewhere", files[0])) != fid


def test_per_wave_metrics_recorded(pages_dir, tmp_path):
    out = str(tmp_path / "metrics_run")
    run_resumable(pages_dir, out, _pipeline, wave_size=3)
    m = CheckpointStore(out).metrics()
    assert m.num_rows == 2  # 6 fragments / wave_size 3
    assert set(m.column_names) >= {"wave", "fragments", "wall_s", "stage_stats"}
    frags = sorted(f for row in m["fragments"].to_pylist() for f in row)
    assert frags == sorted(CheckpointStore(out).completed())
    # per-stage operator timings are captured for each wave
    assert all("Operator" in s for s in m["stage_stats"].to_pylist())


def test_content_hash_sees_long_list_differences():
    """repr() of numpy arrays truncates >1000 elements; the hash must not."""
    import pyarrow as pa

    from sciscraper_ray.state.lineage import content_hash

    a = pa.table({"v": [list(range(2000))]})
    changed = list(range(2000)); changed[1000] = -1
    b = pa.table({"v": [changed]})
    assert content_hash(a) != content_hash(b)
    assert content_hash(a) == content_hash(a)


def test_fragment_id_portable_across_roots(tmp_path):
    """Moving/symlinking the input tree must not invalidate the manifest:
    the id depends on the root-RELATIVE path + size only (ADVICE r1)."""
    import shutil

    d1 = tmp_path / "a" / "pages"
    d2 = tmp_path / "b" / "pages"
    d1.mkdir(parents=True)
    (d1 / "f.parquet").write_bytes(b"x" * 37)
    shutil.copytree(d1, d2)
    assert fragment_id(str(d1 / "f.parquet"), str(d1)) == fragment_id(
        str(d2 / "f.parquet"), str(d2)
    )
