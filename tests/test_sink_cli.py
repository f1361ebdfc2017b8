"""CSV-parity sink (M16/M17/S5 semantics) and the CLI driver."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _input_table() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "wordscore": pa.array([0.5625, 0.7425, 0.25], pa.float64()),
            "matching_terms": pa.array([100, 500, 0], pa.int64()),
            "pub_date": pa.array(["2024-01-05", "not a date", None], pa.string()),
            "all_empty": pa.array(["", None, ""], pa.string()),
            "tags": pa.array([["a", "b"], [], None], pa.list_(pa.string())),
        }
    )


def test_export_cast_and_empty_drop(ray_session, tmp_path):
    import ray.data

    from sciscraper_ray.pipelines.sink import export_results

    ds = ray.data.from_arrow(_input_table())
    run_dir = export_results(ds, str(tmp_path), date_stamp="240101")
    assert os.path.basename(run_dir) == "240101_sciscraper"

    out = pq.read_table(os.path.join(run_dir, "parquet")).sort_by("doc_id")
    # M16: the all-empty column is gone
    assert "all_empty" not in out.column_names
    # M17: declared dtypes at the sink (KEY_TYPE_PAIRINGS)
    assert out.schema.field("wordscore").type == pa.float16()
    assert out.schema.field("matching_terms").type == pa.int16()
    assert out.schema.field("pub_date").type == pa.timestamp("us")
    # pub_date errors="coerce": garbage -> null
    assert out["pub_date"].null_count == 2
    assert out["pub_date"][0].as_py().year == 2024
    # float16 rounding is the reference's documented precision loss
    assert out["wordscore"].to_pylist() == pytest.approx(
        [0.5625, 0.7425, 0.25], abs=1e-3
    )

    csv_dir = os.path.join(run_dir, "csv")
    assert any(f for f in os.listdir(csv_dir))


def test_cli_wordscore_mode(ray_session, tmp_path):
    from sciscraper_ray.cli import main

    run_dir = main(
        [
            "-m", "wordscore",
            "-f", "/root/testdata/sf0.001/documents.parquet",
            "-e", str(tmp_path),
            "--date-stamp", "240102",
        ]
    )
    out = pq.read_table(os.path.join(run_dir, "parquet"))
    assert out.num_rows == 500
    assert out.schema.field("wordscore").type == pa.float16()


def test_cli_query_mode(ray_session, tmp_path):
    from sciscraper_ray.cli import main

    run_dir = main(
        [
            "-m", "query:top_tokens_global",
            "-f", "/root/testdata/sf0.001",
            "-e", str(tmp_path),
            "--date-stamp", "240103",
        ]
    )
    out = pq.read_table(os.path.join(run_dir, "parquet"))
    assert out.num_rows > 0 and "token" in out.column_names


def test_cli_rejects_unknown_mode(ray_session, tmp_path):
    from sciscraper_ray.cli import main

    with pytest.raises(KeyError):
        main(["-m", "nope", "-f", "x", "-e", str(tmp_path)])


def test_int16_cast_wraps_instead_of_crashing():
    """>32767 counts must wrap (reference astype semantics), not raise."""
    import numpy as np

    from sciscraper_ray.pipelines.sink import cast_declared_schema

    batch = pa.table({"matching_terms": pa.array([40_000, 5], pa.int64())})
    out = cast_declared_schema(batch)
    assert out["matching_terms"].to_pylist() == [
        int(np.int64(40_000).astype(np.int16)), 5
    ]


def test_int16_cast_preserves_nulls():
    """A null count column (e.g. times_cited after a join miss) must stay
    null through the wrapping cast — not become garbage via float NaN."""
    batch = pa.table(
        {
            "times_cited": pa.array([7, None, 40_000], pa.int64()),
            "matching_terms": pa.array([1.0, float("nan"), 3.0], pa.float64()),
        }
    )
    out = cast_from_sink(batch)
    assert out["times_cited"].to_pylist() == [7, None, -25536]
    assert out.schema.field("times_cited").type == pa.int16()
    # float NaN (pandas-style missing) also lands as a true null
    assert out["matching_terms"].to_pylist() == [1, None, 3]


def cast_from_sink(batch):
    from sciscraper_ray.pipelines.sink import cast_declared_schema

    return cast_declared_schema(batch)


def test_format_filename_deterministic():
    """M22: reference shape {date}_{etag}_{id}.{ext} with the randint
    replaced by a stable url-derived 1..255 id
    (/root/reference/src/downloaders.py:346-366 minus the randomness)."""
    from sciscraper_ray.kernels.links import format_filename

    a = format_filename('"abc123"', "pdf", url="https://x/p1", date_stamp="240101")
    b = format_filename('"abc123"', "pdf", url="https://x/p1", date_stamp="240101")
    c = format_filename(None, "png", url="https://x/p2", date_stamp="240101")
    assert a == b  # idempotent across calls/workers
    assert a.startswith("240101_abc123_") and a.endswith(".pdf")
    file_id = int(a.rsplit("_", 1)[1].split(".")[0])
    assert 1 <= file_id <= 255
    # None etag -> _NaN_ like the reference
    assert c.startswith("240101__NaN__") and c.endswith(".png")


def test_write_artifacts(ray_session, tmp_path):
    import ray.data

    from sciscraper_ray.pipelines.sink import write_artifacts

    ds = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["https://x/a", "https://x/b"]),
                "html": pa.array([b"%PDF-1", b"%PDF-2"], pa.binary()),
            }
        )
    )
    out_dir = write_artifacts(ds, str(tmp_path), date_stamp="240101")
    t = pq.read_table(out_dir).sort_by("filename")
    assert t.num_rows == 2
    assert sorted(t.column_names) == ["filename", "payload"]
    assert all(n.startswith("240101__NaN__") for n in t["filename"].to_pylist())
    assert set(t["payload"].to_pylist()) == {b"%PDF-1", b"%PDF-2"}


def test_cli_reference_mode_coverage():
    """Every reference SCISCRAPERS named pipeline (factories.py:26-103)
    has a CLI mode: directory, wordscore, citations, download, images,
    fastscore, google."""
    from sciscraper_ray.cli import MODES

    for mode in ("directory", "wordscore", "citations", "images",
                 "fastscore", "google"):
        assert mode in MODES, mode
    # 'download' is a main()-level mode (needs the export dir)


def test_cli_citations_and_download_modes(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq_

    from sciscraper_ray.cli import main

    # citations: EP3 analog over the sf-dir layout
    run_dir = main(
        [
            "-m", "citations",
            "-f", "/root/testdata/sf0.001",
            "-e", str(tmp_path / "cit"),
            "--date-stamp", "240101",
        ]
    )
    out = pq_.read_table(os.path.join(run_dir, "parquet"))
    assert out.num_rows == 1500  # 500 docs x 3 citations

    # download: binary artifact sink over a page table
    pages = tmp_path / "pages.parquet"
    pq_.write_table(
        pa.table(
            {
                "url": ["https://x/a", "https://x/b"],
                "html": pa.array([b"%PDF-a", b"%PDF-b"], pa.binary()),
            }
        ),
        str(pages),
    )
    out_dir = main(
        [
            "-m", "download",
            "-f", str(pages),
            "-e", str(tmp_path / "dl"),
            "--date-stamp", "240101",
        ]
    )
    t = pq_.read_table(out_dir)
    assert t.num_rows == 2 and "filename" in t.column_names


def test_read_mode_prompt_loop():
    """Reference read_factory contract (factories.py:106-125): re-prompt
    on unknown modes, accept registry names / resume / query:*."""
    from sciscraper_ray.cli import read_mode

    prompts = []

    def fake_input(prompt):
        prompts.append(prompt)
        return ["bogus", "  wordscore "][len(prompts) - 1]

    assert read_mode(fake_input) == "wordscore"
    assert len(prompts) == 2
    assert "wordscore" in prompts[0] and "resume" in prompts[0]
    assert read_mode(lambda p: "query:top_tokens_global") == "query:top_tokens_global"
    assert read_mode(lambda p: "download") == "download"


def test_cli_profiler_benchmark(ray_session, tmp_path, capsys):
    from sciscraper_ray.cli import main

    out = main(
        [
            "-m", "wordscore",
            "-f", "/root/testdata/sf0.001/documents.parquet",
            "-e", str(tmp_path),
            "--date-stamp", "250101",
            "-p", "benchmark",
        ]
    )
    assert (tmp_path / "profile_250101.pstats").exists()
    captured = capsys.readouterr().out
    assert "cumulative" in captured or "tottime" in captured
    import os

    assert os.path.isdir(out)


def test_cli_profiler_bytecode(ray_session, tmp_path, capsys):
    from sciscraper_ray.cli import main

    main(
        [
            "-m", "wordscore",
            "-f", "/root/testdata/sf0.001/documents.parquet",
            "-e", str(tmp_path),
            "-p", "bytecode",
        ]
    )
    captured = capsys.readouterr().out
    assert "LOAD_" in captured  # dis output, nothing executed
    assert not list(tmp_path.iterdir())  # bytecode mode runs no pipeline


def test_cli_profiler_memory(ray_session, tmp_path, capsys):
    from sciscraper_ray.cli import main

    out = main(
        [
            "-m", "wordscore",
            "-f", "/root/testdata/sf0.001/documents.parquet",
            "-e", str(tmp_path),
            "--date-stamp", "250101",
            "-p", "memory",
        ]
    )
    captured = capsys.readouterr().out
    assert "driver peak traced memory" in captured
    import os

    assert os.path.isdir(out)
