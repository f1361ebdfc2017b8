"""Messy-source cleaning, declared-schema cast (M14-M17), lineage/resume.

Split from pipelines/queries.py (round 4); registration side effects
only — import order is fixed by the package __init__.
"""
from __future__ import annotations

import numpy as np

import pyarrow as pa
import pyarrow.compute as pc

from sciscraper_ray.pipelines.queries._shared import (
    _docs,
    register,
)


# --------------------------------------------------------------------------
# Messy-source cleaning + declared-schema cast (M14-M17).
# --------------------------------------------------------------------------


@register(
    "nested_unwrap",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 6 = 0 THEN '10.77' || doc_id || '/z'
                ELSE 'plain-' || doc_id END AS value,
           CASE WHEN doc_id % 9 = 0 THEN 'N/A'
                ELSE 'src-' || (doc_id % 20) END AS filled
    FROM documents
    """,
)
def nested_unwrap(sf_dir: str):
    """M14+M15: dict-literal cell unwrap (ast.literal_eval, never eval) and
    fillna('N/A'). The reference's plain-rows-first reorder (serials.py:66-86)
    is order-only — the keyed output here is order-insensitive."""
    from sciscraper_ray.kernels.nested import clean_nested_values, fill_na

    def build_and_clean(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        messy = [
            ("{'doi': '10.77%d/z'}" % i) if i % 6 == 0 else f"plain-{i}"
            for i in ids
        ]
        # per-row unwrap (keyed variant of clean_nested_values)
        values = [
            clean_nested_values([m], "doi")[0] for m in messy
        ]
        maybe_null = pa.array(
            [None if i % 9 == 0 else f"src-{i % 20}" for i in ids], type=pa.string()
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "value": pa.array(values, type=pa.string()),
                "filled": fill_na(maybe_null, "N/A"),
            }
        )

    return _docs(sf_dir).map_batches(build_and_clean, batch_format="pyarrow")


@register(
    "schema_cast",
    oracle="""
    SELECT doc_id,
           TRY_CAST(CASE WHEN doc_id % 10 = 0 THEN 'not a date'
                         WHEN doc_id % 10 = 1 THEN ''
                         ELSE '2024-' || lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0')
                              || '-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
                    END AS TIMESTAMP) AS pub_date,
           CAST(doc_id % 1000 AS SMALLINT) AS times_cited
    FROM documents
    """,
)
def schema_cast(sf_dir: str):
    """M17: declared-schema cast — pub_date to_datetime(errors='coerce')
    analog (null on garbage) + int16 downcast (KEY_TYPE_PAIRINGS,
    config.py:119-135)."""
    def build_and_cast(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        raw = [
            "not a date" if i % 10 == 0 else
            "" if i % 10 == 1 else
            f"2024-{1 + i % 12:02d}-{1 + i % 28:02d}"
            for i in ids
        ]
        parsed = pc.strptime(
            pa.array(raw, type=pa.string()), format="%Y-%m-%d", unit="us",
            error_is_null=True,
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pub_date": parsed,
                "times_cited": pc.cast(pa.array(ids % 1000), pa.int16()),
            }
        )

    return _docs(sf_dir).map_batches(build_and_cast, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Lineage + checkpoint/resume (north_rule). Stateful across runs -> not
# SQL-expressible -> rows-only driver check; full interrupted-run semantics
# are asserted in tests/test_checkpoint.py.
# --------------------------------------------------------------------------


@register(
    "resumable_extract",
    oracle="""
    SELECT doc_id, text AS extracted_text FROM documents
    UNION ALL
    SELECT doc_id, text AS extracted_text FROM documents WHERE doc_id % 17 = 0
    """,
)
def resumable_extract(sf_dir: str):
    """Checkpointed extraction: synth page table -> run INTERRUPTED after
    1 of 3 waves -> resume -> read back the persisted output. The oracle
    states the complete corpus (each doc once, plus the dup_mod=17
    duplicate fetches — dedup off here), so a green hash proves the
    interrupted+resumed run persisted exactly the full result with no
    fragment lost or doubled. Manifest/lineage mechanics (fragment skip,
    content hashes, clear-on-retry) are asserted in tests/test_checkpoint."""
    import shutil
    import tempfile

    import ray.data

    from sciscraper_ray.pipelines.extract import extraction_pipeline
    from sciscraper_ray.sources.page_synth import synth_page_table
    from sciscraper_ray.state import CheckpointStore, run_resumable

    work = tempfile.mkdtemp(prefix="sciscraper_resume_")
    try:
        pages = synth_page_table(sf_dir, f"{work}/pages", num_files=8)

        def pipeline(ds):
            return extraction_pipeline(ds, dedup=False, analyze=False)

        out = f"{work}/out"
        run_resumable(pages, out, pipeline, wave_size=3, max_waves=1)
        run_resumable(pages, out, pipeline, wave_size=3)
        import os as _os

        n_frags = sum(
            1 for f in _os.listdir(pages) if f.endswith(".parquet")
        )
        assert len(CheckpointStore(out).completed()) == n_frags
        persisted = ray.data.read_parquet(
            CheckpointStore(out).data_dir, columns=["doc_id", "extracted_text"]
        )
        # materialize before the tempdir vanishes (finally: rmtree)
        return persisted.to_pandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)


