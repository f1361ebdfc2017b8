"""Checkpoint store + partition-granular resumable runs (north_rule).

Output layout under ``out_dir``::

    data/fragment_id=<fid>/*.parquet   hive-partitioned results, one
                                       directory per INPUT fragment
    _manifest/*.parquet                lineage side table (LINEAGE_SCHEMA):
                                       one row per COMPLETED fragment

Execution is wave-based: the input fragment list is filtered against the
manifest, the remaining fragments are processed ``wave_size`` at a time,
and a wave's lineage rows are committed only after its output is fully on
disk. A killed run therefore resumes at wave granularity, never
recomputing completed fragments, and a half-written wave is cleaned up and
re-run (its fragments are absent from the manifest). At cluster scale one
wave is hundreds of fragments — the manifest stays tiny (one row per
fragment) while the data tier streams.

The reference restarts from scratch and overwrites its day-stamped CSV
(/root/reference/src/fetch.py:236-263); this is the scale replacement.
"""

from __future__ import annotations

import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq

from sciscraper_ray.state.lineage import (
    LINEAGE_SCHEMA,
    content_hash_of_dir,
    fragment_id,
)


class CheckpointStore:
    """Parquet-backed manifest of completed fragments."""

    def __init__(self, out_dir: str):
        self.root = out_dir
        self.data_dir = os.path.join(out_dir, "data")
        self.manifest_dir = os.path.join(out_dir, "_manifest")
        self.metrics_dir = os.path.join(out_dir, "_metrics")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)
        os.makedirs(self.metrics_dir, exist_ok=True)

    def manifest(self) -> pa.Table:
        files = [
            os.path.join(self.manifest_dir, f)
            for f in sorted(os.listdir(self.manifest_dir))
            if f.endswith(".parquet")
        ]
        if not files:
            return LINEAGE_SCHEMA.empty_table()
        return pa.concat_tables(pq.read_table(f) for f in files)

    def completed(self) -> set[str]:
        return set(self.manifest()["fragment_id"].to_pylist())

    @staticmethod
    def wave_name(fragment_ids) -> str:
        """Deterministic wave file name: blake2 digest of the sorted
        fragment ids (builtin hash() is PYTHONHASHSEED-randomized, which
        would make manifest names irreproducible across runs)."""
        import hashlib

        digest = hashlib.blake2b(
            "|".join(sorted(fragment_ids)).encode(), digest_size=8
        ).hexdigest()
        return f"wave-{digest}"

    def mark_done(self, records: list[dict]) -> str:
        """Atomic-enough commit: write to a temp name, then rename."""
        if not records:
            return ""
        table = pa.Table.from_pylist(records, schema=LINEAGE_SCHEMA)
        name = self.wave_name(r["fragment_id"] for r in records)
        tmp = os.path.join(self.manifest_dir, f".{name}.tmp")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(self.manifest_dir, f"{name}.parquet"))
        return name

    def write_metrics(self, wave_name: str, record: dict) -> None:
        """Per-wave, per-stage metrics side table (north_rule: metrics to
        the checkpoint store). One parquet per wave, same atomic rename."""
        table = pa.Table.from_pylist([record])
        tmp = os.path.join(self.metrics_dir, f".{wave_name}.tmp")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(self.metrics_dir, f"{wave_name}.parquet"))

    def metrics(self) -> pa.Table:
        files = [
            os.path.join(self.metrics_dir, f)
            for f in sorted(os.listdir(self.metrics_dir))
            if f.endswith(".parquet")
        ]
        if not files:
            return pa.table({})
        return pa.concat_tables(
            (pq.read_table(f) for f in files), promote_options="default"
        )

    def fragment_dir(self, fid: str) -> str:
        return os.path.join(self.data_dir, f"fragment_id={fid}")

    def clear_fragment(self, fid: str) -> None:
        """Drop any half-written output for a fragment before re-running."""
        shutil.rmtree(self.fragment_dir(fid), ignore_errors=True)


def _list_fragments(input_path: str | list[str]) -> list[str]:
    if isinstance(input_path, list):
        return sorted(input_path)
    if os.path.isfile(input_path):
        return [input_path]
    return sorted(
        os.path.join(input_path, f)
        for f in os.listdir(input_path)
        if f.endswith(".parquet")
    )


def run_resumable(
    input_path: str | list[str],
    out_dir: str,
    pipeline_fn,
    *,
    wave_size: int = 64,
    max_waves: int | None = None,
    lineage_columns: list[str] | None = None,
) -> dict:
    """Run ``pipeline_fn`` over the input's parquet fragments, resumably.

    ``pipeline_fn(ds)`` takes a Dataset that carries a ``fragment_id``
    column and must preserve that column in its output. Completed
    fragments (per the manifest) are skipped at the READ — they never
    leave storage. ``max_waves`` caps this invocation (used by tests to
    simulate an interrupted run).

    Returns ``{"skipped": n, "processed": n, "waves": n}``.
    """
    import ray.data

    files = _list_fragments(input_path)
    root = input_path if isinstance(input_path, str) and os.path.isdir(input_path) else None
    store = CheckpointStore(out_dir)
    done = store.completed()
    frag_of = {f: fragment_id(f, root) for f in files}
    todo = [f for f in files if frag_of[f] not in done]

    waves = [todo[i : i + wave_size] for i in range(0, len(todo), wave_size)]
    if max_waves is not None:
        waves = waves[:max_waves]

    for wave in waves:
        t0 = time.perf_counter()
        fids = {f: frag_of[f] for f in wave}
        for fid in fids.values():
            store.clear_fragment(fid)

        ds = ray.data.read_parquet(wave, include_paths=True)
        path_to_fid = {os.path.abspath(p): fid for p, fid in fids.items()}

        def tag(batch: pa.Table, _m=path_to_fid) -> pa.Table:
            fid_col = pa.array(
                [_m[os.path.abspath(p)] for p in batch["path"].to_pylist()],
                type=pa.string(),
            )
            return batch.drop_columns(["path"]).append_column("fragment_id", fid_col)

        out = pipeline_fn(ds.map_batches(tag, batch_format="pyarrow"))
        out.write_parquet(store.data_dir, partition_cols=["fragment_id"])
        wall = time.perf_counter() - t0

        wave_name = CheckpointStore.wave_name(fids.values())
        try:
            stats_text = out.stats()
        except Exception:  # noqa: BLE001 — stats are best-effort telemetry
            stats_text = ""
        store.write_metrics(
            wave_name,
            {
                "wave": wave_name,
                "fragments": sorted(fids.values()),
                "wall_s": round(wall, 4),
                "stage_stats": stats_text,
            },
        )

        records = []
        for f in wave:
            fid = fids[f]
            frag_dir = store.fragment_dir(fid)
            if os.path.isdir(frag_dir):
                h, rows = content_hash_of_dir(frag_dir, lineage_columns)
            else:
                h, rows = 0, 0
            records.append(
                {
                    "fragment_id": fid,
                    "path": f,
                    "num_rows": rows,
                    "row_start": 0,
                    "row_end": rows,
                    "content_hash": h,
                    "wall_s": round(wall / len(wave), 4),
                }
            )
        store.mark_done(records)

    return {
        "skipped": len(files) - len(todo),
        "processed": sum(len(w) for w in waves),
        "waves": len(waves),
    }
