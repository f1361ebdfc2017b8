"""Output sink with the reference's CSV export semantics (SURVEY §2.1 S5,
§2.2 M16/M17):

- declared-schema cast applied at the sink only: int16 for the count
  columns, float16 for wordscore (KEY_TYPE_PAIRINGS,
  /root/reference/src/config.py:119-135 — compute stays float64 upstream),
  ``pub_date`` coerced to timestamp with null-on-garbage
  (/root/reference/src/fetch.py:217-234);
- all-empty column drop (/root/reference/src/fetch.py:201-203) as a
  streaming two-pass: a tiny per-column non-empty-count aggregate, then a
  projection — never a driver-side to_pandas of the data;
- date-stamped run directory ``{export_dir}/{YYMMDD}_{prefix}/`` with
  partitioned part files (S5's single CSV becomes a resumable multi-file
  layout; /root/reference/src/fetch.py:236-263, change_dir.py:16-26).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# KEY_TYPE_PAIRINGS analog (config.py:119-135): declared sink dtypes.
INT16_COLUMNS = ("times_cited", "matching_terms", "bycatch_terms", "total_word_count")
FLOAT16_COLUMNS = ("wordscore",)
DATETIME_COLUMNS = ("pub_date",)


def cast_declared_schema(batch: pa.Table) -> pa.Table:
    """M17: apply the declared output dtypes to whichever columns exist."""
    for name in batch.column_names:
        i = batch.column_names.index(name)
        col = batch[name]
        if name in INT16_COLUMNS:
            # numpy-style WRAPPING cast, not Arrow's checked cast: the
            # reference's astype('int16') wraps silently (fetch.py:205-227),
            # and a >32767-word document must not kill the export job.
            # Arrow's unsafe cast wraps the same way AND keeps the validity
            # bitmap — a null (e.g. times_cited after a join miss) stays
            # null instead of round-tripping through float NaN to garbage.
            if pa.types.is_floating(col.type):
                col = pc.if_else(pc.is_nan(col), pa.nulls(len(col), col.type), col)
            batch = batch.set_column(i, name, pc.cast(col, pa.int16(), safe=False))
        elif name in FLOAT16_COLUMNS:
            batch = batch.set_column(i, name, pc.cast(col, pa.float16()))
        elif name in DATETIME_COLUMNS and pa.types.is_string(col.type):
            batch = batch.set_column(
                i,
                name,
                pc.strptime(col, format="%Y-%m-%d", unit="us", error_is_null=True),
            )
    return batch


def _nonempty_partial(batch: pa.Table) -> pa.Table:
    """Per-column count of non-null, non-empty-string values in this batch."""
    counts = {}
    for name in batch.column_names:
        col = batch[name]
        valid = pc.is_valid(col)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            valid = pc.and_(valid, pc.not_equal(pc.coalesce(col, ""), ""))
        counts[name] = [pc.sum(pc.cast(valid, pa.int64())).as_py() or 0]
    return pa.table(counts)


def nonempty_columns(ds: ray.data.Dataset) -> list[str]:
    """M16 reduction: which columns have at least one non-empty value.
    Streams one tiny row per block to the driver — O(columns), not O(rows)."""
    totals: dict[str, int] = {}
    partials = ds.map_batches(_nonempty_partial, batch_format="pyarrow")
    for b in partials.iter_batches(batch_format="pyarrow"):
        for name in b.column_names:
            totals[name] = totals.get(name, 0) + int(pc.sum(b[name]).as_py() or 0)
    return [c for c, n in totals.items() if n > 0]


def export_results(
    ds: ray.data.Dataset,
    export_dir: str,
    *,
    prefix: str = "sciscraper",
    date_stamp: str,
    drop_empty_columns: bool = True,
    also_parquet: bool = True,
) -> str:
    """S5 analog: cast -> drop all-empty columns -> date-stamped run dir.

    ``date_stamp`` (YYMMDD) is an explicit argument — the reference stamps
    with ``datetime.now`` (fetch.py:241), which is not reproducible; the
    caller owns the clock. The empty-column pass re-executes the input
    pipeline, so pass a materialized/written Dataset for expensive inputs.
    """
    run_dir = os.path.join(export_dir, f"{date_stamp}_{prefix}")
    os.makedirs(run_dir, exist_ok=True)
    if drop_empty_columns:
        keep = nonempty_columns(ds)
        ds = ds.select_columns(keep)
    out = ds.map_batches(cast_declared_schema, batch_format="pyarrow")
    if also_parquet:
        out.write_parquet(os.path.join(run_dir, "parquet"))

    # float16 is not CSV-serializable in arrow; render via float32 at the
    # writer while keeping the declared parquet dtype exact.

    def csv_safe(batch: pa.Table) -> pa.Table:
        for name in batch.column_names:
            col = batch[name]
            if pa.types.is_float16(col.type):
                batch = batch.set_column(
                    batch.column_names.index(name), name, pc.cast(col, pa.float32())
                )
            elif pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
                batch = batch.set_column(
                    batch.column_names.index(name),
                    name,
                    pa.array(
                        [repr(v) if v is not None else None for v in col.to_pylist()],
                        type=pa.string(),
                    ),
                )
        return batch

    out.map_batches(csv_safe, batch_format="pyarrow").write_csv(
        os.path.join(run_dir, "csv")
    )
    return run_dir


def write_artifacts(
    ds: ray.data.Dataset,
    export_dir: str,
    *,
    date_stamp: str,
    url_col: str = "url",
    payload_col: str = "html",
    etag_col: str | None = None,
    ext: str = "pdf",
) -> str:
    """S7 analog (downloaders.py:91-117 create_document): persist binary
    payload rows as a ``(filename, payload)`` parquet table, one
    deterministic filename per row via ``format_filename`` (M22).

    A parquet table of (name, bytes) rather than a file-per-row directory:
    at corpus scale millions of small files destroy object-store/file-system
    metadata; the table layout stays streamable and resumable, and a
    fan-out-to-files step can consume it downstream where real files are
    required."""
    from sciscraper_ray.kernels.links import format_filename

    def name_rows(batch: pa.Table) -> pa.Table:
        urls = batch[url_col].to_pylist()
        etags = (
            batch[etag_col].to_pylist() if etag_col and etag_col in batch.column_names
            else [None] * len(urls)
        )
        names = pa.array(
            [
                format_filename(e, ext, url=u or "", date_stamp=date_stamp)
                for u, e in zip(urls, etags)
            ],
            type=pa.string(),
        )
        return pa.table({"filename": names, "payload": batch[payload_col]})

    out_dir = os.path.join(export_dir, f"{date_stamp}_artifacts")
    ds.map_batches(name_rows, batch_format="pyarrow").write_parquet(out_dir)
    return out_dir
