"""Physical-plan auto-selection for the engine's two-plan operators.

Several operators carry two physical plans for their small "key table"
side (dedup winner keys, LSH band rows):

  driver  — stream the key-only rows to the driver and merge/pair with one
            vectorized pandas call. Wins by a wide margin while the table
            fits driver memory: Ray's sort-aggregate pays per-GROUP Python
            overhead (~100 µs/group), which at millions of mostly-unique
            keys dwarfs the actual work.
  shuffle — distributed sort-aggregate / map_groups on the uniform hash
            key; nothing ever concentrates on one node. The only plan that
            works at 10^12 rows.

``resolve_plan`` makes the flip automatic: ``mode='auto'`` materializes
the key-only dataset ONCE (a few tens of bytes per row; reused by
whichever plan runs, so nothing executes twice — and the shuffle plan
would have to produce these rows anyway), counts it for free off the
materialized metadata, and picks ``driver`` iff the count is under the
threshold. Scale safety must not depend on a caller remembering a kwarg
(BASELINE.json north_rule).
"""

from __future__ import annotations

import ray.data

# Above this many key rows the driver merge plan is refused: ~50M rows of
# a few-int64 columns ≈ 1-2 GB on the driver, the documented comfort bound.
DRIVER_PLAN_LIMIT = 50_000_000


def resolve_plan(
    ds: ray.data.Dataset,
    mode: str,
    *,
    limit: int = DRIVER_PLAN_LIMIT,
    est_rows: int | None = None,
) -> tuple[str, ray.data.Dataset]:
    """(resolved_mode, dataset). ``mode`` other than 'auto' passes through
    untouched. 'auto' with an ``est_rows`` UPPER BOUND (e.g. parquet
    metadata row count — free, no execution) picks the plan without
    touching the dataset: distinct keys ≤ input rows, so a bound under
    the limit proves the driver plan safe and skips the materialize
    barrier entirely (it showed up as fixed serial cost in the scaling
    bench). Without a bound, 'auto' materializes the key-only dataset
    once — reused by whichever plan runs, so nothing executes twice."""
    if mode != "auto":
        return mode, ds
    if est_rows is not None:
        return ("driver" if est_rows <= limit else "shuffle"), ds
    mat = ds.materialize()
    return ("driver" if mat.count() <= limit else "shuffle"), mat


def parquet_row_bound(path) -> int | None:
    """Metadata-only row count of a parquet file/dir (None if unreadable)."""
    try:
        import pyarrow.dataset as pads

        return pads.dataset(path).count_rows()
    except Exception:  # noqa: BLE001 — fall back to the measured probe
        return None


def driver_frame(ds: ray.data.Dataset, limit: int, what: str):
    """``to_pandas`` with the oversize guard every driver plan needs:
    failing fast with a pointer at the shuffle plan beats a silent driver
    OOM (ADVICE r1)."""
    try:
        return ds.to_pandas(limit=limit)
    except ValueError as exc:
        raise ValueError(
            f"{what}: key table exceeds the driver plan limit ({limit} rows)"
            " — rerun with the 'shuffle' plan (or 'auto')."
        ) from exc
