"""Event stream basics: windowed aggregate, keep-latest, JSON props.

Split from pipelines/queries.py (round 4); registration side effects
only — import order is fixed by the package __init__.
"""
from __future__ import annotations

import numpy as np

import pyarrow as pa
import pyarrow.compute as pc

from sciscraper_ray.pipelines.queries._shared import (
    register,
)


# --------------------------------------------------------------------------
# Events: windowed aggregate, keep-latest dedup, JSON scalar extraction
# (SURVEY §2.10 streaming-shaped + M23).
# --------------------------------------------------------------------------


@register(
    "host_tally_salted",
    oracle="""
    SELECT CASE WHEN doc_id % 10 < 3 THEN 'mega.example.org'
                WHEN 1 + doc_id % 5 = 1 THEN 'alpha.example.com'
                WHEN 1 + doc_id % 5 = 2 THEN 'beta.example.net'
                WHEN 1 + doc_id % 5 = 3 THEN 'gamma.example.io'
                WHEN 1 + doc_id % 5 = 4 THEN 'delta.example.edu'
                ELSE 'epsilon.example.dev' END AS host,
           count(*) AS cnt
    FROM documents GROUP BY host
    """,
)
def host_tally_salted(sf_dir: str):
    """North-rule skew handling made explicit: per-host page tally over the
    synthetic page table (one mega-host holds ~30% of urls) via the salted
    two-phase groupby — each hot key is spread over 16 reducers in phase 1
    and collapsed in a tiny phase-2 groupby."""
    from sciscraper_ray.stages.relational import salted_group_count

    # lazy: extraction registers after this module in package order
    from sciscraper_ray.pipelines.queries.extraction import _pages

    pages = _pages(sf_dir, pdf_mod=None, dup_mod=None)

    def host_of(batch: pa.Table) -> pa.Table:
        hosts = pc.replace_substring_regex(
            batch["url"], pattern=r"^https://([^/]+)/.*$", replacement=r"\1"
        )
        return pa.table({"host": hosts})

    return salted_group_count(
        pages.map_batches(host_of, batch_format="pyarrow"), "host", salts=16
    )


@register(
    "events_hourly",
    oracle="""
    SELECT event_type,
           date_trunc('hour', ts) AS window_start,
           count(*) AS cnt,
           round(sum(value), 6) AS sum_value
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def events_hourly(sf_dir: str):
    """Tumbling 1-hour window per event_type as groupby over a derived
    window key — the Ray Data expression of a windowed aggregate."""
    import ray.data
    from ray.data.aggregate import Sum

    from sciscraper_ray.stages.relational import group_count_batch

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "window_start", pc.floor_temporal(batch["ts"], unit="hour")
        )
        return group_count_batch(
            batch.drop_columns(["ts"]),
            ["event_type", "window_start"],
            {"value": "sum_value"},
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(
            Sum(on="cnt", alias_name="cnt"),
            Sum(on="sum_value", alias_name="sum_value"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("sum_value"),
            "sum_value",
            pc.round(batch["sum_value"], 6),
        )

    return agg.map_batches(finish, batch_format="pyarrow")


@register(
    "events_keep_latest",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
        SELECT user_id, event_id, ts, event_type, value,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def events_keep_latest(sf_dir: str):
    """Keep-latest-per-key dedup (SURVEY §2.6 rebuild addition): per-batch
    partial keep-latest shrinks the shuffle to ≤1 row per (key, batch),
    then a grouped reduce picks the global latest."""
    import pandas as pd
    import ray.data

    from sciscraper_ray.stages.relational import keep_latest_batch

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type", "value"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return keep_latest_batch(batch, "user_id", ["ts", "event_id"])

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("user_id")
        .map_groups(
            lambda g: keep_latest_batch(g, "user_id", ["ts", "event_id"]),
            batch_format="pandas",
        )
    )


@register(
    "events_json_props",
    oracle="""
    SELECT event_type,
           count(*) AS cnt,
           CAST(sum(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def events_json_props(sf_dir: str):
    """M23 analog: JSON scalar extraction from a string column, vectorized
    with pc.extract_regex, then a grouped sum."""
    import ray.data
    from ray.data.aggregate import Sum

    from sciscraper_ray.stages.relational import group_count_batch

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        extracted = pc.extract_regex(batch["props"], r'"k": (?P<k>\d+)')
        k = pc.cast(pc.struct_field(extracted, "k"), pa.int64())
        batch = pa.table({"event_type": batch["event_type"], "k": k})
        return group_count_batch(batch, ["event_type"], {"k": "sum_k"})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Sum(on="cnt", alias_name="cnt"),
            Sum(on="sum_k", alias_name="sum_k"),
        )
    )


