"""Query registry: named Ray pipelines + matching DuckDB oracle SQL.

Each entry is one operator/pipeline from SURVEY.md §2 (or a scale-oriented
extension: dedup, ANN, text analysis). The callable takes ``sf_dir`` and
returns a Dataset / pandas DataFrame / pyarrow Table; ``ORACLE[name]`` is
ANSI SQL DuckDB runs over the same parquet tables (views: region nation
customer supplier part orders lineitem events documents embeddings).

Column names match between both sides — the driver's compare sorts columns
by name and value-hashes. Floating aggregates are rounded identically on
both sides. Word sets are embedded in the SQL from the same constants the
actors load (sciscraper_ray.words).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from sciscraper_ray.words import BYCATCH_WORDS, TARGET_WORDS, sql_in_list

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _docs(sf_dir: str, columns=("doc_id", "text")):
    import ray.data

    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


# SQL fragment shared by tokenizing oracles: reference tokenizer =
# strip().lower().split(" ")  (docscraper.py:176-186).
_SQL_TOKENS = "string_split(lower(trim(text)), ' ')"

# Per-document matched-term counts ranked like Counter.most_common:
# count desc, first-occurrence asc (docscraper.py:83-87).
def _sql_ranked(word_sql: str) -> str:
    return f"""
    WITH toks AS (
        SELECT doc_id,
               unnest({_SQL_TOKENS}) AS token,
               unnest(range(len({_SQL_TOKENS}))) AS ord
        FROM documents
    ), counts AS (
        SELECT doc_id, token, count(*) AS cnt, min(ord) AS first_ord
        FROM toks WHERE token IN {word_sql}
        GROUP BY doc_id, token
    ), ranked AS (
        SELECT doc_id, token, cnt,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY cnt DESC, first_ord ASC
               ) AS rnk
        FROM counts
    )
    """


# --------------------------------------------------------------------------
# Document analysis family (reference DocScraper semantics, SURVEY §2.2/2.5)
# --------------------------------------------------------------------------


@register(
    "doc_tokenize",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_SQL_TOKENS}) AS INTEGER) AS total_word_count
    FROM documents
    """,
)
def doc_tokenize(sf_dir: str):
    """M3+A2: single-space tokenizer + total_word_count."""
    from sciscraper_ray.kernels.tokenize import tokenize_column

    def count_tokens(batch: pa.Table) -> pa.Table:
        tokens = tokenize_column(batch["text"])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "total_word_count": pc.cast(
                    pc.list_value_length(tokens), pa.int32()
                ),
            }
        )

    return _docs(sf_dir).map_batches(count_tokens, batch_format="pyarrow")


_WORDSCORE_SQL = f"""
    {_sql_ranked(sql_in_list(TARGET_WORDS))},
    tgt AS (
        SELECT doc_id, SUM(cnt) AS s FROM ranked WHERE rnk <= 3 GROUP BY doc_id
    ),
    btoks AS (
        SELECT doc_id,
               unnest({_SQL_TOKENS}) AS token,
               unnest(range(len({_SQL_TOKENS}))) AS ord
        FROM documents
    ), bcounts AS (
        SELECT doc_id, token, count(*) AS cnt, min(ord) AS first_ord
        FROM btoks WHERE token IN {sql_in_list(BYCATCH_WORDS)}
        GROUP BY doc_id, token
    ), branked AS (
        SELECT doc_id, cnt,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY cnt DESC, first_ord ASC
               ) AS rnk
        FROM bcounts
    ), byc AS (
        SELECT doc_id, SUM(cnt) AS s FROM branked WHERE rnk <= 3 GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(tgt.s, 0) AS INTEGER) AS matching_terms,
           CAST(COALESCE(byc.s, 0) AS INTEGER) AS bycatch_terms,
           CAST(len({_SQL_TOKENS}) AS INTEGER) AS total_word_count,
           CASE WHEN len({_SQL_TOKENS}) <= 0 THEN 0.0
                ELSE GREATEST(0.0, LEAST(1.0,
                    (COALESCE(tgt.s, 0) * 1.0
                     + COALESCE(byc.s, 0) * -0.25
                     + (len({_SQL_TOKENS}) - COALESCE(tgt.s, 0) - COALESCE(byc.s, 0)) * 0.5
                    ) / len({_SQL_TOKENS})))
           END AS wordscore
    FROM documents d
    LEFT JOIN tgt ON d.doc_id = tgt.doc_id
    LEFT JOIN byc ON d.doc_id = byc.doc_id
    """


@register("doc_wordscore", oracle=_WORDSCORE_SQL)
def doc_wordscore(sf_dir: str):
    """M1 text path: the flagship fused DocAnalyzer stage (fastscore mode)."""
    from sciscraper_ray.pipelines.flagship import wordscore_pipeline

    ds = wordscore_pipeline(f"{sf_dir}/documents.parquet")
    return ds.select_columns(
        ["doc_id", "matching_terms", "bycatch_terms", "total_word_count", "wordscore"]
    )


def _top3_exploded(sf_dir: str, word_set: frozenset[str]):
    """M4 as an exploded relation: (doc_id, token, cnt, rnk), rnk<=3."""
    from sciscraper_ray.kernels.terms import top_terms_exploded
    from sciscraper_ray.kernels.tokenize import tokenize_column

    def explode(batch: pa.Table) -> pa.Table:
        tokens = tokenize_column(batch["text"])
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        out = top_terms_exploded(tokens, word_set)
        doc_ids = batch["doc_id"].take(pa.array(out["parent"], type=pa.int64()))
        return pa.table(
            {
                "doc_id": doc_ids,
                "token": pa.array(out["token"], type=pa.string()),
                "cnt": pa.array(out["count"], type=pa.int64()),
                "rnk": pa.array(out["rank"], type=pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(explode, batch_format="pyarrow")


@register(
    "doc_top3_target",
    oracle=f"""
    {_sql_ranked(sql_in_list(TARGET_WORDS))}
    SELECT doc_id, token, cnt, rnk FROM ranked WHERE rnk <= 3
    """,
)
def doc_top3_target(sf_dir: str):
    return _top3_exploded(sf_dir, TARGET_WORDS)


@register(
    "doc_top3_bycatch",
    oracle=f"""
    {_sql_ranked(sql_in_list(BYCATCH_WORDS))}
    SELECT doc_id, token, cnt, rnk FROM ranked WHERE rnk <= 3
    """,
)
def doc_top3_bycatch(sf_dir: str):
    return _top3_exploded(sf_dir, BYCATCH_WORDS)


# --------------------------------------------------------------------------
# Identifier mining (M7-M13). The synthetic documents table carries no
# DOIs, so both sides append a deterministic identifier suffix to some rows
# (keyed on doc_id); the oracle states the expected canonical form directly.
# --------------------------------------------------------------------------

_IDENT_SUFFIX_SQL = """
    CASE WHEN doc_id % 3 = 0
             THEN text || ' doi:10.' || (1000 + doc_id % 9000) || '/ax.' || doc_id
         WHEN doc_id % 3 = 1
             THEN text || ' see arxiv:2345.' || (20000 + doc_id) || 'v2'
         ELSE text
    END
"""
# NOTE: the arXiv id must sit at end-of-text — the reference's ARXIV_REGEX
# canonicalizer is $-anchored (doi_regex.py:36-44), so "arxiv:1234.5678 more
# words" standardizes to None. That quirk is part of the pinned contract.


def _ident_suffix_ray(batch: pa.Table) -> pa.Table:
    doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
    text = batch["text"].to_pylist()
    mod = doc_id % 3
    out = np.empty(len(text), dtype=object)
    for i, t in enumerate(text):
        if mod[i] == 0:
            out[i] = f"{t} doi:10.{1000 + doc_id[i] % 9000}/ax.{doc_id[i]}"
        elif mod[i] == 1:
            out[i] = f"{t} see arxiv:2345.{20000 + doc_id[i]}v2"
        else:
            out[i] = t
    return pa.table({"doc_id": batch["doc_id"], "text": pa.array(out, type=pa.string())})


@register(
    "doc_identifiers",
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id % 3 = 0
                    THEN '10.' || (1000 + doc_id % 9000) || '/ax.' || doc_id
                WHEN doc_id % 3 = 1 THEN '2345.' || (20000 + doc_id)
           END AS identifier,
           CASE WHEN doc_id % 3 = 0 THEN 'doi'
                WHEN doc_id % 3 = 1 THEN 'arxiv'
           END AS identifier_type
    FROM documents
    """,
)
def doc_identifiers(sf_dir: str):
    """M13 extract+standardize over the full pattern chains."""
    from sciscraper_ray.kernels.identifiers import extract_identifiers_array

    def extract(batch: pa.Table) -> pa.Table:
        batch = _ident_suffix_ray(batch)
        ids, kinds = extract_identifiers_array(batch["text"].to_pylist())
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "identifier": pa.array(ids, type=pa.string()),
                "identifier_type": pa.array(kinds, type=pa.string()),
            }
        )

    return _docs(sf_dir).map_batches(extract, batch_format="pyarrow")


@register(
    "doc_parentheticals",
    oracle="""
    SELECT doc_id,
           '(p = .0' || (doc_id % 9) || ', n = ' || (10 + doc_id % 90) || ')' AS stat
    FROM documents WHERE doc_id % 4 = 0
    """,
)
def doc_parentheticals(sf_dir: str):
    """M6: greedy parenthetical-statistic findall, exploded to rows."""
    from sciscraper_ray.kernels.parentheticals import PAPER_STATISTIC

    def extract(batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy(zero_copy_only=False)
        text = batch["text"].to_pylist()
        out_ids: list[int] = []
        out_stats: list[str] = []
        for i, t in enumerate(text):
            if doc_id[i] % 4 == 0:
                t = f"{t} (p = .0{doc_id[i] % 9}, n = {10 + doc_id[i] % 90})"
            for m in PAPER_STATISTIC.findall(t):
                out_ids.append(int(doc_id[i]))
                out_stats.append(m)
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "stat": pa.array(out_stats, type=pa.string()),
            }
        )

    return _docs(sf_dir).map_batches(extract, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Relational tier (SURVEY §2.4-2.6): grouped aggregates with partial
# pre-aggregation, broadcast joins, two-phase token tallies, top-k.
# --------------------------------------------------------------------------


@register(
    "lineitem_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_quantity) / count(*), 6) AS avg_qty,
           count(*) AS cnt
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def lineitem_pricing(sf_dir: str):
    """A1/A4-style grouped aggregate, two-phase: per-batch partial sums in
    map_batches, then a small groupby over the partials (SURVEY §4 shuffle
    inventory (2))."""
    import ray.data
    from ray.data.aggregate import Sum

    from sciscraper_ray.stages.relational import group_count_batch

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def partial(batch: pa.Table) -> pa.Table:
        revenue = pc.multiply(
            batch["l_extendedprice"], pc.subtract(1, batch["l_discount"])
        )
        batch = batch.append_column("revenue", revenue)
        return group_count_batch(
            batch,
            ["l_returnflag", "l_linestatus"],
            {
                "l_quantity": "sum_qty",
                "l_extendedprice": "sum_base_price",
                "revenue": "sum_disc_price",
            },
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum(on="sum_qty", alias_name="sum_qty"),
            Sum(on="sum_base_price", alias_name="sum_base_price"),
            Sum(on="sum_disc_price", alias_name="sum_disc_price"),
            Sum(on="cnt", alias_name="cnt"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "sum_qty": pc.round(batch["sum_qty"], 2),
                "sum_base_price": pc.round(batch["sum_base_price"], 2),
                "sum_disc_price": pc.round(batch["sum_disc_price"], 2),
                "avg_qty": pc.round(
                    pc.divide(batch["sum_qty"], pc.cast(batch["cnt"], pa.float64())), 6
                ),
                "cnt": batch["cnt"],
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


@register(
    "orders_by_region",
    oracle="""
    SELECT r_name,
           count(*) AS order_cnt,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def orders_by_region(sf_dir: str):
    """J3-style enrichment as a broadcast join: the custkey→region mapping
    is ray.put once and fetched per actor; orders stream through with no
    shuffle until the tiny final groupby over partials."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from sciscraper_ray.stages.relational import BroadcastLookup, group_count_batch

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).to_pandas()
    region = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    mapping = (
        cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
        .merge(region, left_on="n_regionkey", right_on="r_regionkey")[
            ["c_custkey", "r_name"]
        ]
        .set_index("c_custkey")
    )
    mapping_ref = ray.put(mapping)

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        return group_count_batch(batch, ["r_name"], {"o_totalprice": "total_price"})

    agg = (
        ds.map_batches(
            BroadcastLookup,
            fn_constructor_kwargs={"mapping_ref": mapping_ref, "on": "o_custkey"},
            batch_format="pandas",
            concurrency=(1, 4),
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(
            Sum(on="cnt", alias_name="order_cnt"),
            Sum(on="total_price", alias_name="total_price"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "r_name": batch["r_name"],
                "order_cnt": batch["order_cnt"],
                "total_price": pc.round(batch["total_price"], 2),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


@register(
    "top_tokens_global",
    oracle=f"""
    SELECT token, count(*) AS cnt
    FROM (SELECT unnest({_SQL_TOKENS}) AS token FROM documents)
    GROUP BY token
    ORDER BY cnt DESC, token ASC
    LIMIT 100
    """,
)
def top_tokens_global(sf_dir: str):
    """Corpus-wide token frequency top-k (A1 at corpus scale): per-batch
    partial counts -> groupby Sum -> sort(count desc, token asc) -> limit.
    The partials defuse hot-token skew (SURVEY §4: salted two-phase)."""
    from ray.data.aggregate import Sum

    from sciscraper_ray.kernels.tokenize import tokenize_column

    def partial(batch: pa.Table) -> pa.Table:
        tokens = tokenize_column(batch["text"])
        flat = pc.list_flatten(tokens)
        vc = flat.value_counts()
        return pa.table(
            {"token": vc.field("values"), "cnt": vc.field("counts")}
        )

    return (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum(on="cnt", alias_name="cnt"))
        .sort(key=["cnt", "token"], descending=[True, False])
        .limit(100)
    )


@register(
    "source_token_tally",
    oracle=f"""
    SELECT source, token, count(*) AS cnt
    FROM (SELECT source, unnest({_SQL_TOKENS}) AS token FROM documents)
    WHERE token IN {sql_in_list(TARGET_WORDS)}
    GROUP BY source, token
    """,
)
def source_token_tally(sf_dir: str):
    """E2+A4 analog (citation tally after explode): explode tokens with
    provenance, semi-join against the broadcast word set inside the batch,
    partial-count, then groupby (source, token)."""
    from ray.data.aggregate import Sum

    from sciscraper_ray.kernels.tokenize import tokenize_column

    vocab = pa.array(sorted(TARGET_WORDS), type=pa.string())

    def partial(batch: pa.Table) -> pa.Table:
        tokens = tokenize_column(batch["text"])
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        flat = pc.list_flatten(tokens)
        parents = pc.list_parent_indices(tokens)
        mask = pc.is_in(flat, value_set=vocab)
        exploded = pa.table(
            {
                "source": batch["source"].take(parents.filter(mask)),
                "token": flat.filter(mask),
            }
        )
        return group_count_batch_local(exploded)

    def group_count_batch_local(t: pa.Table) -> pa.Table:
        out = t.group_by(["source", "token"]).aggregate([([], "count_all")])
        return out.rename_columns(
            ["cnt" if c == "count_all" else c for c in out.column_names]
        )

    return (
        _docs(sf_dir, columns=("doc_id", "text", "source"))
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "token"])
        .aggregate(Sum(on="cnt", alias_name="cnt"))
    )


# --------------------------------------------------------------------------
# Events: windowed aggregate, keep-latest dedup, JSON scalar extraction
# (SURVEY §2.10 streaming-shaped + M23).
# --------------------------------------------------------------------------


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
           sum(CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS sum_k
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
