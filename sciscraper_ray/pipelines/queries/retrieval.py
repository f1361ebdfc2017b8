"""Retrieval / model-inference / index-build tier (BM25, LR, inverted index, LM stats).

Split from pipelines/queries.py (round 4); registration side effects
only — import order is fixed by the package __init__.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from sciscraper_ray.words import sql_in_list

from sciscraper_ray.pipelines.queries._shared import (
    _SQL_TOKENS,
    _docs,
    register,
)
from sciscraper_ray.pipelines.queries.dedup import (
    _md5_hex15_sql,
)
from sciscraper_ray.pipelines.queries.text_analysis import (
    _lang_sql,
    lang_id_batch,
)


# --------------------------------------------------------------------------
# Retrieval / model-inference / index-build tier (round 3)
# --------------------------------------------------------------------------

_BM25_QUERIES = (
    (0, ("join", "hash", "scan")),
    (1, ("filter", "merge", "vector")),
    (2, ("customer", "order", "line")),
    (3, ("batch", "row", "column")),
    (4, ("small", "slow", "data")),
)
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 10
_BM25_TERMS = tuple(sorted({t for _, ts in _BM25_QUERIES for t in ts}))


def _bm25_oracle() -> str:
    terms_sql = "(" + ", ".join(f"'{t}'" for t in _BM25_TERMS) + ")"
    qvals = ", ".join(
        f"({qid}, '{t1}', '{t2}', '{t3}')" for qid, (t1, t2, t3) in _BM25_QUERIES
    )
    # the score expression mirrors the Ray kernel OPERATION FOR OPERATION
    # (same literals, same association) so IEEE doubles match bit-exactly:
    # idf = ln(1 + (n - df + 0.5)/(df + 0.5));
    # s = idf * (tf*2.2) / (tf + 1.2*(0.25 + 0.75*(dl/(total/n))))
    return f"""
    WITH dl AS (
        SELECT doc_id, CAST(len({_SQL_TOKENS}) AS DOUBLE) AS dl FROM documents
    ), corpus AS (
        SELECT CAST(count(*) AS DOUBLE) AS n, sum(dl) AS total FROM dl
    ), toks AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents
    ), tf AS (
        SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
        FROM toks WHERE token IN {terms_sql} GROUP BY doc_id, token
    ), df AS (
        SELECT token, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        FROM toks WHERE token IN {terms_sql} GROUP BY token
    ), ts AS (
        SELECT tf.doc_id, tf.token,
               ln(1 + (g.n - f.df + 0.5) / (f.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + {_BM25_K1} * ((1 - {_BM25_B}) + {_BM25_B} * (d.dl / (g.total / g.n)))) AS s
        FROM tf
        JOIN df f ON f.token = tf.token
        JOIN dl d ON d.doc_id = tf.doc_id
        CROSS JOIN corpus g
    ), scored AS (
        SELECT q.query_id, d.doc_id,
               COALESCE(s1.s, 0) + COALESCE(s2.s, 0) + COALESCE(s3.s, 0) AS score
        FROM dl d
        CROSS JOIN (VALUES {qvals}) q(query_id, t1, t2, t3)
        LEFT JOIN ts s1 ON s1.doc_id = d.doc_id AND s1.token = q.t1
        LEFT JOIN ts s2 ON s2.doc_id = d.doc_id AND s2.token = q.t2
        LEFT JOIN ts s3 ON s3.doc_id = d.doc_id AND s3.token = q.t3
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, score
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY score DESC, doc_id ASC
        ) AS rn FROM scored
    ) WHERE rn <= {_BM25_TOPK}
    """


@register("doc_bm25_topk", oracle=_bm25_oracle())
def doc_bm25_topk(sf_dir: str):
    """BM25 retrieval scoring (Robertson/Sparck-Jones; the lexical-search
    op of a retrieval pipeline): score every document against a fixed
    query set, emit global top-10 per query.

    Scale shape: pass 1 streams corpus stats — (N, total_len) plus df for
    the 15 query terms only (per-batch partials, a 15-row exchange).
    Pass 2 broadcasts those constants and scores each batch vectorized
    (one token-mask + bincount per term), keeping only a per-batch top-k
    partial per query; the driver merge sees <= batches * Q * k candidate
    rows, never the corpus. Per-batch top-k is lossless under the global
    (score desc, doc_id asc) order: every kept candidate within a batch
    precedes its dropped batch-mates in the same order.

    Float exactness: idf/length-norm expressions are evaluated in the
    same literal association as the SQL oracle, and the 3-term sum is a
    fixed left-to-right add, so scores are IEEE-bit-identical (no
    rounding on either side)."""
    import ray
    from ray.data.aggregate import Sum

    from sciscraper_ray.kernels.tokenize import tokenize_column

    def stats_partial(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch["text"])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        rows = [("", len(batch), int(len(flat)))]  # "": (n_docs, total_len)
        for t in _BM25_TERMS:
            mask = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            df_t = len(np.unique(par[mask]))
            rows.append((t, df_t, 0))
        term, a, b = zip(*rows)
        return pa.table(
            {
                "term": pa.array(term),
                "a": pa.array(np.array(a, np.int64)),
                "b": pa.array(np.array(b, np.int64)),
            }
        )

    stats = (
        _docs(sf_dir)
        .map_batches(stats_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum(on="a", alias_name="a"), Sum(on="b", alias_name="b"))
        .to_pandas()  # bounded: vocabulary term stats (broadcast side)
    )
    srow = stats[stats["term"] == ""].iloc[0]
    n_docs, total_len = float(srow["a"]), float(srow["b"])
    df = {r["term"]: float(r["a"]) for _, r in stats.iterrows() if r["term"]}
    avgdl = total_len / n_docs
    idf = {
        t: np.log(1 + (n_docs - df.get(t, 0.0) + 0.5) / (df.get(t, 0.0) + 0.5))
        for t in _BM25_TERMS
    }
    consts = ray.put((idf, avgdl))

    def score_partial(batch: pa.Table) -> pa.Table:
        idf_, avgdl_ = ray.get(consts)
        toks = tokenize_column(batch["text"])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nrows = len(batch)
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.float64)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        denom_norm = _BM25_K1 * ((1 - _BM25_B) + _BM25_B * (dl / avgdl_))
        s_term = {}
        for t in _BM25_TERMS:
            mask = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            tf = np.bincount(par[mask], minlength=nrows).astype(np.float64)
            s = np.zeros(nrows)
            nz = tf > 0
            s[nz] = idf_[t] * (tf[nz] * 2.2) / (tf[nz] + denom_norm[nz])
            s_term[t] = s
        out_q, out_d, out_s = [], [], []
        for qid, (t1, t2, t3) in _BM25_QUERIES:
            score = s_term[t1] + s_term[t2] + s_term[t3]
            k = min(_BM25_TOPK, nrows)
            order = np.lexsort((doc_ids, -score))[:k]
            out_q.append(np.full(k, qid, np.int64))
            out_d.append(doc_ids[order])
            out_s.append(score[order])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "doc_id": pa.array(np.concatenate(out_d)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    cand = (
        _docs(sf_dir)
        .map_batches(score_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: batches x Q x k candidate rows
    )
    cand = cand.sort_values(
        ["query_id", "score", "doc_id"], ascending=[True, False, True]
    )
    top = cand.groupby("query_id", sort=True).head(_BM25_TOPK).reset_index(drop=True)
    return pa.table(
        {
            "query_id": pa.array(top["query_id"].to_numpy(np.int64)),
            "doc_id": pa.array(top["doc_id"].to_numpy(np.int64)),
            "score": pa.array(top["score"].to_numpy(np.float64)),
        }
    )


# logistic quality scorer: fixed weights over integer document features —
# the broadcast-weights batched-inference pattern (weights load once per
# actor, scoring is one vectorized pass; swap the linear model for any
# batched model and the Ray shape is unchanged)
_LR_STOPS = ("join", "hash", "row", "batch", "scan")
_LR_W = (0.08, -0.004, 0.3, -0.05, 0.01)  # n_tokens, n_chars, stops, digits, distinct
_LR_B = -6.5


class _LrScorer:
    """Actor-pool inference stage: 'model' (weight vector) built once in
    __init__, __call__ scores whole Arrow batches vectorized."""

    def __init__(self):
        self.w = np.array(_LR_W, np.float64)
        self.b = float(_LR_B)
        self.stops = _LR_STOPS

    def __call__(self, batch: pa.Table) -> pa.Table:
        from sciscraper_ray.kernels.tokenize import tokenize_column

        toks = tokenize_column(batch["text"])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nrows = len(batch)
        x0 = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.float64)
        x1 = pc.utf8_length(batch["text"]).to_numpy(zero_copy_only=False).astype(np.float64)
        stop_mask = pc.is_in(flat, value_set=pa.array(self.stops)).to_numpy(
            zero_copy_only=False
        )
        x2 = np.bincount(par[stop_mask], minlength=nrows).astype(np.float64)
        digits = pc.count_substring_regex(batch["text"], "[0-9]").to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        # distinct tokens per doc: one C-level unique over (doc, token)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        tok_codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pairs = par.astype(np.int64) * (tok_codes.max() + 1 if len(tok_codes) else 1) + tok_codes
        uniq_docs = par[np.unique(pairs, return_index=True)[1]]
        x4 = np.bincount(uniq_docs, minlength=nrows).astype(np.float64)
        w = self.w
        # fixed left-to-right association, mirrored in the SQL oracle
        z = self.b + w[0] * x0 + w[1] * x1 + w[2] * x2 + w[3] * digits + w[4] * x4
        prob = 1.0 / (1.0 + np.exp(-z))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "score": pa.array(z),
                "prob": pa.array(prob),
                "label": pa.array((z > 0).astype(np.int64)),
            }
        )


@register(
    "doc_lr_score",
    oracle=f"""
    WITH feats AS (
        SELECT doc_id,
               CAST(len({_SQL_TOKENS}) AS DOUBLE) AS x0,
               CAST(length(text) AS DOUBLE) AS x1,
               CAST((SELECT count(*) FROM unnest({_SQL_TOKENS}) AS u(t)
                     WHERE t IN {sql_in_list(_LR_STOPS)}) AS DOUBLE) AS x2,
               CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
                    AS DOUBLE) AS x3,
               CAST((SELECT count(DISTINCT t) FROM unnest({_SQL_TOKENS}) AS u(t))
                    AS DOUBLE) AS x4
        FROM documents
    ), z AS (
        SELECT doc_id,
               {_LR_B} + {_LR_W[0]} * x0 + {_LR_W[1]} * x1 + {_LR_W[2]} * x2
                       + {_LR_W[3]} * x3 + {_LR_W[4]} * x4 AS score
        FROM feats
    )
    SELECT doc_id, score, 1 / (1 + exp(-score)) AS prob,
           CAST(score > 0 AS BIGINT) AS label
    FROM z
    """,
)
def doc_lr_score(sf_dir: str):
    """Model-scoring inference over the corpus: a logistic quality model
    with broadcast weights, run as an actor-pool map_batches stage
    (weights materialize once per actor in __init__ — the shape a real
    learned quality classifier or reward model runs in at 100 TB; the
    features here are integer-exact so the oracle reproduces the scores
    bit-identically, same left-to-right accumulation).

    Zero shuffle: one streaming pass, output is one row per document."""
    return _docs(sf_dir).map_batches(
        _LrScorer,
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


@register(
    "token_inverted_index",
    oracle=f"""
    WITH pairs AS (
        SELECT DISTINCT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents
    )
    SELECT token,
           CAST(count(*) AS BIGINT) AS df,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
    FROM pairs GROUP BY token
    """,
)
def token_inverted_index(sf_dir: str):
    """Inverted-index build (the search-index op): token -> document
    frequency + sorted posting list.

    Scale shape: per-batch DISTINCT (token, doc) partials (an Arrow
    group_by inside the batch — the exchange moves one row per distinct
    pair, never repeated occurrences), then a token-partitioned
    ``map_groups`` merge. Group count = vocabulary size (Heaps' law:
    sublinear in corpus size), so per-group dispatch stays bounded; at
    real scale each group writes a posting FILE (hive-partitioned by
    token hash) instead of returning a joined string — the operator
    shape is identical."""
    import ray.data

    from sciscraper_ray.kernels.tokenize import tokenize_column

    def pair_partial(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch["text"])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks)
        doc = batch["doc_id"].take(par)
        t = pa.table({"token": flat, "doc_id": doc})
        return t.group_by(["token", "doc_id"]).aggregate([])

    def merge_group(tbl: pa.Table) -> pa.Table:
        ids = np.unique(tbl["doc_id"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "token": pa.array([tbl["token"][0].as_py()]),
                "df": pa.array(np.array([len(ids)], np.int64)),
                "postings": pa.array([",".join(map(str, ids))]),
            }
        )

    return (
        _docs(sf_dir)
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby("token")
        .map_groups(merge_group, batch_format="pyarrow")
    )


def _warc_fixture_dir(sf_dir: str, n_shards: int = 8) -> tuple[str, int]:
    """Build (once, cached) the 8-shard WARC fixture for ``sf_dir`` and
    return (dir, n_shards). Cache key = the source parquet's identity
    (abspath, mtime_ns, size) so a regenerated fixture never reuses
    stale shards; shards are written to a temp dir and published with an
    atomic rename so concurrent runs never observe a half-written
    cache."""
    import hashlib
    import os
    import shutil

    import pyarrow.parquet as pq

    from sciscraper_ray.sources.warc import build_warc

    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    cache_key = hashlib.sha256(
        f"{os.path.abspath(src)}|{st.st_mtime_ns}|{st.st_size}".encode()
    ).hexdigest()[:16]
    out_dir = f"/tmp/warc_src_{cache_key}"
    if not os.path.isdir(out_dir):
        docs = pq.read_table(src, columns=["doc_id", "text"])
        tmp_dir = f"{out_dir}.tmp.{os.getpid()}"
        os.makedirs(tmp_dir, exist_ok=True)
        ids = docs["doc_id"].to_numpy(zero_copy_only=False)
        texts = docs["text"].to_pylist()
        shards: list[list[tuple[int, str, bytes]]] = [[] for _ in range(n_shards)]
        for i, t in zip(ids, texts):
            shards[int(i) % n_shards].append(
                (int(i), f"https://warc.example/doc-{int(i)}", t.encode("utf-8"))
            )
        for s, recs in enumerate(shards):
            with open(os.path.join(tmp_dir, f"shard-{s:04d}.warc"), "wb") as f:
                f.write(build_warc(recs))
        try:
            os.rename(tmp_dir, out_dir)  # atomic publish
        except OSError:  # lost the race to a concurrent builder — use theirs
            shutil.rmtree(tmp_dir, ignore_errors=True)
    return out_dir, n_shards


@register(
    "warc_roundtrip",
    oracle="""
    SELECT doc_id,
           'https://warc.example/doc-' || CAST(doc_id AS VARCHAR) AS uri,
           text
    FROM documents
    """,
)
def warc_roundtrip(sf_dir: str):
    """WARC segment source (sources/warc.py): documents serialized into
    Content-Length-delimited WARC/1.0 segments (8 shard files — the
    warc.paths fan-out shape), then streamed back through
    ``read_binary_files`` -> per-file record parse -> columns.

    Parallelism = segment files (WARC has no intra-file random access
    without a CDX index — the constraint real Common-Crawl readers have);
    the parse is per-fragment and shuffle-free. Segment synthesis is
    fixture generation (driver-side, cached per sf under /tmp — keyed by
    the source parquet's identity (path, mtime_ns, size) so a regenerated
    fixture never reuses stale shards, and built in a temp dir with an
    atomic rename so a concurrent run can never observe a half-written
    cache)."""
    import os

    import ray.data

    from sciscraper_ray.sources.warc import parse_warc

    out_dir, n_shards = _warc_fixture_dir(sf_dir)

    def parse_batch(batch: pa.Table) -> pa.Table:
        ids_, uris, texts_ = [], [], []
        for blob in batch["bytes"].to_pylist():
            for rec in parse_warc(blob):
                ids_.append(rec["record_id"])
                uris.append(rec["uri"])
                texts_.append(rec["payload"].decode("utf-8"))
        return pa.table(
            {
                "doc_id": pa.array(ids_, pa.int64()),
                "uri": pa.array(uris),
                "text": pa.array(texts_),
            }
        )

    return ray.data.read_binary_files(
        [os.path.join(out_dir, f"shard-{s:04d}.warc") for s in range(n_shards)]
    ).map_batches(parse_batch, batch_format="pyarrow")


# robots.txt-style URL blocklist: deterministic per-host path-prefix rules
# (host index -> disallowed prefix), the crawl-politeness filter shape
_ROBOTS_RULES = (
    ("web-00.example.org", "/pdf/"),
    ("web-03.example.org", "/html/doc-1"),
    ("web-05.example.org", "/"),
)


@register(
    "url_robots_filter",
    oracle="""
    WITH pages AS (
        SELECT doc_id,
               'web-0' || CAST(doc_id % 7 AS VARCHAR)
                   || '.example.org' AS host,
               '/' || (CASE WHEN doc_id % 4 = 0 THEN 'pdf' ELSE 'html' END)
                   || '/doc-' || CAST(doc_id AS VARCHAR) AS path
        FROM documents
    )
    SELECT doc_id, 'https://' || host || path AS url FROM pages
    WHERE NOT (host = 'web-00.example.org' AND path LIKE '/pdf/%')
      AND NOT (host = 'web-03.example.org' AND path LIKE '/html/doc-1%')
      AND NOT (host = 'web-05.example.org')
    """,
)
def url_robots_filter(sf_dir: str):
    """robots.txt-style disallow filtering (the crawl-politeness gate a
    page pipeline runs before fetch/extract): a tiny per-host
    path-prefix rule table is broadcast, every batch evaluates its rules
    vectorized (one ``starts_with`` mask per rule — rule count is small
    by construction; a real exclusion list is grouped per host and only
    the batch's hosts' rules run). Zero shuffle, one streaming pass.

    URLs are derived deterministically from doc_id (a fixed host/path
    scheme, same flavor as the synthetic page table's) so the oracle
    reproduces them exactly."""

    def filt(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        host_idx = ids % 7
        kind = np.where(ids % 4 == 0, "pdf", "html")
        hosts = pa.array([f"web-0{h}.example.org" for h in host_idx])
        paths = pa.array([f"/{k}/doc-{i}" for k, i in zip(kind, ids)])
        keep = np.ones(len(ids), bool)
        for rule_host, prefix in _ROBOTS_RULES:
            hmask = pc.equal(hosts, rule_host).to_numpy(zero_copy_only=False)
            pmask = pc.starts_with(paths, prefix).to_numpy(zero_copy_only=False)
            keep &= ~(hmask & pmask)
        url = pc.binary_join_element_wise(
            pa.array(["https://"] * len(ids)), hosts, paths, ""
        )
        return pa.table({"doc_id": batch["doc_id"], "url": url}).filter(
            pa.array(keep)
        )

    return _docs(sf_dir, columns=("doc_id",)).map_batches(
        filt, batch_format="pyarrow"
    )


@register(
    "token_pair_counts",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               unnest({_SQL_TOKENS}) AS token,
               unnest(range(len({_SQL_TOKENS}))) AS ord
        FROM documents
    )
    SELECT a.token || ' ' || b.token AS pair, count(*) AS cnt
    FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
    GROUP BY pair
    ORDER BY cnt DESC, pair ASC
    LIMIT 50
    """,
)
def token_pair_counts(sf_dir: str):
    """BPE merge-step statistics: corpus-wide adjacent-token-pair
    frequencies, top-50 — the counting pass a distributed tokenizer
    trainer runs once per merge round. Pairs are built vectorized from
    the flattened token buffer (adjacency = equal parent indices, no
    per-doc loop); each batch value-counts locally so the shuffle moves
    (pair, cnt) partials bounded by the batch's pair vocabulary, then
    groupby-Sum -> sort(cnt desc, pair asc) -> limit. Pair key joins
    with a single space, unambiguous because the reference tokenizer
    splits on exactly that byte (docscraper.py:176-186)."""
    from ray.data.aggregate import Sum

    from sciscraper_ray.kernels.tokenize import tokenize_column

    def partial(batch: pa.Table) -> pa.Table:
        tokens = tokenize_column(batch["text"])
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        flat = pc.list_flatten(tokens)
        n = len(flat)
        if n < 2:
            return pa.table(
                {"pair": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        parents = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
        same_doc = pa.array(parents[:-1] == parents[1:])
        left = flat.slice(0, n - 1).filter(same_doc)
        right = flat.slice(1, n - 1).filter(same_doc)
        pairs = pc.binary_join_element_wise(left, right, " ")
        vc = pairs.value_counts()
        return pa.table({"pair": vc.field("values"), "cnt": vc.field("counts")})

    return (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum(on="cnt", alias_name="cnt"))
        .sort(key=["cnt", "pair"], descending=[True, False])
        .limit(50)
    )


_MIXTURE_QUOTA = 15


def _md5_hex15_np(ids) -> np.ndarray:
    """Vector of the 60-bit md5 prefix ints matching _md5_mod / the
    _md5_hex15_sql oracle fragment (str(id) convention)."""
    import hashlib

    return np.array(
        [int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) for i in ids],
        dtype=np.int64,
    )


@register(
    "doc_mixture_quota",
    oracle=f"""
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY {_md5_hex15_sql("CAST(doc_id AS VARCHAR)")} ASC,
                            doc_id ASC
               ) AS rn
        FROM documents
    ) WHERE rn <= {_MIXTURE_QUOTA}
    """,
)
def doc_mixture_quota(sf_dir: str):
    """Domain-balanced mixture downsampling: keep at most K documents per
    source, chosen as the K smallest content-stable id hashes — the
    deterministic quota sampler that balances a training mixture across
    domains without RNG state (reproducible across runs, cluster sizes,
    partitionings). Pass 1 streams (source, h, doc_id) candidates,
    pre-pruned per batch to its local K smallest per source, so the
    driver merge sees <= sources x K rows per batch, never the corpus;
    the per-source K-th smallest (h, doc_id) cutoff is broadcast and
    pass 2 is a zero-shuffle stream filter (payloads never move). The
    (h, doc_id) lexicographic cutoff keeps exactly K even under 60-bit
    hash collisions."""
    import pandas as pd
    import ray

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "source": batch["source"].to_pandas(),  # bounded: worker-side column conversion
                "h": _md5_hex15_np(ids),
                "doc_id": ids,
            }
        )
        pruned = (
            df.sort_values(["source", "h", "doc_id"])
            .groupby("source", sort=False)
            .head(_MIXTURE_QUOTA)
        )
        return pa.Table.from_pandas(pruned, preserve_index=False)

    cand = (
        _docs(sf_dir, columns=("doc_id", "source"))
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: quota x |sources| candidates per block
    )
    kept = (
        cand.sort_values(["source", "h", "doc_id"])
        .groupby("source", sort=False)
        .head(_MIXTURE_QUOTA)
    )
    # the cutoff row is the lexicographic max (h, doc_id) of the kept set
    cut = (
        kept.sort_values(["source", "h", "doc_id"])
        .groupby("source", sort=False)
        .tail(1)
        .set_index("source")
    )
    cut_ref = ray.put(cut)

    def filt(batch: pa.Table) -> pa.Table:
        c = ray.get(cut_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = _md5_hex15_np(ids)
        src = batch["source"].to_pandas()  # bounded: worker-side column conversion
        lim_h = src.map(c["h"]).to_numpy(np.int64)
        lim_id = src.map(c["doc_id"]).to_numpy(np.int64)
        keep = (h < lim_h) | ((h == lim_h) & (ids <= lim_id))
        return pa.table(
            {"doc_id": batch["doc_id"], "source": batch["source"]}
        ).filter(pa.array(keep))

    return _docs(sf_dir, columns=("doc_id", "source")).map_batches(
        filt, batch_format="pyarrow"
    )


@register(
    "doc_unigram_freq_score",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents
    ), vocab AS (
        SELECT token, count(*) AS gcnt FROM toks GROUP BY token
    )
    SELECT t.doc_id,
           CAST(SUM(v.gcnt) AS BIGINT) AS freq_sum,
           CAST(count(*) AS BIGINT) AS n_tokens
    FROM toks t JOIN vocab v USING (token)
    GROUP BY t.doc_id
    """,
)
def doc_unigram_freq_score(sf_dir: str):
    """Unigram language-model quality scoring (the CCNet/KenLM shape):
    score every document by how typical its tokens are of the corpus.
    Pass 1 builds the global unigram table (per-batch value-count
    partials -> vocabulary-sized groupby, Heaps'-law small); the table is
    broadcast once and pass 2 maps each doc's tokens through it, emitting
    the integer-exact sufficient statistics (sum of global frequencies,
    token count) whose ratio is the mean-frequency score — integers
    instead of a float mean so the oracle comparison is exact; a real
    LM swaps the broadcast table for model weights (doc_lr_score is the
    learned-weights twin). Zero shuffle in pass 2."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    from sciscraper_ray.kernels.tokenize import tokenize_column

    def partial(batch: pa.Table) -> pa.Table:
        tokens = tokenize_column(batch["text"])
        flat = pc.list_flatten(tokens)
        vc = flat.value_counts()
        return pa.table({"token": vc.field("values"), "cnt": vc.field("counts")})

    counts = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum(on="cnt", alias_name="cnt"))
        .to_pandas()  # bounded: vocabulary post-aggregate (broadcast side)
    )
    lut_ref = ray.put(
        pd.Series(counts["cnt"].to_numpy(np.int64), index=counts["token"])
    )

    def score(batch: pa.Table) -> pa.Table:
        lut = ray.get(lut_ref)
        tokens = tokenize_column(batch["text"])
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        flat = pc.list_flatten(tokens)
        parents = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
        freqs = pd.Series(flat.to_pandas()).map(lut).to_numpy(np.int64)  # bounded: worker-side column conversion
        sums = np.zeros(len(batch), np.int64)
        np.add.at(sums, parents, freqs)
        lens = pc.list_value_length(tokens).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "freq_sum": pa.array(sums, pa.int64()),
                "n_tokens": pa.array(lens.astype(np.int64)),
            }
        )

    return _docs(sf_dir).map_batches(score, batch_format="pyarrow")


_LATEST_K = 20


@register(
    "events_latest_k",
    oracle=f"""
    SELECT event_id, user_id, ts FROM (
        SELECT event_id, user_id, ts,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts DESC, event_id DESC
               ) AS rn
        FROM events
    ) WHERE rn <= {_LATEST_K}
    """,
)
def events_latest_k(sf_dir: str):
    """Per-key latest-K row retention (the TTL/compaction policy shape:
    keep each user's K most recent events, drop the tail) — the
    grouped-top-K-ROWS generalization of keep-latest(1). Same two-phase
    plan as doc_mixture_quota: per-batch candidates pre-pruned to the
    local K latest per user (merge sees <= users x K rows per batch),
    the per-user K-th latest (ts, event_id) cutoff broadcast, then a
    zero-shuffle stream filter — full event payloads never shuffle.
    Timestamps compare as epoch-microsecond int64 end to end (the
    pandas-unit round-trip gotcha)."""
    import pandas as pd
    import ray
    import ray.data

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def to_us(batch: pa.Table) -> np.ndarray:
        return (
            pc.cast(batch["ts"], pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
                "ts_us": to_us(batch),
                "event_id": batch["event_id"].to_numpy(zero_copy_only=False),
            }
        )
        pruned = (
            df.sort_values(["user_id", "ts_us", "event_id"], ascending=[True, False, False])
            .groupby("user_id", sort=False)
            .head(_LATEST_K)
        )
        return pa.Table.from_pandas(pruned, preserve_index=False)

    cand = ev.map_batches(partial, batch_format="pyarrow").to_pandas()  # bounded: K-per-user candidates (broadcast decision side)
    kept = (
        cand.sort_values(["user_id", "ts_us", "event_id"], ascending=[True, False, False])
        .groupby("user_id", sort=False)
        .head(_LATEST_K)
    )
    cut = (
        kept.sort_values(["user_id", "ts_us", "event_id"], ascending=[True, False, False])
        .groupby("user_id", sort=False)
        .tail(1)
        .set_index("user_id")
    )
    cut_ref = ray.put(cut)

    def filt(batch: pa.Table) -> pa.Table:
        c = ray.get(cut_ref)
        users = pd.Series(batch["user_id"].to_numpy(zero_copy_only=False))
        ts_us = to_us(batch)
        eid = batch["event_id"].to_numpy(zero_copy_only=False)
        lim_ts = users.map(c["ts_us"]).to_numpy(np.int64)
        lim_eid = users.map(c["event_id"]).to_numpy(np.int64)
        keep = (ts_us > lim_ts) | ((ts_us == lim_ts) & (eid >= lim_eid))
        return batch.filter(pa.array(keep))

    return ev.map_batches(filt, batch_format="pyarrow")


def _host_sql(x: str) -> str:
    """page_synth.host_for in SQL (HOSTS table + mega-host skew)."""
    return (
        f"CASE WHEN ({x}) % 10 < 3 THEN 'mega.example.org' "
        f"ELSE CASE ({x}) % 5 WHEN 0 THEN 'alpha.example.com' "
        f"WHEN 1 THEN 'beta.example.net' WHEN 2 THEN 'gamma.example.io' "
        f"WHEN 3 THEN 'delta.example.edu' ELSE 'epsilon.example.dev' END END"
    )


_REF_TARGETS_SQL = "[(doc_id * 17 + 13) % 997, (doc_id * 29 + 7) % 997]"


@register(
    "page_link_graph",
    oracle=f"""
    WITH links AS (
        SELECT doc_id, unnest({_REF_TARGETS_SQL}) AS t FROM documents
    )
    SELECT {_host_sql("doc_id")} AS src_host,
           {_host_sql("t")} AS dst_host,
           count(*) AS cnt
    FROM links
    GROUP BY src_host, dst_host
    """,
)
def page_link_graph(sf_dir: str):
    """Web-graph construction: harvest the references-section outlinks of
    every synthesized page (DOM parse, CSS-scoped to ``section.refs a``)
    and tally host-level edges — the stage that builds the input for
    graph_pagerank / dedup_components from raw pages. Per-batch edge
    counts are pre-aggregated (the shuffle moves (src, dst, cnt) partials
    bounded by hosts², never per-link rows), then a tiny groupby-Sum.
    Link targets are the synthesizer's deterministic ``ref_targets`` so
    the oracle rebuilds the edge list from pure arithmetic."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from sciscraper_ray.sources.page_synth import host_for, render_html
    from sciscraper_ray.stages.dom_select import select_links

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        src: list[str] = []
        dst: list[str] = []
        for i, t, lg in zip(ids, texts, langs):
            page = render_html(int(i), t, lg, with_links=True).decode()
            s = host_for(int(i))
            for href, _anchor in select_links(page, "section.refs a"):
                src.append(s)
                dst.append(href.split("/")[2])
        vc = (
            pd.DataFrame({"src_host": src, "dst_host": dst})
            .value_counts()
            .rename("cnt")
            .reset_index()
        )
        return pa.Table.from_pandas(vc, preserve_index=False)

    return (
        _docs(sf_dir, columns=("doc_id", "text", "lang"))
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["src_host", "dst_host"])
        .aggregate(Sum(on="cnt", alias_name="cnt"))
    )


@register(
    "page_anchor_texts",
    oracle=f"""
    WITH links AS (
        SELECT doc_id, unnest({_REF_TARGETS_SQL}) AS t FROM documents
    )
    SELECT doc_id,
           'https://' || {_host_sql("t")} || '/html/doc-' || CAST(t AS VARCHAR)
               AS dst_url,
           'ref ' || CAST(t AS VARCHAR) AS anchor
    FROM links
    """,
)
def page_anchor_texts(sf_dir: str):
    """Anchor-text corpus extraction: (source doc, destination url, anchor
    text) triples from every page's reference links — the web-scale
    query/title training-pair source (anchor text is the classic weak
    label for the linked page). Same DOM harvest as page_link_graph but
    exploded with provenance instead of aggregated; zero shuffle."""
    from sciscraper_ray.sources.page_synth import render_html
    from sciscraper_ray.stages.dom_select import select_links

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        out_id: list[int] = []
        out_url: list[str] = []
        out_anchor: list[str] = []
        for i, t, lg in zip(ids, texts, langs):
            page = render_html(int(i), t, lg, with_links=True).decode()
            for href, anchor in select_links(page, "section.refs a"):
                out_id.append(int(i))
                out_url.append(href)
                out_anchor.append(anchor)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "dst_url": pa.array(out_url, pa.string()),
                "anchor": pa.array(out_anchor, pa.string()),
            }
        )

    return _docs(sf_dir, columns=("doc_id", "text", "lang")).map_batches(
        explode, batch_format="pyarrow"
    )


def _doc_edges(sf_dir: str) -> "ray.data.Dataset":
    """Doc-level (src, dst) edge list harvested from every page's
    reference links through the DOM engine (same parse as
    page_link_graph, kept at document granularity: dst = trailing id of
    the href path). The harvest streams; consumers that scan repeatedly
    (BFS rounds) materialize the two-int64-column result themselves."""
    from sciscraper_ray.sources.page_synth import render_html
    from sciscraper_ray.stages.dom_select import select_links

    def harvest(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        src: list[int] = []
        dst: list[int] = []
        for i, t, lg in zip(ids, texts, langs):
            page = render_html(int(i), t, lg, with_links=True).decode()
            for href, _anchor in select_links(page, "section.refs a"):
                src.append(int(i))
                dst.append(int(href.rsplit("-", 1)[1]))
        return pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )

    return _docs(sf_dir, columns=("doc_id", "text", "lang")).map_batches(
        harvest, batch_format="pyarrow"
    )


_BFS_ROUNDS = 12  # shared cap: engine rounds == oracle recursion depth


@register(
    "crawl_depth_from_seeds",
    oracle=f"""
    WITH RECURSIVE links AS (
        SELECT doc_id AS src, unnest({_REF_TARGETS_SQL}) AS dst FROM documents
    ),
    bfs(node, d) AS (
        SELECT doc_id, 0 FROM documents WHERE doc_id % 100 = 0
        UNION
        SELECT l.dst, b.d + 1
        FROM bfs b JOIN links l ON l.src = b.node
        WHERE b.d < {_BFS_ROUNDS}
    )
    SELECT node, CAST(min(d) AS BIGINT) AS dist FROM bfs GROUP BY node
    """,
)
def crawl_depth_from_seeds(sf_dir: str):
    """Crawl-depth assignment: exact minimum hop distance of every page
    from the seed set (doc_id % 100 == 0) over the harvested doc-level
    outlink graph, capped at _BFS_ROUNDS hops — the frontier-depth
    label every BFS-ordered crawler stamps on its queue. The edge list is
    DOM-harvested once and materialized (int64 pairs only); each BFS
    round is a frontier-broadcast ``is_in`` semi-join over the edge
    blocks (see graph.bfs_distances) — no shuffle, driver holds only the
    bounded reachable set. The oracle recomputes the same closure with a
    recursive CTE over the synthesizer's arithmetic link targets."""
    from sciscraper_ray.pipelines.graph import bfs_distances

    def seed_filter(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(ids % 100 == 0))

    seeds = (
        _docs(sf_dir, columns=("doc_id",))
        .map_batches(seed_filter, batch_format="pyarrow")
        .to_pandas()["doc_id"]  # bounded: 1%-sample seed set (broadcast side)
        .to_numpy()
    )
    return bfs_distances(_doc_edges(sf_dir), seeds, max_rounds=_BFS_ROUNDS)


@register(
    "link_indegree_histogram",
    oracle=f"""
    WITH links AS (
        SELECT doc_id, unnest({_REF_TARGETS_SQL}) AS t FROM documents
    ),
    deg AS (SELECT t, count(*) AS indegree FROM links GROUP BY t)
    SELECT indegree, count(*) AS n_pages FROM deg GROUP BY indegree
    """,
)
def link_indegree_histogram(sf_dir: str):
    """Web-graph in-degree distribution (the power-law plot every crawl
    QA report opens with): number of link targets at each in-link count,
    multi-edges counted. Per-batch Arrow group_by compresses each edge
    block to (dst, cnt) partials, one groupby-Sum reduces per target
    (exchange bounded by distinct targets, never per-link rows), then
    per-block histogram partials over the degree column merge on the
    driver (rows = distinct degree VALUES — tiny by construction)."""
    from ray.data.aggregate import Sum

    def dst_partial(batch: pa.Table) -> pa.Table:
        agg = batch.select(["dst"]).group_by("dst").aggregate([([], "count_all")])
        return agg.rename_columns(["dst", "cnt"])

    def deg_partial(batch: pa.Table) -> pa.Table:
        agg = batch.select(["cnt"]).group_by("cnt").aggregate([([], "count_all")])
        return agg.rename_columns(["indegree", "n_pages"])

    parts = (
        _doc_edges(sf_dir)
        .map_batches(dst_partial, batch_format="pyarrow")
        .groupby("dst")
        .aggregate(Sum(on="cnt", alias_name="cnt"))
        .map_batches(deg_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: node id space (synth targets < 997)
    )
    out = parts.groupby("indegree", as_index=False)["n_pages"].sum()
    return pa.table(
        {
            "indegree": pa.array(out["indegree"].to_numpy(), pa.int64()),
            "n_pages": pa.array(out["n_pages"].to_numpy(), pa.int64()),
        }
    )


def _hits_sql(iters: int = 3) -> str:
    """HITS unrolled to fixed-K chained CTEs (same rationale as
    _pagerank_sql: deterministic, no aggregates in recursive terms),
    L2-normalized per half-step, over the DISTINCT synthesizer link
    targets."""
    ctes = [
        f"e0 AS (SELECT doc_id AS src, unnest({_REF_TARGETS_SQL}) AS dst FROM documents)",
        "e AS (SELECT DISTINCT src, dst FROM e0)",
        "h0 AS (SELECT DISTINCT src AS node, 1.0 AS s FROM e)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""a{k}u AS (
        SELECT e.dst AS node, sum(p.s) AS s
        FROM e JOIN h{k - 1} p ON p.node = e.src GROUP BY e.dst
    )"""
        )
        ctes.append(
            f"a{k} AS (SELECT node, s / sqrt((SELECT sum(s*s) FROM a{k}u)) AS s FROM a{k}u)"
        )
        ctes.append(
            f"""h{k}u AS (
        SELECT e.src AS node, sum(p.s) AS s
        FROM e JOIN a{k} p ON p.node = e.dst GROUP BY e.src
    )"""
        )
        ctes.append(
            f"h{k} AS (SELECT node, s / sqrt((SELECT sum(s*s) FROM h{k}u)) AS s FROM h{k}u)"
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT node, 'auth' AS kind, round(s, 10) AS score FROM a{iters}
    UNION ALL
    SELECT node, 'hub' AS kind, round(s, 10) AS score FROM h{iters}
    """
    )


@register("graph_hits", oracle=_hits_sql(3))
def graph_hits(sf_dir: str):
    """HITS hub/authority link analysis (3 mutual-reinforcement
    iterations, L2-normalized per half-step) over the DISTINCT harvested
    doc-level outlink graph — pagerank's asymmetric twin: reference
    sections are hubs, cited targets are authorities. See
    pipelines/graph.py hits for the two physical plans; the oracle
    unrolls the identical fixed-K chain in SQL."""
    from sciscraper_ray.pipelines.graph import _dedup_edges, hits

    e = _dedup_edges(
        _doc_edges(sf_dir).map_batches(
            lambda b: pa.table({"a": b["src"], "b": b["dst"]}),
            batch_format="pyarrow",
        )
    ).map_batches(
        lambda b: pa.table({"src": b["a"], "dst": b["b"]}), batch_format="pyarrow"
    )
    return hits(e, iters=3)


_BOOL_QUERIES: tuple[tuple[int, tuple[str, ...]], ...] = (
    (0, ("join", "hash")),
    (1, ("scan", "filter", "merge")),
    (2, ("vector", "window")),
)


@register(
    "doc_boolean_retrieval",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents
    ), qt(query_id, token) AS (VALUES {", ".join(
        f"({qid}, '{t}')" for qid, terms in _BOOL_QUERIES for t in terms
    )}),
    hits AS (
        SELECT q.query_id, t.doc_id, count(DISTINCT t.token) AS k
        FROM qt q JOIN toks t USING (token)
        GROUP BY q.query_id, t.doc_id
    ), need AS (
        SELECT query_id, count(*) AS n FROM qt GROUP BY query_id
    )
    SELECT h.query_id, h.doc_id
    FROM hits h JOIN need USING (query_id) WHERE h.k = need.n
    """,
)
def doc_boolean_retrieval(sf_dir: str):
    """Boolean AND retrieval (conjunctive posting intersection, the query
    side of token_inverted_index): for a broadcast query set, emit every
    (query, doc) where the doc contains ALL the query's terms. Per batch:
    one vectorized is_in + parent-index scatter per DISTINCT query term
    (terms, not docs, drive the loop), then a boolean AND across each
    query's term-presence vectors — zero shuffle, documents stream once
    for all queries together."""
    from sciscraper_ray.kernels.tokenize import tokenize_column

    terms = sorted({t for _, ts in _BOOL_QUERIES for t in ts})

    def probe(batch: pa.Table) -> pa.Table:
        tokens = tokenize_column(batch["text"])
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        flat = pc.list_flatten(tokens)
        parents = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
        nb = len(batch)
        present: dict[str, np.ndarray] = {}
        for t in terms:
            mask = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            hit = np.zeros(nb, bool)
            hit[parents[mask]] = True
            present[t] = hit
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_q: list[np.ndarray] = []
        out_d: list[np.ndarray] = []
        for qid, qterms in _BOOL_QUERIES:
            keep = np.ones(nb, bool)
            for t in qterms:
                keep &= present[t]
            out_q.append(np.full(int(keep.sum()), qid, np.int64))
            out_d.append(ids[keep])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(probe, batch_format="pyarrow")


@register(
    "doc_iqr_filter",
    oracle="""
    WITH hist AS (
        SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY n_chars
    ), cum AS (
        SELECT v, SUM(c) OVER (ORDER BY v) AS cum,
               (SELECT SUM(c) FROM hist) AS n
        FROM hist
    ), q AS (
        SELECT
            (SELECT min(v) FROM cum WHERE cum >= CAST(ceil(n * 0.25) AS BIGINT)) AS q1,
            (SELECT min(v) FROM cum WHERE cum >= CAST(ceil(n * 0.75) AS BIGINT)) AS q3
        FROM cum LIMIT 1
    )
    SELECT d.doc_id, d.n_chars
    FROM documents d, q
    WHERE d.n_chars >= q.q1 - (3 * (q.q3 - q.q1)) // 2
      AND d.n_chars <= q.q3 + (3 * (q.q3 - q.q1)) // 2
    """,
)
def doc_iqr_filter(sf_dir: str):
    """Tukey-fence outlier gate on document length (the robust
    length-filter a corpus pipeline runs before training): exact Q1/Q3
    from a value histogram — per-batch (value, count) partials, merged on
    the driver (distinct lengths ≪ corpus), cumulative scan reads off the
    smallest value with cum ≥ ceil(q·n) — then the integer Tukey fences
    [Q1 - 3·IQR/2, Q3 + 3·IQR/2] broadcast into a zero-shuffle stream
    filter. All-integer arithmetic end to end, so the oracle is exact."""
    import pandas as pd
    import ray

    src = _docs(sf_dir, columns=("doc_id", "n_chars"))

    def hist(batch: pa.Table) -> pa.Table:
        vc = batch["n_chars"].value_counts()
        return pa.table({"v": vc.field("values"), "c": vc.field("counts")})

    h = (
        src.map_batches(hist, batch_format="pyarrow")
        .to_pandas()  # bounded: |distinct lengths| x blocks
        .groupby("v", as_index=False)["c"]
        .sum()
        .sort_values("v")
    )
    n = int(h["c"].sum())
    cum = h["c"].cumsum().to_numpy()
    vals = h["v"].to_numpy()
    q1 = int(vals[np.searchsorted(cum, -(-n // 4))])  # ceil(n/4)
    q3 = int(vals[np.searchsorted(cum, -(-(3 * n) // 4))])
    iqr = q3 - q1
    lo, hi = q1 - (3 * iqr) // 2, q3 + (3 * iqr) // 2

    def filt(batch: pa.Table) -> pa.Table:
        v = batch["n_chars"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((v >= lo) & (v <= hi)))

    return src.map_batches(filt, batch_format="pyarrow")


_CHARSETS = ("utf-8", "latin-1", "utf-16")


@register(
    "page_charset_decode",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'latin-1'
                ELSE 'utf-16' END AS charset,
           text AS extracted_text
    FROM documents
    """,
)
def page_charset_decode(sf_dir: str):
    """Charset-sniffing decode in front of main-content extraction — the
    real-crawl concern the fixed-utf-8 page table hides: payload bytes
    arrive in mixed encodings (here utf-8 / latin-1 / utf-16-LE-with-BOM,
    declared by ``<meta charset>``; the footer's © makes the encodings
    byte-distinct). The decode stage sniffs the BOM, else regex-scans the
    first KB ASCII-compatibly for the meta declaration, decodes, then the
    usual text-density extractor reproduces the ground-truth main content
    byte-identically. One streaming pass, zero shuffle."""
    import re as _re

    from sciscraper_ray.sources.page_synth import render_html
    from sciscraper_ray.stages.html_extract import extract_main_content

    _meta_re = _re.compile(rb'<meta charset="([a-zA-Z0-9_-]+)"')

    def build(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        payloads: list[bytes] = []
        for i, t, lg in zip(ids, texts, langs):
            cs = _CHARSETS[int(i) % 3]
            page = render_html(int(i), t, lg).decode("utf-8")
            page = page.replace(
                "<head>", f'<head><meta charset="{cs}">', 1
            )
            payloads.append(page.encode(cs))
        return pa.table(
            {"doc_id": batch["doc_id"], "payload": pa.array(payloads, pa.binary())}
        )

    def sniff_decode_extract(batch: pa.Table) -> pa.Table:
        charsets: list[str] = []
        texts: list[str] = []
        for payload in batch["payload"].to_pylist():
            if payload[:2] in (b"\xff\xfe", b"\xfe\xff"):
                cs = "utf-16"
            else:
                m = _meta_re.search(payload[:1024])
                cs = m.group(1).decode("ascii") if m else "utf-8"
            charsets.append(cs)
            text, _spans = extract_main_content(payload.decode(cs))
            texts.append(text)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "charset": pa.array(charsets, pa.string()),
                "extracted_text": pa.array(texts, pa.string()),
            }
        )

    return (
        _docs(sf_dir, columns=("doc_id", "text", "lang"))
        .map_batches(build, batch_format="pyarrow")
        .map_batches(sniff_decode_extract, batch_format="pyarrow")
    )


@register(
    "sitemap_roundtrip",
    oracle=f"""
    SELECT doc_id,
           {_host_sql("doc_id")} AS host,
           'https://' || {_host_sql("doc_id")} || '/html/doc-'
               || CAST(doc_id AS VARCHAR) AS url,
           strftime(DATE '2023-11-14' + CAST(doc_id % 30 AS INTEGER),
                    '%Y-%m-%d') AS lastmod
    FROM documents
    """,
)
def sitemap_roundtrip(sf_dir: str):
    """Sitemap XML write -> streaming parse round trip (the crawl-frontier
    seed format; S-tier source coverage beyond parquet/CSV/txt/JSONL/WARC/
    binary). The writer emits one ``<urlset>`` segment per (host, batch) —
    real sitemap indexes chunk at 50k urls per file, so segments, not
    hosts, are the parallelism unit (the warc.paths shape); the parser
    fans out per segment. Lastmod dates derive from doc_id so the oracle
    rebuilds every row arithmetically."""
    import xml.etree.ElementTree as ET
    from datetime import date, timedelta

    from sciscraper_ray.sources.page_synth import host_for

    _epoch = date(2023, 11, 14)

    def write_segments(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        by_host: dict[str, list[int]] = {}
        for i in ids:
            by_host.setdefault(host_for(int(i)), []).append(int(i))
        hosts: list[str] = []
        xmls: list[str] = []
        for h, members in sorted(by_host.items()):
            entries = "".join(
                f"<url><loc>https://{h}/html/doc-{i}</loc>"
                f"<lastmod>{(_epoch + timedelta(days=i % 30)).isoformat()}</lastmod></url>"
                for i in members
            )
            hosts.append(h)
            xmls.append(
                '<?xml version="1.0" encoding="UTF-8"?>'
                f"<urlset>{entries}</urlset>"
            )
        return pa.table(
            {"host": pa.array(hosts, pa.string()), "xml": pa.array(xmls, pa.string())}
        )

    def parse_segments(batch: pa.Table) -> pa.Table:
        out_id: list[int] = []
        out_host: list[str] = []
        out_url: list[str] = []
        out_mod: list[str] = []
        for h, xml in zip(batch["host"].to_pylist(), batch["xml"].to_pylist()):
            root = ET.fromstring(xml)
            for u in root.findall("url"):
                loc = u.findtext("loc")
                out_id.append(int(loc.rsplit("-", 1)[1]))
                out_host.append(h)
                out_url.append(loc)
                out_mod.append(u.findtext("lastmod"))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "host": pa.array(out_host, pa.string()),
                "url": pa.array(out_url, pa.string()),
                "lastmod": pa.array(out_mod, pa.string()),
            }
        )

    return (
        _docs(sf_dir, columns=("doc_id",))
        .map_batches(write_segments, batch_format="pyarrow")
        .map_batches(parse_segments, batch_format="pyarrow")
    )


@register(
    "redirect_resolve",
    oracle="""
    WITH RECURSIVE chase(src, cur, d) AS (
        SELECT doc_id, doc_id, 0 FROM documents
        UNION ALL
        SELECT src, cur - 1, d + 1 FROM chase WHERE cur % 4 <> 0
    )
    SELECT src AS doc_id, CAST(cur AS BIGINT) AS terminal_id,
           CAST(d AS BIGINT) AS hops
    FROM chase WHERE cur % 4 = 0
    """,
)
def redirect_resolve(sf_dir: str):
    """Redirect-chain resolution to the terminal URL — the crawl-graph
    normalization every frontier needs before dedup (3xx hops, URL
    shorteners, www/apex canonical moves). The redirect map here is one
    row per URL (corpus-sized: NEITHER side broadcasts), so resolution is
    POINTER DOUBLING: start from the one-hop map f(u) (terminals map to
    themselves with 0 hops) and iterate f <- f∘f via the co-partitioned
    ``bucketed_hash_join`` — each round squares the resolved distance and
    sums hop counts, so ceil(log2(max_chain)) all-to-all rounds replace a
    max_chain-step sequential chase. Chains here are <= 3 hops
    (synthesized: url with doc_id % 4 != 0 redirects to doc_id - 1), so
    TWO rounds reach the fixpoint; the oracle chases the same map with a
    recursive CTE, so transitivity itself is value-checked. Partitioning
    assumption: the hop key is near-uniform (hash-mixed in the join), so
    no bucket concentrates; one straggler chain costs rounds, not skew."""
    from sciscraper_ray.stages.relational import bucketed_hash_join

    def one_hop(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        redirects = ids % 4 != 0
        return pa.table(
            {
                "src": pa.array(ids),
                "cur": pa.array(np.where(redirects, ids - 1, ids)),
                "hops": pa.array(redirects.astype(np.int64)),
            }
        )

    f = _docs(sf_dir, columns=("doc_id",)).map_batches(
        one_hop, batch_format="pyarrow"
    )
    for _round in range(2):  # ceil(log2(3 hops)) = 2 doubling rounds
        # f is total (terminals self-map), so the inner equi-join on
        # cur = src2 matches every row and composes hop counts exactly.
        right = f.map_batches(
            lambda b: b.rename_columns(["src2", "cur2", "hops2"]),
            batch_format="pyarrow",
        )
        joined = bucketed_hash_join(
            f, right, left_on="cur", right_on="src2", num_buckets=32
        )

        def compose(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": batch["src"],
                    "cur": batch["cur2"],
                    "hops": pc.add(batch["hops"], batch["hops2"]),
                }
            )

        f = joined.map_batches(compose, batch_format="pyarrow")

    return f.map_batches(
        lambda b: b.rename_columns(["doc_id", "terminal_id", "hops"]),
        batch_format="pyarrow",
    )


_TEASER_MOD = 9
_TEASER_OFFSET = 500_000
_TEASER_FRAC = 0.4
_TEASER_CONTAIN = 0.9


@register(
    "dedup_teaser_prefix",
    oracle=f"""
    WITH all_docs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {_TEASER_OFFSET},
               array_to_string(list_slice(
                   string_split(text, ' '), 1,
                   CAST(ceil({_TEASER_FRAC} * len(string_split(text, ' ')))
                        AS BIGINT)), ' ')
        FROM documents WHERE doc_id % {_TEASER_MOD} = 0
    ),
    toks AS (
        SELECT doc_id, string_split(lower(trim(text)), ' ') AS lst
        FROM all_docs
    ),
    heads AS (
        SELECT doc_id, array_to_string(list_slice(lst, 1, 3), ' ') AS head
        FROM toks
    ),
    grams AS (
        SELECT doc_id,
        CASE WHEN len(lst) < 3 THEN [array_to_string(lst, ' ')]
             ELSE list_transform(range(1, len(lst) - 1),
                                 i -> lst[i] || ' ' || lst[i+1] || ' ' || lst[i+2])
        END AS shl
        FROM toks
    ),
    sh AS (SELECT DISTINCT doc_id, unnest(shl) AS g FROM grams),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    cand AS (
        SELECT x.doc_id AS p, y.doc_id AS q
        FROM heads x JOIN heads y ON x.head = y.head AND x.doc_id < y.doc_id
    ),
    oriented AS (
        SELECT CASE WHEN sp.n < sq.n OR (sp.n = sq.n AND p < q)
                    THEN p ELSE q END AS a,
               CASE WHEN sp.n < sq.n OR (sp.n = sq.n AND p < q)
                    THEN q ELSE p END AS b
        FROM cand
        JOIN sizes sp ON sp.doc_id = p
        JOIN sizes sq ON sq.doc_id = q
    ),
    inter AS (
        SELECT o.a, o.b, count(*) AS i
        FROM oriented o
        JOIN sh x ON x.doc_id = o.a
        JOIN sh y ON y.doc_id = o.b AND y.g = x.g
        GROUP BY o.a, o.b
    )
    SELECT a, b FROM inter
    JOIN sizes sa ON sa.doc_id = a
    WHERE i * 1.0 / sa.n >= {_TEASER_CONTAIN}
    """,
)
def dedup_teaser_prefix(sf_dir: str):
    """Prefix-teaser containment dedup — the AMP/mobile/teaser-page case
    near-dup Jaccard misses: an excerpt sharing only ~40% of its source's
    shingles has Jaccard ~0.4 (invisible at the 0.8 LSH threshold) but
    shingle CONTAINMENT ~1.0. Candidates block on the document HEAD
    fingerprint (128-bit hash of the first 3 tokens) — deterministic and
    complete for prefix excerpts, the declared contract (general
    substring containment is doc_dup_substrings' job) — through the same
    two-plan ``_candidate_pairs`` machinery as MinHash; each candidate
    pair is exact-verified |S(a)∩S(b)|/|S(a)| >= 0.9 with a = the
    smaller-shingle-set side, texts fetched broadcast-small-side.
    Emits oriented (a=contained, b=container) pairs; the oracle
    recomputes head-blocked containment from first principles."""
    import math

    from sciscraper_ray.kernels.tokenize import format_manuscript
    from sciscraper_ray.pipelines.dedup import _candidate_pairs, _texts_for
    from sciscraper_ray.pipelines.plan import parquet_row_bound
    from sciscraper_ray.stages.dedup import md5_hash128_batch, word_shingles

    ds = _docs(sf_dir)

    def make_teasers(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = ids % _TEASER_MOD == 0
        texts = []
        for t, k in zip(batch["text"].to_pylist(), keep):
            if k:
                words = t.split(" ")
                texts.append(
                    " ".join(words[: math.ceil(_TEASER_FRAC * len(words))])
                )
        return pa.table(
            {
                "doc_id": pa.array(
                    (ids[keep] + _TEASER_OFFSET).tolist(), pa.int64()
                ),
                "text": pa.array(texts, pa.string()),
            }
        )

    corpus = (
        ds.union(ds.map_batches(make_teasers, batch_format="pyarrow"))
        .repartition(
            max(
                1,
                min(
                    64,
                    ((parquet_row_bound(f"{sf_dir}/documents.parquet") or 0))
                    // 500,
                ),
            )
        )
        .materialize()
    )

    def head_rows(batch: pa.Table) -> pa.Table:
        heads = [
            " ".join(format_manuscript(t)[:3]) for t in batch["text"].to_pylist()
        ]
        tbl = pa.table(
            {"doc_id": batch["doc_id"], "head": pa.array(heads, pa.string())}
        )
        hi, lo, _valid = md5_hash128_batch(tbl, "head")
        return pa.table(
            {"doc_id": tbl["doc_id"], "h_hi": pa.array(hi), "h_lo": pa.array(lo)}
        )

    banded = corpus.map_batches(head_rows, batch_format="pyarrow")
    pairs = _candidate_pairs(banded, ["h_hi", "h_lo"])
    if pairs.empty:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    texts = _texts_for(
        corpus, np.unique(pairs[["a", "b"]].to_numpy()), "doc_id", "text"
    )
    shingles = {
        i: set(word_shingles(format_manuscript(t), 3).tolist())
        for i, t in texts.items()
    }
    out_a: list[int] = []
    out_b: list[int] = []
    for p, q in zip(pairs["a"], pairs["b"]):
        sp, sq = shingles[p], shingles[q]
        a, b = (p, q) if (len(sp), p) < (len(sq), q) else (q, p)
        sa, sb = shingles[a], shingles[b]
        if len(sa & sb) / len(sa) >= _TEASER_CONTAIN:
            out_a.append(int(a))
            out_b.append(int(b))
    return pa.table(
        {"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64())}
    )


@register(
    "host_topk_docs",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, n_chars, {_host_sql("doc_id")} AS host,
               row_number() OVER (
                   PARTITION BY {_host_sql("doc_id")}
                   ORDER BY n_chars DESC, doc_id
               ) AS r
        FROM documents
    )
    SELECT host, doc_id, n_chars, CAST(r AS BIGINT) AS rank
    FROM ranked WHERE r <= 3
    """,
)
def host_topk_docs(sf_dir: str, plan: str = "auto"):
    """Per-host top-3 documents by length — grouped top-k WITHOUT a
    global sort or per-host map_groups: each batch keeps at most 3 rows
    per host (vectorized lexsort + segment-boundary take), so the merge
    input is bounded by 3 x hosts x blocks regardless of corpus size and
    hot hosts (mega.example.org holds 30% of rows) are defused before
    any exchange. The merge itself is two-plan: driver pandas under the
    row limit, else one groupby-free repeat of the same partial pass
    after a hash repartition on host."""
    import pandas as pd

    from sciscraper_ray.pipelines.plan import (
        DRIVER_PLAN_LIMIT,
        driver_frame,
        resolve_plan,
    )
    from sciscraper_ray.sources.page_synth import host_for

    K = 3

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n = batch["n_chars"].to_numpy(zero_copy_only=False)
        hosts = np.array([host_for(int(i)) for i in ids])
        order = np.lexsort((ids, -n, hosts))
        h_s = hosts[order]
        starts = np.flatnonzero(np.r_[True, h_s[1:] != h_s[:-1]])
        pos = np.arange(len(h_s)) - np.repeat(starts, np.diff(np.r_[starts, len(h_s)]))
        keep = order[pos < K]
        return pa.table(
            {
                "host": pa.array(hosts[keep]),
                "doc_id": pa.array(ids[keep]),
                "n_chars": pa.array(n[keep]),
            }
        )

    partials = _docs(sf_dir, columns=("doc_id", "n_chars")).map_batches(
        partial_topk, batch_format="pyarrow"
    )
    mode, partials = resolve_plan(partials, plan)
    if mode == "driver":
        df = driver_frame(partials, DRIVER_PLAN_LIMIT, "host_topk_docs")
    else:
        # beyond driver memory: ONE bounded-cardinality exchange — hosts
        # hash into 32 buckets (the window family's bucket-then-vectorize
        # shape: group count is O(buckets), not O(hosts)), each bucket's
        # partial rows merge with the identical vectorized take
        def tag_bucket(b: pa.Table) -> pa.Table:
            import zlib

            # process-independent hash: Python's hash() is salted per
            # worker, which would split one host across buckets
            h = np.array(
                [zlib.crc32(x.encode()) for x in b["host"].to_pylist()],
                np.int64,
            )
            return b.append_column("__bucket", pa.array(h % 32))

        reduced = (
            partials.map_batches(tag_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(
                lambda t: partial_topk_merge(t.drop_columns(["__bucket"])),
                batch_format="pyarrow",
            )
        )
        df = reduced.to_pandas()  # bounded: k x buckets merged top-k
    df = df.sort_values(
        ["host", "n_chars", "doc_id"], ascending=[True, False, True]
    )
    df["rank"] = df.groupby("host").cumcount() + 1
    out = df[df["rank"] <= K].reset_index(drop=True)
    return out[["host", "doc_id", "n_chars", "rank"]]


def partial_topk_merge(batch: pa.Table) -> pa.Table:
    """host_topk_docs' shuffle-plan reducer: same vectorized per-host
    take over co-located partial rows (host column already present)."""
    hosts = batch["host"].to_numpy(zero_copy_only=False)
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    n = batch["n_chars"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -n, hosts))
    h_s = hosts[order]
    starts = np.flatnonzero(np.r_[True, h_s[1:] != h_s[:-1]])
    pos = np.arange(len(h_s)) - np.repeat(starts, np.diff(np.r_[starts, len(h_s)]))
    keep = order[pos < 3]
    return pa.table(
        {
            "host": pa.array(hosts[keep]),
            "doc_id": pa.array(ids[keep]),
            "n_chars": pa.array(n[keep]),
        }
    )


@register(
    "page_meta_extract",
    oracle="""
    SELECT doc_id,
           'Document ' || CAST(doc_id AS VARCHAR) AS title,
           lang AS html_lang
    FROM documents
    """,
)
def page_meta_extract(sf_dir: str):
    """Page-metadata harvest through the DOM engine (the trafilatura-shaped
    metadata pull that runs beside main-content extraction): <title> text
    and the <html lang> attribute, one parse per page, zero shuffle. The
    fixture pages carry both deterministically so the oracle rebuilds the
    table arithmetically."""
    from sciscraper_ray.sources.page_synth import render_html
    from sciscraper_ray.stages.dom_select import select_attr, select_text

    def harvest(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        titles: list[str] = []
        langs: list[str] = []
        for i, t, lg in zip(
            ids, batch["text"].to_pylist(), batch["lang"].to_pylist()
        ):
            page = render_html(int(i), t, lg).decode()
            titles.append(select_text(page, "title") or "")
            langs.append(select_attr(page, "html", "lang") or "")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "title": pa.array(titles, pa.string()),
                "html_lang": pa.array(langs, pa.string()),
            }
        )

    return _docs(sf_dir, columns=("doc_id", "text", "lang")).map_batches(
        harvest, batch_format="pyarrow"
    )


@register(
    "doc_length_median_by_lang",
    oracle="""
    WITH hist AS (
        SELECT lang, n_chars AS v, count(*) AS c
        FROM documents GROUP BY lang, n_chars
    ),
    cum AS (
        SELECT lang, v,
               SUM(c) OVER (PARTITION BY lang ORDER BY v) AS cum,
               SUM(c) OVER (PARTITION BY lang) AS n
        FROM hist
    ),
    med AS (
        SELECT lang, min(v) AS m FROM cum
        WHERE cum >= CAST(ceil(n * 0.5) AS BIGINT)
        GROUP BY lang
    )
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d JOIN med USING (lang)
    WHERE d.n_chars >= med.m
    """,
)
def doc_length_median_by_lang(sf_dir: str):
    """GROUP-RELATIVE quality gate: keep documents at or above their own
    language's exact median length — the per-language thresholding a
    multilingual corpus needs (a global cut silently drops whole
    languages whose documents run short). Exact grouped medians from
    (lang, length, count) histogram partials — distinct (lang, length)
    pairs ≪ corpus, merged driver-side like doc_iqr_filter — then the
    per-lang thresholds broadcast into one zero-shuffle stream filter."""
    src = _docs(sf_dir, columns=("doc_id", "lang", "n_chars"))

    def hist(batch: pa.Table) -> pa.Table:
        df = (
            batch.select(["lang", "n_chars"])
            .to_pandas()  # bounded: worker-side batch conversion
            .value_counts()
            .rename("c")
            .reset_index()
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    h = (
        src.map_batches(hist, batch_format="pyarrow")
        .to_pandas()  # bounded: |langs| x |distinct lengths|
        .groupby(["lang", "n_chars"], as_index=False)["c"]
        .sum()
        .sort_values(["lang", "n_chars"])
    )
    thresholds: dict[str, int] = {}
    for lang, grp in h.groupby("lang"):
        n = int(grp["c"].sum())
        cum = grp["c"].cumsum().to_numpy()
        vals = grp["n_chars"].to_numpy()
        thresholds[lang] = int(vals[np.searchsorted(cum, -(-n // 2))])

    def filt(batch: pa.Table) -> pa.Table:
        v = batch["n_chars"].to_numpy(zero_copy_only=False)
        m = np.array([thresholds[lg] for lg in batch["lang"].to_pylist()])
        return batch.filter(pa.array(v >= m))

    return src.map_batches(filt, batch_format="pyarrow")


_CRAWL_BUDGET = 40  # fetches per host per politeness wave
_CRAWL_RANGE_W = 256  # doc-id range width per rank bucket


@register(
    "crawl_schedule_waves",
    oracle=f"""
    SELECT doc_id, {_host_sql("doc_id")} AS host,
           CAST((row_number() OVER (
                    PARTITION BY {_host_sql("doc_id")} ORDER BY doc_id
                ) - 1) // {_CRAWL_BUDGET} AS BIGINT) AS wave
    FROM documents
    """,
)
def crawl_schedule_waves(sf_dir: str):
    """Politeness-window crawl scheduling: every URL gets its host-local
    fetch rank (priority = doc_id order) and wave = rank // budget — the
    frontier partitioner that caps per-host request rates. Exact ranks
    WITHOUT a global sort, distributed-rank by offset composition:

      pass 1  per-batch (host, id-range-bucket, count) histogram partials
              -> driver exclusive prefix sums (rows = hosts x ranges seen,
              ≪ corpus) give each (host, range)'s starting rank;
      pass 2  one bounded-cardinality exchange co-locates each (host,
              range) — hash into 32 groups, the window family's
              bucket-then-vectorize shape — then segment-relative
              positions (lexsort + np.diff boundaries) add to the
              broadcast offsets.

    Skew-safe by construction: mega.example.org (30% of the corpus)
    splits across id ranges, so no single group concentrates."""
    import zlib

    import ray

    from sciscraper_ray.sources.page_synth import host_for

    src = _docs(sf_dir, columns=("doc_id",))

    def hist(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        hosts = np.array([host_for(int(i)) for i in ids])
        rng = ids // _CRAWL_RANGE_W
        import pandas as pd

        vc = (
            pd.DataFrame({"host": hosts, "rng": rng})
            .value_counts()
            .rename("c")
            .reset_index()
        )
        return pa.Table.from_pandas(vc, preserve_index=False)

    h = (
        src.map_batches(hist, batch_format="pyarrow")
        .to_pandas()  # bounded: |hosts| x |ranges|
        .groupby(["host", "rng"], as_index=False)["c"]
        .sum()
        .sort_values(["host", "rng"])
    )
    cum = h.groupby("host")["c"].cumsum() - h["c"]
    offsets = {
        (r.host, int(r.rng)): int(o)
        for r, o in zip(h.itertuples(index=False), cum)
    }
    offsets_ref = ray.put(offsets)

    def tag(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        hosts = np.array([host_for(int(i)) for i in ids])
        crc = np.array([zlib.crc32(x.encode()) for x in hosts], np.int64)
        grp = (crc * np.int64(1_000_003) + ids // _CRAWL_RANGE_W) % 32
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "host": pa.array(hosts),
                "__grp": pa.array(grp),
            }
        )

    def rank_group(tbl: pa.Table) -> pa.Table:
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        hosts = np.asarray(tbl["host"].to_pylist())
        rng = ids // _CRAWL_RANGE_W
        order = np.lexsort((ids, rng, hosts))
        h_s, r_s, i_s = hosts[order], rng[order], ids[order]
        new_seg = np.r_[True, (h_s[1:] != h_s[:-1]) | (r_s[1:] != r_s[:-1])]
        starts = np.flatnonzero(new_seg)
        pos = np.arange(len(i_s)) - np.repeat(
            starts, np.diff(np.r_[starts, len(i_s)])
        )
        offs = ray.get(offsets_ref)
        off = np.array(
            [offs[(h, int(r))] for h, r in zip(h_s[starts], r_s[starts])],
            np.int64,
        )
        rank = np.repeat(off, np.diff(np.r_[starts, len(i_s)])) + pos
        return pa.table(
            {
                "doc_id": pa.array(i_s),
                "host": pa.array(h_s),
                "wave": pa.array(rank // _CRAWL_BUDGET),
            }
        )

    return (
        src.map_batches(tag, batch_format="pyarrow")
        .groupby("__grp")
        .map_groups(
            lambda t: rank_group(t.drop_columns(["__grp"])),
            batch_format="pyarrow",
        )
    )


@register(
    "host_triangle_count",
    oracle=f"""
    WITH links AS (
        SELECT doc_id, unnest({_REF_TARGETS_SQL}) AS t FROM documents
    ),
    e0 AS (
        SELECT DISTINCT {_host_sql("doc_id")} AS u, {_host_sql("t")} AS v
        FROM links WHERE {_host_sql("doc_id")} <> {_host_sql("t")}
    ),
    e AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM e0)
    SELECT CAST(count(*) AS BIGINT) AS triangles
    FROM e x
    JOIN e y ON y.a = x.b
    JOIN e z ON z.a = x.a AND z.b = y.b
    """,
)
def host_triangle_count(sf_dir: str):
    """Triangle count on the undirected host link graph — the graph-health
    statistic (clustering) computed after page_link_graph's harvest. The
    corpus-sized link stream collapses to DISTINCT undirected host edges
    via per-batch dedup partials + one groupby (edge table ≪ corpus — the
    declared assumption for a host-level graph; a node-level triangle
    count would need degree-ordered wedge joins instead), then the
    triangle join runs vectorized on the driver-resident edge list."""
    import pandas as pd

    from sciscraper_ray.sources.page_synth import host_for, ref_targets

    def edge_partials(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        seen: set[tuple[str, str]] = set()
        for i in ids:
            s = host_for(int(i))
            for t in ref_targets(int(i)):
                d = host_for(t)
                if s != d:
                    seen.add((min(s, d), max(s, d)))
        a, b = zip(*sorted(seen)) if seen else ((), ())
        return pa.table(
            {"a": pa.array(list(a), pa.string()), "b": pa.array(list(b), pa.string())}
        )

    edges = (
        _docs(sf_dir, columns=("doc_id",))
        .map_batches(edge_partials, batch_format="pyarrow")
        .to_pandas()  # bounded: host-level edge set
        .drop_duplicates(ignore_index=True)
    )
    em = set(zip(edges["a"], edges["b"]))
    # x=(a,b), y=(b,c): closing edge (a,c) — vectorized merge then set probe
    m = edges.merge(edges, left_on="b", right_on="a", suffixes=("_x", "_y"))
    n = sum(
        1
        for ax, by in zip(m["a_x"], m["b_y"])
        if (ax, by) in em
    )
    return pa.table({"triangles": pa.array([n], pa.int64())})


@register(
    "top_tokens_by_lang",
    oracle=f"""
    WITH toks AS (
        SELECT lang, unnest({_SQL_TOKENS}) AS token FROM documents
    ),
    counts AS (
        SELECT lang, token, count(*) AS cnt FROM toks GROUP BY lang, token
    ),
    ranked AS (
        SELECT lang, token, cnt,
               row_number() OVER (
                   PARTITION BY lang ORDER BY cnt DESC, token
               ) AS r
        FROM counts
    )
    SELECT lang, token, cnt, CAST(r AS BIGINT) AS rank
    FROM ranked WHERE r <= 5
    """,
)
def top_tokens_by_lang(sf_dir: str, plan: str = "auto"):
    """GROUPED top-k aggregate: the 5 most frequent tokens per language —
    the per-stratum vocabulary summary a multilingual corpus report needs.
    Per-batch (lang, token) count partials (vocabulary x langs x batches
    rows, Heaps'-law small) through the shared two-plan merge; the final
    per-lang take is the same vectorized lexsort + segment-boundary
    pattern as host_topk_docs."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from sciscraper_ray.kernels.tokenize import tokenize_column
    from sciscraper_ray.pipelines.plan import (
        DRIVER_PLAN_LIMIT,
        driver_frame,
        resolve_plan,
    )

    def partial(batch: pa.Table) -> pa.Table:
        tokens = tokenize_column(batch["text"])
        if isinstance(tokens, pa.ChunkedArray):
            tokens = tokens.combine_chunks()
        flat = pc.list_flatten(tokens)
        parents = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
        langs = np.asarray(batch["lang"].to_pylist())[parents]
        df = (
            pd.DataFrame({"lang": langs, "token": flat.to_pylist()})
            .value_counts()
            .rename("cnt")
            .reset_index()
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    partials = _docs(sf_dir, columns=("lang", "text")).map_batches(
        partial, batch_format="pyarrow"
    )
    mode, partials = resolve_plan(partials, plan)
    if mode == "driver":
        df = driver_frame(partials, DRIVER_PLAN_LIMIT, "top_tokens_by_lang")
        agg = df.groupby(["lang", "token"], as_index=False)["cnt"].sum()
    else:
        agg = (
            partials.groupby(["lang", "token"])
            .aggregate(Sum(on="cnt", alias_name="cnt"))
            .to_pandas()  # bounded: vocab x langs post-aggregate
        )
    agg = agg.sort_values(["lang", "cnt", "token"], ascending=[True, False, True])
    agg["rank"] = agg.groupby("lang").cumcount() + 1
    out = agg[agg["rank"] <= 5].reset_index(drop=True)
    return out[["lang", "token", "cnt", "rank"]]


@register(
    "doc_lang_mismatch",
    oracle=f"""
    SELECT p.doc_id, d.lang, p.lang_pred
    FROM ({_lang_sql()}) p JOIN documents d USING (doc_id)
    WHERE p.lang_pred <> d.lang
    """,
)
def doc_lang_mismatch(sf_dir: str):
    """Crawl-QA mismatch report: documents whose content-based language ID
    disagrees with the page's DECLARED lang attribute — the wrong-langtag
    detector every multilingual crawl runs before per-lang routing (declared
    tags are wrong or missing on a large fraction of the real web). One
    vectorized pass over (doc_id, text, lang); the declared column rides
    along and the filter is an Arrow kernel — zero shuffle."""
    def mismatch(batch: pa.Table) -> pa.Table:
        out = lang_id_batch(batch)
        keep = pc.invert(pc.equal(out["lang_pred"], out["lang"]))
        return out.filter(keep).select(["doc_id", "lang", "lang_pred"])

    return _docs(sf_dir, columns=("doc_id", "text", "lang")).map_batches(
        mismatch, batch_format="pyarrow"
    )




_GD_ETA = 0.5
_GD_SIGMA = "1/(1+exp(-({z})))"


def _gd_grad_sql(p_expr: str, src: str) -> str:
    """One full-batch gradient CTE body: avg((p - y) * x_k) given the
    prediction expression and the weight-CTE to join."""
    return f"""
        SELECT sum(({p_expr} - y) * x1) / max(n.n) AS ga,
               sum(({p_expr} - y) * x2) / max(n.n) AS gb,
               sum(({p_expr} - y))      / max(n.n) AS gc
        FROM f{src}, n
    """


@register(
    "lr_train_gd",
    oracle=f"""
    WITH f AS (
        SELECT CAST(n_chars AS DOUBLE) / 1000 AS x1,
               CAST(len({_SQL_TOKENS}) AS DOUBLE) / 100 AS x2,
               CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        FROM documents
    ), n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM f),
    g1 AS ({_gd_grad_sql("0.5", "")}),
    w1 AS (SELECT -{_GD_ETA}*ga AS wa, -{_GD_ETA}*gb AS wb, -{_GD_ETA}*gc AS wc
           FROM g1),
    g2 AS ({_gd_grad_sql(_GD_SIGMA.format(z="w1.wa*x1 + w1.wb*x2 + w1.wc"), ", w1")}),
    w2 AS (SELECT w1.wa - {_GD_ETA}*g2.ga AS wa, w1.wb - {_GD_ETA}*g2.gb AS wb,
                  w1.wc - {_GD_ETA}*g2.gc AS wc FROM w1, g2),
    g3 AS ({_gd_grad_sql(_GD_SIGMA.format(z="w2.wa*x1 + w2.wb*x2 + w2.wc"), ", w2")}),
    w3 AS (SELECT w2.wa - {_GD_ETA}*g3.ga AS wa, w2.wb - {_GD_ETA}*g3.gb AS wb,
                  w2.wc - {_GD_ETA}*g3.gc AS wc FROM w2, g3),
    acc AS (
        SELECT avg(CASE WHEN (CASE WHEN w3.wa*x1 + w3.wb*x2 + w3.wc >= 0
                                   THEN 1.0 ELSE 0.0 END) = y
                        THEN 1.0 ELSE 0.0 END) AS acc
        FROM f, w3
    )
    SELECT round(w3.wa, 6) AS w_len, round(w3.wb, 6) AS w_tok,
           round(w3.wc, 6) AS w_bias, round(acc.acc, 6) AS train_acc
    FROM w3, acc
    """,
)
def lr_train_gd(sf_dir: str):
    """Distributed quality-classifier TRAINING (companion to the inference
    op doc_lr_score): full-batch logistic-regression gradient descent,
    3 iterations, label = (lang = 'en'), features = (n_chars/1000,
    token_count/100, bias). Each iteration is one streaming pass that
    reduces per-batch PARTIAL gradient sums (one 4-value row per batch;
    the exchange never grows with the corpus), the driver applies the
     3-float weight update, and the next pass closes over the new
    weights — the canonical data-parallel SGD/GD shape (parameters
    broadcast, gradients tree-reduced) at Dataset granularity. A final
    pass measures training accuracy with the sign rule. The oracle
    unrolls all three iterations as chained CTEs, so the driver checks
    the whole optimization trajectory, not just a plausible endpoint."""

    def feats(batch: pa.Table):
        txt = pc.fill_null(batch["text"], "")
        ntok = pc.add(
            pc.count_substring(pc.utf8_trim(txt, " "), " "), 1
        ).to_numpy(zero_copy_only=False)
        x1 = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64) / 1000
        x2 = ntok.astype(np.float64) / 100
        y = pc.equal(batch["lang"], "en").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        return x1, x2, y

    def grad_pass(w):
        def partial(batch: pa.Table) -> pa.Table:
            x1, x2, y = feats(batch)
            if w is None:
                p = np.full(len(y), 0.5)
            else:
                p = 1.0 / (1.0 + np.exp(-(w[0] * x1 + w[1] * x2 + w[2])))
            d = p - y
            return pa.table(
                {
                    "ga": pa.array([float((d * x1).sum())]),
                    "gb": pa.array([float((d * x2).sum())]),
                    "gc": pa.array([float(d.sum())]),
                    "cnt": pa.array([len(y)]),
                }
            )

        agg = (
            _docs(sf_dir, columns=("text", "lang", "n_chars"))
            .map_batches(partial, batch_format="pyarrow")
            .to_pandas()  # bounded: one row per batch
            .sum()
        )
        n = float(agg["cnt"])
        return np.array([agg["ga"], agg["gb"], agg["gc"]]) / n

    w = None
    for _ in range(3):
        g = grad_pass(w)
        w = (np.zeros(3) if w is None else w) - _GD_ETA * g

    def acc_partial(batch: pa.Table) -> pa.Table:
        x1, x2, y = feats(batch)
        pred = (w[0] * x1 + w[1] * x2 + w[2] >= 0).astype(np.float64)
        return pa.table(
            {
                "correct": pa.array([float((pred == y).sum())]),
                "cnt": pa.array([len(y)]),
            }
        )

    agg = (
        _docs(sf_dir, columns=("text", "lang", "n_chars"))
        .map_batches(acc_partial, batch_format="pyarrow")
        .to_pandas()  # bounded: one scalar row per block
        .sum()
    )
    return pa.table(
        {
            "w_len": pa.array([round(float(w[0]), 6)]),
            "w_tok": pa.array([round(float(w[1]), 6)]),
            "w_bias": pa.array([round(float(w[2]), 6)]),
            "train_acc": pa.array([round(float(agg["correct"] / agg["cnt"]), 6)]),
        }
    )


@register(
    "doc_bigram_lm_ppl",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               unnest({_SQL_TOKENS}) AS token,
               unnest(range(len({_SQL_TOKENS}))) AS ord
        FROM documents
    ), uni AS (
        SELECT token, count(*) AS c1 FROM toks GROUP BY token
    ), vsz AS (
        SELECT count(*) AS v FROM uni
    ), bg AS (
        SELECT a.doc_id, a.token AS w1, b.token AS w2
        FROM toks a JOIN toks b
          ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
    ), bgc AS (
        SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2
    ), terms AS (
        SELECT bg.doc_id,
               ln((bgc.c2 + 1.0) / (uni.c1 + vsz.v)) AS t
        FROM bg
        JOIN bgc USING (w1, w2)
        JOIN uni ON uni.token = bg.w1
        CROSS JOIN vsz
    ), agg AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               round(sum(t) / count(*), 6) AS avg_logprob
        FROM terms GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(agg.n_bigrams, 0) AS n_bigrams,
           agg.avg_logprob
    FROM documents d LEFT JOIN agg USING (doc_id)
    """,
)
def doc_bigram_lm_ppl(sf_dir: str):
    """Bigram-LM log-likelihood scoring — the CCNet/KenLM perplexity
    filter shape one order up from doc_unigram_freq_score: train pass
    counts global unigrams and bigrams (per-batch value-count partials ->
    vocabulary-sized groupby — Heaps'-law bounded; in production the
    trained LM is the broadcast artifact, exactly as KenLM's binary is),
    the two count tables broadcast once via ray.put; score pass maps each
    document's adjacent token pairs through add-one smoothing
    P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V) and emits the per-token average
    log-probability (the log-domain perplexity equivalent CCNet buckets
    on). Term sums accumulate per doc over <=100 terms; both engines
    round to 6 decimals, burying the <=1e-13 libm/associativity spread.
    Zero shuffle in the score pass."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    from sciscraper_ray.kernels.tokenize import tokenize_column
    from sciscraper_ray.pipelines.queries.dedup import _ngram_positions

    def uni_partial(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(tokenize_column(batch["text"]))
        vc = flat.value_counts()
        return pa.table({"token": vc.field("values"), "cnt": vc.field("counts")})

    def bg_partial(batch: pa.Table) -> pa.Table:
        _, bgs = _ngram_positions(batch, 2)
        vc = bgs.value_counts()
        return pa.table({"bg": vc.field("values"), "cnt": vc.field("counts")})

    uni = (
        _docs(sf_dir)
        .map_batches(uni_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum(on="cnt", alias_name="cnt"))
        .to_pandas()  # bounded: vocab LM table (broadcast side)
    )
    bgc = (
        _docs(sf_dir)
        .map_batches(bg_partial, batch_format="pyarrow")
        .groupby("bg")
        .aggregate(Sum(on="cnt", alias_name="cnt"))
        .to_pandas()  # bounded: bigram LM table (broadcast side; must fit to ray.put)
    )
    vocab_size = len(uni)
    lm_ref = ray.put(
        (
            pd.Series(uni["cnt"].to_numpy(np.int64), index=uni["token"]),
            pd.Series(bgc["cnt"].to_numpy(np.int64), index=bgc["bg"]),
            vocab_size,
        )
    )

    def score(batch: pa.Table) -> pa.Table:
        uni_lut, bg_lut, v = ray.get(lm_ref)
        pos, bgs = _ngram_positions(batch, 2)
        n = batch.num_rows
        n_bg = np.zeros(n, np.int64)
        tsum = np.zeros(n, np.float64)
        if len(pos):
            bgs_pd = pd.Series(bgs.to_pandas())  # bounded: worker-side column conversion
            c2 = bgs_pd.map(bg_lut).to_numpy(np.int64)
            w1 = bgs_pd.str.split(" ").str[0]
            c1 = w1.map(uni_lut).to_numpy(np.int64)
            terms = np.log((c2 + 1.0) / (c1 + v))
            np.add.at(n_bg, pos, 1)
            np.add.at(tsum, pos, terms)
        avg = np.full(n, np.nan)
        nz = n_bg > 0
        avg[nz] = np.round(tsum[nz] / n_bg[nz], 6)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bigrams": pa.array(n_bg, pa.int64()),
                "avg_logprob": pa.array(avg, pa.float64()),
            }
        )

    return _docs(sf_dir).map_batches(score, batch_format="pyarrow")


# --------------------------------------------------------------------------
# KWIC concordance snippets — the keyword-in-context view a retrieval UI
# renders for each hit (Luhn 1960); one row per occurrence with clamped
# two-token windows on each side.
# --------------------------------------------------------------------------

_KWIC_TERM = "table"


@register(
    "doc_snippets",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
    ), pos AS (
        SELECT doc_id, toks, unnest(range(len(toks))) AS i FROM t
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS pos,
           array_to_string(toks[greatest(i - 1, 1):i], ' ') AS left_ctx,
           array_to_string(toks[i + 2:least(i + 3, len(toks))], ' ')
               AS right_ctx
    FROM pos WHERE toks[i + 1] = '{_KWIC_TERM}'
    """,
)
def doc_snippets(sf_dir: str):
    """Keyword-in-context extraction, fully vectorized: one tokenize pass,
    the match mask is a single Arrow equality over the flat token buffer,
    and each context token is one clamped gather (take with null indices
    at document boundaries) — variable-width windows come from if_else
    composition, never a per-hit Python loop. Zero shuffle: every row of
    output is produced in the block that read its document. Boundary
    semantics match the oracle's 1-indexed list slices exactly (empty
    window -> NULL on both engines)."""
    from sciscraper_ray.kernels.tokenize import tokenize_column

    def snippets(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch["text"])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offs = np.asarray(toks.offsets, dtype=np.int64)
        starts, ends = offs[:-1], offs[1:]
        parents = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        hit = pc.equal(flat, _KWIC_TERM).to_numpy(zero_copy_only=False)
        g = np.nonzero(hit)[0]
        doc_idx = parents[g]
        st, en = starts[doc_idx], ends[doc_idx]

        def gather(idx: np.ndarray, lo: np.ndarray, hi: np.ndarray):
            ok = (idx >= lo) & (idx < hi)
            ia = pa.array(
                np.where(ok, idx, 0), pa.int64(), mask=~ok
            )
            return flat.take(ia)

        tm2 = gather(g - 2, st, en)
        tm1 = gather(g - 1, st, en)
        tp1 = gather(g + 1, st, en)
        tp2 = gather(g + 2, st, en)
        left = pc.if_else(
            pc.is_valid(tm2),
            pc.binary_join_element_wise(tm2, tm1, " "),
            tm1,
        )
        right = pc.if_else(
            pc.is_valid(tp2),
            pc.binary_join_element_wise(tp1, tp2, " "),
            tp1,
        )
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)[doc_idx]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "pos": pa.array(g - st, pa.int64()),
                "left_ctx": left,
                "right_ctx": right,
            }
        )

    return _docs(sf_dir).map_batches(snippets, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Degree assortativity: do popular pages link to popular pages? Pearson r
# of (indeg(src), indeg(dst)) across directed edges — one constant-size
# exchange after the degree tally.
# --------------------------------------------------------------------------


@register(
    "link_degree_assortativity",
    oracle=f"""
    WITH l AS (
        SELECT doc_id AS src, unnest({_REF_TARGETS_SQL}) AS dst
        FROM documents
    ), ind AS (
        SELECT dst AS node, count(*) AS d FROM l GROUP BY dst
    ), e AS (
        SELECT coalesce(i1.d, 0) AS dx, i2.d AS dy
        FROM l LEFT JOIN ind i1 ON l.src = i1.node
               JOIN ind i2 ON l.dst = i2.node
    )
    SELECT CAST(count(*) AS BIGINT) AS n_edges,
           round(CAST(count(*) * sum(dx * dy) - sum(dx) * sum(dy) AS DOUBLE)
                 / sqrt(CAST(count(*) * sum(dx * dx) - sum(dx) * sum(dx)
                             AS DOUBLE)
                        * CAST(count(*) * sum(dy * dy) - sum(dy) * sum(dy)
                               AS DOUBLE)), 6) AS assortativity
    FROM e
    """,
)
def link_degree_assortativity(sf_dir: str):
    """In-degree assortativity of the harvested doc-level link graph:
    Pearson r of (indeg(src), indeg(dst)) over directed edges (parallel
    edges kept, like the degree sequence itself). The in-degree table is
    bounded by the DESTINATION id space (the synthesizer's targets live
    in [0, 997) at every sf) so it broadcasts via one ray.put; wider dst
    spaces would swap the lookup for two bucketed_hash_join passes
    (stages/relational.py:140). Every edge batch reduces to ONE int64
    moment row — sums stay exact integers across engines, and only the
    final closed form (mirrored cast-to-double order) is floating."""
    import ray
    from ray.data.aggregate import Sum

    edges = _doc_edges(sf_dir).materialize()  # reused: degree pass + moments

    def ind_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("dst").aggregate([([], "count_all")])
        return g.rename_columns(["node", "d"])

    ind = (
        edges.map_batches(ind_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum(on="d", alias_name="d"))
        .to_pandas()  # bounded: dst id space
    )
    lut = np.zeros(int(ind["node"].max()) + 1, np.int64)
    lut[ind["node"].to_numpy()] = ind["d"].to_numpy()
    lut_ref = ray.put(lut)

    class Moments:
        def __init__(self):
            self.lut = ray.get(lut_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            src = b["src"].to_numpy(zero_copy_only=False)
            dst = b["dst"].to_numpy(zero_copy_only=False)
            dx = np.where(src < len(self.lut), self.lut[np.minimum(src, len(self.lut) - 1)], 0)
            dy = self.lut[dst]
            return pa.table(
                {
                    "n": pa.array([len(src)], pa.int64()),
                    "sx": pa.array([int(dx.sum())], pa.int64()),
                    "sy": pa.array([int(dy.sum())], pa.int64()),
                    "sxy": pa.array([int((dx * dy).sum())], pa.int64()),
                    "sxx": pa.array([int((dx * dx).sum())], pa.int64()),
                    "syy": pa.array([int((dy * dy).sum())], pa.int64()),
                }
            )

    m = (
        edges.map_batches(Moments, batch_format="pyarrow", concurrency=(1, 4))
        .to_pandas()  # bounded: one scalar row per block
        .sum()
    )
    n, sx, sy = int(m["n"]), int(m["sx"]), int(m["sy"])
    sxy, sxx, syy = int(m["sxy"]), int(m["sxx"]), int(m["syy"])
    num = float(n * sxy - sx * sy)
    den = np.sqrt(float(n * sxx - sx * sx) * float(n * syy - sy * sy))
    return pa.table(
        {
            "n_edges": pa.array([n], pa.int64()),
            "assortativity": pa.array([round(float(num / den), 6)], pa.float64()),
        }
    )


# --------------------------------------------------------------------------
# Per-node clustering coefficient via degree-ordered wedge joins — the
# node-level triangle plan host_triangle_count's docstring points at.
# --------------------------------------------------------------------------


@register(
    "node_clustering_coeff",
    oracle=f"""
    WITH l AS (
        SELECT doc_id AS s, unnest({_REF_TARGETS_SQL}) AS t FROM documents
    ), e AS (
        SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
        FROM l WHERE s <> t
    ), tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1
        JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ), tnodes AS (
        SELECT x AS node FROM tri UNION ALL
        SELECT y FROM tri UNION ALL
        SELECT z FROM tri
    ), tcount AS (
        SELECT node, count(*) AS t FROM tnodes GROUP BY node
    ), deg AS (
        SELECT node, count(*) AS d
        FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        GROUP BY node
    )
    SELECT deg.node, deg.d, coalesce(t.t, 0) AS triangles,
           CASE WHEN deg.d >= 2
                THEN round(2.0 * coalesce(t.t, 0) / (deg.d * (deg.d - 1)), 6)
                ELSE 0.0 END AS clustering
    FROM deg LEFT JOIN tcount t ON deg.node = t.node
    """,
)
def node_clustering_coeff(sf_dir: str, num_buckets: int = 16):
    """NODE-level local clustering coefficient — the degree-ordered wedge
    join host_triangle_count's docstring declares necessary once the
    graph outgrows a driver edge list. Plan (all exchanges bounded):
    (1) distinct undirected edges via the packed-int64 groupby
    (graph._dedup_edges); (2) degree tally; (3) orient every edge from
    its lower (degree, node) endpoint — each triangle then has exactly
    one vertex that out-sees the other two, so wedge volume is the
    O(m^1.5) arboricity bound instead of sum(deg^2) on hub-skewed
    graphs; (4) wedges generated bucket-locally (hash(u) % B groups, one
    vectorized pair expansion per bucket — no per-node Python); (5)
    wedge->edge closure via the bucketed co-partitioned hash join;
    (6) triangle corners explode to per-node counts. The degree table
    rides along as a broadcast here (node space bounded by the synth's
    target arithmetic); at open-web scale steps (3)/(6) swap it for two
    more bucketed joins — same plan shape."""
    import ray
    from ray.data.aggregate import Sum

    from sciscraper_ray.pipelines.graph import _dedup_edges
    from sciscraper_ray.stages.relational import bucketed_hash_join

    raw = _doc_edges(sf_dir)

    def orient_minmax(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        t = b["dst"].to_numpy(zero_copy_only=False)
        keep = s != t
        s, t = s[keep], t[keep]
        return pa.table(
            {
                "a": pa.array(np.minimum(s, t), pa.int64()),
                "b": pa.array(np.maximum(s, t), pa.int64()),
            }
        )

    und = _dedup_edges(raw.map_batches(orient_minmax, batch_format="pyarrow"))
    und = und.materialize()  # reused: degrees, orientation, closure probe

    def deg_partial(b: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                b["a"].to_numpy(zero_copy_only=False),
                b["b"].to_numpy(zero_copy_only=False),
            ]
        )
        t = pa.table({"node": pa.array(nodes, pa.int64())})
        g = t.group_by("node").aggregate([([], "count_all")])
        return g.rename_columns(["node", "d"])

    deg = (
        und.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum(on="d", alias_name="d"))
        .to_pandas()  # bounded: node space (synth targets < 997)
        .sort_values("node", kind="stable")
    )
    dlut = np.zeros(int(deg["node"].max()) + 1, np.int64)
    dlut[deg["node"].to_numpy()] = deg["d"].to_numpy()
    dlut_ref = ray.put(dlut)

    class OrientByDegree:
        """(a,b) -> (u,v): u the lower endpoint in (degree, node) order,
        plus the wedge bucket id. Canonical closure key k = a<<32|b stays
        in NODE order to match the undirected edge set."""

        def __init__(self):
            self.d = ray.get(dlut_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            a = b["a"].to_numpy(zero_copy_only=False)
            bb = b["b"].to_numpy(zero_copy_only=False)
            da, db = self.d[a], self.d[bb]
            a_first = (da < db) | ((da == db) & (a < bb))
            u = np.where(a_first, a, bb)
            v = np.where(a_first, bb, a)
            return pa.table(
                {
                    "u": pa.array(u, pa.int64()),
                    "v": pa.array(v, pa.int64()),
                    "bucket": pa.array(
                        (u * 0x9E3779B9 & 0x7FFFFFFF) % num_buckets, pa.int64()
                    ),
                }
            )

    oriented = und.map_batches(
        OrientByDegree, batch_format="pyarrow", concurrency=(1, 4)
    )

    def wedges(g):
        import pandas as pd

        u = g["u"].to_numpy()
        v = g["v"].to_numpy()
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        # segment boundaries per u; all i<j pairs inside each segment
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        seg_end = np.repeat(ends, ends - starts)
        pos = np.arange(len(u))
        reps = seg_end - pos - 1
        total = int(reps.sum())
        if total == 0:
            return pd.DataFrame(
                {"wu": [], "wv": [], "ww": [], "k": []}
            ).astype(np.int64)
        left = np.repeat(pos, reps)
        offs = np.concatenate(([0], np.cumsum(reps)[:-1]))
        right = left + (np.arange(total) - np.repeat(offs, reps)) + 1
        wv, ww = v[left], v[right]
        lo, hi = np.minimum(wv, ww), np.maximum(wv, ww)
        return pd.DataFrame(
            {
                "wu": u[left],
                "wv": lo,
                "ww": hi,
                "k": (lo << 32) | hi,
            }
        )

    wedge_ds = oriented.groupby("bucket").map_groups(
        wedges, batch_format="pandas"
    )

    def edge_keys(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        return pa.table({"ek": pa.array((a << 32) | bb, pa.int64())})

    closed = bucketed_hash_join(
        wedge_ds,
        und.map_batches(edge_keys, batch_format="pyarrow"),
        left_on="k",
        right_on="ek",
    )

    def corner_partial(b: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                b["wu"].to_numpy(zero_copy_only=False),
                b["wv"].to_numpy(zero_copy_only=False),
                b["ww"].to_numpy(zero_copy_only=False),
            ]
        )
        t = pa.table({"node": pa.array(nodes, pa.int64())})
        g = t.group_by("node").aggregate([([], "count_all")])
        return g.rename_columns(["node", "t"])

    tri = (
        closed.map_batches(corner_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum(on="t", alias_name="t"))
        .to_pandas()  # bounded: node id space (synth targets < 997)
    )
    out = deg.merge(tri, on="node", how="left")
    t = out["t"].fillna(0).to_numpy(np.int64)
    d = out["d"].to_numpy(np.int64)
    coeff = np.where(d >= 2, np.round(2.0 * t / (d * (d - 1)), 6), 0.0)
    return pa.table(
        {
            "node": pa.array(out["node"].to_numpy(), pa.int64()),
            "d": pa.array(d, pa.int64()),
            "triangles": pa.array(t, pa.int64()),
            "clustering": pa.array(coeff, pa.float64()),
        }
    )


# --------------------------------------------------------------------------
# Bibliographic coupling: page pairs sharing a reference target — the
# co-citation neighbor table, built on the shared pair-expansion kernel.
# --------------------------------------------------------------------------


@register(
    "doc_cocitation_pairs",
    oracle=f"""
    WITH l AS (
        SELECT DISTINCT doc_id AS src, unnest({_REF_TARGETS_SQL}) AS dst
        FROM documents
    )
    SELECT a.src AS doc_a, b.src AS doc_b, count(*) AS shared_refs
    FROM l a JOIN l b ON a.dst = b.dst AND a.src < b.src
    GROUP BY doc_a, doc_b
    ORDER BY shared_refs DESC, doc_a ASC, doc_b ASC
    LIMIT 50
    """,
)
def doc_cocitation_pairs(sf_dir: str, num_buckets: int = 16):
    """Bibliographic coupling: top page pairs by number of SHARED
    reference targets. Distinct (src, dst) links bucket by hash(dst) % B
    and expand to per-target citing-pairs with the vectorized segment
    kernel (same as basket_part_pairs); hub targets bound the blow-up
    as sum(indeg^2) — the documented skew risk, mitigated at open-web
    scale by an indeg cap on the expansion (a target cited by millions
    contributes no usable coupling signal)."""
    import ray.data
    from ray.data.aggregate import Sum

    links = _doc_edges(sf_dir)

    def dedup_partial(b: pa.Table) -> pa.Table:
        return b.group_by(["src", "dst"]).aggregate([])

    distinct = (
        links.map_batches(dedup_partial, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()
        .map_batches(
            lambda b: pa.table(
                {
                    "src": b["src"],
                    "dst": b["dst"],
                    "bucket": pa.array(
                        (
                            b["dst"].to_numpy(zero_copy_only=False)
                            * 0x9E3779B9
                            & 0x7FFFFFFF
                        )
                        % num_buckets,
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )

    def pairs(g):
        import pandas as pd

        d = g["dst"].to_numpy()
        s = g["src"].to_numpy()
        order = np.lexsort((s, d))
        d, s = d[order], s[order]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        ends = np.r_[starts[1:], len(d)]
        seg_end = np.repeat(ends, ends - starts)
        pos = np.arange(len(d))
        reps = seg_end - pos - 1
        total = int(reps.sum())
        if total == 0:
            return pd.DataFrame(
                {"doc_a": [], "doc_b": [], "c": []}
            ).astype(np.int64)
        left = np.repeat(pos, reps)
        offs = np.concatenate(([0], np.cumsum(reps)[:-1]))
        right = left + (np.arange(total) - np.repeat(offs, reps)) + 1
        return (
            pd.DataFrame({"doc_a": s[left], "doc_b": s[right]})
            .value_counts()
            .rename("c")
            .reset_index()
        )

    merged = (
        distinct.groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Sum(on="c", alias_name="shared_refs"))
    )
    return (
        merged.sort(
            key=["shared_refs", "doc_a", "doc_b"],
            descending=[True, False, False],
        )
        .limit(50)
    )


# --------------------------------------------------------------------------
# Bounded-round k-core peeling — the degeneracy pruning pass community
# detection and spam-farm analysis run before the expensive algorithms.
# --------------------------------------------------------------------------

_KCORE_K = 2
_KCORE_ROUNDS = 3


def _kcore_sql(k: int, rounds: int) -> str:
    body = f"""
    WITH l AS (
        SELECT doc_id AS s, unnest({_REF_TARGETS_SQL}) AS t FROM documents
    ), e0 AS (
        SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
        FROM l WHERE s <> t
    )"""
    for i in range(rounds):
        body += f""", d{i} AS (
        SELECT node, count(*) AS d
        FROM (SELECT a AS node FROM e{i} UNION ALL SELECT b FROM e{i})
        GROUP BY node
    ), a{i + 1} AS (SELECT node FROM d{i} WHERE d >= {k}
    ), e{i + 1} AS (
        SELECT a, b FROM e{i}
        WHERE a IN (SELECT node FROM a{i + 1})
          AND b IN (SELECT node FROM a{i + 1})
    )"""
    return body + f"""
    SELECT node, CAST(count(*) AS BIGINT) AS deg
    FROM (SELECT a AS node FROM e{rounds} UNION ALL SELECT b FROM e{rounds})
    GROUP BY node
    """


@register("graph_kcore_peel", oracle=_kcore_sql(_KCORE_K, _KCORE_ROUNDS))
def graph_kcore_peel(sf_dir: str):
    """Bounded-round k-core peeling (k=2, 3 rounds) over the undirected
    doc link graph: iteratively drop nodes of degree < k, keeping edges
    whose endpoints both survive; report the post-peel degree table.
    Fixed round count keeps the oracle expressible as unrolled CTEs
    (same policy as graph_pagerank / crawl_depth_from_seeds). Per round:
    degree tally is a per-batch Arrow partial + node-keyed groupby whose
    merged output is node-bounded (driver table here, exactly the
    node_clustering_coeff bound); the edge filter applies the alive set
    as a broadcast boolean LUT — one streaming pass over edges, no
    shuffle. At open-web node counts the LUT swaps for two bucketed
    semi-joins per round; the round structure is unchanged."""
    import ray
    from ray.data.aggregate import Sum

    from sciscraper_ray.pipelines.graph import _dedup_edges

    raw = _doc_edges(sf_dir)

    def orient(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        t = b["dst"].to_numpy(zero_copy_only=False)
        keep = s != t
        s, t = s[keep], t[keep]
        return pa.table(
            {
                "a": pa.array(np.minimum(s, t), pa.int64()),
                "b": pa.array(np.maximum(s, t), pa.int64()),
            }
        )

    edges = _dedup_edges(raw.map_batches(orient, batch_format="pyarrow"))
    edges = edges.materialize()  # rescanned once per peel round

    def deg_partial(b: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                b["a"].to_numpy(zero_copy_only=False),
                b["b"].to_numpy(zero_copy_only=False),
            ]
        )
        t = pa.table({"node": pa.array(nodes, pa.int64())})
        return (
            t.group_by("node")
            .aggregate([([], "count_all")])
            .rename_columns(["node", "d"])
        )

    def degrees(ds):
        return (
            ds.map_batches(deg_partial, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum(on="d", alias_name="deg"))
            .to_pandas()  # bounded: node space (synth targets < 997)
        )

    for _ in range(_KCORE_ROUNDS):
        deg = degrees(edges)
        alive = deg[deg["deg"] >= _KCORE_K]["node"].to_numpy()
        size = (
            int(max(alive.max() if len(alive) else 0, 1)) + 1
        )
        lut = np.zeros(size, bool)
        if len(alive):
            lut[alive] = True
        lut_ref = ray.put(lut)

        def alive_filter(b: pa.Table, _ref=lut_ref) -> pa.Table:
            lt = ray.get(_ref)
            a = b["a"].to_numpy(zero_copy_only=False)
            bb = b["b"].to_numpy(zero_copy_only=False)
            keep = (
                (a < len(lt))
                & (bb < len(lt))
                & lt[np.minimum(a, len(lt) - 1)]
                & lt[np.minimum(bb, len(lt) - 1)]
            )
            return b.filter(pa.array(keep))

        edges = edges.map_batches(
            alive_filter, batch_format="pyarrow"
        ).materialize()

    out = degrees(edges)
    out["deg"] = out["deg"].astype(np.int64)
    return pa.Table.from_pandas(
        out.sort_values("node").reset_index(drop=True), preserve_index=False
    )


@register(
    "host_jaccard_overlap",
    oracle=f"""
    WITH l AS (
        SELECT doc_id, unnest({_REF_TARGETS_SQL}) AS t FROM documents
    ), hs AS (
        SELECT DISTINCT {_host_sql("doc_id")} AS h, t FROM l
    ), sizes AS (
        SELECT h, count(*) AS sz FROM hs GROUP BY h
    ), inter AS (
        SELECT a.h AS host_a, b.h AS host_b, count(*) AS inter
        FROM hs a JOIN hs b ON a.t = b.t AND a.h < b.h
        GROUP BY host_a, host_b
    )
    SELECT host_a, host_b, CAST(inter AS BIGINT) AS inter_cnt,
           CAST(sa.sz + sb.sz - inter AS BIGINT) AS union_cnt
    FROM inter
    JOIN sizes sa ON sa.h = host_a
    JOIN sizes sb ON sb.h = host_b
    """,
)
def host_jaccard_overlap(sf_dir: str):
    """Jaccard overlap of outlink-target sets between host pairs — the
    link-spam / mirror-site signal ("two hosts pointing at the same
    things"). Kept as exact integer rationals (inter_cnt, union_cnt);
    pairs with empty intersection drop (inner join on shared targets).
    Plan: the DOM-harvested edge stream reduces per batch to distinct
    (host, target) pairs, one groupby dedups globally, and the pair
    algebra runs on the merged table — bounded by |hosts| x |target
    space|, NOT by the edge stream (at open-web host counts the pair
    step becomes a target-keyed self-join: same SQL shape, bucketed)."""
    from sciscraper_ray.sources.page_synth import host_for

    def hp(b: pa.Table) -> pa.Table:
        src = b["src"].to_numpy(zero_copy_only=False)
        hosts = np.array([host_for(int(i)) for i in src], object)
        t = pa.table(
            {
                "h": pa.array(hosts.tolist(), pa.string()),
                "t": b["dst"],
            }
        )
        return t.group_by(["h", "t"]).aggregate([])

    hs = (
        _doc_edges(sf_dir)
        .map_batches(hp, batch_format="pyarrow")
        .groupby(["h", "t"])
        .count()
        .to_pandas()  # bounded: |hosts| x target space (6 x 997)
    )[["h", "t"]]

    sizes = hs.groupby("h").size()
    pairs = hs.merge(hs, on="t")
    pairs = pairs[pairs["h_x"] < pairs["h_y"]]
    inter = (
        pairs.groupby(["h_x", "h_y"]).size().reset_index(name="inter_cnt")
    )
    inter["union_cnt"] = (
        sizes.loc[inter["h_x"]].to_numpy()
        + sizes.loc[inter["h_y"]].to_numpy()
        - inter["inter_cnt"].to_numpy()
    )
    return pa.table(
        {
            "host_a": pa.array(inter["h_x"].tolist(), pa.string()),
            "host_b": pa.array(inter["h_y"].tolist(), pa.string()),
            "inter_cnt": pa.array(
                inter["inter_cnt"].to_numpy().astype(np.int64), pa.int64()
            ),
            "union_cnt": pa.array(
                inter["union_cnt"].to_numpy().astype(np.int64), pa.int64()
            ),
        }
    )


@register(
    "token_postings_delta_stats",
    oracle=f"""
    WITH pairs AS (
        SELECT DISTINCT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents
    ), d AS (
        SELECT token, doc_id,
               doc_id - lag(doc_id) OVER (
                   PARTITION BY token ORDER BY doc_id
               ) AS delta
        FROM pairs
    )
    SELECT token, CAST(count(*) AS BIGINT) AS df,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           CAST(max(doc_id) AS BIGINT) AS max_doc,
           CAST(coalesce(max(delta), 0) AS BIGINT) AS max_gap
    FROM d GROUP BY token
    """,
)
def token_postings_delta_stats(sf_dir: str):
    """Posting-list delta statistics — the compressibility profile an
    index builder reads before picking a varint/PFor layout (df, id
    range, and the worst consecutive-id gap per token). The max-gap
    aggregate needs SORTED postings, so it can't fold into a plain
    groupby; plan: per-batch DISTINCT (token, doc) partials, ONE
    token-hash bucket shuffle (token_inverted_index's exchange), then
    per bucket a vectorized lexsort (token, doc) + shifted diff with
    same-token masking + np.maximum.reduceat over token segments — no
    per-token Python. Group count is O(buckets), not vocabulary."""
    import ray.data

    def pair_partial(b: pa.Table) -> pa.Table:
        from sciscraper_ray.kernels.tokenize import tokenize_column

        toks = tokenize_column(b["text"])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = np.asarray(toks.offsets, np.int64)
        flat = toks.values
        counts = np.diff(offs)
        doc = np.repeat(
            b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64), counts
        )
        keep = pc.is_valid(flat).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "token": flat.filter(pa.array(keep)),
                "doc_id": pa.array(doc[keep], pa.int64()),
            }
        )
        return t.group_by(["token", "doc_id"]).aggregate([])

    pairs = (
        _docs(sf_dir, columns=("doc_id", "text"))
        .map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["token", "doc_id"])
        .count()
        .map_batches(
            lambda b: b.select(["token", "doc_id"]), batch_format="pyarrow"
        )
    )

    N_BUCKETS = 32

    def add_bucket(b: pa.Table) -> pa.Table:
        # process-stable bucket hash (NOT Python hash(): PYTHONHASHSEED
        # varies across workers and would split a token's postings)
        import zlib

        h = np.array(
            [
                zlib.crc32(t.encode("utf-8")) & (N_BUCKETS - 1)
                for t in b["token"].to_pylist()
            ],
            np.int64,
        )
        return b.append_column("bucket", pa.array(h, pa.int64()))

    def bucket_kernel(g):
        import pandas as pd

        tok = g["token"].to_numpy()
        doc = g["doc_id"].to_numpy()
        order = np.lexsort((doc, tok))
        tok_s, doc_s = tok[order], doc[order]
        new_tok = np.ones(len(tok_s), bool)
        new_tok[1:] = tok_s[1:] != tok_s[:-1]
        starts = np.flatnonzero(new_tok)
        lens = np.diff(np.append(starts, len(tok_s)))
        gaps = np.zeros(len(doc_s), np.int64)
        gaps[1:] = doc_s[1:] - doc_s[:-1]
        gaps[new_tok] = 0
        max_gap = np.maximum.reduceat(gaps, starts)
        # single-posting tokens: reduceat over a 1-length segment sees
        # its own zeroed gap, so max_gap is already 0 there
        return pd.DataFrame(
            {
                "token": tok_s[starts],
                "df": lens.astype(np.int64),
                "min_doc": doc_s[starts].astype(np.int64),
                "max_doc": doc_s[starts + lens - 1].astype(np.int64),
                "max_gap": max_gap,
            }
        )

    return (
        pairs.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_kernel, batch_format="pandas")
        .map_batches(
            lambda b: b.select(["token", "df", "min_doc", "max_doc", "max_gap"]),
            batch_format="pyarrow",
        )
    )


@register(
    "graph_two_hop_reach",
    oracle=f"""
    WITH l AS (
        SELECT doc_id AS s, unnest({_REF_TARGETS_SQL}) AS t FROM documents
    ), e AS (
        SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
        FROM l WHERE s <> t
    ), und AS (
        SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e
    ), reach AS (
        SELECT u, v FROM und
        UNION
        SELECT e1.u, e2.v
        FROM und e1 JOIN und e2 ON e1.v = e2.u
        WHERE e1.u <> e2.v
    )
    SELECT u AS node, CAST(count(*) AS BIGINT) AS reach2
    FROM reach GROUP BY u
    """,
)
def graph_two_hop_reach(sf_dir: str):
    """Two-hop neighborhood size per node (|N(v) ∪ N²(v)|, v excluded) —
    the local-influence measure crawl prioritizers use. Plan: distinct
    undirected edges (packed-int64 groupby), symmetrized; the 2-hop
    expansion is the bucketed co-partitioned self-join on the middle
    vertex (wedge volume bounded by Σdeg² — the hub-skew caveat
    host_triangle_count documents applies, and the degree-ordered
    orientation there is the fix at open-web scale); distinct (u, v)
    pairs then collapse through one packed-key groupby before the
    per-node count."""
    import ray
    from ray.data.aggregate import Sum

    from sciscraper_ray.pipelines.graph import _dedup_edges
    from sciscraper_ray.stages.relational import bucketed_hash_join

    raw = _doc_edges(sf_dir)

    def orient(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        t = b["dst"].to_numpy(zero_copy_only=False)
        keep = s != t
        s, t = s[keep], t[keep]
        return pa.table(
            {
                "a": pa.array(np.minimum(s, t), pa.int64()),
                "b": pa.array(np.maximum(s, t), pa.int64()),
            }
        )

    und = _dedup_edges(raw.map_batches(orient, batch_format="pyarrow"))

    def symmetrize(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, bb]), pa.int64()),
                "v": pa.array(np.concatenate([bb, a]), pa.int64()),
            }
        )

    sym = und.map_batches(symmetrize, batch_format="pyarrow").materialize()

    two_hop = bucketed_hash_join(
        sym,
        sym.map_batches(
            lambda b: pa.table({"m": b["u"], "w": b["v"]}),
            batch_format="pyarrow",
        ),
        left_on="v",
        right_on="m",
    ).map_batches(
        lambda b: pa.table(
            {"u": b["u"], "v2": b["w"]}
        ).filter(pc.not_equal(b["u"], b["w"])),
        batch_format="pyarrow",
    )

    direct = sym.map_batches(
        lambda b: pa.table({"u": b["u"], "v2": b["v"]}), batch_format="pyarrow"
    )

    pairs = (
        direct.union(two_hop)
        .map_batches(
            lambda b: b.group_by(["u", "v2"]).aggregate([]),
            batch_format="pyarrow",
        )
        .groupby(["u", "v2"])
        .count()
    )

    def reach_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"node": b["u"], "one": pa.array(np.ones(len(b), np.int64))}
        )
        return (
            t.group_by("node")
            .aggregate([("one", "sum")])
            .rename_columns(["node", "reach2"])
        )

    return (
        pairs.map_batches(reach_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum(on="reach2", alias_name="reach2"))
    )


@register(
    "page_paragraph_stats",
    oracle="""
    SELECT doc_id,
           CAST((len(string_split(text, ' ')) + 39) // 40 AS BIGINT)
               AS n_paras,
           CAST(length(text)
                - ((len(string_split(text, ' ')) + 39) // 40 - 1)
               AS BIGINT) AS sum_chars
    FROM documents
    """,
)
def page_paragraph_stats(sf_dir: str):
    """Paragraph-level extraction parity: parse every fixture page with
    the REAL DOM engine, count the <article id=main> paragraphs and sum
    their extracted text lengths. The synthesizer chunks main content
    into 40-word paragraphs, so the oracle rebuilds both numbers
    arithmetically — ceil(tokens/40) paragraphs, and the joined-chunk
    char total telescopes to length(text) minus the (n_paras-1) removed
    separator spaces. Any escape/unescape or whitespace bug anywhere in
    the parse chain breaks the equality; one parse per page, zero
    shuffle."""
    from sciscraper_ray.sources.page_synth import render_html
    from sciscraper_ray.stages.dom_select import select_texts

    def harvest(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        n_paras: list[int] = []
        sum_chars: list[int] = []
        for i, t, lg in zip(
            ids, batch["text"].to_pylist(), batch["lang"].to_pylist()
        ):
            page = render_html(int(i), t, lg).decode()
            paras = select_texts(page, "article p")
            n_paras.append(len(paras))
            sum_chars.append(sum(len(p) for p in paras))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_paras": pa.array(n_paras, pa.int64()),
                "sum_chars": pa.array(sum_chars, pa.int64()),
            }
        )

    return _docs(sf_dir, columns=("doc_id", "text", "lang")).map_batches(
        harvest, batch_format="pyarrow"
    )


@register(
    "crawl_interleave_schedule",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_host_sql("doc_id")} AS host FROM documents
    ), r AS (
        SELECT doc_id, host,
               row_number() OVER (
                   PARTITION BY host ORDER BY doc_id
               ) AS rank_in_host
        FROM d
    )
    SELECT doc_id, host, CAST(rank_in_host AS BIGINT) AS rank_in_host,
           CAST(row_number() OVER (
               ORDER BY rank_in_host, host, doc_id
           ) AS BIGINT) AS slot
    FROM r
    """,
)
def crawl_interleave_schedule(sf_dir: str):
    """Politeness-interleaved fetch schedule: round-robin across hosts
    (every host's k-th fetch happens before any host's (k+1)-th), the
    ordering a crawler emits so no host sees bursts. The global slot
    needs NO global sort: with the |hosts|-bounded count histogram
    broadcast, slot(r, host) = Σ_h min(c_h, r-1) + |{{h' < host :
    c_h' ≥ r}}| + 1 — a closed form over the histogram, evaluated
    vectorized per batch. Per-host ranks come from the bucketed window
    (hosts whole per bucket; the mega-host's bucket is the skew cap —
    at open-web host counts the rank pass becomes the two-level scan
    corpus_heaps_law uses)."""
    import ray
    import ray.data

    from sciscraper_ray.sources.page_synth import host_for
    from sciscraper_ray.stages.window import bucketed_window

    base = _docs(sf_dir, columns=("doc_id",)).map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["doc_id"],
                "host": pa.array(
                    [
                        host_for(int(i))
                        for i in b["doc_id"].to_numpy(zero_copy_only=False)
                    ],
                    pa.string(),
                ),
                "hkey": pa.array(
                    [
                        int.from_bytes(
                            host_for(int(i)).encode()[:6], "big"
                        )
                        for i in b["doc_id"].to_numpy(zero_copy_only=False)
                    ],
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def rank_kernel(g):
        import pandas as pd

        host = g["host"].to_numpy()
        did = g["doc_id"].to_numpy()
        order = np.lexsort((did, host))
        host_s, did_s = host[order], did[order]
        new_h = np.ones(len(host_s), bool)
        new_h[1:] = host_s[1:] != host_s[:-1]
        starts = np.flatnonzero(new_h)
        lens = np.diff(np.append(starts, len(host_s)))
        rank = np.arange(len(host_s)) - np.repeat(starts, lens) + 1
        return pd.DataFrame(
            {
                "doc_id": did_s,
                "host": host_s,
                "rank_in_host": rank.astype(np.int64),
            }
        )

    ranked = bucketed_window(base, rank_kernel, key="hkey").map_batches(
        lambda b: b.select(["doc_id", "host", "rank_in_host"]),
        batch_format="pyarrow",
    )
    ranked = ranked.materialize()  # reused: histogram + slot pass

    counts = (
        ranked.groupby("host")
        .count()
        .to_pandas()  # bounded: |hosts|
        .sort_values("host")
    )
    hosts_sorted = counts["host"].tolist()
    c = counts["count()"].to_numpy().astype(np.int64)
    c_ref = ray.put((hosts_sorted, c))

    def slot_batch(b: pa.Table) -> pa.Table:
        hosts_s, cc = ray.get(c_ref)
        hidx = {h: i for i, h in enumerate(hosts_s)}
        r = b["rank_in_host"].to_numpy(zero_copy_only=False)
        hi = np.array([hidx[h] for h in b["host"].to_pylist()], np.int64)
        # Σ_h min(c_h, r-1): cumulative over the sorted count histogram
        cs = np.sort(cc)
        cum = np.concatenate(([0], np.cumsum(cs)))
        pos = np.searchsorted(cs, r - 1, side="left")
        before_rank = cum[pos] + (len(cs) - pos) * (r - 1)
        # ties at the same rank from lexically-smaller hosts
        ge = (cc[None, :] >= r[:, None]) & (
            np.arange(len(cc))[None, :] < hi[:, None]
        )
        slot = before_rank + ge.sum(axis=1) + 1
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "host": b["host"],
                "rank_in_host": b["rank_in_host"],
                "slot": pa.array(slot, pa.int64()),
            }
        )

    return ranked.map_batches(slot_batch, batch_format="pyarrow")


@register(
    "graph_wcc_sizes",
    oracle=f"""
    WITH RECURSIVE l AS (
        SELECT doc_id AS s, unnest({_REF_TARGETS_SQL}) AS t FROM documents
    ), e AS (
        SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
        FROM l WHERE s <> t
    ), und AS (
        SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e
    ), nodes AS (
        SELECT DISTINCT u AS n FROM und
    ), reach(s, t) AS (
        SELECT n, n FROM nodes
        UNION
        SELECT r.s, u.v FROM reach r JOIN und u ON r.t = u.u
    ), comp AS (
        SELECT s, min(t) AS lbl FROM reach GROUP BY s
    ), sizes AS (
        SELECT lbl, count(*) AS comp_size FROM comp GROUP BY lbl
    )
    SELECT CAST(comp_size AS BIGINT) AS comp_size,
           CAST(count(*) AS BIGINT) AS n_components
    FROM sizes GROUP BY comp_size
    """,
)
def graph_wcc_sizes(sf_dir: str):
    """Weakly-connected-component size distribution of the doc link
    graph — the fragmentation profile (one giant component + a dust
    tail is the healthy-web signature; many mid-size islands means a
    partitioned crawl). Components come from the alternating
    Large-/Small-Star plan (pipelines/graph.py — edge-list-only
    exchanges, converges in O(log n) rounds); the size histogram is two
    tiny groupbys on the (node, comp) table. The oracle computes the
    same labels via a recursive-CTE transitive closure — tractable at
    fixture node counts, which is exactly why the engine ships the
    star algorithm instead."""
    import ray.data
    from ray.data.aggregate import Sum

    from sciscraper_ray.pipelines.graph import connected_components

    raw = _doc_edges(sf_dir)

    def orient(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        t = b["dst"].to_numpy(zero_copy_only=False)
        keep = s != t
        s, t = s[keep], t[keep]
        return pa.table(
            {
                "a": pa.array(np.minimum(s, t), pa.int64()),
                "b": pa.array(np.maximum(s, t), pa.int64()),
            }
        )

    comp = connected_components(raw.map_batches(orient, batch_format="pyarrow"))

    def size_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "comp_id": b["comp_id"],
                "one": pa.array(np.ones(len(b), np.int64)),
            }
        )
        return (
            t.group_by("comp_id")
            .aggregate([("one", "sum")])
            .rename_columns(["comp_id", "sz"])
        )

    sizes = (
        comp.map_batches(size_partial, batch_format="pyarrow")
        .groupby("comp_id")
        .aggregate(Sum(on="sz", alias_name="comp_size"))
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "comp_size": b["comp_size"],
                "one": pa.array(np.ones(len(b), np.int64)),
            }
        )
        return (
            t.group_by("comp_size")
            .aggregate([("one", "sum")])
            .rename_columns(["comp_size", "n_components"])
        )

    return (
        sizes.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("comp_size")
        .aggregate(Sum(on="n_components", alias_name="n_components"))
    )


# --------------------------------------------------------------------------
# Deterministic synchronous label propagation (Raghavan et al. 2007,
# restricted to the SQL-mirrorable synchronous min-tiebreak form): the
# cheap community-detection pass crawl pipelines run between WCC (too
# coarse: one giant component) and modularity methods (not
# fixed-round-deterministic). 3 synchronous rounds, then the community
# size histogram.
# --------------------------------------------------------------------------

_LP_ROUNDS = 3


def _lp_oracle() -> str:
    rounds = []
    prev = "lab0"
    for k in range(1, _LP_ROUNDS + 1):
        rounds.append(
            f"""r{k} AS (
        SELECT e.u AS n, lb.lbl AS cl, count(*) AS c
        FROM e JOIN {prev} lb ON e.v = lb.n GROUP BY e.u, lb.lbl
    ), lab{k} AS (
        SELECT n, cl AS lbl FROM (
            SELECT n, cl, row_number() OVER (
                PARTITION BY n ORDER BY c DESC, cl ASC) AS rn
            FROM r{k}
        ) WHERE rn = 1
    )"""
        )
        prev = f"lab{k}"
    body = ",\n    ".join(rounds)
    return f"""
    WITH l AS (
        SELECT doc_id AS s, unnest({_REF_TARGETS_SQL}) AS t FROM documents
    ), e0 AS (
        SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
        FROM l WHERE s <> t
    ), e AS (
        SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b, a FROM e0
    ), lab0 AS (
        SELECT DISTINCT u AS n, u AS lbl FROM e
    ), {body},
    sizes AS (
        SELECT lbl, count(*) AS sz FROM {prev} GROUP BY lbl
    )
    SELECT CAST(sz AS BIGINT) AS comm_size,
           CAST(count(*) AS BIGINT) AS n_communities
    FROM sizes GROUP BY sz
    """


@register("graph_label_propagation", oracle=_lp_oracle())
def graph_label_propagation(sf_dir: str):
    """Community size histogram after 3 synchronous mode-label rounds
    over the doc link graph. Edges are harvested through the DOM engine
    (same parse as page_link_graph), canonicalized (a < b, self-loops
    dropped) and DEDUPED with a key-only groupby — multiplicity feeds
    the neighbor mode, so distinctness is part of the contract. The
    rounds run in pipelines/graph.py label_propagation (two-plan:
    driver lexsort kernel under resolve_plan's limit, else per-round
    bucketed join + node-bucketed vectorized mode kernel); the
    histogram is two |distinct-size|-bounded groupbys."""
    import ray.data
    from ray.data.aggregate import Count, Sum

    from sciscraper_ray.pipelines.graph import label_propagation

    raw = _doc_edges(sf_dir)

    def orient(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        t = b["dst"].to_numpy(zero_copy_only=False)
        keep = s != t
        s, t = s[keep], t[keep]
        tab = pa.table(
            {
                "a": pa.array(np.minimum(s, t), pa.int64()),
                "b": pa.array(np.maximum(s, t), pa.int64()),
            }
        )
        # local pre-dedup shrinks the distinct shuffle's exchange
        return tab.group_by(["a", "b"]).aggregate([]).rename_columns(["a", "b"])

    distinct = (
        raw.map_batches(orient, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Count(alias_name="_m"))
        .map_batches(
            lambda b: b.select(["a", "b"]), batch_format="pyarrow"
        )
    )

    labels = label_propagation(distinct, rounds=_LP_ROUNDS)
    if isinstance(labels, pa.Table):
        labels = ray.data.from_arrow(labels)

    def size_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"lbl": b["lbl"], "one": pa.array(np.ones(len(b), np.int64))}
        )
        return (
            t.group_by("lbl").aggregate([("one", "sum")]).rename_columns(["lbl", "sz"])
        )

    sizes = (
        labels.map_batches(size_partial, batch_format="pyarrow")
        .groupby("lbl")
        .aggregate(Sum(on="sz", alias_name="comm_size"))
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "comm_size": b["comm_size"],
                "one": pa.array(np.ones(len(b), np.int64)),
            }
        )
        return (
            t.group_by("comm_size")
            .aggregate([("one", "sum")])
            .rename_columns(["comm_size", "n_communities"])
        )

    return (
        sizes.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("comm_size")
        .aggregate(Sum(on="n_communities", alias_name="n_communities"))
    )


# --------------------------------------------------------------------------
# CDX sidecar index build: the (offset, length) table that turns
# sequential-only WARC segments into a random-access store (what
# Common Crawl publishes as .cdx). The oracle derives every offset
# arithmetically — the WARC/1.0 envelope is deterministic, so
# rec_len = 127 + 2*len(digits(id)) + len(digits(payload_len)) +
# payload_len and offsets are the per-shard prefix sum — which means a
# single byte of writer/scanner drift fails the compare.
# --------------------------------------------------------------------------


@register(
    "warc_cdx_index",
    oracle="""
    WITH r AS (
        SELECT doc_id, doc_id % 8 AS shard,
               127 + 2 * length(CAST(doc_id AS VARCHAR))
                   + length(CAST(octet_length(encode(text)) AS VARCHAR))
                   + octet_length(encode(text)) AS rec_len
        FROM documents
    )
    SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(sum(rec_len) OVER (PARTITION BY shard ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) - rec_len AS BIGINT) AS offset,
           CAST(rec_len AS BIGINT) AS rec_len
    FROM r
    """,
)
def warc_cdx_index(sf_dir: str):
    """Build the CDX index by scanning the WARC shards themselves
    (sources/warc.py cdx_scan: Content-Length-delimited walk recording
    each record's magic offset and full envelope span). One task per
    segment file — the index build is embarrassingly parallel and
    shuffle-free, exactly how real .cdx generation fans out over
    warc.paths; the oracle recomputes every byte offset from the
    envelope arithmetic, so the check pins the writer AND scanner to
    the format contract."""
    import os

    import ray.data

    from sciscraper_ray.sources.warc import cdx_scan

    out_dir, n_shards = _warc_fixture_dir(sf_dir)

    def scan_batch(batch: pa.Table) -> pa.Table:
        ids_, shards_, offs_, lens_ = [], [], [], []
        for path, blob in zip(
            batch["path"].to_pylist(), batch["bytes"].to_pylist()
        ):
            shard = int(os.path.basename(path).split("-")[1].split(".")[0])
            for rec_id, _uri, off, ln in cdx_scan(blob):
                ids_.append(rec_id)
                shards_.append(shard)
                offs_.append(off)
                lens_.append(ln)
        return pa.table(
            {
                "doc_id": pa.array(ids_, pa.int64()),
                "shard": pa.array(shards_, pa.int64()),
                "offset": pa.array(offs_, pa.int64()),
                "rec_len": pa.array(lens_, pa.int64()),
            }
        )

    return ray.data.read_binary_files(
        [os.path.join(out_dir, f"shard-{s:04d}.warc") for s in range(n_shards)],
        include_paths=True,
    ).map_batches(scan_batch, batch_format="pyarrow")


@register(
    "link_neighbor_degree_curve",
    oracle=f"""
    WITH l AS (
        SELECT doc_id AS src, unnest({_REF_TARGETS_SQL}) AS dst
        FROM documents
    ), ind AS (
        SELECT dst AS node, count(*) AS d FROM l GROUP BY dst
    ), e AS (
        SELECT coalesce(i1.d, 0) AS dx, i2.d AS dy
        FROM l LEFT JOIN ind i1 ON l.src = i1.node
               JOIN ind i2 ON l.dst = i2.node
    )
    SELECT CAST(dx AS BIGINT) AS src_indeg,
           CAST(count(*) AS BIGINT) AS n_edges,
           CAST(sum(dy) AS BIGINT) AS sum_dst_indeg
    FROM e GROUP BY dx
    """,
)
def link_neighbor_degree_curve(sf_dir: str):
    """Average-neighbor-degree curve k_nn(d) — the degree-correlation
    PROFILE underneath link_degree_assortativity's single Pearson
    number (Pastor-Satorras et al. 2001): for every source in-degree
    class d, the edge count and the total in-degree of link targets
    (mean = sum/n, the caller's one division — both columns exact
    int64). A rising curve means hubs link to hubs (assortative), the
    fingerprint used to tell organic link structure from spam farms.
    Same physical plan as the assortativity op: the in-degree table is
    bounded by the destination id space and broadcasts via one ray.put;
    every edge batch pre-reduces to at most |degree classes| rows, and
    the final groupby is degree-bounded, never edge-bounded."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from sciscraper_ray.sources.page_synth import _LINK_MOD

    def edges_of(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        src = np.repeat(ids, 2)
        dst = np.empty(len(ids) * 2, np.int64)
        dst[0::2] = (ids * 17 + 13) % _LINK_MOD
        dst[1::2] = (ids * 29 + 7) % _LINK_MOD
        return src, dst

    docs = _docs(sf_dir, columns=("doc_id",))

    def indeg_partial(b: pa.Table) -> pa.Table:
        _, dst = edges_of(b)
        cnt = np.bincount(dst, minlength=_LINK_MOD)
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "node": pa.array(nz.astype(np.int64)),
                "d": pa.array(cnt[nz].astype(np.int64)),
            }
        )

    ind_df = (
        docs.map_batches(indeg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum(on="d", alias_name="d"))
        .to_pandas()  # bounded: node id space (synth targets < 997)
    )
    indeg = np.zeros(_LINK_MOD, np.int64)
    indeg[ind_df["node"].to_numpy(np.int64)] = ind_df["d"].to_numpy(np.int64)
    indeg_ref = ray.put(indeg)

    class CurvePartial:
        def __init__(self):
            self.indeg = ray.get(indeg_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            src, dst = edges_of(b)
            # srcs outside the target id space are never linked-to: deg 0
            dx = np.where(
                src < _LINK_MOD,
                self.indeg[np.minimum(src, _LINK_MOD - 1)],
                0,
            )
            dy = self.indeg[dst]
            t = pa.table(
                {
                    "src_indeg": pa.array(dx),
                    "n_edges": pa.array(np.ones(len(dx), np.int64)),
                    "sum_dst_indeg": pa.array(dy),
                }
            )
            return (
                t.group_by("src_indeg")
                .aggregate([("n_edges", "sum"), ("sum_dst_indeg", "sum")])
                .rename_columns(["src_indeg", "n_edges", "sum_dst_indeg"])
            )

    return (
        docs.map_batches(CurvePartial, batch_format="pyarrow", concurrency=(1, 4))
        .groupby("src_indeg")
        .aggregate(
            Sum(on="n_edges", alias_name="n_edges"),
            Sum(on="sum_dst_indeg", alias_name="sum_dst_indeg"),
        )
    )


# --------------------------------------------------------------------------
# Link prediction: common-neighbor / Jaccard scores for non-adjacent pairs
# --------------------------------------------------------------------------


@register(
    "link_jaccard_prediction",
    oracle=f"""
    WITH l AS (
        SELECT doc_id AS s, unnest({_REF_TARGETS_SQL}) AS t FROM documents
    ), e AS (
        SELECT DISTINCT least(s, t) AS a, greatest(s, t) AS b
        FROM l WHERE s <> t
    ), adj AS (
        SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e
    ), deg AS (
        SELECT u AS node, count(*) AS d FROM adj GROUP BY u
    ), cn AS (
        SELECT a1.v AS x, a2.v AS y, count(*) AS common
        FROM adj a1 JOIN adj a2 ON a1.u = a2.u AND a1.v < a2.v
        GROUP BY x, y
    ), nonadj AS (
        SELECT cn.x, cn.y, cn.common
        FROM cn LEFT JOIN e ON e.a = cn.x AND e.b = cn.y
        WHERE e.a IS NULL
    )
    SELECT x AS a, y AS b, common,
           dx.d AS deg_a, dy.d AS deg_b,
           dx.d + dy.d - common AS union_size,
           CAST(row_number() OVER (ORDER BY common DESC, x, y) AS BIGINT)
               AS rnk
    FROM nonadj
    JOIN deg dx ON dx.node = x
    JOIN deg dy ON dy.node = y
    ORDER BY common DESC, x, y
    LIMIT 100
    """,
)
def link_jaccard_prediction(sf_dir: str, num_buckets: int = 16):
    """Link prediction over the harvested web graph: for every
    NON-adjacent node pair sharing at least one neighbor, the
    common-neighbor count plus the Jaccard ingredients (deg_a, deg_b,
    union = deg_a + deg_b - common) as exact integers, top-100 by
    (common desc, a, b) — the classic "you may also like" / related-page
    candidate generator (Liben-Nowell & Kleinberg 2003). Plan: (1)
    distinct undirected edges via the packed-int64 groupby; (2) FULL
    adjacency (both directions — unlike triangle counting, every wedge
    center must expand, so no degree orientation); (3) bucket-local
    vectorized pair expansion per center segment (hash(u) % B, one
    lexsort + repeat/cumsum expansion per bucket — never per-node
    Python); (4) wedge pairs shrink through a groupby-Count on the
    packed lo<<32|hi key; (5) the bounded candidate table merges on the
    driver where the anti-join against the edge set and the degree
    attach are numpy array ops. Wedge volume is sum(deg^2) — at open-web
    scale step (3) caps hub fan-out (hubs contribute no discriminative
    common-neighbor signal) and steps (4)/(5) swap the driver merge for
    the bucketed co-partitioned join, same plan shape as
    node_clustering_coeff documents."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from sciscraper_ray.pipelines.graph import _dedup_edges

    raw = _doc_edges(sf_dir)

    def orient_minmax(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        t = b["dst"].to_numpy(zero_copy_only=False)
        keep = s != t
        s, t = s[keep], t[keep]
        return pa.table(
            {
                "a": pa.array(np.minimum(s, t), pa.int64()),
                "b": pa.array(np.maximum(s, t), pa.int64()),
            }
        )

    und = _dedup_edges(
        raw.map_batches(orient_minmax, batch_format="pyarrow")
    ).materialize()  # reused: adjacency expansion + driver anti-join probe

    def both_dirs(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        u = np.concatenate([a, bb])
        v = np.concatenate([bb, a])
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "bucket": pa.array(
                    (u * 0x9E3779B9 & 0x7FFFFFFF) % num_buckets, pa.int64()
                ),
            }
        )

    adj = und.map_batches(both_dirs, batch_format="pyarrow")

    def wedge_pairs(g: "pd.DataFrame") -> "pd.DataFrame":
        u = g["u"].to_numpy()
        v = g["v"].to_numpy()
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        seg_end = np.repeat(ends, ends - starts)
        pos = np.arange(len(u))
        reps = seg_end - pos - 1
        total = int(reps.sum())
        if total == 0:
            return pd.DataFrame({"k": np.array([], np.int64)})
        left = np.repeat(pos, reps)
        offs = np.concatenate(([0], np.cumsum(reps)[:-1]))
        right = left + (np.arange(total) - np.repeat(offs, reps)) + 1
        wv, ww = v[left], v[right]
        lo, hi = np.minimum(wv, ww), np.maximum(wv, ww)
        return pd.DataFrame({"k": (lo << 32) | hi})

    def count_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("k").aggregate([([], "count_all")])
        return g.rename_columns(["k", "common"])

    cand = (
        adj.groupby("bucket")
        .map_groups(wedge_pairs, batch_format="pandas")
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("k")
        .aggregate(Sum(on="common", alias_name="common"))
        .to_pandas()  # bounded: candidate pairs (node space < 997 here)
    )
    edges = und.to_pandas()  # bounded: synth edge set (node space < 997)
    ea = edges["a"].to_numpy(np.int64)
    eb = edges["b"].to_numpy(np.int64)
    ekeys = (ea << 32) | eb
    deg = np.zeros(int(max(ea.max(), eb.max())) + 1, np.int64)
    np.add.at(deg, ea, 1)
    np.add.at(deg, eb, 1)

    k = cand["k"].to_numpy(np.int64)
    common = cand["common"].to_numpy(np.int64)
    keep = ~np.isin(k, ekeys)
    k, common = k[keep], common[keep]
    a = k >> 32
    b = k & 0xFFFFFFFF
    order = np.lexsort((b, a, -common))[:100]
    a, b, common = a[order], b[order], common[order]
    da, db = deg[a], deg[b]
    return pa.table(
        {
            "a": pa.array(a, pa.int64()),
            "b": pa.array(b, pa.int64()),
            "common": pa.array(common, pa.int64()),
            "deg_a": pa.array(da, pa.int64()),
            "deg_b": pa.array(db, pa.int64()),
            "union_size": pa.array(da + db - common, pa.int64()),
            "rnk": pa.array(np.arange(1, len(a) + 1, dtype=np.int64)),
        }
    )


@register(
    "graph_seed_closeness",
    oracle=f"""
    WITH RECURSIVE links AS (
        SELECT doc_id AS src, unnest({_REF_TARGETS_SQL}) AS dst FROM documents
    ),
    seeds AS (
        SELECT doc_id AS seed FROM documents WHERE doc_id % 200 = 0
    ),
    bfs(seed, node, d) AS (
        SELECT seed, seed, 0 FROM seeds
        UNION
        SELECT b.seed, l.dst, b.d + 1
        FROM bfs b JOIN links l ON l.src = b.node
        WHERE b.d < {_BFS_ROUNDS}
    ),
    md AS (
        SELECT seed, node, min(d) AS d FROM bfs GROUP BY seed, node
    )
    SELECT seed, count(*) AS n_reached,
           CAST(sum(d) AS BIGINT) AS sum_dist,
           CAST(max(d) AS BIGINT) AS ecc
    FROM md GROUP BY seed
    """,
)
def graph_seed_closeness(sf_dir: str):
    """Per-seed closeness-centrality ingredients — for each probe seed
    (doc_id % 200 == 0) the exact reachable count, sum of hop distances
    and eccentricity within the shared _BFS_ROUNDS horizon: the
    landmark-distance table ANF/HyperBall-style centrality estimates
    calibrate against, computed exactly for a bounded landmark set.
    Plan: ONE labeled multi-seed BFS — the frontier is (seed, node)
    pairs, each round ships only the per-seed frontier arrays
    (ray.put once) and every edge block answers all seeds with one
    is_in semi-join per seed (seed count is the bounded landmark
    budget, never corpus-scale); no shuffle, the edge list is harvested
    and materialized once, and the driver holds only per-seed visited
    sets (politeness-bounded neighborhoods — the bfs_distances
    contract, labeled). The oracle replays the same closure as one
    recursive CTE carrying the seed column."""
    import ray

    edges = _doc_edges(sf_dir).materialize()

    def seed_filter(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"seed": pa.array(ids[ids % 200 == 0], pa.int64())})

    seeds = (
        _docs(sf_dir, columns=("doc_id",))
        .map_batches(seed_filter, batch_format="pyarrow")
        .to_pandas()["seed"]  # bounded: seed sample (broadcast side)
        .to_numpy(np.int64)
    )
    dist: dict[int, dict[int, int]] = {int(s): {int(s): 0} for s in seeds}
    frontier: dict[int, np.ndarray] = {
        int(s): np.array([s], np.int64) for s in seeds
    }
    for d in range(1, _BFS_ROUNDS + 1):
        active = {s: f for s, f in frontier.items() if f.size}
        if not active:
            break
        ref = ray.put(
            {s: pa.array(f, pa.int64()) for s, f in active.items()}
        )

        def hop(batch: pa.Table, _ref=ref) -> pa.Table:
            fr = ray.get(_ref)
            out_s: list[np.ndarray] = []
            out_d: list[np.ndarray] = []
            for s, nodes in fr.items():
                hit = batch.filter(pc.is_in(batch["src"], value_set=nodes))
                dsts = pc.unique(hit["dst"]).to_numpy(zero_copy_only=False)
                out_s.append(np.full(dsts.size, s, np.int64))
                out_d.append(dsts.astype(np.int64))
            if not out_s:
                return pa.table(
                    {
                        "seed": pa.array([], pa.int64()),
                        "dst": pa.array([], pa.int64()),
                    }
                )
            return pa.table(
                {
                    "seed": pa.array(np.concatenate(out_s)),
                    "dst": pa.array(np.concatenate(out_d)),
                }
            )

        cand = (
            edges.map_batches(hop, batch_format="pyarrow")
            .to_pandas()  # bounded: hop frontier (synth node space)
            .drop_duplicates()
        )
        frontier = {}
        for s, g in cand.groupby("seed"):
            s = int(s)
            seen = dist[s]
            new = np.array(
                [n for n in g["dst"].to_numpy() if int(n) not in seen],
                np.int64,
            )
            for n in new:
                seen[int(n)] = d
            if new.size:
                frontier[s] = new

    out_seed = sorted(dist)
    return pa.table(
        {
            "seed": pa.array(out_seed, pa.int64()),
            "n_reached": pa.array(
                [len(dist[s]) for s in out_seed], pa.int64()
            ),
            "sum_dist": pa.array(
                [sum(dist[s].values()) for s in out_seed], pa.int64()
            ),
            "ecc": pa.array(
                [max(dist[s].values()) for s in out_seed], pa.int64()
            ),
        }
    )


@register(
    "warc_gzip_member_split",
    oracle="""
    SELECT doc_id,
           doc_id % 8 AS shard,
           CAST(row_number() OVER (PARTITION BY doc_id % 8
                                   ORDER BY doc_id) AS BIGINT)
               AS member_index,
           CAST(14 + length(CAST(doc_id AS VARCHAR)) + strlen(text)
                AS BIGINT) AS uncomp_len
    FROM documents
    """,
)
def warc_gzip_member_split(sf_dir: str):
    """Member-gzip WARC ingestion — the REAL Common-Crawl `.warc.gz`
    framing, where every record is its own gzip member and a reader must
    discover member boundaries by decoding (no Content-Length framing
    like warc_roundtrip's plain segments, no index). The fixture is
    written per run into a fresh mkdtemp (the warc_roundtrip cache-race
    lesson: no shared /tmp cache to go stale) by an 8-group
    groupby-map_groups — one worker per shard concatenates its members
    in doc order. The read side is the honest scale plan: one task per
    shard file (gzip members force sequential decode within a file —
    exactly why crawl archives ship thousands of small shards), each
    walking members with a streaming decompressor whose unused_data
    yields the next member's offset; rows (doc, shard, member_index,
    byte length) stream out per member, nothing buffers a whole shard's
    decompressed payloads. The oracle reconstructs the member layout
    from the synthesis arithmetic. (Shard files carry a .warcgz
    suffix: read_binary_files auto-gunzips *.gz paths via Arrow's
    extension sniffing, which would hide the member framing this op
    exists to exercise.)"""
    import gzip
    import io
    import tempfile
    import zlib

    import pandas as pd
    import ray.data

    base = tempfile.mkdtemp(prefix="warc_gz_")

    def add_shard(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "shard", pa.array((ids % 8).astype(np.int64))
        )

    def write_shard(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values("doc_id")
        shard = int(g["shard"].iloc[0])
        buf = io.BytesIO()
        for i, t in zip(g["doc_id"], g["text"]):
            payload = f"WARC/1.0\ndoc:{int(i)}\n{t}".encode()
            with gzip.GzipFile(
                fileobj=buf, mode="wb", mtime=0, compresslevel=6
            ) as gz:
                gz.write(payload)
        with open(f"{base}/shard-{shard:02d}.warcgz", "wb") as f:
            f.write(buf.getvalue())
        return pd.DataFrame({"shard": [shard], "n": [len(g)]})

    (
        _docs(sf_dir, columns=("doc_id", "text"))
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_shard, batch_format="pandas")
        .materialize()  # barrier: shards fully written before the read
    )

    def split_members(b: pa.Table) -> pa.Table:
        out_doc: list[int] = []
        out_shard: list[int] = []
        out_idx: list[int] = []
        out_len: list[int] = []
        for blob in b["bytes"].to_pylist():
            rest = bytes(blob)
            idx = 0
            shard = None
            while rest:
                obj = zlib.decompressobj(31)  # one gzip member
                payload = obj.decompress(rest)
                payload += obj.flush()
                rest = obj.unused_data
                idx += 1
                head, doc_line, text = payload.decode().split("\n", 2)
                assert head == "WARC/1.0"
                doc = int(doc_line.removeprefix("doc:"))
                if shard is None:
                    shard = doc % 8
                out_doc.append(doc)
                out_shard.append(shard)
                out_idx.append(idx)
                out_len.append(len(payload))
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "shard": pa.array(out_shard, pa.int64()),
                "member_index": pa.array(out_idx, pa.int64()),
                "uncomp_len": pa.array(out_len, pa.int64()),
            }
        )

    import ray.data as rd

    return rd.read_binary_files(base).map_batches(
        split_members, batch_format="pyarrow"
    )


from sciscraper_ray.pipelines.queries.dedup import _md5_hex15_sql as _walk_hex15

_WALKS = 64
_WALK_LEN = 8


@register(
    "graph_random_walks",
    oracle=f"""
    WITH RECURSIVE nbrs AS (
        SELECT s, t,
               row_number() OVER (PARTITION BY s ORDER BY t) - 1 AS idx,
               count(*) OVER (PARTITION BY s) AS outdeg
        FROM (
            SELECT DISTINCT doc_id AS s, unnest({_REF_TARGETS_SQL}) AS t
            FROM documents
        )
        WHERE s <> t
    ),
    walk(walk_id, step, node) AS (
        SELECT w, 0, w FROM unnest(range({_WALKS})) AS u(w)
        UNION ALL
        SELECT wk.walk_id, wk.step + 1, n.t
        FROM walk wk
        JOIN nbrs n ON n.s = wk.node
         AND n.idx = ({_walk_hex15(
             "CAST(wk.walk_id AS VARCHAR) || ':' || CAST(wk.step AS VARCHAR)"
         )} % n.outdeg)
        WHERE wk.step < {_WALK_LEN}
    )
    SELECT walk_id, step, node FROM walk
    """,
)
def graph_random_walks(sf_dir: str):
    """Deterministic random walks over the harvested web graph — the
    node2vec/DeepWalk sampling primitive, made REPRODUCIBLE: step t of
    walk w picks neighbor index hex15(md5("w:t")) %% outdeg among the
    node's sorted distinct neighbors, so every cluster size, partition
    layout and rerun emits byte-identical walk corpora (and the whole
    trajectory set is checkable by a recursive-CTE oracle — np.random
    walks can never be). 64 walks of length 8 start at docs 0..63;
    walks die at sink nodes (link targets that are not documents have
    no outlinks). Plan: the DOM-harvested edge list is materialized
    once; each step broadcasts the walks' current-node set (bounded by
    the walk budget, never the graph) and the edge blocks answer with
    one is_in semi-join; the driver advances the 64 walk states from
    the returned neighbor lists. Walk count is the sampling budget —
    at web scale you raise it and shard walk states, the per-step
    exchange stays budget-bounded."""
    import hashlib

    import ray

    raw = _doc_edges(sf_dir)

    def clean(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        t = b["dst"].to_numpy(zero_copy_only=False)
        keep = s != t
        return pa.table(
            {
                "src": pa.array(s[keep], pa.int64()),
                "dst": pa.array(t[keep], pa.int64()),
            }
        )

    edges = raw.map_batches(clean, batch_format="pyarrow").materialize()

    state: dict[int, int] = {w: w for w in range(_WALKS)}  # walk -> node
    rows = [(w, 0, w) for w in range(_WALKS)]
    for step in range(_WALK_LEN):
        if not state:
            break
        cur_nodes = pa.array(sorted(set(state.values())), pa.int64())
        ref = ray.put(cur_nodes)

        def fetch(b: pa.Table, _ref=ref) -> pa.Table:
            hit = b.filter(pc.is_in(b["src"], value_set=ray.get(_ref)))
            return hit

        nb = (
            edges.map_batches(fetch, batch_format="pyarrow")
            .to_pandas()  # bounded: fetched neighborhood (synth node space)
            .drop_duplicates()
        )
        nbrs: dict[int, list[int]] = {}
        for s, t in zip(nb["src"].to_numpy(), nb["dst"].to_numpy()):
            nbrs.setdefault(int(s), []).append(int(t))
        nxt: dict[int, int] = {}
        for w, node in state.items():
            lst = sorted(nbrs.get(node, ()))
            if not lst:
                continue  # sink: walk ends
            idx = (
                int(
                    hashlib.md5(f"{w}:{step}".encode()).hexdigest()[:15], 16
                )
                % len(lst)
            )
            nxt[w] = lst[idx]
            rows.append((w, step + 1, lst[idx]))
        state = nxt

    return pa.table(
        {
            "walk_id": pa.array([r[0] for r in rows], pa.int64()),
            "step": pa.array([r[1] for r in rows], pa.int64()),
            "node": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


_ANF_HORIZON = 6  # neighborhood-function horizon: the curve flattens well
# inside it on this graph (saturation is detected and short-circuits)


@register(
    "graph_neighborhood_function",
    oracle=f"""
    WITH RECURSIVE links AS (
        SELECT doc_id AS src, unnest({_REF_TARGETS_SQL}) AS dst
        FROM documents
    ),
    bfs(u, node, d) AS (
        SELECT doc_id, doc_id, 0 FROM documents
        UNION
        SELECT b.u, l.dst, b.d + 1
        FROM bfs b JOIN links l ON l.src = b.node
        WHERE b.d < {_ANF_HORIZON}
    ),
    md AS (SELECT u, node, min(d) AS d FROM bfs GROUP BY u, node),
    grid AS (SELECT unnest(range({_ANF_HORIZON} + 1)) AS d),
    cum AS (
        SELECT g.d,
               (SELECT CAST(count(*) AS BIGINT) FROM md WHERE md.d <= g.d)
                   AS n_pairs
        FROM grid g
    ),
    tot AS (SELECT max(n_pairs) AS nd FROM cum)
    SELECT CAST(cum.d AS BIGINT) AS d, cum.n_pairs,
           CAST(cum.n_pairs AS DOUBLE) / CAST(tot.nd AS DOUBLE) AS pct
    FROM cum, tot
    """,
)
def graph_neighborhood_function(sf_dir: str):
    """The ANF/HyperANF neighborhood function N(d) — the number of
    (source page, reachable page) pairs within d hops of the harvested
    link graph, for d = 0..horizon, plus each point as a fraction of the
    horizon ball (the curve whose 0.9 crossing IS the effective
    diameter; Palmer's ANF and Boldi's HyperANF exist to estimate
    exactly this at web scale). Here it is EXACT — the calibration
    variant: per-source balls are independent given the adjacency, so
    the edge list (two int64 per page, harvested through the DOM engine
    once) broadcasts via ray.put and every doc batch grows its own
    sources' balls locally for `horizon` rounds — embarrassingly
    parallel over sources, zero shuffle, and the only exchange is the
    (d, count) partial histogram each batch emits (horizon+1 rows). A
    first cut advanced a global (u, v) pair Dataset through one
    bucketed_hash_join + groupby-distinct per round; correct, but six
    orchestrated shuffles over pair rows cost minutes where this plan
    costs seconds — the round structure belongs INSIDE the task when
    state factorizes per source. At 10^12 pages the adjacency no longer
    broadcasts: N(d) switches to an HLL register per node united along
    edges (the HyperANF message-passing plan); this operator is the
    exactness oracle that variant calibrates against."""
    import ray
    import ray.data

    edges = _doc_edges(sf_dir).to_pandas()  # bounded: exactness-oracle scope (2 int64/page; HyperANF is the scale path)
    src_arr = edges["src"].to_numpy(np.int64)
    dst_arr = edges["dst"].to_numpy(np.int64)
    order = np.argsort(src_arr, kind="stable")
    src_sorted = src_arr[order]
    dst_sorted = dst_arr[order]
    adj_ref = ray.put((src_sorted, dst_sorted))

    def ball_partial(b: pa.Table) -> pa.Table:
        s_srt, d_srt = ray.get(adj_ref)
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        per_d = np.zeros(_ANF_HORIZON + 1, np.int64)
        for u in ids:
            ball = {int(u)}
            frontier = np.array([u], np.int64)
            per_d[0] += 1
            for d in range(1, _ANF_HORIZON + 1):
                lo = np.searchsorted(s_srt, frontier, side="left")
                hi = np.searchsorted(s_srt, frontier, side="right")
                nxt = {
                    int(x)
                    for j in range(len(frontier))
                    for x in d_srt[lo[j] : hi[j]]
                    if int(x) not in ball
                }
                if not nxt:
                    break
                ball.update(nxt)
                per_d[d] += len(nxt)
                frontier = np.fromiter(nxt, np.int64, len(nxt))
        return pa.table(
            {
                "d": pa.array(np.arange(_ANF_HORIZON + 1, dtype=np.int64)),
                "c": pa.array(per_d),
            }
        )

    parts = (
        _docs(sf_dir, columns=("doc_id",))
        .map_batches(ball_partial, batch_format="pyarrow")
        .to_pandas()  # (horizon+1) rows per batch  # bounded: (horizon+1) rows per block
        .groupby("d")["c"]
        .sum()
        .sort_index()
    )
    counts = np.cumsum(parts.to_numpy(np.int64))
    nd = float(counts[-1])
    return pa.table(
        {
            "d": pa.array(np.arange(len(counts), dtype=np.int64)),
            "n_pairs": pa.array(counts.astype(np.int64)),
            "pct": pa.array(counts.astype(np.float64) / nd, pa.float64()),
        }
    )


@register(
    "doc_ccnet_ppl_bins",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               unnest({_SQL_TOKENS}) AS token,
               unnest(range(len({_SQL_TOKENS}))) AS ord
        FROM documents
    ), uni AS (
        SELECT token, count(*) AS c1 FROM toks GROUP BY token
    ), vsz AS (
        SELECT count(*) AS v FROM uni
    ), bg AS (
        SELECT a.doc_id, a.token AS w1, b.token AS w2
        FROM toks a JOIN toks b
          ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
    ), bgc AS (
        SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2
    ), terms AS (
        SELECT bg.doc_id,
               ln((bgc.c2 + 1.0) / (uni.c1 + vsz.v)) AS t
        FROM bg
        JOIN bgc USING (w1, w2)
        JOIN uni ON uni.token = bg.w1
        CROSS JOIN vsz
    ), agg AS (
        SELECT doc_id,
               CAST(round(round(sum(t) / count(*), 6) * 1000000) AS BIGINT)
                   AS lp
        FROM terms GROUP BY doc_id
    ), p AS (
        SELECT d.lang, agg.lp FROM documents d JOIN agg USING (doc_id)
    ), q AS (
        SELECT lang,
               quantile_disc(lp, 1.0/3) AS q1,
               quantile_disc(lp, 2.0/3) AS q2
        FROM p GROUP BY lang
    )
    SELECT p.lang,
           CASE WHEN p.lp <= q.q1 THEN 'tail'
                WHEN p.lp <= q.q2 THEN 'middle'
                ELSE 'head' END AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(p.lp) AS BIGINT) AS min_lp_micro,
           CAST(max(p.lp) AS BIGINT) AS max_lp_micro
    FROM p JOIN q USING (lang)
    GROUP BY p.lang, bin
    """,
)
def doc_ccnet_ppl_bins(sf_dir: str):
    """CCNet's actual selection step: per-language head/middle/tail
    binning of documents by LM perplexity tertiles (Wenzek et al. keep
    'head' as the cleanest third; here higher avg log-prob = lower
    perplexity = head). Everything after the bigram-LM score runs in
    INTEGER micro-log-prob units — the rounded-6 score is scaled to an
    exact int64 the moment it exists, so tertile thresholds, bin
    comparisons and the min/max outputs never touch a float boundary
    (quantile_disc over BIGINT returns an element; the driver mirrors
    the sorted[ceil(n*q)-1] rule with the same double n*q product the
    engine uses — the pinned formula in test_round4_properties). Plan:
    the per-doc score Dataset joins lang via one bucketed co-partitioned
    join, compresses to a (lang, lp) histogram whose cell count is
    RESOLUTION-bounded (<= 1.5e7 cells for the whole [-15, 0] log-prob
    range at 6 decimals — calendar-bounded in spirit, never row-bounded,
    the two-pass-quantile contract), thresholds broadcast, bins assign
    distributed, and the output is the |langs| x 3 summary."""
    import math

    import ray
    import ray.data
    from ray.data.aggregate import Count, Max, Min, Sum

    from sciscraper_ray.stages.relational import bucketed_hash_join

    from sciscraper_ray.pipelines.queries._shared import QUERIES

    ppl = QUERIES["doc_bigram_lm_ppl"](sf_dir)

    def to_micro(b: pa.Table) -> pa.Table:
        lp = b["avg_logprob"].to_numpy(zero_copy_only=False)
        keep = ~np.isnan(lp)
        return pa.table(
            {
                "doc_id": pa.array(
                    b["doc_id"].to_numpy(zero_copy_only=False)[keep].astype(
                        np.int64
                    )
                ),
                "lp": pa.array(
                    np.round(lp[keep] * 1_000_000).astype(np.int64)
                ),
            }
        )

    lang_side = _docs(sf_dir, columns=("doc_id", "lang")).map_batches(
        lambda b: pa.table({"doc_id_r": b["doc_id"], "lang": b["lang"]}),
        batch_format="pyarrow",
    )
    joined = bucketed_hash_join(
        ppl.map_batches(to_micro, batch_format="pyarrow"),
        lang_side,
        left_on="doc_id",
        right_on="doc_id_r",
        num_buckets=8,
    )

    hist = (
        joined.map_batches(
            lambda b: pa.table({"lang": b["lang"], "lp": b["lp"]})
            .group_by(["lang", "lp"])
            .aggregate([([], "count_all")])
            .rename_columns(["lang", "lp", "cnt"]),
            batch_format="pyarrow",
        )
        .groupby(["lang", "lp"])
        .aggregate(Sum(on="cnt", alias_name="cnt"))
        .to_pandas()  # bounded: resolution cells
    )

    thresholds: dict[str, tuple[int, int]] = {}
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("lp")
        vals = g["lp"].to_numpy(np.int64)
        cnts = g["cnt"].to_numpy(np.int64)
        cum = np.cumsum(cnts)
        n = int(cum[-1])

        def disc(q: float) -> int:
            k = math.ceil(n * q)  # same double product DuckDB forms
            return int(vals[np.searchsorted(cum, k)])

        thresholds[str(lang)] = (disc(1.0 / 3), disc(2.0 / 3))
    thr_ref = ray.put(thresholds)

    def assign(b: pa.Table) -> pa.Table:
        thr = ray.get(thr_ref)
        langs = b["lang"].to_pylist()
        lp = b["lp"].to_numpy(zero_copy_only=False)
        bins = [
            "tail"
            if lp[j] <= thr[langs[j]][0]
            else ("middle" if lp[j] <= thr[langs[j]][1] else "head")
            for j in range(len(langs))
        ]
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "bin": pa.array(bins, pa.string()),
                "lp": b["lp"],
            }
        )

    return (
        joined.map_batches(assign, batch_format="pyarrow")
        .groupby(["lang", "bin"])
        .aggregate(
            Count(alias_name="n_docs"),
            Min(on="lp", alias_name="min_lp_micro"),
            Max(on="lp", alias_name="max_lp_micro"),
        )
    )


# --------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion + ranked-list evaluation
# --------------------------------------------------------------------------

_RRF_K = 60  # the canonical smoothing constant (Cormack et al. 2009)

_BM25_QVALS = ", ".join(
    f"({qid}, '{t1}', '{t2}', '{t3}')" for qid, (t1, t2, t3) in _BM25_QUERIES
)
_BM25_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in _BM25_TERMS) + ")"

# Second ranker shared by the fusion/eval oracles: rank documents by TOTAL
# query-term frequency (an exact-integer lexical ranker — the "sparse"
# leg of a hybrid stack), score > 0 only, ties doc_id asc, top-10.
_TF_RANKER_SQL = f"""
        SELECT query_id, doc_id, r FROM (
            SELECT q.query_id, f.doc_id,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY (COALESCE(a.tf, 0) + COALESCE(b.tf, 0)
                                 + COALESCE(c.tf, 0)) DESC, f.doc_id ASC
                   ) AS r,
                   COALESCE(a.tf, 0) + COALESCE(b.tf, 0) + COALESCE(c.tf, 0)
                       AS s
            FROM (SELECT DISTINCT doc_id FROM tft) f
            CROSS JOIN (VALUES {_BM25_QVALS}) q(query_id, t1, t2, t3)
            LEFT JOIN tft a ON a.doc_id = f.doc_id AND a.token = q.t1
            LEFT JOIN tft b ON b.doc_id = f.doc_id AND b.token = q.t2
            LEFT JOIN tft c ON c.doc_id = f.doc_id AND c.token = q.t3
        ) WHERE s > 0 AND r <= {_BM25_TOPK}
"""

_TFT_CTE = f"""
    toks AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents
    ), tft AS (
        SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        FROM toks WHERE token IN {_BM25_TERMS_SQL} GROUP BY doc_id, token
    )
"""


def _tf_topk_pandas(sf_dir: str):
    """Total-query-term-frequency top-10 per query: one corpus scan, a
    per-batch integer partial top-k per query (lossless under the global
    (s desc, doc_id asc) order), bounded driver merge."""
    from sciscraper_ray.kernels.tokenize import tokenize_column

    def partial(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch["text"])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nrows = len(batch)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        tf = {}
        for t in _BM25_TERMS:
            mask = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            tf[t] = np.bincount(par[mask], minlength=nrows).astype(np.int64)
        out_q, out_d, out_s = [], [], []
        for qid, (t1, t2, t3) in _BM25_QUERIES:
            s = tf[t1] + tf[t2] + tf[t3]
            nz = np.flatnonzero(s > 0)
            order = nz[np.lexsort((doc_ids[nz], -s[nz]))][: _BM25_TOPK]
            out_q.append(np.full(len(order), qid, np.int64))
            out_d.append(doc_ids[order])
            out_s.append(s[order])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "doc_id": pa.array(np.concatenate(out_d)),
                "s": pa.array(np.concatenate(out_s)),
            }
        )

    cand = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # bounded: batches x Q x k rows
    )
    cand = cand.sort_values(
        ["query_id", "s", "doc_id"], ascending=[True, False, True]
    )
    return cand.groupby("query_id", sort=True).head(_BM25_TOPK)


def _ranks_of(df, score_col: str, ascending: bool = False):
    """1-based per-query rank under (score desc, doc_id asc) — the same
    total order every ranked-list oracle here uses."""
    df = df.sort_values(
        ["query_id", score_col, "doc_id"], ascending=[True, ascending, True]
    ).reset_index(drop=True)
    df["r"] = df.groupby("query_id").cumcount() + 1
    return df[["query_id", "doc_id", "r"]]


@register(
    "retrieval_rrf_fusion",
    oracle=f"""
    WITH bm AS ({_bm25_oracle()}),
    bmr AS (
        SELECT query_id, doc_id,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY score DESC, doc_id ASC
               ) AS r
        FROM bm
    ),
    {_TFT_CTE},
    tfr AS ({_TF_RANKER_SQL}),
    cand AS (
        SELECT query_id, doc_id FROM bmr
        UNION
        SELECT query_id, doc_id FROM tfr
    ),
    fused AS (
        SELECT c.query_id, c.doc_id,
               COALESCE(1.0 / ({_RRF_K} + b.r), 0.0)
               + COALESCE(1.0 / ({_RRF_K} + t.r), 0.0) AS rrf_score
        FROM cand c
        LEFT JOIN bmr b ON b.query_id = c.query_id AND b.doc_id = c.doc_id
        LEFT JOIN tfr t ON t.query_id = c.query_id AND t.doc_id = c.doc_id
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rrf_score,
           CAST(fused_rank AS BIGINT) AS fused_rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC
        ) AS fused_rank
        FROM fused
    ) WHERE fused_rank <= {_BM25_TOPK}
    """,
)
def retrieval_rrf_fusion(sf_dir: str):
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of two
    retrieval legs — the standard hybrid-search merge (dense+sparse in a
    RAG stack; here BM25 + an exact-integer total-term-frequency ranker,
    so both legs and the fusion are engine-reproducible). Each leg is a
    full corpus scan with per-batch bounded top-k partials (the BM25 plan
    and its integer twin); fusion itself touches only the <= 2*Q*k
    candidate rows. RRF score = sum over lists of 1/(60+rank), docs
    absent from a list contribute 0 — computed as two exactly-rounded
    IEEE divisions plus one add in the SAME association on both engines,
    so the emitted doubles are bit-identical (no transcendentals, no
    reduction-order ambiguity). At 100 TB each leg is the already-proven
    streaming top-k; the fused merge never leaves candidate scale."""
    import pandas as pd

    from sciscraper_ray.pipelines.queries._shared import QUERIES

    bm = QUERIES["doc_bm25_topk"](sf_dir).to_pandas()  # bounded: Q x k fused top-k
    bmr = _ranks_of(bm, "score")
    tfr = _ranks_of(_tf_topk_pandas(sf_dir), "s")

    cand = pd.merge(
        bmr.rename(columns={"r": "r_bm"}),
        tfr.rename(columns={"r": "r_tf"}),
        on=["query_id", "doc_id"],
        how="outer",
    )
    a = np.where(
        cand["r_bm"].notna(), 1.0 / (_RRF_K + cand["r_bm"].fillna(0.0)), 0.0
    )
    b = np.where(
        cand["r_tf"].notna(), 1.0 / (_RRF_K + cand["r_tf"].fillna(0.0)), 0.0
    )
    cand["rrf_score"] = a + b
    cand = cand.sort_values(
        ["query_id", "rrf_score", "doc_id"], ascending=[True, False, True]
    ).reset_index(drop=True)
    cand["fused_rank"] = cand.groupby("query_id").cumcount() + 1
    top = cand[cand["fused_rank"] <= _BM25_TOPK]
    return pa.table(
        {
            "query_id": pa.array(top["query_id"].to_numpy(np.int64)),
            "doc_id": pa.array(top["doc_id"].to_numpy(np.int64)),
            "rrf_score": pa.array(top["rrf_score"].to_numpy(np.float64)),
            "fused_rank": pa.array(top["fused_rank"].to_numpy(np.int64)),
        }
    )


@register(
    "retrieval_eval_mrr",
    oracle=f"""
    WITH bm AS ({_bm25_oracle()}),
    bmr AS (
        SELECT query_id, doc_id,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY score DESC, doc_id ASC
               ) AS r
        FROM bm
    ),
    {_TFT_CTE},
    rel AS (
        SELECT q.query_id, a.doc_id
        FROM (VALUES {_BM25_QVALS}) q(query_id, t1, t2, t3)
        JOIN tft a ON a.token = q.t1
        JOIN tft b ON b.doc_id = a.doc_id AND b.token = q.t2
        JOIN tft c ON c.doc_id = a.doc_id AND c.token = q.t3
    ),
    hit AS (
        SELECT bmr.query_id, bmr.r
        FROM bmr JOIN rel
          ON rel.query_id = bmr.query_id AND rel.doc_id = bmr.doc_id
    ),
    per AS (
        SELECT q.query_id,
               (SELECT count(*) FROM rel
                WHERE rel.query_id = q.query_id) AS n_rel,
               (SELECT count(*) FROM hit
                WHERE hit.query_id = q.query_id AND hit.r <= 5) AS hits_at_5,
               (SELECT count(*) FROM hit
                WHERE hit.query_id = q.query_id AND hit.r <= 10)
                   AS hits_at_10,
               COALESCE((SELECT min(hit.r) FROM hit
                         WHERE hit.query_id = q.query_id), 0)
                   AS first_rel_rank
        FROM (VALUES {_BM25_QVALS}) q(query_id, t1, t2, t3)
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(n_rel AS BIGINT) AS n_rel,
           CAST(hits_at_5 AS BIGINT) AS hits_at_5,
           CAST(hits_at_10 AS BIGINT) AS hits_at_10,
           CAST(first_rel_rank AS BIGINT) AS first_rel_rank,
           CASE WHEN first_rel_rank = 0 THEN 0
                ELSE CAST(round(1000000.0 / first_rel_rank) AS BIGINT)
           END AS mrr_micro
    FROM per
    """,
)
def retrieval_eval_mrr(sf_dir: str):
    """Ranked-list evaluation of the BM25 leg against a deterministic
    relevance oracle (doc is relevant to a query iff it contains ALL
    three query terms — the boolean-AND containment label): per query
    emits n_rel, hits@5, hits@10, the first relevant rank, and MRR in
    exact micro units (round(1e6 / first_rank); 1e6/r never lands on a
    .5 for r <= 10, so half-even vs half-up cannot diverge). Plan: the
    ranked list is the proven bounded top-k; relevance then needs ONE
    more corpus scan emitting per-batch 5-int relevant-doc COUNT
    partials plus flags for the <= Q*k broadcast ranked docs — the
    exchange is (Q + Q*k) rows regardless of corpus size, and the
    metric assembly happens on that bounded table."""
    import ray

    from sciscraper_ray.kernels.tokenize import tokenize_column
    from sciscraper_ray.pipelines.queries._shared import QUERIES

    bm = QUERIES["doc_bm25_topk"](sf_dir).to_pandas()  # bounded: Q x k top-k
    bmr = _ranks_of(bm, "score")
    ranked = {
        int(q): dict(zip(g["doc_id"].astype(np.int64), g["r"].astype(np.int64)))
        for q, g in bmr.groupby("query_id")
    }
    ranked_ref = ray.put(ranked)

    def partial(batch: pa.Table) -> pa.Table:
        ranked_ = ray.get(ranked_ref)
        toks = tokenize_column(batch["text"])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nrows = len(batch)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        has = {}
        for t in _BM25_TERMS:
            mask = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            has[t] = np.bincount(par[mask], minlength=nrows) > 0
        out_q, out_d, out_c = [], [], []
        for qid, (t1, t2, t3) in _BM25_QUERIES:
            rel = has[t1] & has[t2] & has[t3]
            # count partial rides doc_id = -1
            out_q.append(qid)
            out_d.append(-1)
            out_c.append(int(rel.sum()))
            rdocs = ranked_.get(qid, {})
            for j in np.flatnonzero(rel):
                d = int(doc_ids[j])
                if d in rdocs:
                    out_q.append(qid)
                    out_d.append(d)
                    out_c.append(1)
        return pa.table(
            {
                "query_id": pa.array(np.array(out_q, np.int64)),
                "doc_id": pa.array(np.array(out_d, np.int64)),
                "c": pa.array(np.array(out_c, np.int64)),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["query_id", "doc_id"])
        .aggregate(Sum(on="c", alias_name="c"))
        .to_pandas()  # bounded: Q count rows + Q*k flag rows
    )
    rows = []
    for qid, _terms in _BM25_QUERIES:
        g = agg[agg["query_id"] == qid]
        n_rel = int(g.loc[g["doc_id"] == -1, "c"].sum())
        rdocs = ranked.get(qid, {})
        hit_ranks = sorted(
            rdocs[int(d)]
            for d in g.loc[g["doc_id"] >= 0, "doc_id"]
            if int(d) in rdocs
        )
        h5 = sum(1 for r in hit_ranks if r <= 5)
        h10 = sum(1 for r in hit_ranks if r <= 10)
        first = hit_ranks[0] if hit_ranks else 0
        mrr = int(np.round(1_000_000.0 / first)) if first else 0
        rows.append((qid, n_rel, h5, h10, first, mrr))
    q, nr, h5s, h10s, fr, mm = zip(*rows)
    return pa.table(
        {
            "query_id": pa.array(np.array(q, np.int64)),
            "n_rel": pa.array(np.array(nr, np.int64)),
            "hits_at_5": pa.array(np.array(h5s, np.int64)),
            "hits_at_10": pa.array(np.array(h10s, np.int64)),
            "first_rel_rank": pa.array(np.array(fr, np.int64)),
            "mrr_micro": pa.array(np.array(mm, np.int64)),
        }
    )


@register(
    "graph_scc_sizes",
    oracle=f"""
    WITH RECURSIVE links AS (
        SELECT DISTINCT doc_id AS src, unnest({_REF_TARGETS_SQL}) AS dst
        FROM documents
    ),
    reach(a, b) AS (
        SELECT src, dst FROM links
        UNION
        SELECT r.a, l.dst FROM reach r JOIN links l ON l.src = r.b
    ),
    mutual AS (
        SELECT r1.a AS v, r1.b AS u
        FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
    ),
    sccid AS (SELECT v, min(u) AS scc_id FROM mutual GROUP BY v)
    SELECT CAST(scc_id AS BIGINT) AS scc_id,
           CAST(count(*) AS BIGINT) AS size
    FROM sccid GROUP BY scc_id HAVING count(*) >= 2
    """,
)
def graph_scc_sizes(sf_dir: str):
    """Non-trivial strongly-connected components of the directed
    doc-level link graph — the MultiStep plan (pipelines/graph.py
    strongly_connected_sizes): iterative distributed TRIM drops every
    edge whose src has no in-edge or whose dst has no out-edge (no node
    either side of such an edge can sit on a cycle; removal cascades to
    fixpoint), leaving the cyclic core orders of magnitude smaller than
    the crawl, then exact iterative Tarjan labels the core under the
    driver-merge contract. Emits (scc_id = min member, size) for every
    SCC with >= 2 nodes. Trim rounds exchange only NODE-set partials and
    a broadcast filter — edges never shuffle. The oracle recomputes the
    closure with a recursive CTE: scc(v) = min u with v->*u and u->*v."""
    from sciscraper_ray.pipelines.graph import strongly_connected_sizes

    return strongly_connected_sizes(_doc_edges(sf_dir))


@register(
    "link_reciprocity",
    oracle=f"""
    WITH raw AS (
        SELECT doc_id AS u, unnest({_REF_TARGETS_SQL}) AS v FROM documents
    ), e AS (
        SELECT DISTINCT u, v FROM raw WHERE u <> v
    ), r AS (
        SELECT count(*) AS recip FROM e x JOIN e y ON x.u = y.v AND x.v = y.u
    )
    SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT recip FROM r) AS BIGINT) AS n_reciprocal,
           CAST((SELECT recip FROM r) AS DOUBLE)
               / (SELECT count(*) FROM e) AS reciprocity
    """,
)
def link_reciprocity(sf_dir: str):
    """Link reciprocity of the crawled page graph — the fraction of
    directed doc->doc reference edges whose reverse edge also exists,
    the classic link-farm / mutual-citation-ring detector (organic web
    link graphs sit near ~0.05-0.3; paid link networks spike it).
    Edges are harvested from the rendered pages' reference sections
    (DOM parse + href doc-id extraction, same stage as page_link_graph),
    de-duplicated per batch, then every directed edge is folded onto its
    UNORDERED key packed into one int64 ((min << 32) | max) carrying a
    direction bit — one vocab-bounded exchange; a pair is reciprocal
    iff its key accumulates both bits. The scalar report is exact
    integers plus their ratio in identical double arithmetic."""
    import pandas as pd

    from sciscraper_ray.sources.page_synth import render_html
    from sciscraper_ray.stages.dom_select import select_links

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        us: list[int] = []
        vs: list[int] = []
        for i, t, lg in zip(ids, texts, langs):
            page = render_html(int(i), t, lg, with_links=True).decode()
            for href, _anchor in select_links(page, "section.refs a"):
                v = int(href.rsplit("doc-", 1)[1])
                if v != int(i):
                    us.append(int(i))
                    vs.append(v)
        u = np.asarray(us, np.int64)
        v = np.asarray(vs, np.int64)
        key = (np.minimum(u, v) << 32) | np.maximum(u, v)
        bit = np.where(u < v, 1, 2).astype(np.int64)
        df = pd.DataFrame({"key": key, "bit": bit}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    from ray.data.aggregate import Sum

    # Distributed fold (ADVICE r4): global dedup of directed edges on the
    # packed (key, bit) pair, then sum direction bits per unordered key —
    # only two scalars ever reach the driver.
    distinct = (
        _docs(sf_dir, columns=("doc_id", "text", "lang"))
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["key", "bit"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )
    n_edges = distinct.count()
    n_recip = 2 * (
        distinct.groupby("key")
        .aggregate(Sum(on="bit", alias_name="bits"))
        .map_batches(
            lambda b: b.filter(pc.equal(b["bits"], 3)), batch_format="pyarrow"
        )
        .count()
    )
    return pa.table(
        {
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_reciprocal": pa.array([n_recip], pa.int64()),
            "reciprocity": pa.array(
                [float(n_recip) / n_edges if n_edges else 0.0], pa.float64()
            ),
        }
    )


_RICH_CLUB_KS = (1, 2, 3, 4)


@register(
    "graph_rich_club",
    oracle=f"""
    WITH raw AS (
        SELECT doc_id AS u, unnest({_REF_TARGETS_SQL}) AS v FROM documents
    ), und AS (
        SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
        FROM raw WHERE u <> v
    ), deg AS (
        SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
            SELECT a AS node FROM und UNION ALL SELECT b FROM und
        ) GROUP BY node
    ), ks AS (
        SELECT * FROM (VALUES {", ".join(f"({k})" for k in _RICH_CLUB_KS)}) AS t(k)
    ), club AS (
        SELECT ks.k, deg.node FROM ks JOIN deg ON deg.d > ks.k
    ), within AS (
        SELECT c1.k, count(*) AS e
        FROM und
        JOIN club c1 ON c1.node = und.a
        JOIN club c2 ON c2.node = und.b AND c2.k = c1.k
        GROUP BY c1.k
    ), sizes AS (
        SELECT k, CAST(count(*) AS BIGINT) AS n FROM club GROUP BY k
    )
    SELECT s.k, s.n AS n_nodes,
           CAST(COALESCE(w.e, 0) AS BIGINT) AS n_edges,
           2 * CAST(COALESCE(w.e, 0) AS DOUBLE) / (CAST(s.n AS DOUBLE) * (s.n - 1))
               AS phi
    FROM sizes s LEFT JOIN within w ON w.k = s.k
    WHERE s.n > 1
    """,
)
def graph_rich_club(sf_dir: str):
    """Rich-club coefficient curve of the page link graph: for each
    degree threshold k, phi(k) = 2 E_k / (N_k (N_k - 1)) — the density
    of the subgraph induced by nodes of degree > k (Colizza et al.
    2006). A rising phi(k) exposes hub collusion (mega-hosts linking
    each other), the structural signature link-spam demotes on. Edges
    come from the rendered pages' reference sections (DOM harvest,
    de-duplicated unordered pairs); the curve itself is one vectorized
    pass over the (node, degree) table per threshold — degrees via
    bincount, club membership masks, and an isin filter over the edge
    list, never per-node Python. Exact integer sizes/edges; phi in
    identical double arithmetic."""
    import pandas as pd

    from sciscraper_ray.sources.page_synth import render_html
    from sciscraper_ray.stages.dom_select import select_links

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        texts = batch["text"].to_pylist()
        langs = batch["lang"].to_pylist()
        aa: list[int] = []
        bb: list[int] = []
        for i, t, lg in zip(ids, texts, langs):
            page = render_html(int(i), t, lg, with_links=True).decode()
            for href, _anchor in select_links(page, "section.refs a"):
                v = int(href.rsplit("doc-", 1)[1])
                if v != int(i):
                    aa.append(min(int(i), v))
                    bb.append(max(int(i), v))
        df = pd.DataFrame({"a": aa, "b": bb}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    from ray.data.aggregate import Sum

    from sciscraper_ray.pipelines.plan import DRIVER_PLAN_LIMIT, driver_frame

    # Distributed fold (ADVICE r4): dedup undirected pairs with one
    # groupby, fold degrees with a second; the driver then pulls only the
    # deduped edge keys and the node-bounded degree table, both behind
    # the 50M fail-fast guard.
    und_ds = (
        _docs(sf_dir, columns=("doc_id", "text", "lang"))
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )

    def deg_partial(b: pa.Table) -> pa.Table:
        both = np.concatenate(
            [
                b["a"].to_numpy(zero_copy_only=False),
                b["b"].to_numpy(zero_copy_only=False),
            ]
        )
        uniq, cnt = np.unique(both, return_counts=True)
        return pa.table(
            {
                "node": pa.array(uniq.astype(np.int64)),
                "d": pa.array(cnt.astype(np.int64)),
            }
        )

    deg_df = driver_frame(
        und_ds.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum(on="d", alias_name="d")),
        DRIVER_PLAN_LIMIT,
        "graph_rich_club (degree table)",
    ).sort_values("node", ignore_index=True)
    und = driver_frame(und_ds, DRIVER_PLAN_LIMIT, "graph_rich_club (edges)")
    a = und["a"].to_numpy(np.int64)
    b = und["b"].to_numpy(np.int64)
    nodes = deg_df["node"].to_numpy(np.int64)
    deg = deg_df["d"].to_numpy(np.int64)
    ai = np.searchsorted(nodes, a)
    bi = np.searchsorted(nodes, b)
    out_k, out_n, out_e, out_phi = [], [], [], []
    for k in _RICH_CLUB_KS:
        member = deg > k
        n = int(member.sum())
        if n <= 1:  # degenerate club: phi undefined, skip (oracle parity)
            continue
        e = int((member[ai] & member[bi]).sum())
        out_k.append(k)
        out_n.append(n)
        out_e.append(e)
        out_phi.append(2 * float(e) / (float(n) * (n - 1)))
    return pa.table(
        {
            "k": pa.array(out_k, pa.int32()),
            "n_nodes": pa.array(out_n, pa.int64()),
            "n_edges": pa.array(out_e, pa.int64()),
            "phi": pa.array(out_phi, pa.float64()),
        }
    )


_CDX_PROBES = (0, 7, 23, 46, 92, 997001, 997007)  # last two never exist


@register(
    "warc_cdx_lookup",
    oracle=f"""
    WITH r AS (
        SELECT doc_id, doc_id % 8 AS shard,
               127 + 2 * length(CAST(doc_id AS VARCHAR))
                   + length(CAST(octet_length(encode(text)) AS VARCHAR))
                   + octet_length(encode(text)) AS rec_len
        FROM documents
    ), cdx AS (
        SELECT doc_id, shard,
               sum(rec_len) OVER (PARTITION BY shard ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) - rec_len AS offset,
               rec_len
        FROM r
    )
    SELECT p.doc_id, CAST(p.doc_id % 8 AS BIGINT) AS shard,
           CAST(coalesce(cdx.offset, -1) AS BIGINT) AS offset,
           CAST(coalesce(cdx.rec_len, -1) AS BIGINT) AS rec_len,
           CAST(cdx.doc_id IS NOT NULL AS BIGINT) AS found
    FROM (VALUES {", ".join(f"({p})" for p in _CDX_PROBES)}) AS p(doc_id)
    LEFT JOIN cdx ON cdx.doc_id = p.doc_id
    """,
)
def warc_cdx_lookup(sf_dir: str):
    """Random-access record lookup through a CDX index — the serving
    path of a crawl archive (wayback-style): each shard task SCANS its
    WARC shard once to build the sorted in-shard index, binary-searches
    the broadcast probe list (probe shard = id % 8, so each probe has
    exactly one owner and misses are provably absent, not elsewhere),
    then actually SEEKS the returned (offset, rec_len) slice and
    verifies the record magic before reporting it found — an index
    entry that doesn't dereference is a corrupt archive, reported as
    absent rather than trusted. Probes include two ids beyond any
    fixture's range to pin the miss path. Zero exchange beyond the
    7-row probe result; the oracle states offsets from the record-
    length arithmetic already proven by warc_cdx_index."""
    import os

    import ray.data

    from sciscraper_ray.sources.warc import cdx_scan

    out_dir, n_shards = _warc_fixture_dir(sf_dir)
    by_shard: dict[int, list[int]] = {}
    for p in _CDX_PROBES:
        by_shard.setdefault(p % n_shards, []).append(p)

    def lookup(batch: pa.Table) -> pa.Table:
        rows = []
        for path, blob in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            shard = int(os.path.basename(path).split("-")[1].split(".")[0])
            probes = by_shard.get(shard, [])
            if not probes:
                continue
            idx = sorted((rec_id, off, ln) for rec_id, _u, off, ln in cdx_scan(blob))
            ids = [r[0] for r in idx]
            import bisect

            for p in probes:
                j = bisect.bisect_left(ids, p)
                if j < len(ids) and ids[j] == p:
                    off, ln = idx[j][1], idx[j][2]
                    ok = blob[off : off + 8] == b"WARC/1.0"
                    rows.append((p, shard, off if ok else -1, ln if ok else -1, int(ok)))
                else:
                    rows.append((p, shard, -1, -1, 0))
        return pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "shard": pa.array([r[1] for r in rows], pa.int64()),
                "offset": pa.array([r[2] for r in rows], pa.int64()),
                "rec_len": pa.array([r[3] for r in rows], pa.int64()),
                "found": pa.array([r[4] for r in rows], pa.int64()),
            }
        )

    return ray.data.read_binary_files(
        [os.path.join(out_dir, f"shard-{s:04d}.warc") for s in range(n_shards)],
        include_paths=True,
    ).map_batches(lookup, batch_format="pyarrow")


_PRF_Q = ("join", "hash", "scan")  # seed query (BM25 query 0)
_PRF_FB_DOCS = 3
_PRF_FB_TERMS = 2


def _prf_oracle() -> str:
    """RM3-lite pseudo-relevance feedback, fully in SQL: BM25 the seed
    query, take its top-3 docs, rank their non-query tokens by raw count
    (ties -> token asc) for 2 expansion terms, then re-score BM25 over
    the 5-term query with a FIXED left-to-right sum (t1..t3, e1, e2) so
    IEEE doubles match the Ray kernel bit-exactly."""
    q_sql = "(" + ", ".join(f"'{t}'" for t in _PRF_Q) + ")"
    base = f"""
    WITH dl AS (
        SELECT doc_id, CAST(len({_SQL_TOKENS}) AS DOUBLE) AS dl FROM documents
    ), corpus AS (
        SELECT CAST(count(*) AS DOUBLE) AS n, sum(dl) AS total FROM dl
    ), toks AS (
        SELECT doc_id, unnest({_SQL_TOKENS}) AS token FROM documents
    ), df AS MATERIALIZED (
        SELECT token, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        FROM toks GROUP BY token
    ), ts AS MATERIALIZED (
        SELECT t.doc_id, t.token,
               ln(1 + (g.n - f.df + 0.5) / (f.df + 0.5))
               * (CAST(t.tf AS DOUBLE) * 2.2)
               / (t.tf + {_BM25_K1} * ((1 - {_BM25_B}) + {_BM25_B} * (d.dl / (g.total / g.n)))) AS s
        FROM (SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf
              FROM toks GROUP BY doc_id, token) t
        JOIN df f ON f.token = t.token
        JOIN dl d ON d.doc_id = t.doc_id
        CROSS JOIN corpus g
    ), seed AS MATERIALIZED (
        SELECT d.doc_id,
               (COALESCE(s1.s, 0) + COALESCE(s2.s, 0)) + COALESCE(s3.s, 0)
                   AS score
        FROM dl d
        LEFT JOIN ts s1 ON s1.doc_id = d.doc_id AND s1.token = '{_PRF_Q[0]}'
        LEFT JOIN ts s2 ON s2.doc_id = d.doc_id AND s2.token = '{_PRF_Q[1]}'
        LEFT JOIN ts s3 ON s3.doc_id = d.doc_id AND s3.token = '{_PRF_Q[2]}'
    ), fb AS MATERIALIZED (
        SELECT doc_id FROM seed
        ORDER BY score DESC, doc_id ASC LIMIT {_PRF_FB_DOCS}
    ), exp AS MATERIALIZED (
        SELECT token, row_number() OVER (
                   ORDER BY count(*) DESC, token ASC
               ) AS rk
        FROM toks
        WHERE doc_id IN (SELECT doc_id FROM fb) AND token NOT IN {q_sql}
        GROUP BY token
        ORDER BY count(*) DESC, token ASC LIMIT {_PRF_FB_TERMS}
    )
    SELECT d.doc_id,
           ((((COALESCE(s1.s, 0) + COALESCE(s2.s, 0)) + COALESCE(s3.s, 0))
               + COALESCE(e1.s, 0)) + COALESCE(e2.s, 0)) AS score
    FROM dl d
    LEFT JOIN ts s1 ON s1.doc_id = d.doc_id AND s1.token = '{_PRF_Q[0]}'
    LEFT JOIN ts s2 ON s2.doc_id = d.doc_id AND s2.token = '{_PRF_Q[1]}'
    LEFT JOIN ts s3 ON s3.doc_id = d.doc_id AND s3.token = '{_PRF_Q[2]}'
    LEFT JOIN ts e1 ON e1.doc_id = d.doc_id
        AND e1.token = (SELECT token FROM exp WHERE rk = 1)
    LEFT JOIN ts e2 ON e2.doc_id = d.doc_id
        AND e2.token = (SELECT token FROM exp WHERE rk = 2)
    ORDER BY score DESC, d.doc_id ASC LIMIT {_BM25_TOPK}
    """
    return (
        f"SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC)"
        f" AS BIGINT) AS rank, doc_id, score FROM ({base})"
    )


@register("retrieval_bm25_prf", oracle=_prf_oracle())
def retrieval_bm25_prf(sf_dir: str):
    """Pseudo-relevance feedback (RM3-lite, Lavrenko & Croft shape):
    BM25 the seed query, harvest the 2 highest-count non-query tokens
    from its top-3 documents, and re-run BM25 over the expanded 5-term
    query — the zero-training recall booster classical IR systems run
    between first-pass retrieval and reranking. Three bounded passes:
    (1) the shared BM25 stats pass but with FULL vocabulary df (one
    vocab-bounded exchange instead of a fixed term list — expansion
    terms aren't known in advance, which is the whole point), (2) seed
    scoring with per-batch top-k partials, (3) feedback-term tally over
    just 3 broadcast doc ids, then expanded scoring, again top-k
    partials. Every score expression and the 5-term left-to-right sum
    mirror the oracle literal-for-literal, so the final ranking is
    IEEE-bit-exact with no rounding."""
    import ray
    from ray.data.aggregate import Sum

    from sciscraper_ray.kernels.tokenize import tokenize_column

    ds = _docs(sf_dir)

    # pass 1: corpus stats + FULL-vocab df (vocab-bounded partials)
    def stats_partial(batch: pa.Table) -> pa.Table:
        toks = tokenize_column(batch["text"])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        par = pc.list_parent_indices(toks)
        dfp = (
            pa.table({"token": flat, "d": par})
            .group_by(["token", "d"])
            .aggregate([])
            .group_by("token")
            .aggregate([([], "count_all")])
            .rename_columns(["term", "a"])
        )
        head = pa.table(
            {
                "term": pa.array([""]),
                "a": pa.array([len(batch)], pa.int64()),
            }
        )
        # 'b' carries total token length on the "" row only
        out = pa.concat_tables(
            [
                head.append_column("b", pa.array([int(len(flat))], pa.int64())),
                dfp.append_column("b", pa.array([0] * len(dfp), pa.int64())),
            ]
        )
        return out

    stats = (
        ds.map_batches(stats_partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum(on="a", alias_name="a"), Sum(on="b", alias_name="b"))
        .to_pandas()  # bounded: vocabulary term stats (broadcast side)
    )
    srow = stats[stats["term"] == ""].iloc[0]
    n_docs, total_len = float(srow["a"]), float(srow["b"])
    avgdl = total_len / n_docs
    df_all = dict(
        zip(stats["term"], stats["a"].astype(float))
    )  # per-batch partials count distinct docs per batch; docs never split
    # across batches for df because group was (token, in-batch doc) — the
    # groupby Sum then adds per-batch distinct-doc counts, and a doc lives
    # in exactly one batch, so the sum IS the global df.

    def idf_of(t: str) -> float:
        d = df_all.get(t, 0.0)
        return float(np.log(1 + (n_docs - d + 0.5) / (d + 0.5)))

    def score_terms(terms: tuple, k: int) -> "pa.Table":
        idf = {t: idf_of(t) for t in terms}
        consts = ray.put((idf, avgdl, tuple(terms)))

        def score_partial(batch: pa.Table) -> pa.Table:
            idf_, avgdl_, terms_ = ray.get(consts)
            toks = tokenize_column(batch["text"])
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            flat = pc.list_flatten(toks)
            par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
            nrows = len(batch)
            dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            denom = _BM25_K1 * ((1 - _BM25_B) + _BM25_B * (dl / avgdl_))
            score = None
            for t in terms_:
                mask = pc.equal(flat, t).to_numpy(zero_copy_only=False)
                tf = np.bincount(par[mask], minlength=nrows).astype(np.float64)
                s = np.zeros(nrows)
                nz = tf > 0
                s[nz] = idf_[t] * (tf[nz] * 2.2) / (tf[nz] + denom[nz])
                score = s if score is None else score + s
            kk = min(k, nrows)
            order = np.lexsort((doc_ids, -score))[:kk]
            return pa.table(
                {
                    "doc_id": pa.array(doc_ids[order], pa.int64()),
                    "score": pa.array(score[order], pa.float64()),
                }
            )

        cand = (
            ds.map_batches(score_partial, batch_format="pyarrow")
            .to_pandas()  # bounded: per-block top candidates
            .sort_values(["score", "doc_id"], ascending=[False, True])
            .head(k)
        )
        return cand

    seed_top = score_terms(_PRF_Q, _PRF_FB_DOCS)
    fb_ids = set(int(d) for d in seed_top["doc_id"])
    fb_ref = ray.put(fb_ids)

    def fb_tokens(batch: pa.Table) -> pa.Table:
        import pandas as pd

        wanted = ray.get(fb_ref)
        keep = np.isin(
            batch["doc_id"].to_numpy(zero_copy_only=False), list(wanted)
        )
        if not keep.any():
            return pa.table(
                {"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        toks = tokenize_column(batch.filter(pa.array(keep))["text"])
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pc.list_flatten(toks)
        agg = pa.table({"token": flat}).group_by("token").aggregate([([], "count_all")])
        return agg.rename_columns(["token", "cnt"])

    fb = (
        ds.map_batches(fb_tokens, batch_format="pyarrow")
        .to_pandas()  # bounded: feedback-doc vocabulary
        .groupby("token", as_index=False)["cnt"]
        .sum()
    )
    fb = fb[~fb["token"].isin(_PRF_Q)].sort_values(
        ["cnt", "token"], ascending=[False, True]
    )
    expansion = tuple(fb["token"].head(_PRF_FB_TERMS))
    top = score_terms(tuple(_PRF_Q) + expansion, _BM25_TOPK).reset_index(drop=True)
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int64), pa.int64()),
            "doc_id": pa.array(top["doc_id"].to_numpy(np.int64), pa.int64()),
            "score": pa.array(top["score"].to_numpy(np.float64), pa.float64()),
        }
    )


@register(
    "link_powerlaw_alpha",
    oracle=f"""
    WITH l AS (
        SELECT unnest({_REF_TARGETS_SQL}) AS dst FROM documents
    ), ind AS (
        SELECT dst, CAST(count(*) AS BIGINT) AS d FROM l GROUP BY dst
    ), dmin AS (SELECT CAST(min(d) AS BIGINT) AS dm FROM ind)
    SELECT CAST(count(*) AS BIGINT) AS n_nodes,
           (SELECT dm FROM dmin) AS d_min,
           1 + count(*) / sum(ln(CAST(d AS DOUBLE) / (SELECT dm FROM dmin)
                                 ) + 0.0)
               AS alpha
    FROM ind WHERE d >= (SELECT dm FROM dmin)
    """,
)
def link_powerlaw_alpha(sf_dir: str):
    """Power-law exponent of the link in-degree distribution by the
    continuous MLE (Clauset, Shalizi & Newman 2009, eq. 3.1):
    alpha = 1 + n / sum ln(d_i / d_min) — the one-number answer to 'is
    this crawl's link graph scale-free, and how heavy is the tail'
    (alpha ~ 2-3 is webgraph-normal; alpha drifting low flags link-farm
    inflation). In-degree tallies are a dst-bounded exchange; the MLE
    is one vectorized log pass. Exact integer n and d_min; alpha is a
    double whose ln-sum matches the oracle at the canonical 12-digit
    comparison (same PMI-family convention)."""
    import pandas as pd

    def partials(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        dst = np.concatenate([(ids * 17 + 13) % 997, (ids * 29 + 7) % 997])
        uniq, cnt = np.unique(dst, return_counts=True)
        return pa.table(
            {
                "dst": pa.array(uniq.astype(np.int64), pa.int64()),
                "d": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    ind = (
        _docs(sf_dir, columns=("doc_id",))
        .map_batches(partials, batch_format="pyarrow")
        .to_pandas()  # bounded: node id space (synth targets < 997)
        .groupby("dst")["d"]
        .sum()
    )
    d = ind.to_numpy(np.int64)
    dm = int(d.min())
    n = len(d)
    alpha = 1 + n / float(np.log(d.astype(np.float64) / dm).sum() + 0.0)
    return pa.table(
        {
            "n_nodes": pa.array([n], pa.int64()),
            "d_min": pa.array([dm], pa.int64()),
            "alpha": pa.array([alpha], pa.float64()),
        }
    )
