"""Round-4 session-AC additions: hybrid-retrieval RRF fusion + ranked-list
evaluation — first-principles recomputes (oracle parity runs in
tools/check_correctness.py at all three sf dirs)."""

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def _tokens(text: str) -> list[str]:
    return text.strip().lower().split(" ")


def test_retrieval_rrf_fusion(ray_session):
    from sciscraper_ray.pipelines.queries.retrieval import (
        _BM25_QUERIES,
        _BM25_TOPK,
        _RRF_K,
    )

    got = _df(QUERIES["retrieval_rrf_fusion"](SF))
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])

    # leg 1: the registered BM25 list (its own oracle pins its semantics)
    bm = _df(QUERIES["doc_bm25_topk"](SF))
    # leg 2: total-term-frequency ranking recomputed from scratch
    tf_rank: dict[tuple[int, int], int] = {}
    for qid, terms in _BM25_QUERIES:
        scores = []
        for d, t in zip(docs["doc_id"], docs["text"]):
            toks = _tokens(t)
            s = sum(toks.count(term) for term in terms)
            if s > 0:
                scores.append((-s, int(d)))
        for r, (_neg, d) in enumerate(sorted(scores)[:_BM25_TOPK], start=1):
            tf_rank[(qid, d)] = r

    bm_rank: dict[tuple[int, int], int] = {}
    for qid, g in bm.groupby("query_id"):
        g = g.sort_values(["score", "doc_id"], ascending=[False, True])
        for r, d in enumerate(g["doc_id"], start=1):
            bm_rank[(int(qid), int(d))] = r

    for qid, _terms in _BM25_QUERIES:
        cand = {d for (q, d) in bm_rank if q == qid} | {
            d for (q, d) in tf_rank if q == qid
        }
        exp = []
        for d in cand:
            s = 0.0
            if (qid, d) in bm_rank:
                s += 1.0 / (_RRF_K + bm_rank[(qid, d)])
            if (qid, d) in tf_rank:
                s += 1.0 / (_RRF_K + tf_rank[(qid, d)])
            exp.append((-s, d))
        exp_top = [d for _s, d in sorted(exp)[:_BM25_TOPK]]
        g = got[got["query_id"] == qid].sort_values("fused_rank")
        assert list(g["doc_id"]) == exp_top
        # scores decrease along the fused ranking (ties broken by doc_id)
        assert (np.diff(g["rrf_score"].to_numpy()) <= 1e-18).all()


def test_retrieval_eval_mrr(ray_session):
    from sciscraper_ray.pipelines.queries.retrieval import _BM25_QUERIES

    got = _df(QUERIES["retrieval_eval_mrr"](SF)).set_index("query_id")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    bm = _df(QUERIES["doc_bm25_topk"](SF))

    for qid, terms in _BM25_QUERIES:
        rel = {
            int(d)
            for d, t in zip(docs["doc_id"], docs["text"])
            if all(term in _tokens(t) for term in terms)
        }
        g = bm[bm["query_id"] == qid].sort_values(
            ["score", "doc_id"], ascending=[False, True]
        )
        ranked = [int(d) for d in g["doc_id"]]
        hit_ranks = [r for r, d in enumerate(ranked, start=1) if d in rel]
        row = got.loc[qid]
        assert row["n_rel"] == len(rel)
        assert row["hits_at_5"] == sum(1 for r in hit_ranks if r <= 5)
        assert row["hits_at_10"] == len(hit_ranks)
        first = hit_ranks[0] if hit_ranks else 0
        assert row["first_rel_rank"] == first
        assert row["mrr_micro"] == (
            int(np.round(1_000_000.0 / first)) if first else 0
        )
