"""Round-4 session-L additions: dimension-truncation recall, KMV
intersection estimate — first-principles recomputes (oracle parity runs
in tools/check_correctness.py at all three sf dirs)."""

import hashlib

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def _topk(emb, qid, dims, k=5):
    q = emb[qid][:dims]
    sims = {}
    for vid, v in emb.items():
        if vid == qid:
            continue
        a, b = q, v[:dims]
        sims[vid] = float(
            np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
        )
    order = sorted(sims, key=lambda v: (-sims[v], v))
    return set(order[:k])


def test_ann_dim_truncation_recall(ray_session):
    got = _df(QUERIES["ann_dim_truncation_recall"](SF)).set_index("qid")
    t = pd.read_parquet(SF + "/embeddings.parquet")
    emb = {
        int(r.vec_id): np.asarray(r.embedding, np.float64)
        for r in t.itertuples()
    }
    assert len(got) == 10
    for qid in range(10):
        full = _topk(emb, qid, 64)
        trunc = _topk(emb, qid, 16)
        assert int(got.loc[qid, "n_common"]) == len(full & trunc)
        assert got.loc[qid, "k"] == 5
    # truncation to a quarter of the dims must lose SOMETHING somewhere,
    # but keep most neighbors on average for this embedding family
    assert 0 < got["n_common"].sum() <= 50


def test_customer_year_overlap_kmv(ray_session):
    got = _df(QUERIES["customer_year_overlap_kmv"](SF)).set_index("yr_from")
    orders = pd.read_parquet(SF + "/orders.parquet")
    orders["yr"] = orders["o_orderdate"].dt.year
    by_year = {
        y: set(g["o_custkey"]) for y, g in orders.groupby("yr")
    }
    K, M = 64, 16**15

    def h(c):
        return int(hashlib.md5(str(int(c)).encode()).hexdigest()[:15], 16)

    for y in sorted(by_year):
        if y + 1 not in by_year:
            continue
        a = {h(c) for c in by_year[y]}
        b = {h(c) for c in by_year[y + 1]}
        union = sorted(a | b)
        nd = len(union)
        k_used = min(nd, K)
        est_union = nd if nd < K else (K - 1) * M // union[K - 1]
        c = sum(1 for v in union[:k_used] if v in a and v in b)
        row = got.loc[y]
        assert row["yr_to"] == y + 1
        assert row["true_union"] == nd
        assert row["est_union"] == est_union
        assert row["true_inter"] == len(a & b)
        assert row["est_inter"] == c * est_union // k_used
        assert row["k_used"] == k_used
        if nd >= K:  # sketch branch engaged: sanity on the estimate
            assert 0.3 * nd < est_union < 3 * nd
