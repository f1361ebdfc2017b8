"""Round-4 session-Q additions: bottom-k exact sampling, grouped
two-pass quantiles — first-principles recomputes (oracle parity runs in
tools/check_correctness.py at all three sf dirs)."""

import hashlib

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def test_doc_sample_bottomk(ray_session):
    got = _df(QUERIES["doc_sample_bottomk"](SF))
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id"])
    hs = {
        int(i): int(hashlib.md5(str(int(i)).encode()).hexdigest()[:15], 16)
        for i in docs["doc_id"]
    }
    want = sorted(hs, key=hs.__getitem__)[:100]
    assert got["doc_id"].tolist() == want
    assert got["sample_rank"].tolist() == list(range(1, 101))
    # mergeability: bottom-k of any split's bottom-k equals the global
    half = len(docs) // 2
    a = sorted((h, d) for d, h in hs.items() if d < half)[:100]
    b = sorted((h, d) for d, h in hs.items() if d >= half)[:100]
    assert [d for _, d in sorted(a + b)[:100]] == want


def test_orders_value_quantiles_by_segment(ray_session):
    got = _df(QUERIES["orders_value_quantiles_by_segment"](SF)).set_index(
        ["seg", "pct"]
    )
    orders = pd.read_parquet(SF + "/orders.parquet")
    cust = pd.read_parquet(SF + "/customer.parquet")
    m = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    m["cents"] = np.round(m["o_totalprice"] * 100).astype(np.int64)
    for seg, g in m.groupby("c_mktsegment"):
        cents = np.sort(g["cents"].to_numpy())
        n = len(cents)
        for pct in (50, 90):
            idx = (n * pct + 99) // 100 - 1
            row = got.loc[(seg, pct)]
            assert int(row["value_cents"]) == int(cents[idx])
            assert int(row["n_rows"]) == n
    assert len(got) == m["c_mktsegment"].nunique() * 2
