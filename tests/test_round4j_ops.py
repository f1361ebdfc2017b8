"""Round-4 session-J additions: KMV distinct sketch, Z-order layout
stats, segment x nation independence audit — first-principles recomputes
(oracle parity runs in tools/check_correctness.py at all three sf dirs)."""

import hashlib

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def _h(u):
    return int(hashlib.md5(str(int(u)).encode()).hexdigest()[:15], 16)


def test_events_kmv_exact_branch(ray_session):
    # sf0.001 has 15 users — under k=64 the sketch must be EXACT
    got = _df(QUERIES["events_kmv_distinct"](SF))
    ev = pd.read_parquet(SF + "/events.parquet", columns=["event_type", "user_id"])
    want = ev.groupby("event_type")["user_id"].nunique()
    for _, r in got.iterrows():
        assert r["est_distinct"] == r["true_distinct"] == want[r["event_type"]]
        assert r["k_used"] == want[r["event_type"]]


def test_events_kmv_sketch_branch(ray_session):
    # sf0.01 has 150 users — the bottom-64 estimator engages
    got = _df(QUERIES["events_kmv_distinct"](SF01)).set_index("event_type")
    ev = pd.read_parquet(SF01 + "/events.parquet", columns=["event_type", "user_id"])
    for et, g in ev.groupby("event_type"):
        users = g["user_id"].unique()
        nd = len(users)
        hs = sorted(_h(u) for u in users)
        want = nd if nd < 64 else 63 * 16**15 // hs[63]
        assert int(got.loc[et, "true_distinct"]) == nd
        assert int(got.loc[et, "est_distinct"]) == want
        if nd >= 64:
            assert got.loc[et, "k_used"] == 64
            # the estimator should be in the right ballpark (KMV with
            # k=64 has ~12% relative std error)
            assert 0.5 * nd < want < 2 * nd


def _zvalue(x, y):
    z = 0
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_lineitem_zorder_stats(ray_session):
    got = _df(QUERIES["lineitem_zorder_stats"](SF)).set_index("bucket")
    li = pd.read_parquet(SF + "/lineitem.parquet", columns=["l_shipdate", "l_quantity"])
    x = (li["l_shipdate"] - pd.Timestamp("1995-01-01")).dt.days.to_numpy()
    y = li["l_quantity"].to_numpy().astype(np.int64) * 50
    b = np.array([_zvalue(int(a), int(c)) for a, c in zip(x, y)]) >> 20
    df = pd.DataFrame({"b": b, "x": x, "q": y // 50})
    for bk, g in df.groupby("b"):
        assert int(got.loc[bk, "n_rows"]) == len(g)
        assert int(got.loc[bk, "min_day"]) == g["x"].min()
        assert int(got.loc[bk, "max_day"]) == g["x"].max()
        assert int(got.loc[bk, "min_qty"]) == g["q"].min()
        assert int(got.loc[bk, "max_qty"]) == g["q"].max()
    # the 2-D probe must prune most buckets — that's the layout's point
    assert 1 <= got["probe_hit"].sum() < len(got) / 2


def test_customer_segment_nation_independence(ray_session):
    got = _df(QUERIES["customer_segment_nation_independence"](SF))
    cust = pd.read_parquet(SF + "/customer.parquet")
    nation = pd.read_parquet(SF + "/nation.parquet")
    m = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    ct = pd.crosstab(m["c_mktsegment"], m["n_name"])
    N = ct.values.sum()
    assert len(got) == ct.shape[0] * ct.shape[1]
    for _, r in got.iterrows():
        o = ct.loc[r["seg"], r["n_name"]]
        e = ct.loc[r["seg"]].sum() * ct[r["n_name"]].sum()
        assert r["obs"] == o
        assert r["expected_times_n"] == e
        assert r["deviation_n"] == o * N - e
    # deviations over the full table sum to zero by construction
    assert got["deviation_n"].sum() == 0
