"""Round-4 session-F additions: interval-union coverage, Q21-shape
supplier blame — first-principles pandas/numpy recomputes (oracle parity
runs in tools/check_correctness.py)."""

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    return out.to_pandas() if hasattr(out, "to_pandas") else out


def test_events_interval_coverage(ray_session):
    got = _df(QUERIES["events_interval_coverage"](SF)).set_index("user_id")
    ev = pd.read_parquet(SF + "/events.parquet", columns=["user_id", "ts"])
    W = 300_000_000
    for uid, g in ev.groupby("user_id"):
        ts = np.sort(g["ts"].astype("datetime64[us]").astype("int64").to_numpy())
        # brute-force interval union of [t, t+W)
        covered = 0
        islands = 0
        cur_start = cur_end = None
        for t in ts:
            if cur_end is None or t > cur_end:
                if cur_end is not None:
                    covered += cur_end - cur_start
                cur_start, cur_end = t, t + W
                islands += 1
            else:
                cur_end = max(cur_end, t + W)
        covered += cur_end - cur_start
        assert int(got.loc[uid, "covered_us"]) == covered
        assert int(got.loc[uid, "n_islands"]) == islands
    assert len(got) == ev["user_id"].nunique()


def test_supplier_late_blame(ray_session):
    got = _df(QUERIES["supplier_late_blame"](SF))
    li = pd.read_parquet(
        SF + "/lineitem.parquet", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    )
    orders = pd.read_parquet(
        SF + "/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    )
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    late_us = 45 * 86_400_000_000
    j["late"] = (
        j["l_shipdate"].astype("datetime64[us]").astype("int64")
        > j["o_orderdate"].astype("datetime64[us]").astype("int64") + late_us
    )
    pair = (
        j.groupby(["l_orderkey", "l_suppkey"])["late"].max().reset_index()
    )
    blame: dict[int, int] = {}
    for ok, g in pair.groupby("l_orderkey"):
        if len(g) >= 2 and int(g["late"].sum()) == 1:
            sk = int(g.loc[g["late"], "l_suppkey"].iloc[0])
            blame[sk] = blame.get(sk, 0) + 1
    exp = sorted(blame.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got_pairs = list(zip(got["s_suppkey"].astype(int), got["n_blame"].astype(int)))
    assert sorted(got_pairs, key=lambda kv: (-kv[1], kv[0])) == exp
    # the pipeline's own ordering contract: count desc, suppkey asc
    assert got_pairs == exp
