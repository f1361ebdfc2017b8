"""Round-4 session-D additions: multi-join TPC-H shapes (Q2/Q4/Q7/Q10/
Q16/Q17/Q18/Q19), sentence/diversity text stats, gaps-and-islands
streaks, pairwise embedding top-k, k-core peeling, host Jaccard — each
recomputed from first principles in pandas/numpy (oracle parity runs in
tools/check_correctness.py)."""

import re

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    return out.to_pandas() if hasattr(out, "to_pandas") else out


def _li(cols):
    return pd.read_parquet(SF + "/lineitem.parquet", columns=cols)


def _cents(s):
    return np.round(s.to_numpy() * 100).astype(np.int64)


def _rev_c2(li):
    return _cents(li["l_extendedprice"]) * (100 - _cents(li["l_discount"]))


def test_returned_revenue_topk(ray_session):
    got = _df(QUERIES["returned_revenue_topk"](SF))
    li = _li(["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"])
    li = li[li["l_returnflag"] == "R"].copy()
    li["rev"] = _rev_c2(li)
    orders = pd.read_parquet(SF + "/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = pd.read_parquet(
        SF + "/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    )
    nat = pd.read_parquet(SF + "/nation.parquet", columns=["n_nationkey", "n_name"])
    j = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .groupby("o_custkey")["rev"]
        .sum()
        .rename("revenue_c2")
        .reset_index()
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    )
    want = j.sort_values(
        ["revenue_c2", "c_custkey"], ascending=[False, True]
    ).head(20)
    assert got["c_custkey"].tolist() == want["c_custkey"].tolist()
    assert got["revenue_c2"].tolist() == want["revenue_c2"].tolist()
    assert got["n_name"].tolist() == want["n_name"].tolist()


def test_small_qty_revenue(ray_session):
    got = _df(QUERIES["small_qty_revenue"](SF))
    li = _li(["l_partkey", "l_quantity", "l_extendedprice"])
    qty = np.round(li["l_quantity"].to_numpy()).astype(np.int64)
    g = pd.DataFrame({"pk": li["l_partkey"], "q": qty}).groupby("pk")["q"]
    s, c = g.sum(), g.count()
    keep = qty * 5 * c.loc[li["l_partkey"]].to_numpy() < s.loc[li["l_partkey"]].to_numpy()
    assert int(got["n_small"].iloc[0]) == int(keep.sum())
    assert int(got["revenue_cents"].iloc[0]) == int(
        _cents(li["l_extendedprice"])[keep].sum()
    )


def test_large_order_customers(ray_session):
    got = _df(QUERIES["large_order_customers"](SF))
    li = _li(["l_orderkey", "l_quantity"])
    qty = (
        pd.DataFrame(
            {
                "k": li["l_orderkey"],
                "q": np.round(li["l_quantity"].to_numpy()).astype(np.int64),
            }
        )
        .groupby("k")["q"]
        .sum()
    )
    big = qty[qty > 250]
    orders = pd.read_parquet(
        SF + "/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )
    want = orders[orders["o_orderkey"].isin(big.index)].copy()
    want["sum_qty"] = big.loc[want["o_orderkey"]].to_numpy()
    want = want.sort_values(["sum_qty", "o_orderkey"], ascending=[False, True])
    assert got["o_orderkey"].tolist() == want["o_orderkey"].tolist()
    assert got["sum_qty"].tolist() == want["sum_qty"].tolist()
    assert (
        got["total_cents"].tolist() == _cents(want["o_totalprice"]).tolist()
    )


def test_brand_supplier_counts(ray_session):
    got = _df(QUERIES["brand_supplier_counts"](SF)).sort_values(
        ["p_brand", "p_size"]
    ).reset_index(drop=True)
    li = _li(["l_partkey", "l_suppkey"]).drop_duplicates()
    part = pd.read_parquet(
        SF + "/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    want = (
        j.groupby(["p_brand", "p_size"])["l_suppkey"]
        .nunique()
        .rename("supplier_cnt")
        .reset_index()
        .sort_values(["p_brand", "p_size"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"supplier_cnt": np.int64, "p_size": np.int64}),
        want.astype({"supplier_cnt": np.int64, "p_size": np.int64}),
    )


def test_volume_shipping_pairs(ray_session):
    got = _df(QUERIES["volume_shipping_pairs"](SF))
    li = _li(
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"]
    )
    li["rev"] = _rev_c2(li)
    li["l_year"] = li["l_shipdate"].dt.year.astype(np.int64)
    supp = pd.read_parquet(SF + "/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nat = pd.read_parquet(SF + "/nation.parquet", columns=["n_nationkey", "n_name"])
    orders = pd.read_parquet(SF + "/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = pd.read_parquet(SF + "/customer.parquet", columns=["c_custkey", "c_nationkey"])
    j = (
        li.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
        .merge(nat.rename(columns={"n_name": "supp_nation"}),
               left_on="s_nationkey", right_on="n_nationkey")
        .merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nat.rename(columns={"n_name": "cust_nation",
                                   "n_nationkey": "nk2"}),
               left_on="c_nationkey", right_on="nk2")
    )
    want = (
        j.groupby(["supp_nation", "cust_nation", "l_year"])["rev"]
        .sum()
        .rename("revenue_c2")
        .reset_index()
    )
    keys = ["supp_nation", "cust_nation", "l_year"]
    got = got.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[keys + ["revenue_c2"]], want)


def test_disjunctive_revenue(ray_session):
    got = _df(QUERIES["disjunctive_revenue"](SF))
    li = _li(["l_partkey", "l_quantity", "l_extendedprice", "l_discount"])
    part = pd.read_parquet(
        SF + "/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    )
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    q, sz, br = j["l_quantity"].to_numpy(), j["p_size"].to_numpy(), j["p_brand"]
    keep = (
        ((br == "Brand#12").to_numpy() & (q >= 1) & (q <= 15) & (sz >= 1) & (sz <= 25))
        | ((br == "Brand#23").to_numpy() & (q >= 10) & (q <= 25) & (sz >= 1) & (sz <= 30))
        | ((br == "Brand#5").to_numpy() & (q >= 20) & (q <= 40) & (sz >= 1) & (sz <= 40))
    )
    assert int(got["n_lines"].iloc[0]) == int(keep.sum())
    assert int(got["revenue_c2"].iloc[0]) == int(_rev_c2(j)[keep].sum())


def test_cheapest_supplier_per_part(ray_session):
    got = _df(QUERIES["cheapest_supplier_per_part"](SF)).sort_values(
        "l_partkey"
    ).reset_index(drop=True)
    li = _li(["l_partkey", "l_suppkey", "l_extendedprice"])
    li["cents"] = _cents(li["l_extendedprice"])
    mc = li.groupby("l_partkey")["cents"].min()
    j = li[li["cents"] == mc.loc[li["l_partkey"]].to_numpy()]
    want = (
        j.groupby("l_partkey")
        .agg(min_cents=("cents", "min"), best_suppkey=("l_suppkey", "min"))
        .reset_index()
        .sort_values("l_partkey")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["l_partkey", "min_cents", "best_suppkey"]], want)


def test_late_shipment_trend(ray_session):
    got = _df(QUERIES["late_shipment_trend"](SF))
    li = _li(["l_orderkey", "l_shipdate"])
    ms = li.groupby("l_orderkey")["l_shipdate"].max()
    orders = pd.read_parquet(
        SF + "/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    o = orders[orders["o_orderkey"].isin(ms.index)].copy()
    late = ms.loc[o["o_orderkey"]].to_numpy() > (
        o["o_orderdate"] + pd.Timedelta(days=60)
    ).to_numpy()
    o = o[late]
    want = (
        o.assign(
            yr=o["o_orderdate"].dt.year.astype(np.int64),
            qtr=o["o_orderdate"].dt.quarter.astype(np.int64),
        )
        .groupby(["o_orderpriority", "yr", "qtr"])
        .size()
        .rename("n_late")
        .reset_index()
    )
    keys = ["o_orderpriority", "yr", "qtr"]
    got = got.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[keys + ["n_late"]], want.astype({"n_late": np.int64}))


def test_doc_sentence_stats(ray_session):
    got = _df(QUERIES["doc_sentence_stats"](SF)).set_index("lang")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["text", "lang"])
    rows = {}
    for text, lang in zip(docs["text"], docs["lang"]):
        if text is None:
            continue
        n, ch = rows.get(lang, (0, 0))
        for seg in re.split(r"[.!?]+", text):
            seg = seg.strip(" \t\n\r")
            if seg:
                n += 1
                ch += len(seg)
        rows[lang] = (n, ch)
    for lang, (n, ch) in rows.items():
        assert int(got.loc[lang, "n_sentences"]) == n
        assert int(got.loc[lang, "sum_chars"]) == ch


def test_source_simpson_diversity(ray_session):
    got = _df(QUERIES["source_simpson_diversity"](SF)).set_index("source")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["text", "source"])
    from collections import Counter

    per = {}
    for text, src in zip(docs["text"], docs["source"]):
        if text is None:
            continue
        c = per.setdefault(src, Counter())
        for tok in text.strip().lower().split(" "):
            if tok:
                c[tok] += 1
    for src, c in per.items():
        ns = np.array(list(c.values()), np.int64)
        N = int(ns.sum())
        assert int(got.loc[src, "simpson_num"]) == int((ns * (ns - 1)).sum())
        assert int(got.loc[src, "simpson_den"]) == N * (N - 1)


def test_events_hour_of_week(ray_session):
    got = _df(QUERIES["events_hour_of_week"](SF))
    ev = pd.read_parquet(SF + "/events.parquet", columns=["ts", "event_type", "value"])
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    ev = ev.assign(
        dow=((us // 86_400_000_000 + 4) % 7).astype(np.int64),
        hod=((us % 86_400_000_000) // 3_600_000_000).astype(np.int64),
        cents=np.round(ev["value"].to_numpy() * 100).astype(np.int64),
    )
    want = (
        ev.groupby(["event_type", "dow", "hod"])
        .agg(n_events=("cents", "size"), value_cents=("cents", "sum"))
        .reset_index()
    )
    keys = ["event_type", "dow", "hod"]
    got = got.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[keys + ["n_events", "value_cents"]],
        want.astype({"n_events": np.int64}),
    )
    # sanity: pandas dayofweek (Mon=0) maps to our Sunday-0 convention
    alt = (ev["ts"].dt.dayofweek + 1) % 7
    assert (alt.to_numpy() == ev["dow"].to_numpy()).all()


def test_events_streak_longest(ray_session):
    got = _df(QUERIES["events_streak_longest"](SF)).set_index("user_id")
    ev = pd.read_parquet(SF + "/events.parquet", columns=["user_id", "ts"])
    days = (
        ev.assign(d=ev["ts"].astype("datetime64[us]").astype("int64") // 86_400_000_000)
        .drop_duplicates(["user_id", "d"])
        .sort_values(["user_id", "d"])
    )
    for uid, g in days.groupby("user_id"):
        d = g["d"].to_numpy()
        runs = np.split(np.arange(len(d)), np.flatnonzero(np.diff(d) != 1) + 1)
        lens = [len(r) for r in runs]
        assert int(got.loc[uid, "longest_streak"]) == max(lens)
        assert int(got.loc[uid, "n_streaks"]) == len(lens)


def test_embedding_pairwise_topk(ray_session):
    got = _df(QUERIES["embedding_pairwise_topk"](SF))
    emb = pd.read_parquet(SF + "/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = emb["vec_id"].to_numpy()
    mat = np.asarray(emb["embedding"].tolist(), np.float64)
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = matn @ matn.T
    a, b = np.meshgrid(ids, ids, indexing="ij")
    mask = a < b
    flat = pd.DataFrame(
        {"vec_a": a[mask], "vec_b": b[mask], "sim": sims[mask]}
    ).sort_values(["sim", "vec_a", "vec_b"], ascending=[False, True, True])
    want = flat.head(100)
    assert got["vec_a"].tolist() == want["vec_a"].tolist()
    assert got["vec_b"].tolist() == want["vec_b"].tolist()
    assert got["rank"].tolist() == list(range(1, 101))


def _edges():
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id"])
    ids = docs["doc_id"].to_numpy()
    src = np.repeat(ids, 2)
    dst = np.empty(len(ids) * 2, np.int64)
    dst[0::2] = (ids * 17 + 13) % 997
    dst[1::2] = (ids * 29 + 7) % 997
    return src, dst


def test_graph_kcore_peel(ray_session):
    got = _df(QUERIES["graph_kcore_peel"](SF)).set_index("node")
    src, dst = _edges()
    e = pd.DataFrame(
        {"a": np.minimum(src, dst), "b": np.maximum(src, dst)}
    )
    e = e[e["a"] != e["b"]].drop_duplicates()
    for _ in range(3):
        deg = pd.concat([e["a"], e["b"]]).value_counts()
        alive = set(deg[deg >= 2].index)
        e = e[e["a"].isin(alive) & e["b"].isin(alive)]
    deg = pd.concat([e["a"], e["b"]]).value_counts()
    assert len(got) == len(deg)
    for node, d in deg.items():
        assert int(got.loc[node, "deg"]) == int(d)


def test_host_jaccard_overlap(ray_session):
    got = _df(QUERIES["host_jaccard_overlap"](SF))
    from sciscraper_ray.sources.page_synth import host_for

    src, dst = _edges()
    hs = pd.DataFrame(
        {"h": [host_for(int(i)) for i in src], "t": dst}
    ).drop_duplicates()
    sizes = hs.groupby("h").size()
    m = hs.merge(hs, on="t")
    m = m[m["h_x"] < m["h_y"]]
    inter = m.groupby(["h_x", "h_y"]).size()
    for (ha, hb), ic in inter.items():
        row = got[(got["host_a"] == ha) & (got["host_b"] == hb)]
        assert int(row["inter_cnt"].iloc[0]) == int(ic)
        assert int(row["union_cnt"].iloc[0]) == int(
            sizes[ha] + sizes[hb] - ic
        )
