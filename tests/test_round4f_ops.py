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


def test_label_propagation_plan_parity(ray_session):
    """Driver and shuffle plans produce identical labels on the same
    canonical edge list (the test_dedup-style plan-parity gate)."""
    import pyarrow as pa

    from sciscraper_ray.pipelines.graph import label_propagation

    rng = np.random.default_rng(7)
    a = rng.integers(0, 200, 600, dtype=np.int64)
    b = rng.integers(0, 200, 600, dtype=np.int64)
    keep = a != b
    lo, hi = np.minimum(a[keep], b[keep]), np.maximum(a[keep], b[keep])
    pairs = np.unique(np.stack([lo, hi], axis=1), axis=0)
    edges = pa.table({"a": pairs[:, 0], "b": pairs[:, 1]})

    drv = label_propagation(edges, rounds=3, plan="driver")
    drv_df = drv.to_pandas() if hasattr(drv, "to_pandas") else drv
    shf = label_propagation(edges, rounds=3, plan="shuffle")
    shf_df = shf.to_pandas().sort_values("node").reset_index(drop=True)
    drv_df = (
        drv_df.to_pandas() if not hasattr(drv_df, "sort_values") else drv_df
    )
    drv_df = drv_df.sort_values("node").reset_index(drop=True)
    pd.testing.assert_frame_equal(drv_df, shf_df)


def test_label_propagation_semantics():
    """3 synchronous rounds on a toy barbell: mode with min tiebreak."""
    import pyarrow as pa

    from sciscraper_ray.pipelines.graph import label_propagation

    # triangle {0,1,2} bridged to triangle {3,4,5} via 2-3
    e = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    edges = pa.table(
        {
            "a": np.array([x for x, _ in e], np.int64),
            "b": np.array([y for _, y in e], np.int64),
        }
    )
    out = label_propagation(edges, rounds=3, plan="driver")
    got = dict(zip(out["node"].to_pylist(), out["lbl"].to_pylist()))
    # hand-rolled synchronous rounds
    adj = {n: [] for n in range(6)}
    for x, y in e:
        adj[x].append(y)
        adj[y].append(x)
    lbl = {n: n for n in range(6)}
    for _ in range(3):
        new = {}
        for n in range(6):
            cnts: dict[int, int] = {}
            for nb in adj[n]:
                cnts[lbl[nb]] = cnts.get(lbl[nb], 0) + 1
            best = sorted(cnts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[n] = best
        lbl = new
    assert got == lbl


def test_embedding_power_iteration(ray_session):
    out = QUERIES["embedding_power_iteration"](SF)
    df = _df(out).sort_values("dim").reset_index(drop=True)
    emb = pd.read_parquet(SF + "/embeddings.parquet", columns=["embedding"])
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    q = np.floor(mat * 1000.0 + 0.5)
    m = q.T @ q
    got = df["loading"].to_numpy()
    # primary: exact recompute of the fixed 80-step contract
    v = np.ones(64)
    for _ in range(80):
        y = m @ v
        v = y / np.sqrt(np.sum(y * y))
    assert np.allclose(got, np.round(v, 6), atol=2e-6)
    # secondary: the fixed count actually lands near the true top axis
    w, vecs = np.linalg.eigh(m)
    top = vecs[:, -1]
    cos = abs(float(got @ top) / (np.linalg.norm(got) * np.linalg.norm(top)))
    assert cos > 0.99
    assert abs(np.linalg.norm(got) - 1.0) < 1e-4


def test_events_hll_rollup_merge_property(ray_session):
    """Total-level estimate must equal the estimate of the max-merged
    day registers, and every estimate stays within HLL error of exact."""
    got = _df(QUERIES["events_hll_rollup"](SF))
    ev = pd.read_parquet(SF + "/events.parquet", columns=["ts", "user_id"])
    exact_total = ev["user_id"].nunique()
    tot = float(got.loc[got["level"] == "total", "est_users"].iloc[0])
    # m=64 -> typical rel error ~13%; allow 3 sigma
    assert abs(tot - exact_total) / exact_total < 0.4
    days = got[got["level"] == "day"]
    assert len(days) == ev["ts"].dt.strftime("%Y-%m-%d").nunique()
    # day estimates also sane vs exact per-day distincts
    exact_day = ev.groupby(ev["ts"].dt.strftime("%Y-%m-%d"))["user_id"].nunique()
    for _, row in days.iterrows():
        assert abs(row["est_users"] - exact_day[row["key"]]) / exact_day[row["key"]] < 0.5


def test_market_share_q8(ray_session):
    got = _df(QUERIES["market_share_q8"](SF)).set_index("yr")
    li = pd.read_parquet(SF + "/lineitem.parquet")
    orders = pd.read_parquet(SF + "/orders.parquet")
    cust = pd.read_parquet(SF + "/customer.parquet")
    nation = pd.read_parquet(SF + "/nation.parquet")
    part = pd.read_parquet(SF + "/part.parquet")
    supp = pd.read_parquet(SF + "/supplier.parquet")
    asia = nation[nation["n_regionkey"] == 2]["n_nationkey"]
    ac = cust[cust["c_nationkey"].isin(asia)]["c_custkey"]
    ao = orders[orders["o_custkey"].isin(ac)][["o_orderkey", "o_orderdate"]]
    std = part[part["p_type"] == "STANDARD"]["p_partkey"]
    l2 = li[li["l_partkey"].isin(std)].merge(
        ao, left_on="l_orderkey", right_on="o_orderkey"
    )
    l2 = l2.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    cents = np.round(l2["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    bp = np.round(l2["l_discount"].to_numpy() * 100).astype(np.int64)
    rev = cents * (100 - bp)
    yr = l2["o_orderdate"].dt.year.to_numpy()
    n2 = (l2["s_nationkey"] == 2).to_numpy()
    for y in np.unique(yr):
        m = yr == y
        tot = int(rev[m].sum())
        share = round(float(rev[m & n2].sum()) / tot, 6)
        assert int(got.loc[y, "asia_std_rev_c2"]) == tot
        assert abs(float(got.loc[y, "n2_share"]) - share) < 1e-9


def test_warc_cdx_random_access(ray_session):
    """The CDX rows must actually work: seek to (offset, rec_len) in the
    shard file, parse the single record, get the right doc back."""
    from sciscraper_ray.pipelines.queries.retrieval import _warc_fixture_dir
    from sciscraper_ray.sources.warc import parse_warc

    got = _df(QUERIES["warc_cdx_index"](SF))
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(docs["doc_id"], docs["text"]))
    out_dir, _ = _warc_fixture_dir(SF)
    sample = got.sort_values("doc_id").iloc[:: max(1, len(got) // 25)]
    for _, row in sample.iterrows():
        path = f"{out_dir}/shard-{int(row['shard']):04d}.warc"
        with open(path, "rb") as f:
            f.seek(int(row["offset"]))
            blob = f.read(int(row["rec_len"]))
        recs = parse_warc(blob)
        assert len(recs) == 1
        assert recs[0]["record_id"] == int(row["doc_id"])
        assert recs[0]["payload"].decode("utf-8") == texts[int(row["doc_id"])]
    assert len(got) == len(docs)


def test_token_kn_continuation(ray_session):
    got = _df(QUERIES["token_kn_continuation"](SF)).set_index("token")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["text"])
    pairs = set()
    for t in docs["text"]:
        toks = t.strip().lower().split(" ")
        pairs.update(zip(toks, toks[1:]))
    total = len(pairs)
    cont: dict[str, int] = {}
    for _, w in pairs:
        cont[w] = cont.get(w, 0) + 1
    assert len(got) == len(cont)
    for w, c in cont.items():
        assert int(got.loc[w, "cont_cnt"]) == c
        assert abs(float(got.loc[w, "p_cont"]) - round(c / total, 6)) < 1e-9


def test_lineitem_range_partition_balance(ray_session):
    got = _df(QUERIES["lineitem_range_partition"](SF))
    li = pd.read_parquet(SF + "/lineitem.parquet")
    assert int(got["n_rows"].sum()) == len(li)
    assert set(got["bucket"]) == set(range(8))
    # sample-derived splits must be roughly balanced (2% sample, 8 ways)
    frac = got["n_rows"].to_numpy() / len(li)
    assert frac.max() < 0.25 and frac.min() > 0.04


def test_dedup_cascade_funnel(ray_session):
    got = _df(QUERIES["dedup_cascade"](SF)).set_index("stage")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    n_near = int((docs["doc_id"] % 7 == 0).sum())
    n_exact = int((docs["doc_id"] % 9 == 0).sum())
    n0 = len(docs) + n_near + n_exact
    assert int(got.loc["input", "n_remaining"]) == n0
    # every injected exact copy must die in stage 1 (plus any natural
    # exact dups); stage counts are internally consistent
    assert int(got.loc["exact", "n_removed"]) >= n_exact
    assert (
        int(got.loc["exact", "n_remaining"])
        == n0 - int(got.loc["exact", "n_removed"])
    )
    # every injected near copy must die by stage 2 at the latest
    assert int(got.loc["near", "n_removed"]) >= 1
    assert (
        int(got.loc["near", "n_remaining"])
        == int(got.loc["exact", "n_remaining"]) - int(got.loc["near", "n_removed"])
    )


def test_page_block_density(ray_session):
    got = _df(QUERIES["page_block_density"](SF))
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    assert len(got) == 5 * len(docs)
    # article always wins; chrome containers never do
    w = got[got["is_winner"] == 1]
    assert set(w["tag"]) == {"article"} and len(w) == len(docs)
    # spot-check article arithmetic on a few docs
    sample = docs.iloc[:: max(1, len(docs) // 20)]
    art = got[got["tag"] == "article"].set_index("doc_id")
    for _, row in sample.iterrows():
        nwords = len(row["text"].split(" "))
        nb = -(-nwords // 40)
        assert int(art.loc[row["doc_id"], "n_blocks"]) == nb
        assert (
            int(art.loc[row["doc_id"], "text_chars"])
            == len(row["text"]) - (nb - 1)
        )
    # chrome containers carry high link density (the signal that kills them)
    ul = got[got["tag"] == "ul"]
    assert (ul["link_chars"] == ul["text_chars"]).all()
