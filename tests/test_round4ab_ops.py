"""Round-4 session-AB additions: dyadic-EWMA burst monitor and 2x12
centered-MA seasonal decomposition — first-principles recomputes plus
the bit-determinism / exact-integer properties each op's parity rests
on (oracle parity runs in tools/check_correctness.py)."""

import math

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def _dense_hourly(sf=SF):
    ev = pd.read_parquet(sf + "/events.parquet", columns=["ts"])
    h = ev["ts"].to_numpy().astype("datetime64[h]").astype(np.int64)
    u, c = np.unique(h, return_counts=True)
    dense = np.zeros(int(u.max() - u.min()) + 1, np.int64)
    dense[u - u.min()] = c
    return int(u.min()), dense


def test_events_hourly_ewma(ray_session):
    got = _df(QUERIES["events_hourly_ewma"](SF)).iloc[0]
    lo, dense = _dense_hourly()
    y = float(dense[0])
    max_y, nb, sbh = y, 0, 0
    for i in range(1, len(dense)):
        x = float(dense[i])
        if (x - y) > 3.0 * math.sqrt(max(y, 1.0)):
            nb += 1
            sbh += lo + i
        y = (x + y) * 0.5
        max_y = max(max_y, y)
    assert int(got["n_hours"]) == len(dense)
    assert int(got["n_bursts"]) == nb
    assert int(got["sum_burst_hours"]) == sbh
    # dyadic alpha=1/2: the fold is bit-deterministic, so equality is
    # EXACT (no tolerance) — that's the whole parity contract
    assert float(got["final_ewma"]) == y
    assert float(got["max_ewma"]) == max_y
    # burst rule must be non-degenerate on the fixture
    assert 0 < nb < len(dense) - 1


def test_orders_seasonal_decompose(ray_session):
    got = _df(QUERIES["orders_seasonal_decompose"](SF)).sort_values("ym")
    o = pd.read_parquet(
        SF + "/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    cents = np.round(o["o_totalprice"].to_numpy() * 100).astype(np.int64)
    ym = (
        o["o_orderdate"].dt.year.to_numpy() * 100
        + o["o_orderdate"].dt.month.to_numpy()
    ).astype(np.int64)
    m = pd.DataFrame({"ym": ym, "c": cents}).groupby("ym")["c"].sum()
    v = m.to_numpy()
    n = len(v)
    s13 = np.convolve(v, np.ones(13, np.int64), "valid")
    trend_num = 2 * s13 - v[: n - 12] - v[12:]
    mid = m.index.to_numpy()[6 : n - 6]
    det_num = 24 * v[6 : n - 6] - trend_num
    assert got["ym"].to_numpy().tolist() == mid.tolist()
    assert got["revenue_cents"].to_numpy().tolist() == v[6 : n - 6].tolist()
    # the single final division is the only float op
    np.testing.assert_array_equal(
        got["trend_cents"].to_numpy(), trend_num.astype(np.float64) / 24.0
    )
    np.testing.assert_array_equal(
        got["detrended_cents"].to_numpy(), det_num.astype(np.float64) / 24.0
    )
    mo = mid % 100
    for k in np.unique(mo):
        sel = mo == k
        want = det_num[sel].sum() / (24.0 * sel.sum())
        np.testing.assert_array_equal(
            got["seasonal_cents"].to_numpy()[sel], np.full(sel.sum(), want)
        )
    # trend really smooths: detrended variance well below raw variance
    assert np.var(det_num / 24.0) < np.var(v[6 : n - 6].astype(float))


def test_embedding_mutual_knn(ray_session):
    got = _df(QUERIES["embedding_mutual_knn"](SF)).sort_values("degree")
    emb = pd.read_parquet(SF + "/embeddings.parquet")
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    n = len(ids)
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mn @ mn.T
    np.fill_diagonal(sims, -np.inf)
    # top-5 per row, tie-break neighbor asc
    order = np.lexsort((np.tile(ids, (n, 1)), -sims), axis=1)[:, :5]
    nbr = {ids[i]: set(ids[order[i]]) for i in range(n)}
    mutual = {
        (min(u, v), max(u, v))
        for u, s in nbr.items()
        for v in s
        if u in nbr[v]
    }
    deg = {int(i): 0 for i in ids}
    for u, v in mutual:
        deg[int(u)] += 1
        deg[int(v)] += 1
    want = pd.Series(list(deg.values())).value_counts().sort_index()
    assert got["degree"].tolist() == want.index.tolist()
    assert got["n_nodes"].tolist() == want.tolist()
    # symmetrization strictly prunes: fewer mutual edges than directed
    assert 0 < len(mutual) < 5 * n


def test_token_chi2_keyness(ray_session):
    got = _df(QUERIES["token_chi2_keyness"](SF)).set_index("token")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["text", "lang"])
    rows = {}
    tot = [0, 0]
    for text, lang in zip(docs["text"], docs["lang"]):
        side = 0 if lang == "en" else 1
        for t in text.strip().lower().split(" "):
            c = rows.setdefault(t, [0, 0])
            c[side] += 1
            tot[side] += 1
    assert len(got) == len(rows)
    for t, (a, b) in rows.items():
        assert int(got.loc[t, "k_en"]) == a
        assert int(got.loc[t, "k_rest"]) == b
        c, d = tot[0] - a, tot[1] - b
        x = float(a * d - b * c)
        nd = float(tot[0] + tot[1])
        want = ((nd * x) * x) / (
            ((float(a + b) * float(c + d)) * tot[0]) * tot[1]
        )
        assert float(got.loc[t, "chi2"]) == want  # bit-exact contract
    # the statistic discriminates: not all chi2 equal
    assert got["chi2"].nunique() > 1


def test_reading_order_blocks_vs_naive():
    """Column-aware assembly reconstructs the text; the naive page-wide
    y-cluster garbles two-column layouts (the negative control that
    proves the gutter logic is load-bearing)."""
    from sciscraper_ray.sources.pdf_write import build_pdf_two_column
    from sciscraper_ray.stages.pdf_parse import (
        extract_pdf_pages,
        glyphs_to_reading_order,
        glyphs_to_text,
        split_columns,
    )

    docs = pd.read_parquet(SF + "/documents.parquet", columns=["text"])
    multi = [t for t in docs["text"] if len(t) > 80][:20]
    assert len(multi) == 20
    for t in multi:
        payload = build_pdf_two_column(t)
        ordered = " ".join(
            extract_pdf_pages(payload, assemble=glyphs_to_reading_order)
        )
        assert ordered == t
        naive = " ".join(
            p.replace("\n", " ") for p in extract_pdf_pages(payload)
        )
        assert naive != t  # zipped columns are byte-visible

    # single-column glyphs: no gutter -> one band, identical output
    glyphs = [("a", 72.0, 720.0, 6.0), ("b", 79.0, 720.0, 6.0),
              ("c", 72.0, 706.0, 6.0)]
    assert len(split_columns(glyphs)) == 1
    assert glyphs_to_reading_order(glyphs) == glyphs_to_text(
        glyphs
    ).replace("\n", " ")


def test_split_columns_gutter_detection():
    from sciscraper_ray.stages.pdf_parse import split_columns

    # two bands separated by a 80pt gutter; word gaps of 6pt never split
    left = [("l", 72.0 + 12 * i, 720.0 - 14 * j, 6.0)
            for i in range(10) for j in range(4)]
    right = [("r", 332.0 + 12 * i, 720.0 - 14 * j, 6.0)
             for i in range(10) for j in range(4)]
    bands = split_columns(left + right)
    assert len(bands) == 2
    assert {g[0] for g in bands[0]} == {"l"}
    assert {g[0] for g in bands[1]} == {"r"}


def test_page_extract_damage_matrix(ray_session):
    got = _df(QUERIES["page_extract_damage_matrix"](SF)).set_index("doc_id")
    docs = pd.read_parquet(
        SF + "/documents.parquet", columns=["doc_id", "text"]
    ).set_index("doc_id")
    n_degraded = 0
    for i, row in docs.iterrows():
        t = row["text"]
        m = i % 5
        if m == 3:
            want = " ".join(t.split(" ")[:40])
            n_degraded += want != t
        elif m == 4:
            want = f"Document {i} by the synthesis authors"
            n_degraded += 1
        else:
            want = t
        assert got.loc[i, "extracted_text"] == want, (i, m)
    # degraded classes genuinely degrade on this corpus
    assert n_degraded > len(docs) / 10


def test_warc_revisit_records_roundtrip():
    from sciscraper_ray.sources.warc import build_warc, parse_warc

    payload = b"<html>\r\n\r\nbody with WARC/1.0 inside</html>"
    seg = build_warc(
        [
            (10, "https://h/a", payload),
            (
                11,
                "https://h/a",
                b"",
                {
                    "WARC-Type": "revisit",
                    "WARC-Refers-To": "<urn:doc:10>",
                    "WARC-Payload-Digest": "md5:deadbeef",
                },
            ),
        ]
    )
    recs = parse_warc(seg)
    assert [r["warc_type"] for r in recs] == ["response", "revisit"]
    assert recs[0]["payload"] == payload and recs[0]["refers_to"] is None
    assert recs[1]["refers_to"] == 10 and recs[1]["payload"] == b""


def test_warc_revisit_dedup_counts(ray_session):
    got = _df(QUERIES["warc_revisit_dedup"](SF)).set_index("host")
    ids = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_numpy()
    hosts = np.where(
        ids % 10 < 3,
        "mega.example.org",
        np.array(
            [
                "",
                "alpha.example.com",
                "beta.example.net",
                "gamma.example.io",
                "delta.example.edu",
                "epsilon.example.dev",
            ]
        )[1 + ids % 5],
    )
    df = pd.DataFrame({"h": hosts, "i": ids})
    for h, g in df.groupby("h"):
        i = g["i"].to_numpy()
        want_resp = len(i) + int(((i % 17 == 0) & (i % 2 == 0)).sum())
        want_rev = int(((i % 17 == 0) & (i % 2 == 1)).sum())
        assert int(got.loc[h, "n_response"]) == want_resp
        assert int(got.loc[h, "n_revisit"]) == want_rev
    assert int(got["n_revisit"].sum()) > 0  # fixture exercises revisits


def test_dedup_incremental_ingest(ray_session):
    got = _df(QUERIES["dedup_incremental_ingest"](SF)).set_index("doc_id")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    import hashlib

    def grams(t):
        toks = t.strip().lower().split(" ")
        return {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}

    pfx = {
        int(i): hashlib.md5(t[:32].encode()).hexdigest()
        for i, t in zip(docs["doc_id"], docs["text"])
    }
    g = {int(i): grams(t) for i, t in zip(docs["doc_id"], docs["text"])}
    new = sorted(i for i in pfx if i % 4 == 0)
    corpus = [i for i in pfx if i % 4 != 0]
    n_rejected = 0
    for a in new:
        cands = [b for b in corpus if pfx[b] == pfx[a] and g[a] and g[b]]
        rej = [
            b
            for b in cands
            if 20 * len(g[a] & g[b]) >= 19 * (len(g[a] | g[b]))
        ]
        assert int(got.loc[a, "n_candidates"]) == len(cands), a
        assert int(got.loc[a, "accepted"]) == (0 if rej else 1), a
        if rej:
            assert int(got.loc[a, "dup_of"]) == min(rej), a
            n_rejected += 1
        else:
            assert pd.isna(got.loc[a, "dup_of"]), a
    assert len(got) == len(new)
    # fixture exercises both verdicts
    assert 0 < n_rejected < len(new)


def test_graph_neighborhood_function(ray_session):
    got = _df(QUERIES["graph_neighborhood_function"](SF))
    ids = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_numpy()
    adj = {}
    for i in ids:
        adj.setdefault(int(i), []).extend(
            [(i * 17 + 13) % 997, (i * 29 + 7) % 997]
        )
    want = np.zeros(7, np.int64)
    for u in ids:
        ball, frontier = {int(u)}, {int(u)}
        want[0] += 1
        for d in range(1, 7):
            nxt = {
                int(x) for f in frontier for x in adj.get(f, []) if x not in ball
            }
            if not nxt:
                break
            ball |= nxt
            want[d] += len(nxt)
            frontier = nxt
    cum = np.cumsum(want)
    assert got["d"].tolist() == list(range(7))
    assert got["n_pairs"].tolist() == cum.tolist()
    np.testing.assert_array_equal(
        got["pct"].to_numpy(), cum.astype(float) / float(cum[-1])
    )
    # the curve is non-trivial: strictly grows for at least 3 hops
    assert cum[0] < cum[1] < cum[2] < cum[3]


def test_doc_ccnet_ppl_bins(ray_session):
    got = _df(QUERIES["doc_ccnet_ppl_bins"](SF))
    # structural invariants per lang: three bins, tertile-balanced counts
    # (ntile-free threshold rule: tail <= q1 < middle <= q2 < head), and
    # strictly ordered log-prob ranges tail < middle < head
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["lang"])
    n_by_lang = docs["lang"].value_counts()
    for lang, g in got.groupby("lang"):
        g = g.set_index("bin")
        assert set(g.index) == {"head", "middle", "tail"}
        assert int(g["n_docs"].sum()) == int(n_by_lang[lang])
        # thresholds are quantile elements: each bin holds >= 1/6 of docs
        assert (g["n_docs"] >= n_by_lang[lang] // 6).all()
        assert (
            int(g.loc["tail", "max_lp_micro"])
            <= int(g.loc["middle", "min_lp_micro"])
            and int(g.loc["middle", "max_lp_micro"])
            <= int(g.loc["head", "min_lp_micro"])
        )
