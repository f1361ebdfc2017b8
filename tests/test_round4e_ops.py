"""Round-4 session-E additions: sessionized abandonment, YoY growth,
postings delta stats, HHI concentration, char trigrams, ASCII share —
first-principles pandas/numpy recomputes (oracle parity runs in
tools/check_correctness.py)."""

from collections import Counter

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    return out.to_pandas() if hasattr(out, "to_pandas") else out


def test_events_cart_abandonment(ray_session):
    got = _df(QUERIES["events_cart_abandonment"](SF)).set_index("user_id")
    ev = pd.read_parquet(
        SF + "/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    ).sort_values(["user_id", "ts", "event_id"])
    gap = 30 * 60 * 1_000_000
    for uid, g in ev.groupby("user_id"):
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        new_s = np.ones(len(us), bool)
        new_s[1:] = (us[1:] - us[:-1]) > gap
        sid = np.cumsum(new_s)
        et = g["event_type"].to_numpy()
        n_sessions = sid[-1]
        n_abandoned = 0
        for s in range(1, n_sessions + 1):
            m = sid == s
            if ("view" in et[m]) and ("purchase" not in et[m]):
                n_abandoned += 1
        assert int(got.loc[uid, "n_sessions"]) == int(n_sessions)
        assert int(got.loc[uid, "n_abandoned"]) == n_abandoned


def test_orders_yoy_growth(ray_session):
    got = _df(QUERIES["orders_yoy_growth"](SF))
    orders = pd.read_parquet(SF + "/orders.parquet", columns=["o_orderdate", "o_totalprice"])
    cents = np.round(orders["o_totalprice"].to_numpy() * 100).astype(np.int64)
    want = (
        pd.DataFrame({"yr": orders["o_orderdate"].dt.year, "c": cents})
        .groupby("yr")["c"]
        .sum()
        .sort_index()
    )
    assert got["yr"].tolist() == want.index.tolist()
    assert got["revenue_cents"].tolist() == want.tolist()
    d = got["delta_cents"].to_numpy()
    assert np.isnan(d[0])
    assert (d[1:] == np.diff(want.to_numpy())).all()


def test_token_postings_delta_stats(ray_session):
    got = _df(QUERIES["token_postings_delta_stats"](SF)).set_index("token")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    post = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        if text is None:
            continue
        for tok in set(text.strip().lower().split(" ")):
            post.setdefault(tok, set()).add(int(did))
    assert len(got) == len(post)
    for tok, ids in post.items():
        ids = sorted(ids)
        gaps = np.diff(ids) if len(ids) > 1 else np.array([0])
        assert int(got.loc[tok, "df"]) == len(ids)
        assert int(got.loc[tok, "min_doc"]) == ids[0]
        assert int(got.loc[tok, "max_doc"]) == ids[-1]
        assert int(got.loc[tok, "max_gap"]) == int(gaps.max())


def test_nation_revenue_hhi(ray_session):
    got = _df(QUERIES["nation_revenue_hhi"](SF)).set_index("n_name")
    li = pd.read_parquet(SF + "/lineitem.parquet", columns=["l_suppkey", "l_extendedprice"])
    supp = pd.read_parquet(SF + "/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nat = pd.read_parquet(SF + "/nation.parquet", columns=["n_nationkey", "n_name"])
    li["cents"] = np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    j = li.merge(supp, left_on="l_suppkey", right_on="s_suppkey").merge(
        nat, left_on="s_nationkey", right_on="n_nationkey"
    )
    rev = j.groupby(["n_name", "s_suppkey"])["cents"].sum()
    for n_name, g in rev.groupby(level=0):
        cents = [int(c) for c in g]
        total = sum(cents)
        hhi = round(float(sum(c * c for c in cents)) / float(total * total), 9)
        assert int(got.loc[n_name, "n_suppliers"]) == len(cents)
        assert int(got.loc[n_name, "total_cents"]) == total
        assert got.loc[n_name, "hhi"] == hhi


def test_char_trigram_topk(ray_session):
    got = _df(QUERIES["char_trigram_topk"](SF))
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["text"])
    c = Counter()
    for text in docs["text"]:
        if text is None or len(text) < 3:
            continue
        for i in range(len(text) - 2):
            c[text[i : i + 3]] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert got["trigram"].tolist() == [k for k, _ in want]
    assert got["cnt"].tolist() == [v for _, v in want]


def test_doc_ascii_ratio(ray_session):
    got = _df(QUERIES["doc_ascii_ratio"](SF)).set_index("source")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["text", "source"])
    per = {}
    for text, src in zip(docs["text"], docs["source"]):
        if text is None:
            continue
        a, t = per.get(src, (0, 0))
        a += sum(1 for ch in text if " " <= ch <= "~")
        t += len(text)
        per[src] = (a, t)
    for src, (a, t) in per.items():
        assert int(got.loc[src, "ascii_chars"]) == a
        assert int(got.loc[src, "total_chars"]) == t


def test_events_peak_concurrency(ray_session):
    got = _df(QUERIES["events_peak_concurrency"](SF)).set_index("day")
    ev = pd.read_parquet(
        SF + "/events.parquet", columns=["user_id", "ts", "event_id"]
    ).sort_values(["user_id", "ts", "event_id"])
    gap = 30 * 60 * 1_000_000
    day_us = 86_400_000_000
    bounds = []
    for _, g in ev.groupby("user_id"):
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        new_s = np.ones(len(us), bool)
        new_s[1:] = (us[1:] - us[:-1]) > gap
        starts = np.flatnonzero(new_s)
        ends = np.append(starts[1:], len(us)) - 1
        for s, e in zip(starts, ends):
            bounds.append((us[s], 1))
            bounds.append((us[e], -1))
    bounds.sort()
    run, peaks = 0, {}
    for t, d in bounds:
        run += d
        day = t // day_us
        peaks[day] = max(peaks.get(day, run), run)
    for day, peak in peaks.items():
        assert int(got.loc[day, "peak_concurrent"]) == peak


def test_doc_hapax_trigrams(ray_session):
    got = _df(QUERIES["doc_hapax_trigrams"](SF)).set_index("doc_id")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    c = Counter()
    first = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        if text is None:
            continue
        ts = text.strip().lower().split(" ")
        for i in range(len(ts) - 2):
            g = " ".join(ts[i : i + 3])
            c[g] += 1
            first.setdefault(g, int(did))
            first[g] = min(first[g], int(did))
    per_doc = Counter(first[g] for g, n in c.items() if n == 1)
    assert len(got) == len(per_doc)
    for did, n in per_doc.items():
        assert int(got.loc[did, "n_hapax_trigrams"]) == n


def test_lineitem_benford(ray_session):
    got = _df(QUERIES["lineitem_benford"](SF)).set_index("digit")
    li = pd.read_parquet(SF + "/lineitem.parquet", columns=["l_extendedprice"])
    cents = np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    c = Counter(int(str(v)[0]) for v in cents)
    assert len(got) == len(c)
    for d, n in c.items():
        assert int(got.loc[d, "cnt"]) == n


def test_customer_order_gaps(ray_session):
    got = _df(QUERIES["customer_order_gaps"](SF)).set_index("o_custkey")
    orders = pd.read_parquet(
        SF + "/orders.parquet", columns=["o_custkey", "o_orderdate", "o_orderkey"]
    ).sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    for ck, g in orders.groupby("o_custkey"):
        days = (
            g["o_orderdate"].astype("datetime64[us]").astype("int64").to_numpy()
            // 86_400_000_000
        )
        gaps = np.diff(days)
        assert int(got.loc[ck, "n_orders"]) == len(days)
        assert int(got.loc[ck, "total_gap_days"]) == int(gaps.sum()) if len(gaps) else 0
        assert int(got.loc[ck, "max_gap_days"]) == (int(gaps.max()) if len(gaps) else 0)


def test_events_error_followup(ray_session):
    got = _df(QUERIES["events_error_followup"](SF)).set_index("user_id")
    ev = pd.read_parquet(SF + "/events.parquet", columns=["user_id", "ts", "event_type"])
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    win = 5 * 60 * 1_000_000
    for uid, g in ev.groupby("user_id"):
        errs = g[g["event_type"] == "error"]["us"].to_numpy()
        clicks = np.sort(g[g["event_type"] == "click"]["us"].to_numpy())
        if len(errs) == 0:
            assert uid not in got.index
            continue
        rec = sum(
            1
            for t in errs
            if ((clicks > t) & (clicks <= t + win)).any()
        )
        assert int(got.loc[uid, "n_errors"]) == len(errs)
        assert int(got.loc[uid, "n_recovered"]) == rec


def test_doc_windowed_ttr(ray_session):
    got = _df(QUERIES["doc_windowed_ttr"](SF)).set_index("doc_id")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    for did, text in zip(docs["doc_id"], docs["text"]):
        if text is None:
            continue
        ts = text.strip().lower().split(" ")
        wins = [ts[i : i + 20] for i in range(0, len(ts), 20)]
        assert int(got.loc[int(did), "n_windows"]) == len(wins)
        assert int(got.loc[int(did), "sum_distinct"]) == sum(
            len(set(w)) for w in wins
        )


def test_graph_two_hop_reach(ray_session):
    got = _df(QUERIES["graph_two_hop_reach"](SF)).set_index("node")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id"])
    ids = docs["doc_id"].to_numpy()
    edges = set()
    for i in ids:
        for t in [(i * 17 + 13) % 997, (i * 29 + 7) % 997]:
            if i != t:
                edges.add((min(int(i), int(t)), max(int(i), int(t))))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v, nbrs in adj.items():
        reach = set(nbrs)
        for n in nbrs:
            reach |= adj[n]
        reach.discard(v)
        assert int(got.loc[v, "reach2"]) == len(reach)


def test_orders_pareto_cutoff(ray_session):
    got = _df(QUERIES["orders_pareto_cutoff"](SF))
    orders = pd.read_parquet(SF + "/orders.parquet", columns=["o_custkey", "o_totalprice"])
    cents = np.round(orders["o_totalprice"].to_numpy() * 100).astype(np.int64)
    per = (
        pd.DataFrame({"k": orders["o_custkey"], "c": cents})
        .groupby("k")["c"]
        .sum()
        .reset_index()
        .sort_values(["c", "k"], ascending=[False, True])
    )
    cum = per["c"].cumsum().to_numpy()
    total = int(cum[-1])
    n80 = int(np.argmax(cum * 5 >= total * 4)) + 1
    assert int(got["n_customers_80"].iloc[0]) == n80
    assert int(got["total_customers"].iloc[0]) == len(per)
    assert int(got["total_cents"].iloc[0]) == total


def test_token_burstiness(ray_session):
    got = _df(QUERIES["token_burstiness"](SF)).set_index("token")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    tf = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        if text is None:
            continue
        c = Counter(t for t in text.strip().lower().split(" ") if t)
        for tok, n in c.items():
            tf.setdefault(tok, []).append(n)
    assert len(got) == len(tf)
    for tok, counts in tf.items():
        assert int(got.loc[tok, "cf"]) == sum(counts)
        assert int(got.loc[tok, "df"]) == len(counts)
        assert int(got.loc[tok, "max_tf"]) == max(counts)


def test_page_paragraph_stats(ray_session):
    got = _df(QUERIES["page_paragraph_stats"](SF)).set_index("doc_id")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    for did, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split(" ")
        n_paras = (len(toks) + 39) // 40
        want_chars = sum(
            len(" ".join(toks[i : i + 40])) for i in range(0, len(toks), 40)
        )
        assert int(got.loc[int(did), "n_paras"]) == n_paras
        assert int(got.loc[int(did), "sum_chars"]) == want_chars


def test_select_texts_all_matches_in_order():
    from sciscraper_ray.stages.dom_select import select_texts

    html = "<div><p>a</p><span>x</span><p>b c</p></div><p>d</p>"
    assert select_texts(html, "p") == ["a", "b c", "d"]
    assert select_texts(html, "em") == []


def test_pdf_page_stats(ray_session):
    got = _df(QUERIES["pdf_page_stats"](SF)).set_index("doc_id")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    for did, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split(" ")
        n_pages = (len(toks) + 39) // 40
        want_chars = sum(
            len(" ".join(toks[i : i + 40])) for i in range(0, len(toks), 40)
        )
        assert int(got.loc[int(did), "n_pages"]) == n_pages
        assert int(got.loc[int(did), "sum_chars"]) == want_chars


def test_token_positional_bias(ray_session):
    got = _df(QUERIES["token_positional_bias"](SF)).set_index("token")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    agg = {}
    for _, text in zip(docs["doc_id"], docs["text"]):
        if text is None:
            continue
        ts = text.strip().lower().split(" ")
        first = {}
        for i, t in enumerate(ts):
            if t and t not in first:
                first[t] = i
        for t, fo in first.items():
            n, sfo, sl = agg.get(t, (0, 0, 0))
            agg[t] = (n + 1, sfo + fo, sl + len(ts))
    assert len(got) == len(agg)
    for t, (n, sfo, sl) in agg.items():
        assert int(got.loc[t, "n_docs"]) == n
        assert int(got.loc[t, "sum_first_ord"]) == sfo
        assert int(got.loc[t, "sum_doc_len"]) == sl


def test_crawl_interleave_schedule(ray_session):
    got = _df(QUERIES["crawl_interleave_schedule"](SF)).sort_values("slot")
    from sciscraper_ray.sources.page_synth import host_for

    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id"])
    df = pd.DataFrame(
        {
            "doc_id": docs["doc_id"],
            "host": [host_for(int(i)) for i in docs["doc_id"]],
        }
    ).sort_values(["host", "doc_id"])
    df["rank_in_host"] = df.groupby("host").cumcount() + 1
    df = df.sort_values(["rank_in_host", "host", "doc_id"]).reset_index(drop=True)
    df["slot"] = np.arange(1, len(df) + 1)
    assert got["doc_id"].tolist() == df["doc_id"].tolist()
    assert got["rank_in_host"].tolist() == df["rank_in_host"].tolist()
    assert got["slot"].tolist() == df["slot"].tolist()
    # schedule property: consecutive same-host fetches never adjacent
    # unless only one host remains with pending work
    hosts_in_order = got["host"].tolist()
    n_hosts = len(set(hosts_in_order))
    assert n_hosts > 1


def test_source_phrase_overlap(ray_session):
    got = _df(QUERIES["source_phrase_overlap"](SF)).set_index(
        ["source_a", "source_b"]
    )
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["text", "source"])
    per = {}
    for text, src in zip(docs["text"], docs["source"]):
        if text is None:
            continue
        ts = text.strip().lower().split(" ")
        s = per.setdefault(src, set())
        for i in range(len(ts) - 2):
            s.add(" ".join(ts[i : i + 3]))
    srcs = sorted(per)
    n_rows = 0
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            shared = len(per[a] & per[b])
            if shared:
                n_rows += 1
                assert int(got.loc[(a, b), "n_shared"]) == shared
    assert len(got) == n_rows


def test_lang_bpe_fertility(ray_session):
    got = _df(QUERIES["lang_bpe_fertility"](SF)).set_index("lang")
    from sciscraper_ray.stages.textstats import _BPE_RE

    docs = pd.read_parquet(SF + "/documents.parquet", columns=["text", "lang"])
    agg = {}
    for text, lang in zip(docs["text"], docs["lang"]):
        if text is None:
            continue
        b, w, n = agg.get(lang, (0, 0, 0))
        b += len(_BPE_RE.findall(text))
        w += sum(1 for t in text.strip().lower().split(" ") if t)
        agg[lang] = (b, w, n + 1)
    for lang, (b, w, n) in agg.items():
        assert int(got.loc[lang, "sum_bpe"]) == b
        assert int(got.loc[lang, "sum_words"]) == w
        assert int(got.loc[lang, "n_docs"]) == n


def test_events_session_position_value(ray_session):
    got = _df(QUERIES["events_session_position_value"](SF)).set_index("pos")
    ev = pd.read_parquet(
        SF + "/events.parquet", columns=["user_id", "ts", "event_id", "value"]
    ).sort_values(["user_id", "ts", "event_id"])
    gap = 30 * 60 * 1_000_000
    agg = {}
    for _, g in ev.groupby("user_id"):
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        vals = g["value"].to_numpy()
        pos = 0
        prev = None
        for t, v in zip(us, vals):
            pos = 1 if prev is None or t - prev > gap else pos + 1
            p = min(pos, 5)
            n, c = agg.get(p, (0, 0))
            agg[p] = (n + 1, c + int(round(v * 100)))
            prev = t
    for p, (n, c) in agg.items():
        assert int(got.loc[p, "n_events"]) == n
        assert int(got.loc[p, "value_cents"]) == c


def test_doc_lead_sentence(ray_session):
    import re as _re

    got = _df(QUERIES["doc_lead_sentence"](SF)).set_index("doc_id")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    for did, text in zip(docs["doc_id"], docs["text"]):
        lead = None
        for seg in _re.split(r"[.!?]+", text):
            seg = seg.strip(" \t\n\r")
            if seg:
                lead = seg
                break
        val = got.loc[int(did), "lead_sentence"]
        if lead is None:
            assert val is None or pd.isna(val)
        else:
            assert val == lead


def test_graph_wcc_sizes(ray_session):
    got = _df(QUERIES["graph_wcc_sizes"](SF)).set_index("comp_size")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id"])
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for i in docs["doc_id"]:
        i = int(i)
        for t in [(i * 17 + 13) % 997, (i * 29 + 7) % 997]:
            if i != t:
                union(i, t)
    sizes = Counter()
    for n in list(parent):
        sizes[find(n)] += 1
    hist = Counter(sizes.values())
    assert len(got) == len(hist)
    for size, cnt in hist.items():
        assert int(got.loc[size, "n_components"]) == cnt
