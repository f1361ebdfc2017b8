"""Round-4 late additions: unigram entropy, audience overlap, k-anonymity
audit, per-dimension embedding stats — each recomputed from first
principles in pandas/numpy (oracle parity runs in
tools/check_correctness.py)."""

import math

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_doc_token_entropy_matches_closed_form(ray_session):
    out = (
        QUERIES["doc_token_entropy"](SF)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    docs = pd.read_parquet(SF + "/documents.parquet")
    for _, row in docs.head(40).iterrows():
        toks = row["text"].strip().lower().split(" ")
        n = len(toks)
        counts = pd.Series(toks).value_counts()
        ent = math.log2(n) - sum(c * math.log2(c) for c in counts) / n
        got = out.loc[row["doc_id"]]
        assert got["n_tokens"] == n
        assert got["n_types"] == len(counts)
        assert got["entropy"] == round(ent, 6)
        if len(counts) > 1:
            assert got["norm_entropy"] == round(ent / math.log2(len(counts)), 6)
        else:
            assert got["norm_entropy"] == 0.0


def test_events_user_overlap_matches_pair_join(ray_session):
    out = QUERIES["events_user_overlap"](SF).to_pandas()
    ev = pd.read_parquet(SF + "/events.parquet", columns=["user_id", "event_type"])
    d = ev.drop_duplicates()
    j = d.merge(d, on="user_id")
    j = j[j["event_type_x"] < j["event_type_y"]]
    want = (
        j.groupby(["event_type_x", "event_type_y"])
        .size()
        .reset_index(name="users")
    )
    got = out.sort_values(["type_a", "type_b"]).reset_index(drop=True)
    want = want.sort_values(["event_type_x", "event_type_y"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["type_a"].to_numpy() == want["event_type_x"].to_numpy()).all()
    assert (got["type_b"].to_numpy() == want["event_type_y"].to_numpy()).all()
    assert (got["users"].to_numpy() == want["users"].to_numpy()).all()


def test_events_k_anonymity_flags_small_groups(ray_session):
    out = QUERIES["events_k_anonymity"](SF).to_pandas()
    ev = pd.read_parquet(SF + "/events.parquet")
    ev["band"] = np.floor(ev["value"]).astype(np.int64)
    want = ev.groupby(["event_type", "band"]).agg(
        cnt=("event_id", "size"), users=("user_id", "nunique")
    )
    got = out.set_index(["event_type", "band"]).sort_index()
    want = want.sort_index()
    assert len(got) == len(want)
    assert (got["cnt"].to_numpy() == want["cnt"].to_numpy()).all()
    assert (got["users"].to_numpy() == want["users"].to_numpy()).all()
    expect_supp = (want["cnt"] < 5) | (want["users"] < 3)
    assert (got["suppressed"].to_numpy() == expect_supp.to_numpy()).all()
    # the fine banding must actually exercise both flag values
    assert got["suppressed"].any() and not got["suppressed"].all()


def test_embedding_dim_stats_matches_numpy(ray_session):
    out = QUERIES["embedding_dim_stats"](SF).to_pandas().sort_values("dim")
    emb = pd.read_parquet(SF + "/embeddings.parquet", columns=["embedding"])
    m = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    assert len(out) == m.shape[1]
    np.testing.assert_allclose(out["mean"], np.round(m.mean(0), 6), atol=2e-6)
    np.testing.assert_allclose(out["std"], np.round(m.std(0), 6), atol=2e-6)
    np.testing.assert_array_equal(out["vmin"], np.round(m.min(0), 6))
    np.testing.assert_array_equal(out["vmax"], np.round(m.max(0), 6))


def test_source_kl_divergence_matches_closed_form(ray_session):
    out = QUERIES["source_kl_divergence"](SF).to_pandas().set_index("source")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["source", "text"])
    rows = []
    for src, text in zip(docs["source"], docs["text"]):
        for tok in text.strip().lower().split(" "):
            rows.append((src, tok))
    df = pd.DataFrame(rows, columns=["source", "token"])
    c = df.groupby(["source", "token"]).size().rename("c").reset_index()
    tot = c.groupby("source")["c"].sum()
    g = c.groupby("token")["c"].sum()
    grand = c["c"].sum()
    for src in tot.index:
        sub = c[c["source"] == src]
        p = sub["c"].to_numpy(np.float64) / tot[src]
        q = g[sub["token"]].to_numpy(np.float64) / grand
        kl = float((p * np.log2(p / q)).sum())
        assert out.loc[src, "n_tokens"] == tot[src]
        assert abs(out.loc[src, "kl_bits"] - kl) < 2e-6
    assert (out["kl_bits"] >= 0).all()


def test_events_ab_welch_matches_scipy_free_formula(ray_session):
    out = QUERIES["events_ab_welch"](SF).to_pandas()
    ev = pd.read_parquet(SF + "/events.parquet", columns=["event_type", "value"])
    g = ev.groupby("event_type")["value"]
    stats = {t: (len(v), v.mean(), v.var(ddof=1)) for t, v in g}
    types = sorted(stats)
    assert len(out) == len(types) * (len(types) - 1) // 2
    out = out.set_index(["type_a", "type_b"])
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            na, ma, va = stats[a]
            nb, mb, vb = stats[b]
            se2 = va / na + vb / nb
            t = (ma - mb) / np.sqrt(se2)
            df = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
            assert abs(out.loc[(a, b), "t_stat"] - t) < 2e-5
            assert abs(out.loc[(a, b), "welch_df"] - df) < 2e-2


def test_token_window_cooc_matches_shifted_zip(ray_session):
    out = QUERIES["token_window_cooc"](SF).to_pandas()
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["text"])
    pairs: dict[tuple, int] = {}
    for text in docs["text"]:
        toks = text.strip().lower().split(" ")
        for d in (1, 2):
            for a, b in zip(toks, toks[d:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + 1
    want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:80]
    got = list(zip(zip(out["w1"], out["w2"]), out["cnt"]))
    assert got == [(k, v) for k, v in want]


def test_attribution_first_touch_matches_pandas(ray_session):
    out = (
        QUERIES["events_attribution_first_touch"](SF)
        .to_pandas()
        .set_index("first_touch")["conversions"]
        .sort_index()
    )
    ev = pd.read_parquet(SF + "/events.parquet")
    firsts = (
        ev.sort_values(["ts", "event_id"])
        .groupby("user_id")["event_type"]
        .first()
        .rename("first_touch")
    )
    purch = ev[ev["event_type"] == "purchase"].merge(
        firsts, left_on="user_id", right_index=True
    )
    want = purch.groupby("first_touch").size().sort_index()
    assert (out.index == want.index).all()
    assert (out.to_numpy() == want.to_numpy()).all()


def test_source_dup_rate_counts_planted_copies(ray_session):
    out = QUERIES["source_dup_rate"](SF).to_pandas().set_index("source")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["source", "text"])
    g = docs.groupby("source")["text"]
    for src, v in g:
        assert out.loc[src, "docs"] == len(v)
        assert out.loc[src, "uniq"] == v.nunique()
        assert out.loc[src, "dup_rate"] == round(1.0 - v.nunique() / len(v), 6)


def test_doc_snippets_kwic_contexts(ray_session):
    out = QUERIES["doc_snippets"](SF).to_pandas()
    docs = pd.read_parquet(SF + "/documents.parquet")
    rows = []
    for _, r in docs.iterrows():
        toks = r["text"].strip().lower().split(" ")
        for i, t in enumerate(toks):
            if t == "table":
                left = " ".join(toks[max(i - 2, 0):i]) or None
                right = " ".join(toks[i + 1:i + 3]) or None
                rows.append((r["doc_id"], i, left, right))
    want = pd.DataFrame(rows, columns=["doc_id", "pos", "left_ctx", "right_ctx"])
    got = out.sort_values(["doc_id", "pos"]).reset_index(drop=True)
    want = want.sort_values(["doc_id", "pos"]).reset_index(drop=True)
    assert len(got) == len(want) > 0
    for col in want.columns:
        ga, wa = got[col].to_numpy(), want[col].to_numpy()
        assert all(
            (g == w) or (pd.isna(g) and pd.isna(w)) for g, w in zip(ga, wa)
        ), col


def test_fullouter_join_keeps_both_unmatched_sides(ray_session):
    out = QUERIES["events_user_activity_fullouter"](SF).to_pandas()
    ev = pd.read_parquet(SF + "/events.parquet")
    p = (
        ev[(ev["event_type"] == "purchase") & (ev["value"] > 200)]
        .groupby("user_id").size()
    )
    er = (
        ev[(ev["event_type"] == "error") & (ev["value"] < 8)]
        .groupby("user_id").size()
    )
    users = sorted(set(p.index) | set(er.index))
    got = out.set_index("user_id").sort_index()
    assert list(got.index) == users
    for u in users:
        assert got.loc[u, "big_purchases"] == p.get(u, 0)
        assert got.loc[u, "bad_errors"] == er.get(u, 0)
    # the outer path must actually be exercised (error-only users exist
    # at every sf; purchase-only users appear from sf0.01 up)
    assert (got["big_purchases"] == 0).any()


def test_events_gap_stats_matches_pandas(ray_session):
    out = QUERIES["events_gap_stats"](SF).to_pandas().set_index("user_id")
    ev = pd.read_parquet(SF + "/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    for uid, g in ev.groupby("user_id"):
        # exact integer microseconds, matching the query's float path
        # (sum_us / 1e6 / n) — the query intentionally does NOT round
        # (banker's-vs-half-away divergence at sf0.1, scale-stress r5)
        gaps_us = (
            g["ts"].astype("datetime64[us]").astype("int64").diff().dropna()
        ).to_numpy()
        if len(gaps_us) == 0:
            assert uid not in out.index
            continue
        assert out.loc[uid, "n_gaps"] == len(gaps_us)
        assert out.loc[uid, "mean_gap_s"] == float(gaps_us.sum()) / 1e6 / len(
            gaps_us
        )
        assert out.loc[uid, "max_gap_s"] == float(gaps_us.max()) / 1e6


def test_corpus_heaps_law_matches_closed_form(ray_session):
    out = QUERIES["corpus_heaps_law"](SF).to_pandas()
    docs = pd.read_parquet(SF + "/documents.parquet").sort_values("doc_id")
    seen: set = set()
    ct, cy, xs, ys = 0, 0, [], []
    for _, r in docs.iterrows():
        toks = r["text"].strip().lower().split(" ")
        ct += len(toks)
        new = set(toks) - seen
        seen |= new
        cy += len(new)
        xs.append(np.log(ct))
        ys.append(np.log(cy))
    x, y = np.array(xs), np.array(ys)
    n = len(x)
    beta = (n * (x * y).sum() - x.sum() * y.sum()) / (
        n * (x * x).sum() - x.sum() ** 2
    )
    logk = (y.sum() - beta * x.sum()) / n
    assert out["n_docs"][0] == n
    assert abs(out["heaps_beta"][0] - beta) < 2e-6
    assert abs(out["heaps_logk"][0] - logk) < 2e-5
    assert 0 < out["heaps_beta"][0] < 1  # sublinear vocabulary growth


def test_orders_q3_exact_cents_and_order(ray_session):
    out = QUERIES["orders_q3_priority"](SF).to_pandas()
    import duckdb

    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    want = con.sql(
        """
        SELECT l.l_orderkey,
               CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS revenue_c2
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < DATE '1995-03-15'
          AND l.l_shipdate > DATE '1995-03-15'
        GROUP BY l.l_orderkey
        ORDER BY revenue_c2 DESC LIMIT 10
        """
    ).df()
    assert len(out) == len(want)
    assert list(out["revenue_c2"]) == list(want["revenue_c2"])
    # descending, deterministic ordering
    assert (np.diff(out["revenue_c2"].to_numpy()) <= 0).all()


def test_weighted_median_crossing_rule(ray_session):
    out = (
        QUERIES["lineitem_weighted_median"](SF)
        .to_pandas()
        .set_index("flag")["wmedian_price"]
    )
    li = pd.read_parquet(
        SF + "/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    )
    for flag, g in li.groupby("l_returnflag"):
        w = g.groupby("l_extendedprice")["l_quantity"].sum().sort_index()
        cum = w.cumsum()
        want = cum.index[(cum * 2 >= cum.iloc[-1]).argmax()]
        assert out[flag] == want


def test_markov_stationary_is_probability_vector(ray_session):
    out = QUERIES["events_markov_stationary"](SF).to_pandas()
    assert abs(out["prob"].sum() - 1.0) < 1e-4
    assert (out["prob"] > 0).all()
    assert len(out) == 5


def test_time_to_convert_first_signup_then_first_purchase(ray_session):
    out = (
        QUERIES["events_time_to_convert"](SF)
        .to_pandas()
        .set_index("user_id")["convert_s"]
    )
    ev = pd.read_parquet(SF + "/events.parquet")
    for uid, g in ev.groupby("user_id"):
        s = g[g["event_type"] == "signup"]["ts"]
        if s.empty:
            assert uid not in out.index
            continue
        ts0 = s.min()
        p = g[(g["event_type"] == "purchase") & (g["ts"] >= ts0)]["ts"]
        if p.empty:
            assert uid not in out.index
            continue
        want = round((p.min() - ts0).total_seconds(), 6)
        assert out[uid] == want


def test_lang_confusion_matches_per_doc_langid(ray_session):
    out = QUERIES["doc_lang_confusion"](SF).to_pandas()
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "lang"])
    assert out["docs"].sum() == len(docs)
    # cross-check the matrix against the per-doc lang-ID query
    pred = QUERIES["doc_lang_id"](SF).to_pandas().set_index("doc_id")
    joined = docs.set_index("doc_id").join(pred)
    want = (
        joined.groupby(["lang", "lang_pred"]).size().rename("docs").reset_index()
    )
    got = out.sort_values(["declared", "predicted"]).reset_index(drop=True)
    want = want.sort_values(["lang", "lang_pred"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["docs"].to_numpy() == want["docs"].to_numpy()).all()
    assert (got["declared"].to_numpy() == want["lang"].to_numpy()).all()
    assert (got["predicted"].to_numpy() == want["lang_pred"].to_numpy()).all()


def test_prefix_autocomplete_argmax_rule(ray_session):
    out = (
        QUERIES["token_prefix_autocomplete"](SF)
        .to_pandas()
        .set_index("prefix")
    )
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["text"])
    counts: dict[str, int] = {}
    for text in docs["text"]:
        for t in text.strip().lower().split(" "):
            if len(t) >= 3:
                counts[t] = counts.get(t, 0) + 1
    best: dict[str, tuple] = {}
    for t, c in counts.items():
        k = t[:3]
        cand = (-c, t)
        if k not in best or cand < best[k]:
            best[k] = cand
    assert len(out) == len(best)
    for k, (negc, t) in best.items():
        assert out.loc[k, "completion"] == t
        assert out.loc[k, "cnt"] == -negc


def test_price_qty_corr_matches_numpy(ray_session):
    out = (
        QUERIES["lineitem_price_qty_corr"](SF).to_pandas().set_index("flag")
    )
    li = pd.read_parquet(
        SF + "/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )
    for flag, g in li.groupby("l_returnflag"):
        q = g["l_quantity"].to_numpy(np.float64)
        p = g["l_extendedprice"].to_numpy(np.float64)
        r = np.corrcoef(q, p)[0, 1]
        slope = np.polyfit(q, p, 1)[0]
        assert out.loc[flag, "n"] == len(g)
        assert abs(out.loc[flag, "pearson_r"] - r) < 2e-5
        assert abs(out.loc[flag, "ols_slope"] - slope) < 2e-3
