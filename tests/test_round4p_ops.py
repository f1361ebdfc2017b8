"""Round-4 session-P additions: winsorized mean, Mann-Whitney U —
first-principles recomputes (oracle parity runs in
tools/check_correctness.py at all three sf dirs)."""

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def test_lineitem_winsorized_mean(ray_session):
    got = _df(QUERIES["lineitem_winsorized_mean"](SF)).iloc[0]
    li = pd.read_parquet(SF + "/lineitem.parquet", columns=["l_extendedprice"])
    cents = np.sort(np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64))
    n = len(cents)
    lo = int(cents[(n * 5 + 99) // 100 - 1])
    hi = int(cents[(n * 95 + 99) // 100 - 1])
    assert got["lo_cut"] == lo and got["hi_cut"] == hi
    assert got["n_clipped_lo"] == int((cents < lo).sum())
    assert got["n_clipped_hi"] == int((cents > hi).sum())
    assert got["winsorized_sum_cents"] == int(np.clip(cents, lo, hi).sum())
    assert got["n_rows"] == n
    # winsorizing must pull the mean toward the middle vs the raw mean
    assert got["winsorized_sum_cents"] != int(cents.sum())


def test_source_length_mannwhitney(ray_session):
    got = _df(QUERIES["source_length_mannwhitney"](SF)).iloc[0]
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["source", "n_chars"])
    a = docs.loc[docs["source"] == "src0", "n_chars"].to_numpy(np.int64)
    b = docs.loc[docs["source"] == "src1", "n_chars"].to_numpy(np.int64)
    # brute force 2*U1 = sum over (x in a, y in b) of 2*[x>y] + [x==y]
    two_u1 = int(
        2 * (a[:, None] > b[None, :]).sum() + (a[:, None] == b[None, :]).sum()
    )
    assert got["n1"] == len(a) and got["n2"] == len(b)
    assert got["two_u1"] == two_u1
    assert got["two_u2"] == 2 * len(a) * len(b) - two_u1
    # midrank identity: 2*R1 = 2*U1 + n1*(n1+1)
    assert got["two_r1"] == two_u1 + len(a) * (len(a) + 1)


def test_doc_feature_hashing(ray_session):
    import hashlib

    got = _df(QUERIES["doc_feature_hashing"](SF)).set_index("doc_id")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    cache = {}

    def hv(w):
        if w not in cache:
            h = int(hashlib.md5(w.encode()).hexdigest()[:15], 16)
            cache[w] = (h % 16, 1 if (h // 16) % 2 == 0 else -1)
        return cache[w]

    for _, r in docs.head(50).iterrows():
        vec = np.zeros(16, np.int64)
        for w in r["text"].lower().strip().split(" "):
            b, s = hv(w)
            vec[b] += s
        row = got.loc[r["doc_id"]]
        assert [int(row[f"h{d}"]) for d in range(16)] == vec.tolist()
    # signed collisions must produce BOTH polarities somewhere
    assert (got[[f"h{d}" for d in range(16)]].to_numpy() < 0).any()
    assert (got[[f"h{d}" for d in range(16)]].to_numpy() > 0).any()


def test_events_survival_km(ray_session):
    got = _df(QUERIES["events_survival_km"](SF)).sort_values(
        "d", ignore_index=True
    )
    ev = pd.read_parquet(SF + "/events.parquet")
    US_DAY = 86_400_000_000
    rows = []
    for _, g in ev.groupby("user_id"):
        t0 = g["ts"].min()
        hits = g[(g["event_type"] == "purchase") & (g["value"] >= 150)]
        if len(hits):
            rows.append((int((hits["ts"].min() - t0).value // 1000) // US_DAY, 1))
        else:
            rows.append((int((g["ts"].max() - t0).value // 1000) // US_DAY, 0))
    df = pd.DataFrame(rows, columns=["d", "ev"])
    hist = df.groupby("d").agg(
        n_event=("ev", "sum"), n_total=("ev", "count")
    ).sort_index()
    hist["n_censored"] = hist["n_total"] - hist["n_event"]
    hist["n_risk"] = hist["n_total"][::-1].cumsum()[::-1]
    assert got["d"].tolist() == hist.index.tolist()
    assert got["n_event"].tolist() == hist["n_event"].tolist()
    assert got["n_censored"].tolist() == hist["n_censored"].tolist()
    assert got["n_risk"].tolist() == hist["n_risk"].tolist()
    # real censoring exists (the point of KM over a plain average)
    assert got["n_censored"].sum() > 0 and got["n_event"].sum() > 0
    # at-risk counts are non-increasing and start at the user count
    assert got["n_risk"].is_monotonic_decreasing
    assert got["n_risk"].iloc[0] == ev["user_id"].nunique()


def test_link_neighbor_degree_curve(ray_session):
    from collections import Counter, defaultdict

    got = _df(QUERIES["link_neighbor_degree_curve"](SF)).set_index(
        "src_indeg"
    )
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id"])
    edges = []
    for i in docs["doc_id"]:
        edges.append((int(i), (int(i) * 17 + 13) % 997))
        edges.append((int(i), (int(i) * 29 + 7) % 997))
    indeg = Counter(t for _, t in edges)
    n, s = defaultdict(int), defaultdict(int)
    for src, dst in edges:
        dx = indeg.get(src, 0)
        n[dx] += 1
        s[dx] += indeg[dst]
    assert set(got.index) == set(n)
    for d in n:
        assert int(got.loc[d, "n_edges"]) == n[d]
        assert int(got.loc[d, "sum_dst_indeg"]) == s[d]
