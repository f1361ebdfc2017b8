"""Round-4 session-K additions: AMS F2 sketch, RAKE keyword stats,
spend-decile band migration — first-principles recomputes (oracle parity
runs in tools/check_correctness.py at all three sf dirs)."""

import hashlib
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def _trigram_counts():
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["text"])
    c = Counter()
    for t in docs["text"]:
        toks = t.lower().strip().split(" ")
        for i in range(len(toks) - 2):
            c[" ".join(toks[i : i + 3])] += 1
    return c


def test_token_ams_f2(ray_session):
    got = _df(QUERIES["token_ams_f2"](SF)).set_index("j")
    counts = _trigram_counts()
    true_f2 = sum(v * v for v in counts.values())
    z = np.zeros(16, np.int64)
    for g, c in counts.items():
        h = int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
        for j in range(16):
            z[j] += (((h >> j) & 1) * 2 - 1) * c
    assert (got["true_f2"] == true_f2).all()
    for j in range(16):
        assert int(got.loc[j, "z"]) == z[j]
        assert int(got.loc[j, "est_f2"]) == int(z[j]) ** 2
    # the averaged estimator should land within ~3 std errors of truth
    assert abs(got["est_f2"].mean() - true_f2) < 3 * true_f2


def test_token_rake_stats(ray_session):
    got = _df(QUERIES["token_rake_stats"](SF)).set_index("token")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["text"])
    stops = {"a", "the"}
    freq, deg = Counter(), defaultdict(int)
    for t in docs["text"]:
        phrase = []
        for w in t.lower().strip().split(" ") + [None]:
            if w is None or w in stops:
                for pw in phrase:
                    freq[pw] += 1
                    deg[pw] += len(phrase)
                phrase = []
            else:
                phrase.append(w)
    assert set(got.index) == set(freq)
    for w in freq:
        assert int(got.loc[w, "freq"]) == freq[w]
        assert int(got.loc[w, "deg"]) == deg[w]
    assert "the" not in got.index  # stopwords never score


def _ntile10(vals):
    """DuckDB ntile(10) band for each position of a pre-sorted array."""
    n = len(vals)
    q, rem = divmod(n, 10)
    out = []
    for i in range(n):
        cut = rem * (q + 1)
        out.append(i // (q + 1) + 1 if i < cut else rem + (i - cut) // q + 1)
    return out


def test_customer_band_migration(ray_session):
    got = _df(QUERIES["customer_band_migration"](SF))
    orders = pd.read_parquet(SF + "/orders.parquet")
    orders["yr"] = orders["o_orderdate"].dt.year
    orders["cents"] = np.round(orders["o_totalprice"] * 100).astype(np.int64)
    spend = (
        orders.groupby(["o_custkey", "yr"])["cents"].sum().reset_index()
    )
    band = {}
    for y, g in spend.groupby("yr"):
        g = g.sort_values(["cents", "o_custkey"], ignore_index=True)
        for ck, b in zip(g["o_custkey"], _ntile10(g["cents"].tolist())):
            band[(ck, y)] = b
    trans = Counter()
    for (ck, y), b in band.items():
        nxt = band.get((ck, y + 1))
        if nxt is not None:
            trans[(b, nxt)] += 1
    assert len(got) == len(trans)
    for _, r in got.iterrows():
        assert trans[(r["band_from"], r["band_to"])] == r["n_customers"]
    # diagonal dominance: staying put is the most common move overall
    diag = got[got["band_from"] == got["band_to"]]["n_customers"].sum()
    assert diag > 0
