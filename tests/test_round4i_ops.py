"""Round-4 session-I additions: CUSUM drift, sorted-neighbor LCP,
2-D skyline — first-principles recomputes (oracle parity runs in
tools/check_correctness.py at all three sf dirs)."""

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def test_events_cusum_drift(ray_session):
    got = _df(QUERIES["events_cusum_drift"](SF))
    ev = pd.read_parquet(SF + "/events.parquet", columns=["event_type", "ts"])
    ev["hr"] = ev["ts"].dt.floor("h")
    hourly = ev.groupby(["event_type", "hr"]).size().rename("x").reset_index()
    for et, g in hourly.groupby("event_type"):
        g = g.sort_values("hr", ignore_index=True)
        x = g["x"].to_numpy(np.int64)
        T, H = int(x.sum()), len(x)
        # reference recurrence, literally: S_t = max(0, S_{t-1} + dev_t)
        s_ref, s = [], 0
        for xi in x:
            s = max(0, s + int(xi) * H - T)
            s_ref.append(s)
        sub = got[got["event_type"] == et].sort_values("hr")
        assert sub["n_events"].tolist() == x.tolist()
        assert sub["cusum_scaled"].tolist() == s_ref
        assert sub["drift_flag"].tolist() == [int(v > 2 * T) for v in s_ref]
    assert got["drift_flag"].sum() > 0  # fixture has real bursts


def test_doc_sorted_lcp(ray_session):
    got = (
        _df(QUERIES["doc_sorted_lcp"](SF))
        .set_index("doc_id")["lcp_prev"]
    )
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    docs = docs.sort_values(["text", "doc_id"], ignore_index=True)

    def lcp(a, b):
        m = min(len(a), len(b))
        i = 0
        while i < m and a[i] == b[i]:
            i += 1
        return i

    assert len(got) == len(docs)
    prev = None
    for _, row in docs.iterrows():
        want = 0 if prev is None else lcp(row["text"], prev)
        assert int(got.loc[row["doc_id"]]) == want
        prev = row["text"]
    assert got.max() > 0  # word-salad corpus shares real prefixes


def test_lineitem_skyline(ray_session):
    got = _df(QUERIES["lineitem_skyline"](SF))
    li = pd.read_parquet(
        SF + "/lineitem.parquet", columns=["l_extendedprice", "l_quantity"]
    )
    pts = set(
        zip(
            np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64),
            li["l_quantity"].to_numpy().astype(np.int64),
        )
    )
    # brute-force dominance over the distinct point set
    want = {
        (p, q)
        for (p, q) in pts
        if not any(
            (p2 <= p and q2 >= q and (p2, q2) != (p, q)) for (p2, q2) in pts
        )
    }
    assert set(zip(got["price_c"], got["qty"])) == want
    # frontier is strictly decreasing in price -> strictly increasing qty
    g = got.sort_values("price_c")
    assert g["qty"].is_monotonic_increasing
