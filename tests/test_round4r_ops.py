"""Round-4 session-R additions: link-prediction Jaccard candidates and
windowed grouped top-k — first-principles recomputes (oracle parity runs
in tools/check_correctness.py at all three sf dirs)."""

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def _ref_edges():
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id"])
    edges = set()
    for d in docs["doc_id"]:
        d = int(d)
        for t in ((d * 17 + 13) % 997, (d * 29 + 7) % 997):
            if t != d:
                edges.add((min(d, t), max(d, t)))
    return edges


def test_link_jaccard_prediction(ray_session):
    got = _df(QUERIES["link_jaccard_prediction"](SF))
    edges = _ref_edges()
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scores = {}
    for u, nb in adj.items():
        nb = sorted(nb)
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                scores[(nb[i], nb[j])] = scores.get((nb[i], nb[j]), 0) + 1
    cand = [
        (c, a, b)
        for (a, b), c in scores.items()
        if (a, b) not in edges
    ]
    cand.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = cand[:100]
    assert len(got) == len(want)
    for rnk, ((c, a, b), row) in enumerate(zip(want, got.itertuples()), 1):
        assert (row.a, row.b, row.common, row.rnk) == (a, b, c, rnk)
        assert row.deg_a == len(adj[a]) and row.deg_b == len(adj[b])
        assert row.union_size == len(adj[a]) + len(adj[b]) - c
    # every emitted pair is genuinely non-adjacent with >=1 common neighbor
    assert (got["common"] >= 1).all()


def test_events_hourly_topk_users(ray_session):
    got = _df(QUERIES["events_hourly_topk_users"](SF))
    ev = pd.read_parquet(SF + "/events.parquet", columns=["ts", "user_id"])
    ev["window_start"] = ev["ts"].dt.floor("h")
    hc = (
        ev.groupby(["window_start", "user_id"])
        .size()
        .rename("cnt")
        .reset_index()
    )
    hc = hc.sort_values(
        ["window_start", "cnt", "user_id"],
        ascending=[True, False, True],
        ignore_index=True,
    )
    hc["rnk"] = hc.groupby("window_start").cumcount() + 1
    want = hc[hc["rnk"] <= 3].reset_index(drop=True)
    got = got.sort_values(
        ["window_start", "rnk"], ignore_index=True
    ).astype({"cnt": np.int64, "rnk": np.int64})
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["window_start", "user_id", "cnt", "rnk"]],
        want[["window_start", "user_id", "cnt", "rnk"]],
        check_dtype=False,
    )
    # each window emits at most 3 rows and ranks are dense from 1
    per = got.groupby("window_start")["rnk"].agg(["min", "max", "size"])
    assert (per["min"] == 1).all() and (per["max"] == per["size"]).all()
    assert (per["size"] <= 3).all()
