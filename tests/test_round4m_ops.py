"""Round-4 session-M additions: runs test, TextTiling boundaries —
first-principles recomputes (oracle parity runs in
tools/check_correctness.py at all three sf dirs)."""

from collections import Counter

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def test_events_runs_test(ray_session):
    got = _df(QUERIES["events_runs_test"](SF)).set_index("event_type")
    ev = pd.read_parquet(SF + "/events.parquet", columns=["event_type", "ts"])
    ev["hr"] = ev["ts"].dt.floor("h")
    for et, g in ev.groupby("event_type"):
        x = g.groupby("hr").size().sort_index().to_numpy()
        med = int(np.sort(x)[(len(x) - 1) // 2])
        s = [v > med for v in x if v != med]
        runs = 1 + sum(a != b for a, b in zip(s, s[1:])) if s else 0
        row = got.loc[et]
        assert row["median_rate"] == med
        assert row["n_above"] == sum(s)
        assert row["n_below"] == len(s) - sum(s)
        assert row["n_runs"] == runs
        # sanity: runs can never exceed the kept-sample size
        assert row["n_runs"] <= row["n_above"] + row["n_below"]


def test_doc_texttiling_boundaries(ray_session):
    got = _df(QUERIES["doc_texttiling_boundaries"](SF)).set_index("doc_id")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    seen = 0
    for _, r in docs.iterrows():
        toks = r["text"].lower().strip().split(" ")
        blocks = [
            Counter(toks[i : i + 20]) for i in range(0, len(toks), 20)
        ]
        if len(blocks) < 2:
            assert r["doc_id"] not in got.index
            continue
        seen += 1
        nb = 0
        for a, b in zip(blocks, blocks[1:]):
            dot = sum(a[w] * b[w] for w in a)
            na = sum(v * v for v in a.values())
            n2 = sum(v * v for v in b.values())
            if 4 * dot * dot < na * n2:
                nb += 1
        assert int(got.loc[r["doc_id"], "n_gaps"]) == len(blocks) - 1
        assert int(got.loc[r["doc_id"], "n_boundaries"]) == nb
    assert len(got) == seen
    # fixture sanity: some docs DO contain topic shifts, most gaps don't
    assert 0 < got["n_boundaries"].sum() < got["n_gaps"].sum()
