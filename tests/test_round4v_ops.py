"""Round-4 session-V additions: exact sliding-window velocity and
event-order state-machine validation — first-principles recomputes
(oracle parity runs in tools/check_correctness.py at all three sf dirs)."""

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def test_events_sliding_velocity(ray_session):
    got = _df(QUERIES["events_sliding_velocity"](SF)).set_index("user_id")
    ev = pd.read_parquet(SF + "/events.parquet", columns=["user_id", "ts"])
    ev["eu"] = ev["ts"].astype("datetime64[us]").astype("int64")
    W = 600_000_000
    for uid, g in ev.groupby("user_id"):
        eu = np.sort(g["eu"].to_numpy())
        best = 0
        for t in eu:
            best = max(best, int(((eu >= t) & (eu < t + W)).sum()))
        row = got.loc[uid]
        assert int(row["n_events"]) == len(eu)
        assert int(row["max_in_10min"]) == best
    assert len(got) == ev["user_id"].nunique()
    # sliding max dominates any tumbling-minute count by construction
    assert (got["max_in_10min"] >= 1).all()


def test_events_order_violations(ray_session):
    got = _df(QUERIES["events_order_violations"](SF)).set_index("user_id")
    ev = pd.read_parquet(
        SF + "/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    ev["eu"] = ev["ts"].astype("datetime64[us]").astype("int64")
    n_users = 0
    for uid, g in ev.groupby("user_id"):
        clicks = g.loc[g["event_type"] == "click", "eu"]
        purch = g.loc[g["event_type"] == "purchase", "eu"]
        if len(purch) == 0:
            assert uid not in got.index
            continue
        n_users += 1
        fc = clicks.min() if len(clicks) else None
        viol = (
            len(purch)
            if fc is None
            else int((purch.to_numpy() < fc).sum())
        )
        row = got.loc[uid]
        assert int(row["n_purchases"]) == len(purch)
        assert int(row["n_violations"]) == viol
    assert len(got) == n_users
    assert (got["n_violations"] <= got["n_purchases"]).all()
