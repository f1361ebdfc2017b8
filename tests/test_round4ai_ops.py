"""Round-4 batch AI: DGIM sliding-window sketch audit + hreflang clusters."""

from __future__ import annotations

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES
from sciscraper_ray.pipelines.queries.events import (
    _DGIM_WINDOW,
    _dgim_estimate,
)

SF = "/root/testdata/sf0.001"


def test_dgim_hand_cases():
    # three ones: cascade merges the two oldest size-1 buckets; estimate
    # = newest full bucket (1) + half the merged oldest (2 -> 1) = 2
    assert _dgim_estimate(np.array([1, 1, 1], bool)) == 2
    assert _dgim_estimate(np.array([0, 0, 0], bool)) == 0
    assert _dgim_estimate(np.array([1], bool)) == 1
    # ones older than the window must expire to estimate 0
    bits = np.zeros(200, bool)
    bits[:100] = True
    assert _dgim_estimate(bits) == 0


def test_dgim_bound_holds_on_random_streams():
    rng = np.random.default_rng(7)
    for density in (0.05, 0.3, 0.9):
        for n in (10, 64, 300, 1000):
            bits = rng.random(n) < density
            exact = int(bits[-_DGIM_WINDOW:].sum())
            est = _dgim_estimate(bits)
            assert 2 * abs(est - exact) <= exact + 2, (n, density, est, exact)


def test_dgim_query_users_complete(ray_session):
    got = QUERIES["events_dgim_window_count"](SF).to_pandas()
    ev = pd.read_parquet(SF + "/events.parquet",
                         columns=["user_id", "ts", "event_id", "event_type"])
    assert sorted(got["user_id"]) == sorted(ev["user_id"].unique())
    assert (got["bound_ok"] == 1).all()
    # exact counts vs pandas recompute
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    exp = (
        ev.groupby("user_id")
        .apply(
            lambda g: int(
                (g["event_type"].to_numpy() == "click")[-_DGIM_WINDOW:].sum()
            ),
            include_groups=False,
        )
        .to_dict()
    )
    assert dict(zip(got["user_id"], got["exact_clicks"])) == exp


def test_hreflang_query(ray_session):
    got = QUERIES["page_hreflang_clusters"](SF).to_pandas()
    declared = got[got["doc_id"] % 10 != 9]
    assert (declared["cluster_id"] == declared["doc_id"] - declared["doc_id"] % 3).all()
    assert (
        declared["lang"]
        == declared["doc_id"].mod(3).map({0: "en", 1: "de", 2: "fr"})
    ).all()
    silent = got[got["doc_id"] % 10 == 9]
    assert (silent["cluster_id"] == silent["doc_id"]).all()
    assert silent["lang"].isna().all()
    assert (silent["n_alternates"] == 0).all()
