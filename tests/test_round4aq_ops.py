"""Round-4 batch AQ: XPath-lite selection + hourly forward-fill."""

from __future__ import annotations

import numpy as np
import pandas as pd

from sciscraper_ray.stages.dom_select import xpath_select

SF = "/root/testdata/sf0.001"

_H = (
    "<html><body><div><p>A</p><p>B</p></div>"
    '<div><span data-x="v7">C</span></div>'
    "<ul><li>one</li><li>two</li></ul></body></html>"
)


def test_xpath_features():
    assert xpath_select(_H, "/html/body/div[1]/p[2]") == "B"
    assert xpath_select(_H, "/html/body/div[2]/span") == "C"
    assert xpath_select(_H, "//span/@data-x") == "v7"
    assert xpath_select(_H, "//li[2]") == "two"
    assert xpath_select(_H, "//p") == "A"  # document-order first
    assert xpath_select(_H, "/html/body/div[3]") is None
    assert xpath_select(_H, "//span/@missing") is None


def test_xpath_same_tag_indexing_not_nth_child():
    # mixed children: b[1] must be the first <b>, not the first child
    h = "<html><body><div><a>x</a><b>y</b><a>z</a><b>w</b></div></body></html>"
    assert xpath_select(h, "/html/body/div/b[1]") == "y"
    assert xpath_select(h, "/html/body/div/b[2]") == "w"
    assert xpath_select(h, "/html/body/div/a[2]") == "z"


def test_hourly_ffill_query(ray_session):
    from sciscraper_ray.pipelines.queries import QUERIES

    got = QUERIES["events_hourly_ffill"](SF).to_pandas()
    ev = pd.read_parquet(SF + "/events.parquet",
                         columns=["user_id", "ts", "value"])
    epoch = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    ev["h"] = (
        ev["ts"].astype("datetime64[us]").astype("int64") - epoch
    ) // 3_600_000_000
    ev["cents"] = np.round(ev["value"].to_numpy() * 100).astype("int64")
    hourly = ev.groupby(["user_id", "h"])["cents"].sum()
    for uid, g in got.groupby("user_id"):
        g = g.sort_values("hour")
        obs = hourly.loc[uid]
        # grid spans exactly the user's own [min, max] hours
        assert g["hour"].iloc[0] == obs.index.min()
        assert g["hour"].iloc[-1] == obs.index.max()
        assert (np.diff(g["hour"]) == 1).all()
        # observed slots match, filled slots carry the previous value
        last = None
        for _, row in g.iterrows():
            if row["hour"] in obs.index:
                assert row["is_filled"] == 0
                assert row["cents_filled"] == obs.loc[row["hour"]]
                last = row["cents_filled"]
            else:
                assert row["is_filled"] == 1
                assert row["cents_filled"] == last
