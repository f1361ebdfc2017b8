"""Round-4 batch AM: measurement extraction + date normalization."""

from __future__ import annotations

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_measurements_query(ray_session):
    from sciscraper_ray.pipelines.queries import QUERIES

    got = QUERIES["doc_measurements_extract"](SF).to_pandas()
    assert len(got) == 1500  # 3 measurements x 500 docs
    kg = got[got["unit_raw"] == "kg"]
    assert (kg["value_si"] == kg["value_raw"] * 1000).all()
    assert (kg["unit_si"] == "g").all()
    mb = got[got["unit_raw"] == "MB"]
    assert (mb["value_si"] == mb["value_raw"] * 1024).all()
    # document order: kg then cm then MB
    assert (
        got.sort_values(["doc_id", "ord"])
        .groupby("doc_id")["unit_raw"]
        .agg(list)
        .map(tuple)
        == ("kg", "cm", "MB")
    ).all()


def test_dates_query(ray_session):
    from sciscraper_ray.pipelines.queries import QUERIES

    got = QUERIES["doc_dates_normalize"](SF).to_pandas()
    assert len(got) == 500
    # every row normalizes to the same planted (month, day)
    m = 1 + got["doc_id"] % 12
    d = 1 + got["doc_id"] % 28
    exp = (
        "2021-"
        + m.astype(int).map("{:02d}".format)
        + "-"
        + d.astype(int).map("{:02d}".format)
    )
    assert (got["iso_date"] == exp).all()
    # euro form is parsed day-first: day and month never swapped
    euro = got[got["fmt"] == "euro"]
    assert (
        euro["raw_date"].str[:2].astype(int) == 1 + euro["doc_id"] % 28
    ).all()
    assert set(got["fmt"]) == {"iso", "long", "euro"}
