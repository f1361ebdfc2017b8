"""Round-4 session-U additions: schema-evolution union read and
incremental view maintenance — first-principles recomputes (oracle
parity runs in tools/check_correctness.py at all three sf dirs)."""

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"
SPLIT = np.datetime64("1999-01-01")


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def test_schema_evolution_union(ray_session):
    got = _df(QUERIES["schema_evolution_union"](SF)).set_index(
        "priority_label"
    )
    o = pd.read_parquet(
        SF + "/orders.parquet",
        columns=["o_orderdate", "o_totalprice", "o_orderpriority"],
    )
    o["cents"] = np.round(o["o_totalprice"] * 100).astype(np.int64)
    o["label"] = np.where(
        o["o_orderdate"].to_numpy() < SPLIT,
        "<pre-evolution>",
        o["o_orderpriority"],
    )
    want = o.groupby("label").agg(
        n_orders=("cents", "size"), rev_c=("cents", "sum")
    )
    assert sorted(got.index) == sorted(want.index)
    for lbl in want.index:
        assert int(got.loc[lbl, "n_orders"]) == int(want.loc[lbl, "n_orders"])
        assert int(got.loc[lbl, "rev_c"]) == int(want.loc[lbl, "rev_c"])
    # the evolved snapshot contributes real (non-sentinel) labels
    assert "<pre-evolution>" in got.index and len(got) > 1


def test_orders_incremental_agg(ray_session):
    got = _df(QUERIES["orders_incremental_agg"](SF))
    o = pd.read_parquet(
        SF + "/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    o["cents"] = np.round(o["o_totalprice"] * 100).astype(np.int64)
    o["month"] = (
        o["o_orderdate"].dt.year * 100 + o["o_orderdate"].dt.month
    ).astype(np.int64)
    o["phase"] = np.where(
        o["o_orderdate"].to_numpy() < SPLIT, "base", "delta"
    )
    parts = (
        o.groupby(["phase", "month"])
        .agg(n_orders=("cents", "size"), rev_c=("cents", "sum"))
        .reset_index()
    )
    full = (
        o.groupby("month")
        .agg(n_orders=("cents", "size"), rev_c=("cents", "sum"))
        .reset_index()
        .assign(phase="merged")
    )
    want = pd.concat([parts, full])[
        ["phase", "month", "n_orders", "rev_c"]
    ].sort_values(["phase", "month"], ignore_index=True)
    got = got.sort_values(["phase", "month"], ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # invariant: merged == base + delta per month (the IVM contract)
    m = got.pivot_table(
        index="month", columns="phase", values="rev_c", aggfunc="sum"
    ).fillna(0)
    assert (
        m["merged"] == m.get("base", 0) + m.get("delta", 0)
    ).all()
