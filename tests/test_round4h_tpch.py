"""Round-4 session-H additions: TPC-H Q6/Q15/Q20/Q9 shapes —
first-principles pandas recomputes (oracle parity runs in
tools/check_correctness.py at all three sf dirs)."""

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def _li():
    return pd.read_parquet(SF + "/lineitem.parquet")


def test_forecast_discount_revenue(ray_session):
    got = _df(QUERIES["forecast_discount_revenue"](SF)).set_index("disc_bp")
    li = _li()
    bp = np.round(li["l_discount"].to_numpy() * 100).astype(np.int64)
    cents = np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    keep = (
        (li["l_shipdate"].dt.year.to_numpy() == 1997)
        & (bp >= 4)
        & (bp <= 6)
        & (li["l_quantity"].to_numpy() < 24)
    )
    for b in (4, 5, 6):
        sel = keep & (bp == b)
        assert int(got.loc[b, "n_lines"]) == int(sel.sum())
        assert int(got.loc[b, "forecast_rev_cbp"]) == int(
            (cents[sel] * b).sum()
        )


def test_supplier_peak_revenue(ray_session):
    got = _df(QUERIES["supplier_peak_revenue"](SF))
    li = _li()
    keep = (li["l_shipdate"] >= "1997-01-01") & (li["l_shipdate"] < "1997-04-01")
    li = li[keep]
    rev = (
        np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        * (100 - np.round(li["l_discount"].to_numpy() * 100).astype(np.int64))
    )
    per = pd.Series(rev).groupby(li["l_suppkey"].to_numpy()).sum()
    peak = per.max()
    winners = set(per[per == peak].index)
    assert set(got["s_suppkey"]) == winners
    assert (got["total_rev_c2"] == peak).all()
    supp = pd.read_parquet(SF + "/supplier.parquet").set_index("s_suppkey")
    for _, r in got.iterrows():
        assert r["s_name"] == supp.loc[r["s_suppkey"], "s_name"]


def test_excess_shipment_suppliers(ray_session):
    got = (
        _df(QUERIES["excess_shipment_suppliers"](SF))
        .sort_values("s_suppkey", ignore_index=True)
    )
    li = _li()
    part = pd.read_parquet(SF + "/part.parquet")
    large = set(part.loc[part["p_name"].str.startswith("large"), "p_partkey"])
    li = li[li["l_partkey"].isin(large)].copy()
    li["q"] = li["l_quantity"].astype(np.int64)
    li["q97"] = np.where(li["l_shipdate"].dt.year == 1997, li["q"], 0)
    sp = li.groupby(["l_suppkey", "l_partkey"])[["q97", "q"]].sum()
    excess = sp[2 * sp["q97"] > sp["q"]]
    want = (
        excess.reset_index().groupby("l_suppkey").size().sort_index()
    )
    assert got["s_suppkey"].tolist() == want.index.tolist()
    assert got["n_excess_parts"].tolist() == want.tolist()


def test_profit_by_nation_year(ray_session):
    got = _df(QUERIES["profit_by_nation_year"](SF)).set_index(
        ["n_name", "yr"]
    )
    li = _li()
    part = pd.read_parquet(SF + "/part.parquet")
    orders = pd.read_parquet(SF + "/orders.parquet")
    supp = pd.read_parquet(SF + "/supplier.parquet")
    nation = pd.read_parquet(SF + "/nation.parquet")
    bolt = part[part["p_name"].str.contains("bolt")]
    m = li.merge(bolt, left_on="l_partkey", right_on="p_partkey")
    m = m.merge(orders[["o_orderkey", "o_orderdate"]],
                left_on="l_orderkey", right_on="o_orderkey")
    m = m.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    m = m.merge(nation, left_on="s_nationkey", right_on="n_nationkey")
    margin = (
        np.round(m["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        * (100 - np.round(m["l_discount"].to_numpy() * 100).astype(np.int64))
        - np.round(m["p_retailprice"].to_numpy() * 100).astype(np.int64)
        * m["l_quantity"].to_numpy().astype(np.int64)
        * 80
    )
    want = (
        pd.Series(margin)
        .groupby([m["n_name"].to_numpy(), m["o_orderdate"].dt.year.to_numpy()])
        .sum()
    )
    assert len(got) == len(want)
    for (nm, yr), v in want.items():
        assert int(got.loc[(nm, yr), "profit_c2"]) == int(v)
