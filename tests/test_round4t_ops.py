"""Round-4 session-T additions: warehouse constraint audit and
deterministic md5-addressed bootstrap — first-principles recomputes
(oracle parity runs in tools/check_correctness.py at all three sf dirs)."""

import hashlib

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def test_table_constraint_audit(ray_session):
    got = _df(QUERIES["table_constraint_audit"](SF)).set_index(
        "constraint_name"
    )
    orders = pd.read_parquet(SF + "/orders.parquet", columns=["o_custkey"])
    cust = pd.read_parquet(SF + "/customer.parquet", columns=["c_custkey"])
    li = pd.read_parquet(
        SF + "/lineitem.parquet", columns=["l_quantity", "l_discount"]
    )
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["text"])
    ev = pd.read_parquet(SF + "/events.parquet", columns=["value"])

    fk = got.loc["orders_custkey_fk"]
    assert int(fk["n_checked"]) == len(orders)
    assert int(fk["n_violations"]) == int(
        (~orders["o_custkey"].isin(cust["c_custkey"])).sum()
    )
    uq = got.loc["customer_custkey_unique"]
    assert int(uq["n_checked"]) == len(cust)
    assert int(uq["n_violations"]) == len(cust) - cust["c_custkey"].nunique()
    qr = got.loc["lineitem_quantity_range"]
    assert int(qr["n_violations"]) == int(
        ((li["l_quantity"] < 1) | (li["l_quantity"] > 50)).sum()
    )
    dr = got.loc["lineitem_discount_range"]
    assert int(dr["n_violations"]) == int(
        ((li["l_discount"] < 0) | (li["l_discount"] > 0.1)).sum()
    )
    tx = got.loc["documents_text_nonempty"]
    assert int(tx["n_violations"]) == int(
        (docs["text"].isna() | (docs["text"] == "")).sum()
    )
    vv = got.loc["events_value_nonnegative"]
    assert int(vv["n_checked"]) == len(ev)
    assert int(vv["n_violations"]) == int(
        (ev["value"].isna() | (ev["value"] < 0)).sum()
    )
    assert len(got) == 6
    # all n_checked are non-zero — the audit actually scanned something
    assert (got["n_checked"] > 0).all()


def test_doc_bootstrap_mean_ci(ray_session):
    got = _df(QUERIES["doc_bootstrap_mean_ci"](SF)).set_index("b")
    docs = pd.read_parquet(
        SF + "/documents.parquet", columns=["doc_id", "n_chars"]
    )
    chars = docs.set_index("doc_id")["n_chars"]
    n = len(docs)
    for b in range(16):
        s = 0
        for i in range(2000):
            did = (
                int(hashlib.md5(f"{b}:{i}".encode()).hexdigest()[:15], 16) % n
            )
            s += int(chars.loc[did])
        row = got.loc[b]
        assert int(row["m"]) == 2000
        assert int(row["sum_chars"]) == s
    assert len(got) == 16
    # resample means cluster near the population mean (sanity, not parity)
    means = got["sum_chars"].to_numpy() / got["m"].to_numpy()
    pop = chars.mean()
    assert abs(np.median(means) - pop) < pop * 0.1
