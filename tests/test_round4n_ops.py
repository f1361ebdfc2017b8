"""Round-4 session-N additions: two-pass exact continuous quantiles —
first-principles recomputes (oracle parity runs in
tools/check_correctness.py at all three sf dirs)."""

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def test_lineitem_price_quantiles_twopass(ray_session):
    got = _df(QUERIES["lineitem_price_quantiles_twopass"](SF)).set_index(
        "pct"
    )
    li = pd.read_parquet(SF + "/lineitem.parquet", columns=["l_extendedprice"])
    cents = np.sort(np.round(li["l_extendedprice"].to_numpy() * 100).astype(np.int64))
    n = len(cents)
    for pct in (10, 50, 90):
        idx = (n * pct + 99) // 100 - 1  # quantile_disc: ceil(n*q) - 1
        assert int(got.loc[pct, "value_cents"]) == int(cents[idx])
        assert int(got.loc[pct, "n_rows"]) == n
    assert (
        got.loc[10, "value_cents"]
        < got.loc[50, "value_cents"]
        < got.loc[90, "value_cents"]
    )
