"""Round-4 session-AA additions: distributed gaps-and-islands with
boundary stitching — first-principles recompute plus a stitching
property test (oracle parity runs in tools/check_correctness.py)."""

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def _want(keys: np.ndarray):
    k = np.unique(keys)
    d = np.diff(k)
    brk = d > 1
    starts = np.r_[0, np.flatnonzero(brk) + 1]
    ends = np.r_[np.flatnonzero(brk), len(k) - 1]
    lens = k[ends] - k[starts] + 1
    return (
        len(k),
        len(starts),
        int(lens.max()),
        int((d[brk] - 1).max()) if brk.any() else 0,
    )


def test_orders_key_islands(ray_session):
    got = _df(QUERIES["orders_key_islands"](SF)).iloc[0]
    o = pd.read_parquet(
        SF + "/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    cents = np.round(o["o_totalprice"].to_numpy() * 100).astype(np.int64)
    keys = o["o_orderkey"].to_numpy()[cents % 7 != 0]
    n_keys, n_islands, longest, max_gap = _want(keys)
    assert int(got["n_keys"]) == n_keys
    assert int(got["n_islands"]) == n_islands
    assert int(got["longest_island"]) == longest
    assert int(got["max_gap"]) == max_gap
    # retention filter really punched holes: multiple islands exist
    assert n_islands > 1 and max_gap >= 1


def test_orders_key_islands_range_invariance(ray_session):
    """Stitching is exact for any range width: 3 and 64 ranges must agree
    with 16 (islands spanning many ranges are the hard case)."""
    base = _df(QUERIES["orders_key_islands"](SF)).iloc[0]
    for nr in (3, 64):
        alt = _df(QUERIES["orders_key_islands"](SF, num_ranges=nr)).iloc[0]
        for c in ("n_keys", "n_islands", "longest_island", "max_gap"):
            assert int(alt[c]) == int(base[c]), (nr, c)
