"""Round-4 session-W additions: bloom FPR audit and dense hourly lag-1
autocorrelation moments — first-principles recomputes (oracle parity
runs in tools/check_correctness.py at all three sf dirs)."""

import hashlib

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"
M, K = 16384, 3


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def _pos(key):
    return [
        int(hashlib.md5(f"{i}:{key}".encode()).hexdigest()[:15], 16) % M
        for i in range(K)
    ]


def test_bloom_fpr_audit(ray_session):
    got = _df(QUERIES["bloom_fpr_audit"](SF)).iloc[0]
    part = pd.read_parquet(SF + "/part.parquet", columns=["p_partkey"])
    keys = part["p_partkey"].to_numpy()
    evens = [int(k) for k in keys if k % 2 == 0]
    odds = [int(k) for k in keys if k % 2 == 1]
    bits = set()
    for k in evens:
        bits.update(_pos(k))
    fp = sum(1 for k in odds if all(p in bits for p in _pos(k)))
    assert int(got["n_probes"]) == len(odds)
    assert int(got["n_false_positives"]) == fp
    assert int(got["n_bits_set"]) == len(bits)
    # the filter never false-negatives its own members
    assert all(all(p in bits for p in _pos(k)) for k in evens[:20])


def test_events_hourly_autocorr(ray_session):
    got = _df(QUERIES["events_hourly_autocorr"](SF)).iloc[0]
    ev = pd.read_parquet(SF + "/events.parquet", columns=["ts"])
    h = ev["ts"].astype("datetime64[us]").astype("int64") // 3_600_000_000
    counts = h.value_counts().sort_index()
    lo, hi = int(counts.index.min()), int(counts.index.max())
    dense = np.zeros(hi - lo + 1, np.int64)
    dense[counts.index.to_numpy() - lo] = counts.to_numpy()
    x, y = dense[:-1], dense[1:]
    assert int(got["n_pairs"]) == len(x)
    assert int(got["sum_x"]) == x.sum()
    assert int(got["sum_y"]) == y.sum()
    assert int(got["sum_xy"]) == (x * y).sum()
    assert int(got["sum_xx"]) == (x * x).sum()
    assert int(got["sum_yy"]) == (y * y).sum()
    # derived correlation is a valid value in [-1, 1]
    n = len(x)
    num = n * got["sum_xy"] - got["sum_x"] * got["sum_y"]
    den = np.sqrt(
        float(n * got["sum_xx"] - got["sum_x"] ** 2)
        * float(n * got["sum_yy"] - got["sum_y"] ** 2)
    )
    if den > 0:
        assert -1.0 <= num / den <= 1.0
