"""Round-5: plan parity for the two queries whose driver merges were
unguarded in round 4 (VERDICT r4 item 1) — the shuffle plan must produce
the identical table the driver plan does (oracle parity for the driver
plan runs in tools/check_correctness.py)."""

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def test_dau_stickiness_plan_parity(ray_session):
    d = (
        _df(QUERIES["events_dau_stickiness"](SF, mode="driver"))
        .sort_values("day")
        .reset_index(drop=True)
    )
    s = (
        _df(QUERIES["events_dau_stickiness"](SF, mode="shuffle"))
        .sort_values("day")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(d, s)
    assert (d["dau"] <= d["mau"]).all()


def test_token_zipf_slope_plan_parity(ray_session):
    d = _df(QUERIES["token_zipf_slope"](SF, mode="driver"))
    s = _df(QUERIES["token_zipf_slope"](SF, mode="shuffle"))
    assert int(d["n_types"][0]) == int(s["n_types"][0])
    # Streaming shuffle accumulation sums in a different order; the fit
    # agrees to float tolerance, and the committed value to 8 decimals.
    assert abs(float(d["slope"][0]) - float(s["slope"][0])) < 1e-8


def test_zipf_shuffle_streaming_rank_offset(ray_session):
    # The shuffle plan's running rank offset must reproduce the exact
    # closed form on a known frequency vector: recompute from raw tokens.
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["text"])
    toks = docs["text"].fillna("").str.strip().str.lower().str.split(" ")
    cnt = pd.Series([t for row in toks for t in row]).value_counts()
    c = np.sort(cnt.to_numpy())[::-1].astype(np.float64)
    n = len(c)
    x = np.log(np.arange(1, n + 1, dtype=np.float64))
    y = np.log(c)
    want = (n * np.sum(x * y) - np.sum(x) * np.sum(y)) / (
        n * np.sum(x * x) - np.sum(x) ** 2
    )
    got = float(_df(QUERIES["token_zipf_slope"](SF, mode="shuffle"))["slope"][0])
    assert abs(got - want) < 1e-6
