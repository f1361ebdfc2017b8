"""Bucketed window plan (stages/window.py): the executed plan groups by a
FIXED bucket count (O(B) groups, never O(users)), and the vectorized
in-bucket kernels match a per-user pandas reference exactly."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from sciscraper_ray.stages.window import (
    bucket_cumsum,
    bucket_lag_delta,
    bucketed_window,
    make_bucket_session_paths,
    make_bucket_sessionize,
)

N_USERS = 500
GAP_US = 30 * 60 * 1_000_000


def _events(n_users: int = N_USERS, per_user: int = 6) -> pa.Table:
    """Deterministic multi-user event table; gaps straddle the session
    threshold and several users share every bucket."""
    rng = np.random.default_rng(7)
    user = np.repeat(np.arange(n_users, dtype=np.int64), per_user)
    n = len(user)
    # event times: per-user increasing with some gaps > 30 min
    step = rng.integers(1, 90, size=n) * 60 * 1_000_000
    ts = np.zeros(n, np.int64)
    for u in range(n_users):
        sl = slice(u * per_user, (u + 1) * per_user)
        ts[sl] = 1_600_000_000_000_000 + np.cumsum(step[sl])
    eid = np.arange(n, dtype=np.int64)
    value = np.round(rng.uniform(0, 100, size=n), 3)
    etype = np.array(["view", "click", "purchase"], dtype=object)[
        rng.integers(0, 3, size=n)
    ]
    # shuffle row order so sorting is actually exercised
    perm = rng.permutation(n)
    return pa.table(
        {
            "event_id": pa.array(eid[perm]),
            "user_id": pa.array(user[perm]),
            "ts": pa.array(ts[perm].astype("datetime64[us]")),
            "value": pa.array(value[perm]),
            "event_type": pa.array(etype[perm], pa.string()),
        }
    )


def test_group_count_is_buckets_not_users(ray_session):
    """The plan's map_groups runs once per BUCKET: with 500 users and 8
    buckets the kernel must be invoked <= 8 times (each invocation tags
    its output, so the distinct tag count IS the executed group count)."""
    import ray
    import ray.data

    def tagged_kernel(g: pd.DataFrame) -> pd.DataFrame:
        out = bucket_cumsum(g)
        # one distinct tag per kernel invocation (= per executed group)
        out["group_tag"] = int(g["user_id"].min())
        return out

    ds = ray.data.from_arrow(_events())
    res = bucketed_window(ds, tagged_kernel, buckets=8).to_pandas()
    assert res["user_id"].nunique() == N_USERS
    assert res["group_tag"].nunique() <= 8
    assert len(res) == N_USERS * 6


def _reference_per_user(df: pd.DataFrame):
    """Per-user pandas reference for all four window ops."""
    df = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    cum, lag, sess = [], [], []
    paths = {}
    for _, g in df.groupby("user_id", sort=True):
        cum.append(
            pd.DataFrame(
                {
                    "event_id": g["event_id"].to_numpy(),
                    "user_id": g["user_id"].to_numpy(),
                    "cum_value": g["value"].cumsum().round(6).to_numpy(),
                }
            )
        )
        ts_us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        d = np.empty(len(g))
        d[0] = np.nan
        d[1:] = np.diff(ts_us)
        lag.append(
            pd.DataFrame(
                {
                    "event_id": g["event_id"].to_numpy(),
                    "user_id": g["user_id"].to_numpy(),
                    "delta_us": d,
                }
            )
        )
        new_s = np.ones(len(g), dtype=np.int64)
        new_s[1:] = (np.diff(ts_us) > GAP_US).astype(np.int64)
        sid = np.cumsum(new_s)
        for s in np.unique(sid):
            m = sid == s
            sess.append(
                {
                    "user_id": int(g["user_id"].iloc[0]),
                    "session_id": int(s),
                    "session_start": g["ts"].to_numpy()[m].min(),
                    "session_end": g["ts"].to_numpy()[m].max(),
                    "n_events": int(m.sum()),
                    "sum_value": round(float(g["value"].to_numpy()[m].sum()), 6),
                }
            )
            p = ">".join(g["event_type"].to_numpy()[m])
            paths[p] = paths.get(p, 0) + 1
    return (
        pd.concat(cum, ignore_index=True),
        pd.concat(lag, ignore_index=True),
        pd.DataFrame(sess),
        paths,
    )


@pytest.fixture(scope="module")
def window_data():
    t = _events(n_users=50, per_user=8)
    return t, _reference_per_user(t.to_pandas())


def _sorted(df, by):
    return df.sort_values(by).reset_index(drop=True)


def test_bucket_cumsum_matches_per_user(ray_session, window_data):
    import ray.data

    t, (ref_cum, _, _, _) = window_data
    got = bucketed_window(
        ray.data.from_arrow(t), bucket_cumsum, buckets=8
    ).to_pandas()
    pd.testing.assert_frame_equal(
        _sorted(got.drop(columns=[], errors="ignore"), ["event_id"]),
        _sorted(ref_cum, ["event_id"]),
        check_like=True,
    )


def test_bucket_lag_matches_per_user(ray_session, window_data):
    import ray.data

    t, (_, ref_lag, _, _) = window_data
    got = bucketed_window(
        ray.data.from_arrow(t), bucket_lag_delta, buckets=8
    ).to_pandas()
    pd.testing.assert_frame_equal(
        _sorted(got, ["event_id"]), _sorted(ref_lag, ["event_id"]), check_like=True
    )


def test_bucket_sessionize_matches_per_user(ray_session, window_data):
    import ray.data

    t, (_, _, ref_sess, _) = window_data
    got = bucketed_window(
        ray.data.from_arrow(t), make_bucket_sessionize(GAP_US), buckets=8
    ).to_pandas()
    key = ["user_id", "session_id"]
    got = _sorted(got, key)
    ref = _sorted(ref_sess, key)
    for c in ["session_start", "session_end"]:
        got[c] = got[c].astype("datetime64[us]")
        ref[c] = ref[c].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, ref[got.columns], check_dtype=False)


def test_bucket_paths_match_per_user(ray_session, window_data):
    import ray.data

    t, (_, _, _, ref_paths) = window_data
    got = (
        bucketed_window(
            ray.data.from_arrow(t), make_bucket_session_paths(GAP_US), buckets=8
        )
        .to_pandas()
        .groupby("path")["cnt"]
        .sum()
        .to_dict()
    )
    assert got == ref_paths


def test_bucket_type_transitions_matches_per_user(ray_session):
    import ray.data

    from sciscraper_ray.stages.window import bucket_type_transitions

    tbl = _events()
    df = tbl.to_pandas()
    # reference: per-user lag over (ts, event_id) order
    s = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    prev = s.groupby("user_id", sort=False)["event_type"].shift(1)
    ref = (
        pd.DataFrame({"from_type": prev, "to_type": s["event_type"]})
        .dropna()
        .value_counts()
        .rename("cnt")
        .reset_index()
    )
    ds = ray.data.from_arrow(tbl)
    got = (
        bucketed_window(ds, bucket_type_transitions, buckets=8)
        .to_pandas()
        .groupby(["from_type", "to_type"], as_index=False)["cnt"]
        .sum()
    )
    key = lambda d: d.sort_values(["from_type", "to_type"]).reset_index(drop=True)
    a, b = key(got), key(ref[["from_type", "to_type", "cnt"]])
    assert a["from_type"].tolist() == b["from_type"].tolist()
    assert a["to_type"].tolist() == b["to_type"].tolist()
    assert a["cnt"].astype(int).tolist() == b["cnt"].astype(int).tolist()
