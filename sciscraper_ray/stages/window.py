"""Bucketed-vectorized window plans (the scale-safe window-function shape).

Per-user window functions (running sum, LAG, sessionization, session
paths) must NOT be expressed as ``groupby("user_id").map_groups`` — Ray's
sort-aggregate pays ~100 µs of per-group Python dispatch, so at 10⁸–10⁹
users the job is hours of pure overhead (measured in BASELINE.md). The
plan here is the one ``events_asof_join`` pioneered:

1. ONE shuffle on ``bucket = user_id % B`` (B fixed, ∝ cluster size, NOT
   key cardinality) — the all-to-all moves each event row once.
2. Within each bucket: ``np.lexsort`` by (user, ts, event_id), user/session
   segment boundaries via ``np.diff``, then vectorized cumsum / shifted
   diff / reduceat per segment. Zero per-user Python.

Partitioning contract: one bucket's rows must fit a worker heap (events
are small fixed-width rows; a mega-user inside a hot bucket would be
pre-split by time range and re-merged with opening balances — the
standard prefix-sum decomposition documented on each kernel).

Float parity with SQL window functions: running sums accumulate
sequentially per user in (ts, event_id) order on both engines —
``pandas.groupby(...).cumsum`` and ``np.add.reduceat`` are sequential
left-folds, so the float bits match DuckDB's ordered accumulation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

WINDOW_BUCKETS = 32


def add_user_bucket(ds, key: str = "user_id", buckets: int = WINDOW_BUCKETS):
    """Append ``bucket = key & (buckets-1)`` per batch (buckets must be a
    power of two; masking beats modulo and user ids are uniform here —
    skewed id spaces would hash-mix first like ``bucketed_hash_join``)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        bucket = pc.cast(pc.bit_wise_and(batch[key], buckets - 1), pa.int64())
        return batch.append_column("bucket", bucket)

    return ds.map_batches(add_bucket, batch_format="pyarrow")


def bucketed_window(
    ds,
    kernel,
    *,
    key: str = "user_id",
    buckets: int = WINDOW_BUCKETS,
):
    """The shared physical plan: bucket -> ONE shuffle -> vectorized kernel
    per bucket. ``kernel`` receives one bucket as a pandas DataFrame and
    must handle MANY users per group (group count is O(buckets))."""
    return (
        add_user_bucket(ds, key=key, buckets=buckets)
        .groupby("bucket")
        .map_groups(kernel, batch_format="pandas")
    )


def _sorted_bucket(g: pd.DataFrame):
    """Sort one bucket by (user, ts, event_id); return the sorted arrays
    plus the is-new-user boundary mask."""
    user = g["user_id"].to_numpy()
    ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    eid = g["event_id"].to_numpy()
    order = np.lexsort((eid, ts, user))
    user_s, ts_s, eid_s = user[order], ts[order], eid[order]
    new_user = np.ones(len(order), dtype=bool)
    new_user[1:] = user_s[1:] != user_s[:-1]
    return order, user_s, ts_s, eid_s, new_user


def bucket_cumsum(g: pd.DataFrame) -> pd.DataFrame:
    """Running per-user sum over one bucket. The in-bucket accumulator is
    pandas' Cython group-cumsum keyed on the user array — per-user
    sequential float adds in (ts, event_id) order (bit-identical to a
    per-user loop), with no per-group Python dispatch."""
    order, user_s, _, eid_s, _ = _sorted_bucket(g)
    val_s = g["value"].to_numpy()[order]
    cum = (
        pd.Series(val_s)
        .groupby(user_s, sort=False)
        .cumsum()
        .round(6)
        .to_numpy()
    )
    return pd.DataFrame(
        {"event_id": eid_s, "user_id": user_s, "cum_value": cum}
    )


def bucket_lag_delta(g: pd.DataFrame) -> pd.DataFrame:
    """LAG(ts) delta in integer microseconds (float64 column so NULL-at-
    first-event matches the oracle's nullable-BIGINT → pandas float64)."""
    order, user_s, ts_s, eid_s, new_user = _sorted_bucket(g)
    delta = np.empty(len(order), dtype=np.float64)
    delta[1:] = ts_s[1:] - ts_s[:-1]
    delta[new_user] = np.nan
    return pd.DataFrame(
        {"event_id": eid_s, "user_id": user_s, "delta_us": delta}
    )


def session_boundaries(
    user_s: np.ndarray, ts_s: np.ndarray, new_user: np.ndarray, gap_us: int
):
    """(new_session mask, per-user session ids, session start indices,
    session lengths) for one sorted bucket — all np.diff/cumsum, no loop."""
    n = len(user_s)
    new_s = new_user.copy()
    new_s[1:] |= (ts_s[1:] - ts_s[:-1]) > gap_us
    sid_global = np.cumsum(new_s)
    ustart = np.flatnonzero(new_user)
    ulen = np.diff(np.append(ustart, n))
    sid = sid_global - np.repeat(sid_global[ustart], ulen) + 1
    s_start = np.flatnonzero(new_s)
    s_len = np.diff(np.append(s_start, n))
    return new_s, sid, s_start, s_len


def make_bucket_sessionize(gap_us: int):
    """Gap-based sessionization kernel over one bucket: session aggregates
    via ``np.add.reduceat`` on session segments (sequential per-segment
    float adds, same accumulation order as the sorted per-user loop)."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order, user_s, ts_s, _, new_user = _sorted_bucket(g)
        val_s = g["value"].to_numpy()[order]
        _, sid, s_start, s_len = session_boundaries(
            user_s, ts_s, new_user, gap_us
        )
        return pd.DataFrame(
            {
                "user_id": user_s[s_start],
                "session_id": sid[s_start],
                "session_start": ts_s[s_start].astype("datetime64[us]"),
                "session_end": ts_s[s_start + s_len - 1].astype(
                    "datetime64[us]"
                ),
                "n_events": s_len.astype(np.int64),
                "sum_value": np.add.reduceat(val_s, s_start).round(6),
            }
        )

    return kernel


def make_bucket_session_paths(gap_us: int):
    """Per-bucket session-path partial counts: every session's
    '>'-joined event-type path built with TWO C-level string ops (one
    vectorized prefix concat, one join+split on a sentinel) — no per-
    session Python join — then a bucket-local value_counts partial."""

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        order, user_s, ts_s, _, new_user = _sorted_bucket(g)
        et_s = g["event_type"].to_numpy()[order]
        new_s, _, _, _ = session_boundaries(user_s, ts_s, new_user, gap_us)
        # session-start sentinel is \x1f, NOT \x00: numpy unicode arrays
        # silently strip trailing NULs, which would erase the separator
        prefix = np.where(new_s, "\x1f", ">")
        tokens = np.char.add(prefix.astype("U1"), et_s.astype(str))
        paths = "".join(tokens.tolist()).split("\x1f")[1:]
        uniq, cnt = np.unique(np.asarray(paths, dtype=object), return_counts=True)
        return pd.DataFrame({"path": uniq, "cnt": cnt.astype(np.int64)})

    return kernel


def bucket_type_transitions(g: pd.DataFrame) -> pd.DataFrame:
    """Per-bucket adjacent (from_type, to_type) transition partial counts
    in per-user (ts, event_id) order — the behavior-Markov-chain partial.
    One lexsort + shifted compare; output rows are bounded by the
    event-type vocabulary squared, never by events, so the downstream
    merge exchange is constant-size."""
    order, user_s, _ts_s, _eid_s, new_user = _sorted_bucket(g)
    et = g["event_type"].to_numpy()[order]
    idx = np.flatnonzero(~new_user)  # rows preceded by the same user's event
    vc = (
        pd.DataFrame({"from_type": et[idx - 1], "to_type": et[idx]})
        .value_counts()
        .rename("cnt")
        .reset_index()
    )
    return vc
