"""Pluggable rate-limited enrichment stage (SURVEY §2.9 IO-tier contract)."""

from __future__ import annotations

import pyarrow as pa


def test_token_bucket_paces_requests():
    """A rate-2/s bucket with burst 1 must space acquires ~0.5s apart —
    verified with an injected fake clock (no wall-clock sleeping)."""
    from sciscraper_ray.stages.enrich import TokenBucket

    t = [0.0]
    slept = []

    def clock():
        return t[0]

    def sleep(s):
        slept.append(s)
        t[0] += s

    b = TokenBucket(rate=2.0, burst=1, clock=clock, sleep=sleep)
    for _ in range(5):
        b.acquire()
    # first is free (burst), each further one waits 1/rate
    assert len(slept) == 4
    assert all(abs(s - 0.5) < 1e-9 for s in slept)
    assert abs(t[0] - 2.0) < 1e-9


def test_token_bucket_burst_then_refill():
    from sciscraper_ray.stages.enrich import TokenBucket

    t = [0.0]
    b = TokenBucket(rate=1.0, burst=3, clock=lambda: t[0], sleep=lambda s: t.__setitem__(0, t[0] + s))
    for _ in range(3):
        b.acquire()  # burst: no waiting
    assert t[0] == 0.0
    b.acquire()
    assert abs(t[0] - 1.0) < 1e-9  # refill pace


def test_rate_limited_enrich_offline_transport(ray_session):
    """The offline deployment: broadcast fixture mapping as transport;
    misses and transport errors degrade to null columns (reference
    None-row semantics, webscrapers.py:205-206, 252-262)."""
    import ray.data

    from sciscraper_ray.stages.enrich import RateLimitedEnrich, table_transport

    papers = {
        "10.1/a": {"title": "A", "times_cited": 3},
        "10.1/b": {"title": "B", "times_cited": 7},
    }

    def factory():
        inner = table_transport(papers)

        def fetch(key):
            if key == "10.1/raise":
                raise RuntimeError("boom")
            return inner(key)

        return fetch

    ds = ray.data.from_arrow(
        pa.table({"doi": ["10.1/a", "10.1/missing", "10.1/b", "10.1/raise", None]})
    )
    out = (
        ds.map_batches(
            RateLimitedEnrich,
            fn_constructor_kwargs={
                "transport_factory": factory,
                "on": "doi",
                "out_columns": {"title": pa.string(), "times_cited": pa.int64()},
                "rate": 10_000.0,  # effectively unlimited for the test
            },
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
        .set_index("doi")
    )
    assert out.loc["10.1/a", "title"] == "A"
    assert out.loc["10.1/b", "times_cited"] == 7
    assert out["title"].isna().sum() == 3  # miss + raise + null key
