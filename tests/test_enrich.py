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


def test_http_transport_contract():
    """Reference request contract (webscrapers.py:195-262): querystring
    from key, non-200 -> None, 200 -> parsed row; opener built once and
    reused (session analog)."""
    import json
    from urllib.parse import parse_qs, urlparse

    from sciscraper_ray.stages.enrich import http_transport, json_docs_parse

    calls = []

    def fake_opener(full_url, timeout):
        calls.append(full_url)
        q = parse_qs(urlparse(full_url).query)
        text = q["search_text"][0]
        if text == "10.404/x":
            return 404, b""
        if text == "10.1/empty":
            return 200, json.dumps({"docs": []}).encode()
        return 200, json.dumps(
            {"docs": [{"title": f"T:{text}", "times_cited": len(text)}]}
        ).encode()

    fetch = http_transport(
        "https://api.example.org/search",
        params_for=lambda k: {"search_mode": "content", "search_text": k},
        parse=json_docs_parse({"title": "title", "cited": "times_cited"}),
        opener=fake_opener,
    )
    assert fetch("10.1/a") == {"title": "T:10.1/a", "cited": 6}
    assert fetch("10.404/x") is None  # non-200 -> None
    assert fetch("10.1/empty") is None  # no docs -> None
    assert len(calls) == 3
    assert "search_mode=content" in calls[0]


def test_http_transport_offline_gated(monkeypatch):
    import pytest

    from sciscraper_ray.stages.enrich import http_transport

    monkeypatch.delenv("SCISCRAPER_ALLOW_NETWORK", raising=False)
    with pytest.raises(RuntimeError, match="offline-gated"):
        http_transport(
            "https://api.example.org", lambda k: {}, lambda b: None
        )


def test_http_transport_in_rate_limited_stage(ray_session):
    """Injected HTTP opener through the full actor-pool stage: errors and
    non-200s degrade to null columns, hits enrich."""
    import json

    import ray.data

    from sciscraper_ray.stages.enrich import (
        RateLimitedEnrich,
        http_transport,
        json_docs_parse,
    )

    def factory():
        def fake_opener(full_url, timeout):
            if "boom" in full_url:
                raise OSError("connection reset")
            if "miss" in full_url:
                return 500, b""
            return 200, json.dumps({"docs": [{"title": "ok"}]}).encode()

        return http_transport(
            "https://api.example.org/s",
            params_for=lambda k: {"search_text": k},
            parse=json_docs_parse({"title": "title"}),
            opener=fake_opener,
        )

    ds = ray.data.from_arrow(pa.table({"doi": ["a", "miss", "boom", "b"]}))
    out = (
        ds.map_batches(
            RateLimitedEnrich,
            fn_constructor_kwargs={
                "transport_factory": factory,
                "on": "doi",
                "out_columns": {"title": pa.string()},
                "rate": 10_000.0,
            },
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
        .set_index("doi")
    )
    assert out.loc["a", "title"] == "ok"
    assert out.loc["b", "title"] == "ok"
    assert out["title"].isna().sum() == 2  # 500 + exception


def test_validation_transport_contract():
    """M12 reference contract (doifrompdf.py:166-190): doi -> body text on
    2xx / None otherwise; arxiv -> first Atom entry string / None on empty
    feed; exceptions -> None."""
    from sciscraper_ray.stages.enrich import validation_transport

    atom = "http://www.w3.org/2005/Atom"

    def opener(url, timeout):
        if "dx.doi.org/10.1000/good" in url:
            return 200, b'{"DOI": "10.1000/good"}'
        if "dx.doi.org/" in url:
            return 404, b""
        if "id:1234.5678" in url:
            return 200, (
                f'<feed xmlns="{atom}"><entry>'
                f"<id>http://arxiv.org/abs/1234.5678</id>"
                f"<title>A Paper</title></entry></feed>"
            ).encode()
        if "id:boom" in url:
            raise OSError("reset")
        return 200, f'<feed xmlns="{atom}"></feed>'.encode()

    v = validation_transport(opener)
    assert v("10.1000/good", "doi") == '{"DOI": "10.1000/good"}'
    assert v("10.1000/bad", "doi") is None  # non-2xx -> None
    assert v("1234.5678", "arxiv") == (
        "entry(id=http://arxiv.org/abs/1234.5678, title=A Paper)"
    )
    assert v("9999.0000", "arxiv") is None  # empty feed -> None
    assert v("boom", "arxiv") is None  # exception -> None
    assert v("x", "unknown_type") is None


def test_validation_transport_offline_gated(monkeypatch):
    import pytest

    from sciscraper_ray.stages.enrich import validation_transport

    monkeypatch.delenv("SCISCRAPER_ALLOW_NETWORK", raising=False)
    with pytest.raises(RuntimeError, match="offline-gated"):
        validation_transport()
