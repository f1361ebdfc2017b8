"""Pluggable enrichment stage with per-actor rate limiting (SURVEY §2.9).

The reference's IO tier is a family of requests-based scrapers sharing one
shape: keyed request -> parse JSON/HTML -> record or None on failure, with
``time.sleep(sleep_val)`` before every request
(/root/reference/src/webscrapers.py:186-417, :205-213, :252-262;
downloaders.py:189,305). This module is the engine's contract for that
tier: the TRANSPORT is an injected callable ``key -> dict | None`` so the
operator is identical whether the deployment is

- offline (the tested path): a broadcast fixture table turned into a
  lookup — deterministic, and exactly what the oracle queries exercise
  through ``BroadcastLookup``; or
- live: an HTTP client built once per actor in ``transport_factory``
  (session reuse = the reference's module-global ``client``,
  webscrapers.py:24) — intentionally not shipped in this offline engine.

Rate limiting is a token bucket per actor (capacity ``burst``, refill
``rate``/s): the cluster-wide request rate is ``rate × pool size``, so the
pool's ``concurrency`` is the knob that scales politeness limits with the
cluster. A fixed ``time.sleep`` per row (the reference's plan) wastes the
worker when responses are slow; a bucket only blocks when the stage is
actually ahead of the budget.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import pyarrow as pa


class TokenBucket:
    """Deterministic-capacity token bucket: ``acquire`` blocks until a
    token is available. ``clock``/``sleep`` are injectable for tests."""

    def __init__(
        self,
        rate: float,
        burst: int = 1,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.rate = float(rate)
        self.burst = max(1, int(burst))
        self.tokens = float(self.burst)
        self.clock = clock
        self.sleep = sleep
        self.last = clock()

    def acquire(self) -> None:
        while True:
            now = self.clock()
            self.tokens = min(
                self.burst, self.tokens + (now - self.last) * self.rate
            )
            self.last = now
            if self.tokens >= 1.0:
                self.tokens -= 1.0
                return
            self.sleep((1.0 - self.tokens) / self.rate)


def http_transport(
    url: str,
    params_for: Callable[[Any], dict[str, str]],
    parse: Callable[[bytes], dict | None],
    timeout: float = 10.0,
    opener: Callable[[str, float], Any] | None = None,
) -> Callable[[Any], dict | None]:
    """Live transport matching the reference's request contract
    (webscrapers.py:195-262): build a querystring from the key, GET,
    return None on non-200, else parse the body into a row dict.

    OFFLINE BY DEFAULT: with no injected ``opener`` the real network path
    is gated behind ``SCISCRAPER_ALLOW_NETWORK=1`` — this engine ships and
    tests offline; the flag is the deployment opt-in. Build one transport
    per actor (inside ``transport_factory``) so the opener/session is
    reused across that actor's rows, the analog of the reference's
    module-global ``client`` (webscrapers.py:24).

    ``opener(full_url, timeout) -> (status: int, body: bytes)`` is
    injectable for tests and for custom clients; the default uses stdlib
    ``urllib.request`` (no third-party HTTP dependency).
    """
    import os
    import urllib.parse

    if opener is None:
        if os.environ.get("SCISCRAPER_ALLOW_NETWORK") != "1":
            raise RuntimeError(
                "http_transport is offline-gated: set "
                "SCISCRAPER_ALLOW_NETWORK=1 to enable live requests, or "
                "inject an opener"
            )
        import urllib.error
        import urllib.request

        def opener(full_url: str, t: float):
            try:
                with urllib.request.urlopen(full_url, timeout=t) as resp:
                    return resp.status, resp.read()
            except urllib.error.HTTPError as exc:  # non-200 with a body
                return exc.code, b""

    def fetch(key):
        qs = urllib.parse.urlencode(params_for(key))
        status, body = opener(f"{url}?{qs}", timeout)
        if status != 200:  # reference: non-200 -> None (webscrapers.py:205)
            return None
        return parse(body)

    return fetch


def json_docs_parse(
    fields: dict[str, str], list_key: str = "docs"
) -> Callable[[bytes], dict | None]:
    """Body parser for the reference's response shape
    (webscrapers.py:73-74 get_items_from_response): take the FIRST
    element of ``body[list_key]`` and project ``{out_col: item[src_key]}``
    (the ``item.get(value)`` projection at webscrapers.py:229-230);
    empty/missing list -> None rather than the reference's IndexError —
    the stage's degrade-to-null contract."""
    import json

    def parse(body: bytes) -> dict | None:
        data = json.loads(body)
        items = data.get(list_key) or []
        if not items:
            return None
        item = items[0]
        return {out: item.get(src) for out, src in fields.items()}

    return parse


def validation_transport(
    opener: Callable[[str, float], tuple[int, bytes]] | None = None,
    timeout: float = 10.0,
) -> Callable[[str, str], str | None]:
    """M12 — network identifier validation, the reference's
    ``validate_identifier`` contract (doifrompdf.py:166-190):

    - doi: GET ``http://dx.doi.org/{id}`` (Accept: application/citeproc+json);
      non-2xx or any exception -> None, else the response body text.
    - arxiv: GET the export.arxiv.org Atom query; the string form of the
      first ``<entry>`` (stdlib ElementTree stands in for feedparser,
      which is not in this container), or None when the feed is empty.

    Offline-gated exactly like ``http_transport``: the live path needs
    ``SCISCRAPER_ALLOW_NETWORK=1``; tests and offline deployments inject
    ``opener(full_url, timeout) -> (status, body)``.
    """
    import os
    import xml.etree.ElementTree as ET

    if opener is None:
        if os.environ.get("SCISCRAPER_ALLOW_NETWORK") != "1":
            raise RuntimeError(
                "validation_transport is offline-gated: set "
                "SCISCRAPER_ALLOW_NETWORK=1 or inject an opener"
            )
        import urllib.error
        import urllib.request

        def opener(full_url: str, t: float):
            req = urllib.request.Request(
                full_url, headers={"accept": "application/citeproc+json"}
            )
            try:
                with urllib.request.urlopen(req, timeout=t) as resp:
                    return resp.status, resp.read()
            except urllib.error.HTTPError as exc:
                return exc.code, b""

    _ATOM = "{http://www.w3.org/2005/Atom}"

    def validate(identifier: str, id_type: str) -> str | None:
        try:
            if id_type == "arxiv":
                status, body = opener(
                    "http://export.arxiv.org/api/query?search_query="
                    f"id:{identifier}",
                    timeout,
                )
                if status != 200:
                    return None
                root = ET.fromstring(body)
                entries = root.findall(f"{_ATOM}entry")
                if not entries:
                    return None
                e = entries[0]
                eid = (e.findtext(f"{_ATOM}id") or "").strip()
                title = (e.findtext(f"{_ATOM}title") or "").strip()
                return f"entry(id={eid}, title={title})"
            if id_type in ("doi", "pdf2doi_identifier"):
                status, body = opener(
                    f"http://dx.doi.org/{identifier}", timeout
                )
                if not (200 <= status < 300):  # raise_for_status analog
                    return None
                return body.decode("utf-8", errors="replace")
            return None
        except Exception:  # noqa: BLE001 — reference: any error -> None
            return None

    return validate


class IdentifierValidationStage:
    """Actor-pool map_batches stage filling ``validation_info`` (M12):
    per-row ``validate(identifier, identifier_type)`` through an injected
    transport factory, token-bucket rate limited like every IO-tier stage.
    Null identifiers make no request and burn no tokens."""

    def __init__(
        self,
        transport_factory: Callable[[], Callable[[str, str], str | None]],
        identifier_col: str = "doi",
        type_col: str = "identifier_type",
        rate: float | None = None,
        burst: int = 4,
    ):
        self.validate = transport_factory()
        self.identifier_col = identifier_col
        self.type_col = type_col
        self.bucket = TokenBucket(rate, burst) if rate else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list[str | None] = []
        for ident, kind in zip(
            batch[self.identifier_col].to_pylist(),
            batch[self.type_col].to_pylist(),
        ):
            if ident is None or kind is None:
                out.append(None)
                continue
            if self.bucket is not None:
                self.bucket.acquire()
            out.append(self.validate(ident, kind))
        return batch.append_column(
            "validation_info", pa.array(out, pa.string())
        )


def table_transport(mapping: dict) -> Callable[[Any], dict | None]:
    """Offline transport: key -> row dict from a fixture mapping (the
    broadcast-join deployment of the enrichment contract); miss -> None
    like a non-200 response (webscrapers.py:205-206)."""

    def fetch(key):
        return mapping.get(key)

    return fetch


class RateLimitedEnrich:
    """Actor-pool map_batches stage: per-row keyed enrichment.

    ``transport_factory`` runs ONCE per actor in ``__init__`` (build the
    session/client/broadcast table here); ``out_columns`` declares the
    emitted schema ``{column: pyarrow type}`` — missing keys and transport
    errors degrade to null columns, never crash the task (the reference
    drops such rows as None; the engine keeps them with nulls and lets a
    final filter decide, SURVEY §4 error semantics).

    Use with ``batch_format="pyarrow"`` and a FIXED ``concurrency`` sized
    to the external budget: requests/sec = rate × concurrency.
    """

    def __init__(
        self,
        transport_factory: Callable[[], Callable[[Any], dict | None]],
        on: str,
        out_columns: dict[str, pa.DataType],
        rate: float | None = None,
        burst: int = 4,
    ):
        self.transport = transport_factory()
        self.on = on
        self.out_columns = dict(out_columns)
        self.bucket = TokenBucket(rate, burst) if rate else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {name: [] for name in self.out_columns}
        for key in batch[self.on].to_pylist():
            if key is None:
                # no transport call -> no token: null keys must not burn
                # the external request budget
                for name in self.out_columns:
                    cols[name].append(None)
                continue
            if self.bucket is not None:
                self.bucket.acquire()
            try:
                row = self.transport(key)
            except Exception:  # noqa: BLE001 — error -> None row (ref :252-262)
                row = None
            for name in self.out_columns:
                cols[name].append(None if row is None else row.get(name))
        for name, typ in self.out_columns.items():
            batch = batch.append_column(name, pa.array(cols[name], type=typ))
        return batch
