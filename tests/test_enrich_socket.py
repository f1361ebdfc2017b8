"""Socket-level integration test for the live IO-tier transports
(VERDICT r4 item 4): a real stdlib ``http.server`` on 127.0.0.1 exercises
the previously-injection-only urllib paths of ``http_transport`` and
``validation_transport`` end to end — request formation, header, status
handling (200 / 404 / 500), body parse — with ``SCISCRAPER_ALLOW_NETWORK=1``
set only for the test. No external network is touched.

Contract under test mirrors the reference scrapers:
request -> parse -> row dict, None on any non-200
(/root/reference/src/webscrapers.py:195-262, doifrompdf.py:166-190).
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from sciscraper_ray.stages.enrich import (
    http_transport,
    json_docs_parse,
    validation_transport,
)

_ATOM_FEED = """<?xml version="1.0" encoding="UTF-8"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <entry>
    <id>http://arxiv.org/abs/2101.00001v1</id>
    <title>A Title</title>
  </entry>
</feed>"""

_ATOM_EMPTY = """<?xml version="1.0" encoding="UTF-8"?>
<feed xmlns="http://www.w3.org/2005/Atom"></feed>"""


class _Handler(BaseHTTPRequestHandler):
    seen_headers: list[dict] = []

    def log_message(self, *args):  # keep pytest output clean
        pass

    def do_GET(self):
        u = urlparse(self.path)
        qs = parse_qs(u.query)
        _Handler.seen_headers.append(dict(self.headers))
        if u.path == "/works":
            doi = qs.get("doi", [""])[0]
            if doi == "10.1000/missing":
                self._reply(404, b"not found")
                return
            body = json.dumps(
                {"docs": [{"title": f"T:{doi}", "year": 2020}]}
            ).encode()
            self._reply(200, body)
        elif u.path.startswith("/doi/"):
            ident = u.path[len("/doi/") :]
            if ident == "10.1000/broken":
                self._reply(500, b"")
                return
            self._reply(200, json.dumps({"DOI": ident}).encode())
        elif u.path == "/arxiv":
            q = qs.get("search_query", [""])[0]
            body = _ATOM_EMPTY if "0000.00000" in q else _ATOM_FEED
            self._reply(200, body.encode())
        else:
            self._reply(404, b"")

    def _reply(self, status: int, body: bytes):
        self.send_response(status)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def local_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    t.join(timeout=5)


def test_http_transport_live_socket(local_server, monkeypatch):
    monkeypatch.setenv("SCISCRAPER_ALLOW_NETWORK", "1")
    fetch = http_transport(
        f"{local_server}/works",
        params_for=lambda key: {"doi": key, "rows": "1"},
        parse=json_docs_parse({"title": "title", "pub_year": "year"}),
    )
    row = fetch("10.1000/xyz123")
    assert row == {"title": "T:10.1000/xyz123", "pub_year": 2020}
    # non-200 -> None through the REAL HTTPError path, not an injected opener
    assert fetch("10.1000/missing") is None


def test_http_transport_live_gate_still_enforced(local_server, monkeypatch):
    monkeypatch.delenv("SCISCRAPER_ALLOW_NETWORK", raising=False)
    with pytest.raises(RuntimeError, match="offline-gated"):
        http_transport(f"{local_server}/works", lambda k: {}, lambda b: None)


def test_validation_transport_live_socket(local_server, monkeypatch):
    monkeypatch.setenv("SCISCRAPER_ALLOW_NETWORK", "1")
    validate = validation_transport()
    # route the reference's fixed hosts at the local server via a shim:
    # validation_transport builds absolute URLs, so patch urllib's opener
    # input by wrapping validate with URL rewriting is not possible —
    # instead exercise the live opener through a transport built on the
    # rewritten base (same code path: opener=None, env-gated urllib).
    import urllib.request

    real_urlopen = urllib.request.urlopen

    def rewriting_urlopen(req, timeout=None):
        url = req if isinstance(req, str) else req.full_url
        if url.startswith("http://dx.doi.org/"):
            url = f"{local_server}/doi/" + url[len("http://dx.doi.org/") :]
        elif url.startswith("http://export.arxiv.org/api/query"):
            url = f"{local_server}/arxiv" + url[url.index("?") :]
        if not isinstance(req, str):
            headers = dict(req.header_items())
            req = urllib.request.Request(url, headers=headers)
        else:
            req = url
        return real_urlopen(req, timeout=timeout)

    monkeypatch.setattr(urllib.request, "urlopen", rewriting_urlopen)

    _Handler.seen_headers.clear()
    body = validate("10.1000/xyz123", "doi")
    assert body is not None and json.loads(body)["DOI"] == "10.1000/xyz123"
    # citeproc accept header reaches the socket (doifrompdf.py:172)
    assert any(
        v == "application/citeproc+json"
        for h in _Handler.seen_headers
        for k, v in h.items()
        if k.lower() == "accept"
    )
    assert validate("10.1000/broken", "doi") is None  # 500 -> None
    out = validate("2101.00001", "arxiv")
    assert out is not None and "2101.00001v1" in out and "A Title" in out
    assert validate("0000.00000", "arxiv") is None  # empty feed -> None
    assert validate("whatever", "unknown-type") is None
