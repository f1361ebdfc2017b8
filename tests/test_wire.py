"""Wire-format kernels: strict base64 (RFC 4648) against stdlib, and
HTTP/1.1 chunked transfer coding with extensions + trailers."""

from __future__ import annotations

import base64
import random

import pytest

from sciscraper_ray.kernels.wire import (
    WireError,
    base64_decode,
    base64_encode,
    chunked_decode,
    chunked_encode,
)


def test_base64_parity_with_stdlib_all_remainders():
    rng = random.Random(7)
    for n in list(range(0, 20)) + [100, 3001, 5000]:
        p = bytes(rng.randrange(256) for _ in range(n))
        std = base64.b64encode(p)
        assert base64_encode(p) == std
        assert base64_decode(std) == p


@pytest.mark.parametrize(
    "bad", ["abc", "ab=c", "a===", "====", "ab!c", "QQ=x", "QR=="]
)
def test_base64_strictness(bad):
    # QR== carries set trailing bits -> non-canonical, rejected
    with pytest.raises(WireError):
        base64_decode(bad)


def test_base64_canonical_padding_ok():
    assert base64_decode("QQ==") == b"A"
    assert base64_decode("QUI=") == b"AB"
    assert base64_decode("") == b""


def test_chunked_roundtrip_with_trailers():
    body = b"hello world, this is a chunked payload" * 20
    enc = chunked_encode(body, [5, 17, 100, 256], {"x-digest": "abc"})
    dec, tr = chunked_decode(enc)
    assert dec == body
    assert tr == {"x-digest": "abc"}


def test_chunk_extensions_skipped():
    assert chunked_decode(b"5;ext=1\r\nhello\r\n0\r\n\r\n") == (b"hello", {})


def test_empty_body():
    assert chunked_decode(chunked_encode(b"", [5])) == (b"", {})


@pytest.mark.parametrize(
    "bad",
    [
        b"5\r\nhell\r\n0\r\n\r\n",  # short chunk -> missing CRLF
        b"zz\r\n\r\n",  # bad hex size
        b"1\r\na\r\n0\r\n",  # unterminated trailer section
        b"1\r\na\r\n0\r\n\r\nXX",  # trailing bytes
        b"1\r\na\r\n0\r\nbadline\r\n\r\n",  # trailer without colon
    ],
)
def test_chunked_malformed_rejected(bad):
    with pytest.raises(WireError):
        chunked_decode(bad)


def test_parse_http_response():
    from sciscraper_ray.kernels.wire import parse_http_response

    resp = (
        b"HTTP/1.1 404 Not Found\r\n"
        b"Content-Type: text/html\r\n"
        b"X-Custom:  spaced value \r\n\r\nbody bytes"
    )
    status, headers, body = parse_http_response(resp)
    assert status == 404
    assert headers == {
        "content-type": "text/html",
        "x-custom": "spaced value",
    }
    assert body == b"body bytes"
    with pytest.raises(WireError, match="terminator"):
        parse_http_response(b"HTTP/1.1 200 OK\r\n")
    with pytest.raises(WireError, match="status line"):
        parse_http_response(b"ICY 200 OK\r\n\r\n")
    with pytest.raises(WireError, match="status code"):
        parse_http_response(b"HTTP/1.1 abc OK\r\n\r\n")
