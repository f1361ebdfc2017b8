"""MIME kernels: quoted-printable parity with stdlib quopri, multipart
walking over real stdlib-email-generated bodies (QP + base64 + 7bit
parts, folded headers), and loud malformed-input errors."""

from __future__ import annotations

import io
import quopri
import random
import re
from email.generator import BytesGenerator
from email.message import EmailMessage

import pytest

from sciscraper_ray.kernels.mime import (
    MimeError,
    multipart_parse,
    quoted_printable_decode,
)


def test_qp_parity_with_stdlib():
    rng = random.Random(31)
    for _ in range(100):
        raw = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 500)))
        # stdlib quopri keeps literal newlines, so compare on its own
        # LF-framed output (soft breaks are '=\n' there)
        assert quoted_printable_decode(quopri.encodestring(raw)) == raw
    # CRLF framing: newline-free payloads survive the CRLF rewrite
    for _ in range(50):
        raw = bytes(
            rng.choice([b for b in range(256) if b != 0x0A])
            for _ in range(rng.randrange(0, 300))
        )
        enc = quopri.encodestring(raw).replace(b"\n", b"\r\n")
        assert quoted_printable_decode(enc) == raw


def test_qp_soft_breaks_and_escapes():
    assert quoted_printable_decode(b"caf=C3=A9") == "café".encode()
    assert quoted_printable_decode(b"long=\r\nline") == b"longline"
    assert quoted_printable_decode(b"long=\nline") == b"longline"
    with pytest.raises(MimeError, match="escape"):
        quoted_printable_decode(b"bad=ZZ")
    with pytest.raises(MimeError, match="truncated"):
        quoted_printable_decode(b"bad=A")


def test_real_email_multipart():
    msg = EmailMessage()
    msg["Subject"] = "test"
    msg.set_content(
        "plain text body with accents: café résumé", cte="quoted-printable"
    )
    msg.add_attachment(
        bytes(range(256)) * 4,
        maintype="application",
        subtype="octet-stream",
        filename="x.bin",
        cte="base64",
    )
    msg.add_attachment("another text part", cte="7bit")
    buf = io.BytesIO()
    BytesGenerator(buf).flatten(msg)
    raw = buf.getvalue().replace(b"\n", b"\r\n")
    boundary = (
        re.search(rb'boundary="?([^"\r\n]+)"?', raw).group(1).decode()
    )
    body = raw[raw.index(b"\r\n\r\n") + 4 :]
    parts = multipart_parse(body, boundary)
    assert len(parts) == 3
    assert "café" in parts[0]["payload"].decode("utf-8")
    assert parts[1]["payload"] == bytes(range(256)) * 4
    assert parts[1]["headers"]["content-transfer-encoding"] == "base64"
    assert parts[2]["payload"].rstrip(b"\r\n") == b"another text part"


def test_malformed_multipart():
    with pytest.raises(MimeError, match="header terminator"):
        multipart_parse(b"--X\r\nno terminator", "X")
    with pytest.raises(MimeError, match="closing"):
        multipart_parse(b"", "X")
    with pytest.raises(MimeError, match="header terminator"):
        multipart_parse(b"--B\r\nheaders-only-no-blank\r\n--B--", "B")
    # a well-formed empty-part body with closing delimiter parses
    ok = b"--B\r\nx-k: v\r\n\r\npayload\r\n--B--"
    parts = multipart_parse(ok, "B")
    assert parts[0]["payload"] == b"payload"
    assert parts[0]["headers"] == {"x-k": "v"}
