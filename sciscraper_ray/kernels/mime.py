"""MIME kernels: quoted-printable (RFC 2045 §6.7) and multipart body
walking (RFC 2046 §5.1) — from scratch.

Mail archives and form-data uploads in crawl dumps carry text behind
exactly two transfer encodings: quoted-printable and base64. This
module decodes QP (``=XX`` hex escapes, soft line breaks ``=\\r\\n`` /
``=\\n``, strict on malformed escapes) and walks multipart bodies
(``--boundary`` delimiter lines, per-part headers, closing
``--boundary--``), routing each part's payload through the declared
Content-Transfer-Encoding (QP here, base64 via kernels/wire.py,
7bit/8bit/binary verbatim).

stdlib ``email`` (the real producer of such bodies) generates the
fixtures in tests and the registry query. Pure byte kernels —
``map_batches`` work.
"""

from __future__ import annotations


class MimeError(ValueError):
    """Malformed quoted-printable / multipart payload."""


_HEX = b"0123456789ABCDEFabcdef"


def quoted_printable_decode(data: bytes) -> bytes:
    """RFC 2045 quoted-printable -> bytes (strict escapes)."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        b = data[pos]
        if b != 0x3D:  # '='
            out.append(b)
            pos += 1
            continue
        if pos + 1 < n and data[pos + 1] == 0x0A:  # soft break =\n
            pos += 2
            continue
        if pos + 2 < n and data[pos + 1 : pos + 3] == b"\r\n":  # =\r\n
            pos += 3
            continue
        if pos + 2 >= n:
            raise MimeError("truncated quoted-printable escape")
        h1, h2 = data[pos + 1], data[pos + 2]
        if h1 not in _HEX or h2 not in _HEX:
            raise MimeError(
                f"bad quoted-printable escape ={chr(h1)}{chr(h2)}"
            )
        out.append(int(data[pos + 1 : pos + 3], 16))
        pos += 3
    return bytes(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    last: str | None = None
    for line in block.split(b"\r\n"):
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last:  # folded continuation
            headers[last] += " " + line.strip().decode("latin-1")
            continue
        colon = line.find(b":")
        if colon < 0:
            raise MimeError(f"bad header line {line!r}")
        last = line[:colon].decode("latin-1").strip().lower()
        headers[last] = line[colon + 1 :].decode("latin-1").strip()
    return headers


def multipart_parse(body: bytes, boundary: str) -> list[dict]:
    """Multipart body -> [{headers, payload}] with transfer decoding.

    ``boundary`` is the bare token from the Content-Type parameter.
    Preamble and epilogue are discarded per RFC 2046.
    """
    delim = b"--" + boundary.encode("ascii")
    # a leading CRLF makes an opening delimiter at position 0 split the
    # same way as every later one (RFC 2046: the CRLF before a
    # delimiter belongs to the delimiter)
    chunks = (b"\r\n" + body).split(b"\r\n" + delim)
    parts: list[dict] = []
    closed = False
    for chunk in chunks[1:]:
        if chunk.startswith(b"--"):
            closed = True
            break
        if not chunk.startswith(b"\r\n"):
            raise MimeError("delimiter not followed by CRLF")
        section = chunk[2:]
        head_end = section.find(b"\r\n\r\n")
        if head_end < 0:
            raise MimeError("part missing header terminator")
        headers = _parse_headers(section[:head_end])
        payload = section[head_end + 4 :]
        cte = headers.get("content-transfer-encoding", "7bit").lower()
        if cte == "quoted-printable":
            payload = quoted_printable_decode(payload)
        elif cte == "base64":
            from sciscraper_ray.kernels.wire import base64_decode

            payload = base64_decode(
                payload.replace(b"\r\n", b"").replace(b"\n", b"")
            )
        elif cte in ("7bit", "8bit", "binary"):
            pass
        else:
            raise MimeError(f"transfer encoding {cte!r} out of scope")
        parts.append({"headers": headers, "payload": payload})
    if not closed:
        raise MimeError("multipart body missing closing delimiter")
    return parts
