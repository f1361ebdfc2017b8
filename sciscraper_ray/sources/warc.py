"""WARC-style record container: deterministic writer + streaming parser.

Common-Crawl-shaped input (BASELINE.json input_hint) arrives as WARC
segments before it is columnarized; this module carries the source-format
contract offline: ``build_warc`` serializes records into the standard
WARC/1.0 envelope (named headers, Content-Length-delimited payload,
CRLF CRLF record separator) and ``parse_warc`` slices records back by
Content-Length — never by scanning for a separator, since payloads are
arbitrary bytes that may embed one.

Scale shape: one WARC file is one input fragment; ``read_binary_files``
hands each to a task whole (WARC has no intra-file random access without
an index — the same constraint real CC segment readers have), so
parallelism = number of segment files, exactly how warc.paths fan out.
"""

from __future__ import annotations

_CRLF = b"\r\n"


def build_warc(
    records: "list[tuple[int, str, bytes]] | list[tuple[int, str, bytes, dict]]",
) -> bytes:
    """records: (record_id, target_uri, payload[, extra_headers]) -> one
    WARC segment. ``extra_headers`` may override ``WARC-Type`` (e.g. a
    crawl-dedup ``revisit`` record, which per the
    identical-payload-digest profile carries WARC-Refers-To /
    WARC-Payload-Digest headers and an EMPTY payload) and add any other
    named header."""
    out = bytearray()
    for rec in records:
        rec_id, uri, payload = rec[0], rec[1], rec[2]
        extra = dict(rec[3]) if len(rec) > 3 else {}
        warc_type = extra.pop("WARC-Type", "response")
        out += b"WARC/1.0" + _CRLF
        out += f"WARC-Type: {warc_type}".encode() + _CRLF
        out += f"WARC-Record-ID: <urn:doc:{rec_id}>".encode() + _CRLF
        out += f"WARC-Target-URI: {uri}".encode() + _CRLF
        for k, v in extra.items():
            out += f"{k}: {v}".encode() + _CRLF
        out += f"Content-Length: {len(payload)}".encode() + _CRLF
        out += _CRLF
        out += payload
        out += _CRLF + _CRLF
    return bytes(out)


def parse_warc(data: bytes) -> list[dict]:
    """Parse one WARC segment -> [{record_id, uri, payload}, ...].

    Payloads are sliced by Content-Length; a record with a damaged header
    block is skipped by resyncing on the next ``WARC/1.0`` magic (crawl
    segments routinely contain truncated tail records)."""
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/1.0", pos)
        if start < 0:
            break
        hdr_end = data.find(_CRLF + _CRLF, start)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if v:
                headers[k.decode("latin-1").strip()] = v.decode("latin-1").strip()
        try:
            length = int(headers["Content-Length"])
        except (KeyError, ValueError):
            pos = start + len(b"WARC/1.0")
            continue
        body_start = hdr_end + 4
        payload = data[body_start : body_start + length]
        rec_id = headers.get("WARC-Record-ID", "")
        num = None
        if rec_id.startswith("<urn:doc:") and rec_id.endswith(">"):
            try:
                num = int(rec_id[len("<urn:doc:") : -1])
            except ValueError:
                num = None
        refers = headers.get("WARC-Refers-To", "")
        refers_num = None
        if refers.startswith("<urn:doc:") and refers.endswith(">"):
            try:
                refers_num = int(refers[len("<urn:doc:") : -1])
            except ValueError:
                refers_num = None
        out.append(
            {
                "record_id": num,
                "uri": headers.get("WARC-Target-URI", ""),
                "payload": payload,
                "warc_type": headers.get("WARC-Type", "response"),
                "refers_to": refers_num,
            }
        )
        pos = body_start + length
    return out


def cdx_scan(data: bytes) -> list[tuple[int | None, str, int, int]]:
    """CDX-style index scan of one segment: (record_id, uri, offset,
    rec_len) per record, where offset is the byte position of the
    record's ``WARC/1.0`` magic and rec_len spans through the trailing
    CRLF CRLF separator — the (offset, length) pair that makes WARC
    random-access (what a .cdx sidecar stores for Common Crawl)."""
    out: list[tuple[int | None, str, int, int]] = []
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/1.0", pos)
        if start < 0:
            break
        hdr_end = data.find(_CRLF + _CRLF, start)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[start:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            if v:
                headers[k.decode("latin-1").strip()] = v.decode("latin-1").strip()
        try:
            length = int(headers["Content-Length"])
        except (KeyError, ValueError):
            pos = start + len(b"WARC/1.0")
            continue
        body_start = hdr_end + 4
        end = body_start + length + 4  # trailing CRLF CRLF
        rec_id = headers.get("WARC-Record-ID", "")
        num = None
        if rec_id.startswith("<urn:doc:") and rec_id.endswith(">"):
            try:
                num = int(rec_id[len("<urn:doc:") : -1])
            except ValueError:
                num = None
        out.append((num, headers.get("WARC-Target-URI", ""), start, end - start))
        pos = end
    return out
