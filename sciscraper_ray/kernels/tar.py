"""From-scratch tar (ustar/pax) archive walker.

WebDataset — the de-facto sharding layout for multimodal training
corpora — is nothing but tar streams of grouped sample files, so a
100 TB pipeline needs to walk tar members without materializing
archives. This kernel parses the public POSIX ustar format plus the
extensions real producers emit:

- 512-byte headers: name/prefix splitting, octal numeric fields AND
  the GNU base-256 (high-bit) encoding for large sizes, typeflags.
- Header checksum verification (sum with the checksum field blanked).
- PAX extended headers (typeflag ``x``: length-prefixed
  ``key=value\\n`` records overriding path/size of the next member).
- GNU long-name entries (typeflag ``L``).
- 512-byte payload padding, end-of-archive double-zero-block.

stdlib ``tarfile`` (in ustar, pax and gnu modes) is the untrusted
producer in tests and the registry query. Pure byte-level walking —
``map_batches`` work, no state.
"""

from __future__ import annotations


class TarError(ValueError):
    """Malformed tar archive."""


def _num(field: bytes) -> int:
    """Octal numeric field, or GNU base-256 when the high bit is set."""
    if field and field[0] & 0x80:
        out = field[0] & 0x7F
        for b in field[1:]:
            out = (out << 8) | b
        return out
    s = field.split(b"\x00", 1)[0].strip()
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError:
        raise TarError(f"bad numeric field {field!r}") from None


def _checksum_ok(header: bytes) -> bool:
    stored = _num(header[148:156])
    blanked = header[:148] + b" " * 8 + header[156:]
    return sum(blanked) == stored


def _parse_pax(data: bytes) -> dict[str, str]:
    """PAX records: ``<decimal length> <key>=<value>\\n`` repeated."""
    out: dict[str, str] = {}
    pos = 0
    while pos < len(data):
        sp = data.find(b" ", pos)
        if sp < 0:
            raise TarError("bad PAX record length")
        try:
            length = int(data[pos:sp])
        except ValueError:
            raise TarError("bad PAX record length") from None
        rec = data[pos : pos + length]
        if not rec.endswith(b"\n"):
            raise TarError("unterminated PAX record")
        body = rec[sp - pos + 1 : -1]
        eq = body.find(b"=")
        if eq < 0:
            raise TarError("PAX record missing '='")
        out[body[:eq].decode("utf-8")] = body[eq + 1 :].decode("utf-8")
        pos += length
    return out


def tar_members(data: bytes) -> list[dict]:
    """Walk a tar archive -> [{name, size, type, payload}, ...].

    Regular files carry their payload bytes; directories and links carry
    ``b""``. PAX/longname metadata entries are consumed into the member
    they describe, not emitted."""
    members: list[dict] = []
    pos = 0
    n = len(data)
    pending_pax: dict[str, str] | None = None
    pending_longname: str | None = None
    zero_blocks = 0
    while pos + 512 <= n:
        header = data[pos : pos + 512]
        pos += 512
        if header == b"\x00" * 512:
            zero_blocks += 1
            if zero_blocks == 2:
                return members
            continue
        if zero_blocks:
            raise TarError("data after end-of-archive zero block")
        if not _checksum_ok(header):
            raise TarError(f"header checksum mismatch at {pos - 512}")
        name = header[:100].split(b"\x00", 1)[0].decode("utf-8")
        size = _num(header[124:136])
        typeflag = chr(header[156]) if header[156] else "0"
        magic = header[257:263]
        if magic[:5] == b"ustar":
            prefix = header[345:500].split(b"\x00", 1)[0].decode("utf-8")
            if prefix:
                name = prefix + "/" + name
        payload_len = (size + 511) & ~511
        if pos + payload_len > n:
            raise TarError(f"truncated payload for {name!r}")
        payload = data[pos : pos + size]
        pos += payload_len
        if typeflag == "x":  # PAX extended header for the NEXT member
            pending_pax = _parse_pax(payload)
            continue
        if typeflag == "L":  # GNU long name for the NEXT member
            pending_longname = payload.rstrip(b"\x00").decode("utf-8")
            continue
        if typeflag == "g":  # global PAX header: ignored
            continue
        if pending_pax:
            name = pending_pax.get("path", name)
            if "size" in pending_pax:
                # size override only legal when header size was 0 stub
                size = int(pending_pax["size"])
                payload = data[pos - payload_len : pos - payload_len + size]
            pending_pax = None
        if pending_longname is not None:
            name = pending_longname
            pending_longname = None
        members.append(
            {
                "name": name,
                "size": size,
                "type": typeflag,
                "payload": payload if typeflag in ("0", "7") else b"",
            }
        )
    raise TarError("archive ended without end-of-archive marker")
