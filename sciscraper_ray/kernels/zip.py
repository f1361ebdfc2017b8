"""From-scratch ZIP archive reader (the public APPNOTE.TXT format).

Walks the END-OF-CENTRAL-DIRECTORY record backward from the tail, the
central directory entries, and each member's local header, then
decompresses stored (method 0) members directly and deflated (method
8) members through the repo's OWN from-scratch inflater
(stages/inflate.py) — the two layers compose: a ZIP bug and a DEFLATE
bug are distinguishable because the inflater is independently pinned
against zlib. CRC-32 of every extracted payload is verified against
the central-directory record.

Scope: no ZIP64 (rejected loudly via the 0xFFFFFFFF sentinels), no
encryption, no spanned archives — none of which appear in corpus
shipping. stdlib ``zipfile`` (stored + deflated) is the untrusted
producer in tests and the registry query.
"""

from __future__ import annotations

import struct
import zlib as _zlib  # CRC-32 only (the inflate itself is from scratch)

from sciscraper_ray.stages.inflate import inflate

_EOCD_SIG = 0x06054B50
_CDIR_SIG = 0x02014B50
_LOCAL_SIG = 0x04034B50


class ZipError(ValueError):
    """Malformed or out-of-scope ZIP archive."""


def zip_members(data: bytes) -> list[dict]:
    """ZIP bytes -> [{name, size, method, payload}, ...] (CRC-verified)."""
    # EOCD: scan backward over the (<= 64K) comment space
    scan_from = max(0, len(data) - 22 - 65535)
    eocd = -1
    for pos in range(len(data) - 22, scan_from - 1, -1):
        if struct.unpack_from("<I", data, pos)[0] == _EOCD_SIG:
            eocd = pos
            break
    if eocd < 0:
        raise ZipError("missing end-of-central-directory record")
    (
        _disk,
        _cd_disk,
        _n_disk,
        n_total,
        cd_size,
        cd_offset,
        _comment_len,
    ) = struct.unpack_from("<HHHHIIH", data, eocd + 4)
    if n_total == 0xFFFF or cd_offset == 0xFFFFFFFF:
        raise ZipError("ZIP64 archives out of scope")
    members = []
    pos = cd_offset
    for _ in range(n_total):
        if struct.unpack_from("<I", data, pos)[0] != _CDIR_SIG:
            raise ZipError("bad central-directory signature")
        (
            _ver_made,
            _ver_need,
            flags,
            method,
            _mtime,
            _mdate,
            crc,
            comp_size,
            orig_size,
            name_len,
            extra_len,
            comment_len,
            _disk_start,
            _int_attr,
            _ext_attr,
            local_off,
        ) = struct.unpack_from("<HHHHHHIIIHHHHHII", data, pos + 4)
        if flags & 0x0001:
            raise ZipError("encrypted members out of scope")
        if comp_size == 0xFFFFFFFF or orig_size == 0xFFFFFFFF:
            raise ZipError("ZIP64 member sizes out of scope")
        name = data[pos + 46 : pos + 46 + name_len].decode("utf-8")
        pos += 46 + name_len + extra_len + comment_len
        # local header: its name/extra lengths can differ from the CD's
        if struct.unpack_from("<I", data, local_off)[0] != _LOCAL_SIG:
            raise ZipError(f"bad local header for {name!r}")
        l_name, l_extra = struct.unpack_from("<HH", data, local_off + 26)
        body = local_off + 30 + l_name + l_extra
        raw = data[body : body + comp_size]
        if len(raw) < comp_size:
            raise ZipError(f"truncated member {name!r}")
        if method == 0:
            payload = raw
        elif method == 8:
            payload, _end = inflate(raw)
        else:
            raise ZipError(f"compression method {method} out of scope")
        if len(payload) != orig_size:
            raise ZipError(f"size mismatch for {name!r}")
        if _zlib.crc32(payload) & 0xFFFFFFFF != crc:
            raise ZipError(f"CRC mismatch for {name!r}")
        members.append(
            {
                "name": name,
                "size": orig_size,
                "method": method,
                "payload": payload,
            }
        )
    return members
