"""From-scratch Apple binary property list (bplist00) reader.

Crawled app bundles, browser caches and macOS/iOS artifacts carry
their metadata as binary plists; this kernel parses the public
format: the 32-byte trailer (offset-int size, object-ref size, object
count, top object, offset-table offset), the big-endian offset table,
and every marker-typed object — null/bool, sized big-endian signed
ints, 4/8-byte reals, Core-Data dates (seconds since 2001-01-01),
data, ASCII and UTF-16BE strings, arrays and dicts by object
reference, with the 0x?F extended-length escape.

stdlib ``plistlib`` (the real producer/parser) pins parity in tests
and the registry query. Cycles are rejected via a visiting set.
"""

from __future__ import annotations

import struct


class BplistError(ValueError):
    """Malformed binary plist."""


_EPOCH_2001 = 978307200.0  # 2001-01-01 in unix seconds


def bplist_parse(data: bytes):
    """bplist00 bytes -> python object tree."""
    if data[:8] != b"bplist00":
        raise BplistError("bad bplist magic")
    if len(data) < 40:
        raise BplistError("plist too short for trailer")
    (
        off_size,
        ref_size,
        n_objects,
        top,
        table_off,
    ) = struct.unpack(">6xBBQQQ", data[-32:])
    if off_size not in (1, 2, 4, 8) or ref_size not in (1, 2, 4, 8):
        raise BplistError("bad trailer sizes")
    offsets = []
    pos = table_off
    for _ in range(n_objects):
        offsets.append(
            int.from_bytes(data[pos : pos + off_size], "big")
        )
        pos += off_size

    def read_ref(pos: int) -> tuple[int, int]:
        return (
            int.from_bytes(data[pos : pos + ref_size], "big"),
            pos + ref_size,
        )

    def read_size(marker_low: int, pos: int) -> tuple[int, int]:
        if marker_low != 0x0F:
            return marker_low, pos
        # extended length: an int object inline
        m = data[pos]
        if m >> 4 != 0x1:
            raise BplistError("extended length is not an int")
        nbytes = 1 << (m & 0x0F)
        val = int.from_bytes(data[pos + 1 : pos + 1 + nbytes], "big")
        return val, pos + 1 + nbytes

    def parse_object(idx: int, seen: frozenset[int]):
        if idx >= n_objects:
            raise BplistError(f"object ref {idx} out of range")
        if idx in seen:
            raise BplistError("reference cycle")
        pos = offsets[idx]
        marker = data[pos]
        high, low = marker >> 4, marker & 0x0F
        pos += 1
        if high == 0x0:
            if marker == 0x00:
                return None
            if marker == 0x08:
                return False
            if marker == 0x09:
                return True
            raise BplistError(f"bad singleton marker {marker:#x}")
        if high == 0x1:  # int
            nbytes = 1 << low
            return int.from_bytes(
                data[pos : pos + nbytes], "big", signed=nbytes >= 8
            )
        if high == 0x2:  # real
            if low == 2:
                return struct.unpack_from(">f", data, pos)[0]
            if low == 3:
                return struct.unpack_from(">d", data, pos)[0]
            raise BplistError(f"bad real size {low}")
        if high == 0x3:  # date
            import datetime

            (secs,) = struct.unpack_from(">d", data, pos)
            return datetime.datetime.fromtimestamp(
                secs + _EPOCH_2001, tz=datetime.timezone.utc
            ).replace(tzinfo=None)
        if high == 0x4:  # data
            n, pos = read_size(low, pos)
            return data[pos : pos + n]
        if high == 0x5:  # ascii string
            n, pos = read_size(low, pos)
            return data[pos : pos + n].decode("ascii")
        if high == 0x6:  # utf-16be string
            n, pos = read_size(low, pos)
            return data[pos : pos + 2 * n].decode("utf-16-be")
        if high == 0x8:  # UID (keyed-archiver artifact): surface the int
            nbytes = low + 1
            return int.from_bytes(data[pos : pos + nbytes], "big")
        if high == 0xA:  # array
            n, pos = read_size(low, pos)
            child_seen = seen | {idx}
            out = []
            for _ in range(n):
                ref, pos = read_ref(pos)
                out.append(parse_object(ref, child_seen))
            return out
        if high == 0xD:  # dict
            n, pos = read_size(low, pos)
            child_seen = seen | {idx}
            key_refs = []
            for _ in range(n):
                ref, pos = read_ref(pos)
                key_refs.append(ref)
            out = {}
            for kref in key_refs:
                vref, pos = read_ref(pos)
                out[parse_object(kref, child_seen)] = parse_object(
                    vref, child_seen
                )
            return out
        raise BplistError(f"marker type {high:#x} out of scope")

    return parse_object(top, frozenset())
