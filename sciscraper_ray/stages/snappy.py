"""From-scratch Snappy raw-format decoder (the public Snappy
format_description.txt spec).

Snappy is Parquet's default page codec — the bytes every column chunk
in this engine's own inputs travel in. This decoder implements the raw
(non-framed) format: a little-endian varint preamble carrying the
uncompressed length, then a sequence of elements tagged by the low two
bits of the first byte —

    00  literal; length-1 in the high six bits, values 60..63 switch to
        1..4 extra little-endian length bytes
    01  copy, 1-byte offset: length 4..11 in bits 2..4, offset is
        (bits 5..7) << 8 | next byte (11-bit, may reach 2047)
    10  copy, 2-byte little-endian offset: length 1 + (tag >> 2)
    11  copy, 4-byte little-endian offset: same length rule

with overlapping copies replayed byte-serially (the run-length idiom),
and the declared length enforced exactly.

No encoder here on purpose: the container ships the REAL C++ snappy
through ``pyarrow.Codec("snappy")``, which serves as the untrusted
producer in tests and the registry query — stronger parity evidence
than a self-written encoder could give. Per-payload sequential work;
runs inside ``map_batches`` like the other codecs.
"""

from __future__ import annotations

import struct


class SnappyError(ValueError):
    """Malformed Snappy raw stream."""


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise SnappyError("truncated length varint")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 32:
            raise SnappyError("length varint too long")


def snappy_decompress(data: bytes) -> bytes:
    """Snappy raw bytes -> decompressed bytes (declared length enforced)."""
    want, pos = _read_varint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            length = tag >> 2
            if length >= 60:
                extra = length - 59
                if pos + extra > n:
                    raise SnappyError("truncated literal length")
                length = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            length += 1
            if pos + length > n:
                raise SnappyError("literal runs past end of stream")
            out += data[pos : pos + length]
            pos += length
            continue
        if kind == 1:  # copy, 1-byte offset
            length = 4 + ((tag >> 2) & 0x07)
            if pos >= n:
                raise SnappyError("truncated 1-byte-offset copy")
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            length = 1 + (tag >> 2)
            if pos + 2 > n:
                raise SnappyError("truncated 2-byte-offset copy")
            (offset,) = struct.unpack_from("<H", data, pos)
            pos += 2
        else:  # copy, 4-byte offset
            length = 1 + (tag >> 2)
            if pos + 4 > n:
                raise SnappyError("truncated 4-byte-offset copy")
            (offset,) = struct.unpack_from("<I", data, pos)
            pos += 4
        if offset == 0:
            raise SnappyError("zero copy offset")
        if offset > len(out):
            raise SnappyError("copy offset beyond output start")
        if offset >= length:
            start = len(out) - offset
            out += out[start : start + length]
        else:  # overlapping copy: byte-serial semantics
            for _ in range(length):
                out.append(out[-offset])
    if len(out) != want:
        raise SnappyError(
            f"declared length {want} != decompressed {len(out)}"
        )
    return bytes(out)
