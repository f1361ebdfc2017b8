"""From-scratch DEFLATE/zlib/gzip inflater: bit-for-bit parity against
stdlib zlib output at every level (stored/fixed/dynamic block coverage),
hand-built container headers, and loud rejection of corrupt streams."""

from __future__ import annotations

import gzip
import random
import struct
import zlib

import pytest

from sciscraper_ray.stages.inflate import (
    InflateError,
    adler32,
    gzip_decompress,
    inflate,
    zlib_decompress,
)


def _payloads():
    rng = random.Random(11)
    out = [
        b"",
        b"a",
        b"abc" * 50000,  # dist-3 overlapping copies, max-length matches
        bytes(range(256)) * 300,
        ("the quick brown fox jumps over the lazy dog " * 2000).encode(),
        bytes(rng.randrange(256) for _ in range(3000)),  # incompressible
    ]
    return out


@pytest.mark.parametrize("level", [0, 1, 6, 9])
def test_zlib_gzip_raw_parity_all_levels(level):
    for payload in _payloads():
        assert zlib_decompress(zlib.compress(payload, level)) == payload
        assert (
            gzip_decompress(gzip.compress(payload, compresslevel=level, mtime=0))
            == payload
        )
        co = zlib.compressobj(level, wbits=-15)
        raw = co.compress(payload) + co.flush()
        out, end = inflate(raw)
        assert out == payload
        assert end == len(raw)


def test_fixed_huffman_blocks_forced():
    """Z_FIXED strategy guarantees BTYPE=01 coverage independent of the
    level heuristics."""
    for payload in _payloads():
        co = zlib.compressobj(6, zlib.DEFLATED, -15, 9, zlib.Z_FIXED)
        raw = co.compress(payload) + co.flush()
        out, end = inflate(raw)
        assert out == payload and end == len(raw)


def test_adler32_matches_stdlib():
    for payload in _payloads():
        assert adler32(payload) == zlib.adler32(payload)
    big = bytes(range(256)) * 1024  # crosses the vectorized chunk step
    assert adler32(big) == zlib.adler32(big)


def test_stored_block_hand_built():
    # BFINAL=1 BTYPE=00 -> byte 0x01, align, LEN/NLEN, raw bytes
    body = b"hello stored"
    raw = b"\x01" + struct.pack("<HH", len(body), ~len(body) & 0xFFFF) + body
    out, end = inflate(raw)
    assert out == body and end == len(raw)
    bad = b"\x01" + struct.pack("<HH", len(body), 0) + body
    with pytest.raises(InflateError, match="LEN/NLEN"):
        inflate(bad)


def test_gzip_header_variants():
    body_co = zlib.compressobj(6, wbits=-15)
    payload = b"gzip header walk"
    raw = body_co.compress(payload) + body_co.flush()
    trailer = struct.pack("<II", zlib.crc32(payload), len(payload))
    # FEXTRA + FNAME + FCOMMENT + FHCRC all at once
    flg = 0x04 | 0x08 | 0x10 | 0x02
    extra = b"\x07\x00seven b"
    head = b"\x1f\x8b\x08" + bytes([flg]) + b"\x00" * 6
    head += extra + b"a name\x00" + b"a comment\x00"
    head += struct.pack("<H", zlib.crc32(head) & 0xFFFF)
    assert gzip_decompress(head + raw + trailer) == payload
    # header CRC16 corruption is caught
    bad = bytearray(head + raw + trailer)
    bad[len(head) - 1] ^= 0xFF
    with pytest.raises(InflateError, match="CRC16"):
        gzip_decompress(bytes(bad))


def test_corrupt_streams_rejected():
    z = bytearray(zlib.compress(b"hello world" * 10, 6))
    z[-1] ^= 0xFF
    with pytest.raises(InflateError, match="Adler"):
        zlib_decompress(bytes(z))
    g = bytearray(gzip.compress(b"data", mtime=0))
    g[-5] ^= 0x01
    with pytest.raises(InflateError, match="ISIZE|CRC"):
        gzip_decompress(bytes(g))
    # reserved block type: BFINAL=1 BTYPE=11 -> 0b111
    with pytest.raises(InflateError, match="BTYPE"):
        inflate(b"\x07\x00")
    # zlib header check bits
    with pytest.raises(InflateError, match="check bits"):
        zlib_decompress(b"\x78\x00" + b"\x00" * 8)
    with pytest.raises(InflateError, match="magic"):
        gzip_decompress(b"\x1f\x8c" + b"\x00" * 20)


def test_png_idat_decodes_with_from_scratch_inflate():
    """The entropy layer under PNG is interchangeable: a real encoder's
    IDAT stream decodes identically through this inflater."""
    import numpy as np

    from sciscraper_ray.stages.png import encode_png

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (16, 11, 3), dtype=np.uint8)
    payload = encode_png(img, filter_type=4)
    (length,) = struct.unpack(">I", payload[33:37])
    idat = payload[41 : 41 + length]
    assert zlib_decompress(idat) == zlib.decompress(idat)
