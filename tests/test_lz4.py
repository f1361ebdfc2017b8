"""From-scratch LZ4 block codec: roundtrips over adversarial shapes,
hand-built sequences decoded independently of the encoder, spec
end-of-block rules, and loud malformed-stream errors."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from sciscraper_ray.stages.lz4 import Lz4Error, lz4_compress, lz4_decompress


def _payloads():
    rng = random.Random(3)
    return [
        b"",
        b"a",
        b"abcd",
        b"a" * 5,
        b"a" * 12,  # exactly the no-match tail zone
        b"a" * 13,
        b"a" * 1000,  # long overlapping run (offset 1)
        b"ab" * 5000,  # offset-2 periodic
        bytes(rng.randrange(256) for _ in range(5000)),  # incompressible
        b"the quick brown fox " * 500,
        bytes(range(256)) * 40,
        ("word7 " * 3000).encode(),
    ]


def test_roundtrip_adversarial_shapes():
    for p in _payloads():
        c = lz4_compress(p)
        assert lz4_decompress(c) == p, len(p)


def test_compression_actually_compresses_runs():
    big = b"z" * 100000
    c = lz4_compress(big)
    assert len(c) < 600
    assert lz4_decompress(c) == big


def test_determinism_across_calls():
    p = ("mixed content 123 " * 400).encode()
    assert lz4_compress(p) == lz4_compress(p)


def test_hand_built_sequences():
    # literals 'AB'; match offset 1 len 4 (overlapping: BBBB); literals 'C'
    hand = bytes([0x20]) + b"AB" + b"\x01\x00" + bytes([0x10]) + b"C"
    assert lz4_decompress(hand) == b"ABBBBBC"
    # length extension: literal run of 15+255+3 = 273 'x' bytes
    body = b"x" * 273
    hand2 = bytes([0xF0, 255, 3]) + body
    assert lz4_decompress(hand2) == body


def test_malformed_rejected():
    with pytest.raises(Lz4Error, match="empty"):
        lz4_decompress(b"")
    with pytest.raises(Lz4Error, match="literal run"):
        lz4_decompress(bytes([0x20]) + b"A")
    with pytest.raises(Lz4Error, match="offset beyond"):
        lz4_decompress(bytes([0x00, 0x05, 0x00]))
    with pytest.raises(Lz4Error, match="zero match offset"):
        lz4_decompress(bytes([0x10]) + b"A" + b"\x00\x00" + bytes([0x10]) + b"B")


def test_parity_against_real_lz4():
    """pyarrow ships the REAL C++ LZ4 (lz4_raw): our decoder must accept
    its output, and its decoder must accept ours."""
    codec = pa.Codec("lz4_raw")
    for p in _payloads():
        real = bytes(codec.compress(p))
        assert lz4_decompress(real) == p
        mine = lz4_compress(p)
        assert bytes(codec.decompress(mine, len(p))) == p
