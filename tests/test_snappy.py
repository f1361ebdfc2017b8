"""From-scratch Snappy raw decoder: parity against the container's REAL
C++ snappy (pyarrow.Codec) as untrusted producer, hand-built element
vectors, and loud malformed-stream errors."""

from __future__ import annotations

import random

import pyarrow as pa
import pytest

from sciscraper_ray.stages.snappy import SnappyError, snappy_decompress


def _payloads():
    rng = random.Random(13)
    return [
        b"",
        b"a",
        b"hello hello hello hello world" * 10,
        b"a" * 100000,  # long overlapping runs
        b"ab" * 30000,
        bytes(rng.randrange(256) for _ in range(50000)),  # incompressible
        bytes(range(256)) * 300,
        ("tok3 " * 20000).encode(),
    ]


def test_parity_against_real_snappy():
    codec = pa.Codec("snappy")
    for p in _payloads():
        assert snappy_decompress(bytes(codec.compress(p))) == p


def test_hand_built_elements():
    # varint 6; literal "ab" (tag (2-1)<<2); 1-byte-offset copy len 4 off 1
    hand = bytes([6, 0x04]) + b"ab" + bytes([0x01, 0x01])
    assert snappy_decompress(hand) == b"abbbbb"
    # 2-byte-offset copy: varint 8, literal "abcd", copy len 4 off 4
    hand2 = bytes([8, 0x0C]) + b"abcd" + bytes([(3 << 2) | 2, 4, 0])
    assert snappy_decompress(hand2) == b"abcdabcd"
    # long literal with 1 extra length byte: 100 bytes
    body = bytes(range(100))
    hand3 = bytes([100, (60 << 2), 99]) + body
    assert snappy_decompress(hand3) == body


@pytest.mark.parametrize(
    "bad",
    [
        b"",  # no varint
        bytes([5, 0x04]) + b"ab",  # declared 5, produces 2
        bytes([2, 0x01, 0x01]),  # copy with empty output window
        bytes([3, 0x04]) + b"a",  # literal past end
        bytes([1, (60 << 2)]),  # truncated extra length byte
    ],
)
def test_malformed_rejected(bad):
    with pytest.raises(SnappyError):
        snappy_decompress(bad)
