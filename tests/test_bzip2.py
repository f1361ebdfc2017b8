"""From-scratch bzip2 decoder: parity against stdlib bz2 (real
libbzip2) across levels, multi-block streams, CRC verification, and
loud malformed-stream errors."""

from __future__ import annotations

import bz2
import random

import pytest

from sciscraper_ray.stages.bzip2 import Bzip2Error, bzip2_decompress


def _payloads():
    rng = random.Random(29)
    return [
        b"",
        b"a",
        b"hello world",
        b"a" * 300,  # RLE1 runs + RUNA/RUNB zero runs
        b"abcd" * 100,
        b"aaaab" * 5000,
        bytes(rng.randrange(256) for _ in range(50000)),
        b"the quick brown fox " * 5000,
    ]


@pytest.mark.parametrize("level", [1, 5, 9])
def test_parity_against_stdlib(level):
    for p in _payloads():
        assert bzip2_decompress(bz2.compress(p, level)) == p


def test_multi_block_stream():
    """250k of low-entropy bytes at level 1 spans multiple 100k blocks,
    exercising the unaligned block boundary and combined CRC."""
    rng = random.Random(31)
    p = bytes(rng.randrange(4) for _ in range(250000))
    assert bzip2_decompress(bz2.compress(p, 1)) == p


def test_crc_and_framing_rejected():
    comp = bytearray(bz2.compress(b"payload " * 1000, 5))
    comp[-6] ^= 0x10  # flip a bit near the combined CRC / last block
    with pytest.raises(Bzip2Error):
        bzip2_decompress(bytes(comp))
    with pytest.raises(Bzip2Error, match="magic"):
        bzip2_decompress(b"notbz2....")
    with pytest.raises(Bzip2Error, match="level"):
        bzip2_decompress(b"BZh0" + b"\x00" * 20)
    good = bz2.compress(b"x", 1)
    with pytest.raises(Bzip2Error):
        bzip2_decompress(good[: len(good) - 4])
