"""From-scratch zstd decoder (RFC 8878): parity against the container's
REAL C++ zstd (pyarrow.Codec) across levels and payload shapes, xxHash64
known vectors, a hand-checksummed frame, and loud corruption errors."""

from __future__ import annotations

import random
import struct

import pyarrow as pa
import pytest

from sciscraper_ray.stages.zstd import ZstdError, xxh64, zstd_decompress


def _payloads():
    rng = random.Random(17)
    return {
        "empty": b"",
        "one": b"a",
        "short": b"hello world",
        "runs": b"a" * 100000,  # RLE blocks
        "periodic": b"ab" * 30000,
        "text": b"the quick brown fox jumps over the lazy dog " * 2000,
        "rand": bytes(rng.randrange(256) for _ in range(50000)),  # raw blocks
        "semi": b"".join(
            bytes([rng.randrange(64)]) * rng.randrange(1, 20)
            for _ in range(5000)
        ),
        "bytes256": bytes(range(256)) * 300,
    }


@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_parity_against_real_zstd(level):
    codec = pa.Codec("zstd", level)
    for name, p in _payloads().items():
        assert zstd_decompress(bytes(codec.compress(p))) == p, (name, level)


def test_multi_block_cross_window_matches():
    """2 MB word soup -> many blocks; matches reference earlier blocks'
    output (the frame window), and treeless/repeat table modes recur."""
    rng = random.Random(23)
    words = [
        bytes(rng.randrange(97, 123) for _ in range(rng.randrange(3, 10)))
        for _ in range(500)
    ]
    big = b" ".join(words[rng.randrange(500)] for _ in range(300000))[
        :2_000_000
    ]
    for level in (1, 12, 22):
        comp = bytes(pa.Codec("zstd", level).compress(big))
        assert zstd_decompress(comp) == big, level


def test_xxh64_known_vectors():
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    # spans every tail path: 32-byte stripes + 8/4/1-byte tails
    for n in (31, 32, 33, 40, 45, 100, 1000):
        data = bytes(range(256))[:n] * 5
        assert isinstance(xxh64(data), int)


def test_content_checksum_verified():
    p = b"checksum me " * 1000
    comp = bytearray(pa.Codec("zstd", 6).compress(p))
    assert not comp[4] & 0x04  # pyarrow frames ship without checksum
    comp[4] |= 0x04
    comp += struct.pack("<I", xxh64(p) & 0xFFFFFFFF)
    assert zstd_decompress(bytes(comp)) == p
    bad = bytearray(comp)
    bad[-1] ^= 1
    with pytest.raises(ZstdError, match="checksum"):
        zstd_decompress(bytes(bad))


def test_corruption_is_loud_or_detectably_wrong():
    p = b"corruption probe " * 5000
    comp = bytes(pa.Codec("zstd", 9).compress(p))
    loud = 0
    for pos in range(8, len(comp), max(1, len(comp) // 40)):
        bad = bytearray(comp)
        bad[pos] ^= 0x41
        try:
            out = zstd_decompress(bytes(bad))
            # without a checksum some corruptions legally decode to
            # different bytes — never silently EQUAL output
            assert out != p or bytes(bad) == comp
        except (ZstdError, IndexError):
            loud += 1
    assert loud > 0  # framing errors are detected, not absorbed


def test_malformed_frames_rejected():
    with pytest.raises(ZstdError, match="magic"):
        zstd_decompress(b"nope")
    with pytest.raises(ZstdError, match="magic"):
        zstd_decompress(b"")
    good = bytes(pa.Codec("zstd", 1).compress(b"x"))
    with pytest.raises(ZstdError):
        zstd_decompress(good[:-2])  # truncated
    with pytest.raises(ZstdError, match="trailing"):
        zstd_decompress(good + b"\x00")
