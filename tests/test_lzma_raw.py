"""From-scratch LZMA decoder: stdlib lzma (real liblzma) as producer,
sweeping lc/lp/pb parameter combinations, payload shapes, and the
known-size vs end-marker termination paths."""

from __future__ import annotations

import lzma
import random
import struct

import pytest

from sciscraper_ray.stages.lzma_raw import LzmaError, lzma_alone_decompress


def _payloads():
    rng = random.Random(19)
    return [
        b"",
        b"a",
        b"hello world hello world",
        b"a" * 5000,
        b"ab" * 3000,
        bytes(rng.randrange(256) for _ in range(20000)),
        b"the quick brown fox " * 1000,
    ]


def test_parity_default_preset():
    for p in _payloads():
        comp = lzma.compress(p, format=lzma.FORMAT_ALONE)
        assert lzma_alone_decompress(comp) == p


@pytest.mark.parametrize(
    "lc,lp,pb", [(0, 0, 0), (0, 2, 1), (4, 0, 2), (3, 1, 4), (1, 3, 0)]
)
def test_parameter_matrix(lc, lp, pb):
    filters = [
        {"id": lzma.FILTER_LZMA1, "preset": 6, "lc": lc, "lp": lp, "pb": pb}
    ]
    for p in _payloads():
        comp = lzma.compress(p, format=lzma.FORMAT_ALONE, filters=filters)
        assert lzma_alone_decompress(comp) == p, (lc, lp, pb, len(p))


def test_known_size_header_path():
    p = b"declared size termination " * 100
    comp = bytearray(lzma.compress(p, format=lzma.FORMAT_ALONE))
    assert comp[5:13] == b"\xff" * 8  # stdlib streams with unknown size
    struct.pack_into("<Q", comp, 5, len(p))
    assert lzma_alone_decompress(bytes(comp)) == p


def test_malformed_rejected():
    with pytest.raises(LzmaError):
        lzma_alone_decompress(b"short")
    comp = bytearray(lzma.compress(b"payload " * 200, format=lzma.FORMAT_ALONE))
    comp[0] = 9 * 5 * 5  # invalid properties byte
    with pytest.raises(LzmaError, match="properties"):
        lzma_alone_decompress(bytes(comp))
    good = lzma.compress(b"x" * 1000, format=lzma.FORMAT_ALONE)
    with pytest.raises(LzmaError):
        lzma_alone_decompress(good[: len(good) - 8])


@pytest.mark.parametrize(
    "check",
    [lzma.CHECK_NONE, lzma.CHECK_CRC32, lzma.CHECK_CRC64, lzma.CHECK_SHA256],
)
def test_xz_parity_all_checks(check):
    from sciscraper_ray.stages.lzma_raw import xz_decompress

    for p in _payloads():
        comp = lzma.compress(p, format=lzma.FORMAT_XZ, check=check)
        assert xz_decompress(comp) == p


def test_xz_multi_chunk_lzma2():
    """3 MB at preset 0 spans many LZMA2 chunks — state persistence and
    the shared dictionary window across chunk boundaries."""
    from sciscraper_ray.stages.lzma_raw import xz_decompress

    rng = random.Random(21)
    big = bytes(rng.randrange(64) for _ in range(3_000_000))
    assert xz_decompress(lzma.compress(big, preset=0)) == big


def test_xz_corruption_loud():
    from sciscraper_ray.stages.lzma_raw import LzmaError, xz_decompress

    comp = bytearray(lzma.compress(b"check me " * 1000))
    comp[9] ^= 0x40  # stream-header CRC region
    with pytest.raises(LzmaError):
        xz_decompress(bytes(comp))
    body = bytearray(lzma.compress(b"payload " * 2000))
    body[40] ^= 0x01  # inside compressed data -> CRC64 or decode error
    with pytest.raises(LzmaError):
        xz_decompress(bytes(body))
    with pytest.raises(LzmaError, match="magic"):
        xz_decompress(b"not xz data here")


def test_crc64_known_vector():
    from sciscraper_ray.stages.lzma_raw import crc64_xz

    # public check value for the CRC-64/XZ parameterization
    assert crc64_xz(b"123456789") == 0x995DC9BBDF1939FA
