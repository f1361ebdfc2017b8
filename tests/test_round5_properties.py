"""Hypothesis property tests for the round-5 codec/wire tier: every
byte string must round-trip (or decode to parity with the reference
implementation) regardless of shape."""

from __future__ import annotations

import base64
import bz2
import gzip
import zlib

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from sciscraper_ray.kernels.wire import (
    base64_decode,
    base64_encode,
    chunked_decode,
    chunked_encode,
)
from sciscraper_ray.stages.bzip2 import bzip2_decompress
from sciscraper_ray.stages.inflate import gzip_decompress, zlib_decompress
from sciscraper_ray.stages.lz4 import lz4_compress, lz4_decompress
from sciscraper_ray.stages.snappy import snappy_decompress
from sciscraper_ray.stages.zstd import zstd_decompress

_bytes = st.binary(min_size=0, max_size=4000)


@settings(max_examples=60, deadline=None)
@given(_bytes)
def test_inflate_decodes_any_zlib_stream(payload):
    assert zlib_decompress(zlib.compress(payload, 6)) == payload
    assert gzip_decompress(gzip.compress(payload, mtime=0)) == payload


@settings(max_examples=60, deadline=None)
@given(_bytes)
def test_lz4_roundtrip_and_real_decoder_accepts_ours(payload):
    mine = lz4_compress(payload)
    assert lz4_decompress(mine) == payload
    assert bytes(pa.Codec("lz4_raw").decompress(mine, len(payload))) == payload


@settings(max_examples=60, deadline=None)
@given(_bytes)
def test_snappy_decodes_real_output(payload):
    assert snappy_decompress(bytes(pa.Codec("snappy").compress(payload))) == payload


@settings(max_examples=40, deadline=None)
@given(_bytes, st.sampled_from([1, 3, 9]))
def test_zstd_decodes_real_output(payload, level):
    assert zstd_decompress(bytes(pa.Codec("zstd", level).compress(payload))) == payload


@settings(max_examples=30, deadline=None)
@given(_bytes, st.sampled_from([1, 9]))
def test_bzip2_decodes_real_output(payload, level):
    assert bzip2_decompress(bz2.compress(payload, level)) == payload


@settings(max_examples=60, deadline=None)
@given(_bytes)
def test_base64_roundtrip_and_stdlib_parity(payload):
    enc = base64_encode(payload)
    assert enc == base64.b64encode(payload)
    assert base64_decode(enc) == payload


@settings(max_examples=60, deadline=None)
@given(_bytes, st.lists(st.integers(1, 50), min_size=1, max_size=8))
def test_chunked_roundtrip(payload, sizes):
    body, trailers = chunked_decode(chunked_encode(payload, sizes))
    assert body == payload
    assert trailers == {}
