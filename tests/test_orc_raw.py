"""From-scratch ORC reader: pyarrow.orc (real ORC C++) as producer,
covering all four RLEv2 sub-encodings, dictionary + direct strings,
presence bitmaps, multi-stripe files, and all four compression kinds
(zlib/snappy/zstd through the repo's own codecs)."""

from __future__ import annotations

import io
import random

import pyarrow as pa
import pyarrow.orc as orc
import pytest

from sciscraper_ray.kernels.orc_raw import OrcError, read_orc_raw


def _roundtrip(table, **kw):
    buf = io.BytesIO()
    orc.write_table(table, buf, **kw)
    got = read_orc_raw(buf.getvalue())
    want = table.to_pydict()
    for k in want:
        assert got[k] == want[k], k


def test_small_with_nulls_every_type():
    _roundtrip(
        pa.table(
            {
                "i64": pa.array([1, 2, None, 4, 1 << 40, -7], pa.int64()),
                "i32": pa.array([5, None, -9, 0, 7, 1], pa.int32()),
                "s": pa.array(["x", "yy", None, "zzz", "x", "yy"]),
                "d": pa.array([0.5, None, 2.25, -1e10, 3.0, 4.5]),
                "f": pa.array([0.5, 1.5, None, -2.0, 0.0, 9.0], pa.float32()),
                "b": pa.array([True, None, False, True, False, True]),
                "bin": pa.array(
                    [b"\x00\xff", None, b"", b"abc", b"d", b"e"], pa.binary()
                ),
            }
        )
    )


def _big_table():
    rng = random.Random(9)
    return pa.table(
        {
            "seq": pa.array(range(50000), pa.int64()),  # delta runs
            "rand": pa.array(
                [rng.randrange(-1000000, 1000000) for _ in range(50000)],
                pa.int64(),
            ),  # direct
            "const": pa.array([42] * 50000, pa.int64()),  # short repeat
            "spiky": pa.array(
                [
                    rng.randrange(100)
                    if rng.random() < 0.99
                    else rng.randrange(1 << 40)
                    for _ in range(50000)
                ],
                pa.int64(),
            ),  # patched base
            "strs": pa.array(
                ["word%d" % rng.randrange(50) for _ in range(50000)]
            ),  # dictionary
            "uniq": pa.array(
                ["u%08d" % i for i in range(50000)]
            ),  # direct strings
        }
    )


@pytest.mark.parametrize(
    "compression", ["UNCOMPRESSED", "ZLIB", "SNAPPY", "ZSTD"]
)
def test_all_rlev2_subencodings_and_codecs(compression):
    _roundtrip(_big_table(), compression=compression)


def test_multi_stripe():
    _roundtrip(_big_table(), stripe_size=64 * 1024, compression="ZLIB")


def test_malformed_and_scope():
    with pytest.raises(OrcError, match="magic"):
        read_orc_raw(b"not orc at all....")
    nested = pa.table(
        {"l": pa.array([[1, 2]], pa.list_(pa.int64()))}
    )
    buf = io.BytesIO()
    orc.write_table(nested, buf)
    with pytest.raises(OrcError, match="out of scope"):
        read_orc_raw(buf.getvalue())
