"""From-scratch Parquet reader: parity against pyarrow over the real
driver-generated testdata (all 10 tables incl. list<float>), plus
pyarrow-written variants sweeping page versions, codecs, dictionary
settings, nulls, and every in-scope physical type."""

from __future__ import annotations

import datetime
import glob
import io

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sciscraper_ray.kernels.parquet_raw import ParquetError, read_parquet_raw


def _norm(values):
    out = []
    for v in values:
        if isinstance(v, datetime.datetime):
            v = int(v.timestamp() * 1e6 + 0.5)
        out.append(v)
    return out


@pytest.mark.parametrize(
    "path", sorted(glob.glob("/root/testdata/sf0.001/*.parquet"))
)
def test_parity_on_real_testdata(path):
    got = read_parquet_raw(open(path, "rb").read())
    want = pq.read_table(path).to_pydict()
    assert set(got) == set(want)
    for k in want:
        assert got[k] == _norm(want[k]), k


def _write(table, **kw):
    buf = io.BytesIO()
    pq.write_table(table, buf, **kw)
    return buf.getvalue()


def _sample_table():
    return pa.table(
        {
            "i64": pa.array([1, None, -(1 << 60), 7, 0], pa.int64()),
            "i32": pa.array([5, 2, None, -9, 1 << 30], pa.int32()),
            "f64": pa.array([0.5, None, -3.25, 1e300, float("inf")]),
            "s": pa.array(["alpha", "", None, "δύο", "x" * 5000]),
            "b": pa.array([True, False, None, True, False]),
            "lst": pa.array(
                [[1.5, 2.5], [], None, [0.0], [9.0, 8.0, 7.0]],
                pa.list_(pa.float32()),
            ),
        }
    )


@pytest.mark.parametrize("codec", ["none", "snappy", "gzip", "zstd"])
@pytest.mark.parametrize("page_version", ["1.0", "2.0"])
@pytest.mark.parametrize("use_dict", [True, False])
def test_writer_matrix(codec, page_version, use_dict):
    t = _sample_table()
    raw = _write(
        t,
        compression=codec,
        data_page_version=page_version,
        use_dictionary=use_dict,
    )
    got = read_parquet_raw(raw)
    want = t.to_pydict()
    for k in want:
        assert got[k] == want[k], (k, codec, page_version, use_dict)


def test_multi_row_group_and_small_pages():
    t = pa.table({"x": pa.array(range(10000)), "y": pa.array(
        [f"row-{i}" for i in range(10000)]
    )})
    raw = _write(t, row_group_size=700, data_page_size=512)
    got = read_parquet_raw(raw)
    assert got["x"] == list(range(10000))
    assert got["y"] == [f"row-{i}" for i in range(10000)]


def test_out_of_scope_rejected():
    with pytest.raises(ParquetError, match="magic"):
        read_parquet_raw(b"not parquet")
    nested = pa.table(
        {"s": pa.array([{"a": 1}], pa.struct([("a", pa.int64())]))}
    )
    with pytest.raises(ParquetError, match="out of scope"):
        read_parquet_raw(_write(nested))


def test_delta_encodings_explicit():
    """Force the DELTA families via column_encoding so the 5/6/7 paths
    are pinned (v2 defaults often pick PLAIN for small pages)."""
    t = pa.table(
        {
            "i": pa.array(list(range(1000)) + [None, -5, 1 << 40], pa.int64()),
            "s": pa.array(
                [f"prefix-shared-{i:05d}" for i in range(1000)]
                + [None, "", "zz"]
            ),
        }
    )
    for enc in ("DELTA_BINARY_PACKED", None):
        raw = _write(
            t,
            use_dictionary=False,
            data_page_version="2.0",
            column_encoding={
                "i": enc or "DELTA_BINARY_PACKED",
                "s": "DELTA_BYTE_ARRAY",
            },
        )
        got = read_parquet_raw(raw)
        assert got["i"] == t.to_pydict()["i"]
        assert got["s"] == t.to_pydict()["s"]
    raw = _write(
        t,
        use_dictionary=False,
        column_encoding={
            "i": "DELTA_BINARY_PACKED",
            "s": "DELTA_LENGTH_BYTE_ARRAY",
        },
    )
    got = read_parquet_raw(raw)
    assert got["s"] == t.to_pydict()["s"]
