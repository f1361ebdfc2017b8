"""From-scratch SQLite file reader: real sqlite3 as producer, covering
multi-page table b-trees, overflow chains, every serial-type family,
and the INTEGER PRIMARY KEY rowid-aliasing rule."""

from __future__ import annotations

import os
import random
import sqlite3
import tempfile

import pytest

from sciscraper_ray.kernels.sqlite import SqliteError, SqliteFile


def _build(rows, extra_sql=()):
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.db")
        con = sqlite3.connect(path)
        con.execute(
            "CREATE TABLE docs (id INTEGER PRIMARY KEY, name TEXT,"
            " score REAL, body BLOB, flag INTEGER)"
        )
        for sql in extra_sql:
            con.execute(sql)
        con.executemany("INSERT INTO docs VALUES (?,?,?,?,?)", rows)
        con.commit()
        con.close()
        return open(path, "rb").read()


def test_btree_walk_serial_types_and_overflow():
    rng = random.Random(7)
    want = []
    for i in range(2000):
        want.append(
            (
                i + 1,
                "doc-%05d" % i,
                i / 7.0,
                bytes(rng.randrange(256) for _ in range(rng.randrange(400))),
                rng.choice([None, 0, 1, -5, 123456789012345]),
            )
        )
    want.append((999999, "big", 1.5, b"Z" * 50000, 7))  # overflow chain
    f = SqliteFile(_build(want))
    assert f.tables().keys() == {"docs"}
    rows = f.rows("docs")
    assert len(rows) == len(want)
    for (rowid, rec), w in zip(rows, sorted(want)):
        vals = [rowid if rec[0] is None else rec[0]] + rec[1:]
        assert tuple(vals) == w


def test_second_table_and_missing_table():
    data = _build(
        [(1, "a", 0.5, b"", None)],
        extra_sql=["CREATE TABLE other (x TEXT)"],
    )
    f = SqliteFile(data)
    assert set(f.tables()) == {"docs", "other"}
    assert f.rows("other") == []
    with pytest.raises(SqliteError, match="no such table"):
        f.rows("nope")


def test_malformed_rejected():
    with pytest.raises(SqliteError, match="magic"):
        SqliteFile(b"not a database at all" + b"\x00" * 100)
    good = _build([(1, "a", 0.5, b"", None)])
    with pytest.raises(SqliteError):
        SqliteFile(good[: len(good) // 2]).rows("docs")
