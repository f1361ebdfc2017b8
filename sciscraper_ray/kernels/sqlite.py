"""From-scratch SQLite database-file reader (the public file-format spec).

Crawl and annotation tooling ships metadata as SQLite files (the
reference's own ecosystem stores run state this way); a distributed
engine should read the rows straight from the file bytes instead of
shelling out per file. This kernel implements the read path of the
documented format:

- 100-byte header: magic, page size (1 => 65536), reserved-space byte,
  UTF-8 text encoding check.
- Table b-trees: leaf (0x0D) and interior (0x05) pages, cell pointer
  arrays, depth-first rowid-ordered walks from any root page.
- Varints (1..9 bytes, big-endian 7-bit groups, 9th byte whole).
- The record format: header of serial types, then NULL / 1..8-byte
  big-endian signed ints / float64 / constants 0,1 / blob / text
  payloads.
- Payload overflow chains (maxLocal/minLocal split per the spec's
  usable-space formulas, 4-byte next-page links).
- ``sqlite_master`` bootstrapping (table name -> root page).

stdlib ``sqlite3`` (the real SQLite) is the untrusted producer in
tests and the registry query. Index b-trees, WAL files and non-UTF-8
encodings are out of scope (rejected loudly) — the read path a corpus
pipeline needs is table scans.
"""

from __future__ import annotations

import struct


class SqliteError(ValueError):
    """Malformed or out-of-scope SQLite file."""


_MAGIC = b"SQLite format 3\x00"


def _varint(data: bytes, pos: int) -> tuple[int, int]:
    out = 0
    for i in range(8):
        b = data[pos + i]
        out = (out << 7) | (b & 0x7F)
        if not b & 0x80:
            return out, pos + i + 1
    return (out << 8) | data[pos + 8], pos + 9


def _read_serial(data: bytes, pos: int, stype: int):
    if stype == 0:
        return None, pos
    if 1 <= stype <= 6:
        n = (1, 2, 3, 4, 6, 8)[stype - 1]
        val = int.from_bytes(data[pos : pos + n], "big", signed=True)
        return val, pos + n
    if stype == 7:
        return struct.unpack_from(">d", data, pos)[0], pos + 8
    if stype == 8:
        return 0, pos
    if stype == 9:
        return 1, pos
    if stype >= 12:
        n = (stype - 12) // 2 if stype % 2 == 0 else (stype - 13) // 2
        raw = data[pos : pos + n]
        return (raw if stype % 2 == 0 else raw.decode("utf-8")), pos + n
    raise SqliteError(f"reserved serial type {stype}")


def _decode_record(payload: bytes) -> list:
    hlen, pos = _varint(payload, 0)
    stypes = []
    while pos < hlen:
        st, pos = _varint(payload, pos)
        stypes.append(st)
    if pos != hlen:
        raise SqliteError("record header length mismatch")
    out = []
    for st in stypes:
        val, pos = _read_serial(payload, pos, st)
        out.append(val)
    return out


class SqliteFile:
    def __init__(self, data: bytes) -> None:
        if data[:16] != _MAGIC:
            raise SqliteError("bad SQLite magic")
        (page_size,) = struct.unpack_from(">H", data, 16)
        self.page_size = 65536 if page_size == 1 else page_size
        self.reserved = data[20]
        (encoding,) = struct.unpack_from(">I", data, 56)
        if encoding != 1:
            raise SqliteError("non-UTF-8 text encodings out of scope")
        self.data = data
        self.usable = self.page_size - self.reserved

    def _page(self, number: int) -> tuple[bytes, int]:
        """(page bytes, header offset within page) — page 1 embeds the
        100-byte file header."""
        start = (number - 1) * self.page_size
        page = self.data[start : start + self.page_size]
        if len(page) < self.page_size:
            raise SqliteError(f"truncated page {number}")
        return page, 100 if number == 1 else 0

    def _cell_payload(self, page: bytes, pos: int) -> tuple[int, bytes, int]:
        """Leaf-table cell -> (rowid, full payload incl. overflow, end)."""
        payload_len, pos = _varint(page, pos)
        rowid, pos = _varint(page, pos)
        usable = self.usable
        max_local = usable - 35
        if payload_len <= max_local:
            return rowid, page[pos : pos + payload_len], pos + payload_len
        min_local = (usable - 12) * 32 // 255 - 23
        k = min_local + (payload_len - min_local) % (usable - 4)
        local = k if k <= max_local else min_local
        chunks = [page[pos : pos + local]]
        (next_page,) = struct.unpack_from(">I", page, pos + local)
        remaining = payload_len - local
        while remaining > 0:
            if next_page == 0:
                raise SqliteError("overflow chain ended early")
            opage, _ = self._page(next_page)
            (next_page,) = struct.unpack_from(">I", opage, 0)
            take = min(remaining, usable - 4)
            chunks.append(opage[4 : 4 + take])
            remaining -= take
        return rowid, b"".join(chunks), pos + local + 4

    def _walk(self, page_no: int, out: list) -> None:
        page, hoff = self._page(page_no)
        ptype = page[hoff]
        (ncells,) = struct.unpack_from(">H", page, hoff + 3)
        if ptype == 0x0D:  # leaf table
            for c in range(ncells):
                (cell_off,) = struct.unpack_from(
                    ">H", page, hoff + 8 + 2 * c
                )
                rowid, payload, _ = self._cell_payload(page, cell_off)
                out.append((rowid, _decode_record(payload)))
        elif ptype == 0x05:  # interior table
            for c in range(ncells):
                (cell_off,) = struct.unpack_from(
                    ">H", page, hoff + 12 + 2 * c
                )
                (child,) = struct.unpack_from(">I", page, cell_off)
                self._walk(child, out)
            (rightmost,) = struct.unpack_from(">I", page, hoff + 8)
            self._walk(rightmost, out)
        else:
            raise SqliteError(f"unsupported page type {ptype:#x}")

    def tables(self) -> dict[str, int]:
        """sqlite_master scan -> {table name: root page}."""
        rows: list = []
        self._walk(1, rows)
        out = {}
        for _rowid, rec in rows:
            if len(rec) >= 4 and rec[0] == "table":
                out[rec[1]] = rec[3]
        return out

    def rows(self, table: str) -> list[tuple[int, list]]:
        """All (rowid, values) of a table in rowid order. INTEGER
        PRIMARY KEY columns are stored as NULL in the record — the
        caller substitutes the rowid (SQLite's aliasing rule)."""
        roots = self.tables()
        if table not in roots:
            raise SqliteError(f"no such table {table!r}")
        out: list = []
        self._walk(roots[table], out)
        return out
