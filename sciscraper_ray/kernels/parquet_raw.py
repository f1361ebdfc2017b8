"""From-scratch Parquet file reader (public parquet-format spec).

The engine's OWN input format, read from raw bytes with no pyarrow
parsing: Thrift compact-protocol metadata (varints, zigzag, field-delta
headers, nested structs/lists), the flat-schema subset every table in
this repo uses, v1 and v2 data pages, dictionary pages,
RLE/bit-packed-hybrid decoding for both definition levels and
dictionary indices, PLAIN decoding for INT32/INT64/DOUBLE/BYTE_ARRAY/
BOOLEAN, and page decompression through the repo's OWN codec tier —
Snappy (stages/snappy.py, the default Parquet page codec), gzip/zlib
(stages/inflate.py), and zstd (stages/zstd.py). pyarrow is the
untrusted producer: parity tests read real files written at different
page versions, codecs, and dictionary settings.

Scope (loudly rejected otherwise): flat schemas (no repeated/nested
groups — max_rep 0), the physical types above, codecs
UNCOMPRESSED/SNAPPY/GZIP/ZSTD. That covers every table in
/root/testdata and the overwhelming majority of corpus shards in the
wild.
"""

from __future__ import annotations

import struct


class ParquetError(ValueError):
    """Malformed or out-of-scope Parquet file."""


# ---------------------------------------------------------------------------
# Thrift compact protocol (generic: unknown fields are parsed and kept)
# ---------------------------------------------------------------------------

_CT_STOP = 0
_CT_TRUE = 1
_CT_FALSE = 2
_CT_BYTE = 3
_CT_I16 = 4
_CT_I32 = 5
_CT_I64 = 6
_CT_DOUBLE = 7
_CT_BINARY = 8
_CT_LIST = 9
_CT_SET = 10
_CT_MAP = 11
_CT_STRUCT = 12


class _Thrift:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos

    def varint(self) -> int:
        out = 0
        shift = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            out |= (b & 0x7F) << shift
            if not b & 0x80:
                return out
            shift += 7
            if shift > 70:
                raise ParquetError("runaway thrift varint")

    def zigzag(self) -> int:
        v = self.varint()
        return (v >> 1) ^ -(v & 1)

    def _value(self, ctype: int):
        if ctype == _CT_TRUE:
            return True
        if ctype == _CT_FALSE:
            return False
        if ctype == _CT_BYTE:
            v = self.data[self.pos]
            self.pos += 1
            return v - 256 if v > 127 else v
        if ctype in (_CT_I16, _CT_I32, _CT_I64):
            return self.zigzag()
        if ctype == _CT_DOUBLE:
            (v,) = struct.unpack_from("<d", self.data, self.pos)
            self.pos += 8
            return v
        if ctype == _CT_BINARY:
            n = self.varint()
            out = self.data[self.pos : self.pos + n]
            self.pos += n
            return out
        if ctype in (_CT_LIST, _CT_SET):
            head = self.data[self.pos]
            self.pos += 1
            etype = head & 0x0F
            size = head >> 4
            if size == 15:
                size = self.varint()
            # bools inside lists are full bytes (1 = true)
            if etype in (_CT_TRUE, _CT_FALSE):
                out = [self.data[self.pos + i] == 1 for i in range(size)]
                self.pos += size
                return out
            return [self._value(etype) for _ in range(size)]
        if ctype == _CT_STRUCT:
            return self.struct()
        if ctype == _CT_MAP:
            size = self.varint()
            if size == 0:
                return {}
            kv = self.data[self.pos]
            self.pos += 1
            ktype, vtype = kv >> 4, kv & 0x0F
            return {
                self._value(ktype): self._value(vtype) for _ in range(size)
            }
        raise ParquetError(f"unknown thrift compact type {ctype}")

    def struct(self) -> dict[int, object]:
        out: dict[int, object] = {}
        field_id = 0
        while True:
            head = self.data[self.pos]
            self.pos += 1
            if head == _CT_STOP:
                return out
            delta = head >> 4
            ctype = head & 0x0F
            if delta:
                field_id += delta
            else:
                field_id = self.zigzag()
            out[field_id] = self._value(ctype)


# ---------------------------------------------------------------------------
# RLE / bit-packed hybrid (parquet-format Encodings.md)
# ---------------------------------------------------------------------------


def _hybrid(data: bytes, pos: int, bit_width: int, count: int, end: int):
    """Decode ``count`` values; returns (values, next pos)."""
    out: list[int] = []
    if bit_width == 0:
        return [0] * count, pos
    byte_w = (bit_width + 7) // 8
    while len(out) < count:
        if pos >= end:
            raise ParquetError("hybrid run truncated")
        t = _Thrift(data, pos)
        header = t.varint()
        pos = t.pos
        if header & 1:  # bit-packed: groups of 8
            groups = header >> 1
            total_bits = groups * 8 * bit_width
            nbytes = (total_bits + 7) // 8
            chunk = data[pos : pos + nbytes]
            pos += nbytes
            val = int.from_bytes(chunk, "little")
            mask = (1 << bit_width) - 1
            n = min(groups * 8, count - len(out))
            for i in range(n):
                out.append((val >> (i * bit_width)) & mask)
        else:  # RLE run
            run = header >> 1
            v = int.from_bytes(data[pos : pos + byte_w], "little")
            pos += byte_w
            out.extend([v] * min(run, count - len(out)))
    return out, pos


# ---------------------------------------------------------------------------
# Value decoding
# ---------------------------------------------------------------------------

_TYPE_BOOLEAN = 0
_TYPE_INT32 = 1
_TYPE_INT64 = 2
_TYPE_FLOAT = 4
_TYPE_DOUBLE = 5
_TYPE_BYTE_ARRAY = 6


def _plain(data: bytes, ptype: int, count: int) -> list:
    pos = 0
    out: list = []
    if ptype == _TYPE_INT32:
        return list(struct.unpack_from(f"<{count}i", data, 0))
    if ptype == _TYPE_INT64:
        return list(struct.unpack_from(f"<{count}q", data, 0))
    if ptype == _TYPE_FLOAT:
        return list(struct.unpack_from(f"<{count}f", data, 0))
    if ptype == _TYPE_DOUBLE:
        return list(struct.unpack_from(f"<{count}d", data, 0))
    if ptype == _TYPE_BYTE_ARRAY:
        for _ in range(count):
            (n,) = struct.unpack_from("<I", data, pos)
            pos += 4
            out.append(data[pos : pos + n])
            pos += n
        return out
    if ptype == _TYPE_BOOLEAN:
        val = int.from_bytes(data, "little")
        return [(val >> i) & 1 == 1 for i in range(count)]
    raise ParquetError(f"physical type {ptype} out of scope")


def _delta_binary_packed(data: bytes, pos: int, want: int | None = None):
    """DELTA_BINARY_PACKED ints -> (values, next pos) (Encodings.md)."""
    t = _Thrift(data, pos)
    block_size = t.varint()
    n_mini = t.varint()
    total = t.varint()
    first = t.zigzag()
    if want is not None and total < want:
        raise ParquetError("delta header count too small")
    per_mini = block_size // n_mini
    out = [first]
    pos = t.pos
    while len(out) < total:
        t = _Thrift(data, pos)
        min_delta = t.zigzag()
        pos = t.pos
        widths = data[pos : pos + n_mini]
        pos += n_mini
        for m in range(n_mini):
            if len(out) >= total:
                break
            bw = widths[m]
            nbytes = (per_mini * bw + 7) // 8
            chunk = int.from_bytes(data[pos : pos + nbytes], "little")
            pos += nbytes
            mask = (1 << bw) - 1
            for i in range(per_mini):
                if len(out) >= total:
                    break
                delta = (chunk >> (i * bw)) & mask
                out.append(out[-1] + min_delta + delta)
    return out[: want if want is not None else total], pos


def _delta_length_byte_array(data: bytes, count: int) -> list:
    lengths, pos = _delta_binary_packed(data, 0, count)
    out = []
    for ln in lengths:
        out.append(data[pos : pos + ln])
        pos += ln
    return out


def _delta_byte_array(data: bytes, count: int) -> list:
    prefixes, pos = _delta_binary_packed(data, 0, count)
    suffixes, pos = _delta_binary_packed(data, pos, count)
    out: list[bytes] = []
    prev = b""
    for pre, suf in zip(prefixes, suffixes):
        cur = prev[:pre] + data[pos : pos + suf]
        pos += suf
        out.append(cur)
        prev = cur
    return out


def _decompress(raw: bytes, codec: int, uncompressed_size: int) -> bytes:
    if codec == 0:  # UNCOMPRESSED
        return raw
    if codec == 1:  # SNAPPY — the repo's own decoder
        from sciscraper_ray.stages.snappy import snappy_decompress

        return snappy_decompress(raw)
    if codec == 2:  # GZIP — own inflater
        from sciscraper_ray.stages.inflate import gzip_decompress

        return gzip_decompress(raw)
    if codec == 6:  # ZSTD — own decoder
        from sciscraper_ray.stages.zstd import zstd_decompress

        return zstd_decompress(raw)
    raise ParquetError(f"codec {codec} out of scope")


# ---------------------------------------------------------------------------
# File reading
# ---------------------------------------------------------------------------


def read_parquet_raw(data: bytes) -> dict[str, list]:
    """Parquet bytes -> {column name: python values (None for nulls)}."""
    if data[:4] != b"PAR1" or data[-4:] != b"PAR1":
        raise ParquetError("bad parquet magic")
    (meta_len,) = struct.unpack_from("<I", data, len(data) - 8)
    meta_start = len(data) - 8 - meta_len
    meta = _Thrift(data, meta_start).struct()
    schema = meta[2]  # list<SchemaElement>
    num_rows = meta[3]
    row_groups = meta[4]
    # schema walk: flat primitives, plus the standard 3-level LIST shape
    # (optional group (LIST) > repeated group > primitive element)
    columns = []
    i = 1
    while i < len(schema):
        el = schema[i]
        n_children = el.get(5, 0)
        rep = el.get(3, 0)  # 0 required, 1 optional, 2 repeated
        if not n_children:
            if rep == 2:
                raise ParquetError("bare repeated fields out of scope")
            columns.append(
                {
                    "name": el[4].decode("utf-8"),
                    "path": [el[4].decode("utf-8")],
                    "kind": "flat",
                    "type": el[1],
                    "max_def": 1 if rep == 1 else 0,
                    "max_rep": 0,
                    "values": [],
                }
            )
            i += 1
            continue
        # group: accept only LIST<primitive>
        mid = schema[i + 1] if i + 1 < len(schema) else {}
        leaf = schema[i + 2] if i + 2 < len(schema) else {}
        if (
            n_children == 1
            and mid.get(3) == 2  # repeated
            and mid.get(5, 0) == 1
            and not leaf.get(5, 0)
        ):
            leaf_rep = leaf.get(3, 0)
            max_def = (1 if rep == 1 else 0) + 1 + (
                1 if leaf_rep == 1 else 0
            )
            columns.append(
                {
                    "name": el[4].decode("utf-8"),
                    "path": [
                        el[4].decode("utf-8"),
                        mid[4].decode("utf-8"),
                        leaf[4].decode("utf-8"),
                    ],
                    "kind": "list",
                    "type": leaf[1],
                    "max_def": max_def,
                    "max_rep": 1,
                    "values": [],
                }
            )
            i += 3
            continue
        raise ParquetError("nested schemas out of scope (flat + LIST only)")
    for rg in row_groups:
        for ci, chunk in enumerate(rg[1]):  # list<ColumnChunk>
            cmd = chunk[3]  # ColumnMetaData
            col = columns[ci]
            path = [p.decode("utf-8") for p in cmd[3]]
            if path != col["path"]:
                raise ParquetError("column order / path mismatch")
            codec = cmd[4]
            n_values = cmd[5]
            pos = min(
                p for p in (cmd.get(11), cmd[9]) if p is not None
            )
            dictionary: list | None = None
            got = 0
            while got < n_values:
                header = _Thrift(data, pos)
                ph = header.struct()
                pos = header.pos
                ptype = ph[1]
                comp_size = ph[3]
                raw = data[pos : pos + comp_size]
                pos += comp_size
                if ptype == 2:  # DICTIONARY_PAGE
                    dph = ph[7]
                    page = _decompress(raw, codec, ph[2])
                    dictionary = _plain(page, col["type"], dph[1])
                    continue
                def_w = max(col["max_def"], 0).bit_length() if col[
                    "max_def"
                ] else 0
                rep_w = 1 if col["max_rep"] else 0
                if ptype == 0:  # DATA_PAGE (v1)
                    dp = ph[5]
                    n = dp[1]
                    encoding = dp[2]
                    page = _decompress(raw, codec, ph[2])
                    p2 = 0
                    reps = [0] * n
                    if rep_w:
                        (lvl_len,) = struct.unpack_from("<I", page, p2)
                        reps, _ = _hybrid(
                            page, p2 + 4, rep_w, n, p2 + 4 + lvl_len
                        )
                        p2 += 4 + lvl_len
                    if def_w:
                        (lvl_len,) = struct.unpack_from("<I", page, p2)
                        levels, _ = _hybrid(
                            page, p2 + 4, def_w, n, p2 + 4 + lvl_len
                        )
                        p2 += 4 + lvl_len
                    else:
                        levels = [col["max_def"]] * n
                    body = page[p2:]
                elif ptype == 3:  # DATA_PAGE_V2
                    dp = ph[8]
                    n = dp[1]
                    encoding = dp[4]
                    dl_len = dp.get(5, 0)
                    rl_len = dp.get(6, 0)
                    reps = [0] * n
                    if rl_len:
                        reps, _ = _hybrid(raw, 0, rep_w, n, rl_len)
                    if def_w and dl_len:
                        levels, _ = _hybrid(
                            raw, rl_len, def_w, n, rl_len + dl_len
                        )
                    else:
                        levels = [col["max_def"]] * n
                    body_raw = raw[dl_len + rl_len :]
                    body = (
                        _decompress(
                            body_raw, codec, ph[2] - dl_len - rl_len
                        )
                        if dp.get(7, True)
                        else body_raw
                    )
                else:
                    raise ParquetError(f"page type {ptype} out of scope")
                n_def = sum(1 for lv in levels if lv == col["max_def"])
                if encoding == 0:  # PLAIN
                    vals = _plain(body, col["type"], n_def)
                elif encoding in (2, 8):  # PLAIN_DICTIONARY / RLE_DICTIONARY
                    if dictionary is None:
                        raise ParquetError("dictionary page missing")
                    bw = body[0]
                    idx, _ = _hybrid(body, 1, bw, n_def, len(body))
                    vals = [dictionary[i] for i in idx]
                elif encoding == 5:  # DELTA_BINARY_PACKED
                    vals, _ = _delta_binary_packed(body, 0, n_def)
                elif encoding == 6:  # DELTA_LENGTH_BYTE_ARRAY
                    vals = _delta_length_byte_array(body, n_def)
                elif encoding == 7:  # DELTA_BYTE_ARRAY
                    vals = _delta_byte_array(body, n_def)
                elif encoding == 3:  # RLE (boolean values, 4-byte prefix)
                    (rle_len,) = struct.unpack_from("<I", body, 0)
                    bits, _ = _hybrid(body, 4, 1, n_def, 4 + rle_len)
                    vals = [bit == 1 for bit in bits]
                else:
                    raise ParquetError(f"encoding {encoding} out of scope")
                it = iter(vals)
                if col["kind"] == "flat":
                    col["values"].extend(
                        next(it) if lv == col["max_def"] else None
                        for lv in levels
                    )
                else:  # list assembly from (rep, def) pairs
                    md = col["max_def"]
                    rows = col["values"]
                    for rv, lv in zip(reps, levels):
                        if rv == 0:  # new row
                            if lv == 0:
                                rows.append(None)
                                continue
                            if lv == md - 2:
                                rows.append([])
                                continue
                            rows.append([])
                        cur = rows[-1]
                        cur.append(next(it) if lv == md else None)
                got += n
    out = {}
    for col in columns:
        if len(col["values"]) != num_rows:
            raise ParquetError(
                f"column {col['name']}: {len(col['values'])} != {num_rows}"
            )
        if col["type"] == _TYPE_BYTE_ARRAY:
            col["values"] = [
                v.decode("utf-8") if isinstance(v, bytes) else v
                for v in col["values"]
            ]
        out[col["name"]] = col["values"]
    return out
