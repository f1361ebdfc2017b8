"""From-scratch ORC file reader (the public Apache ORC v1 spec).

Completes the columnar-source trilogy next to the raw Parquet and
SQLite readers: ORC's metadata is protobuf (parsed here with a generic
wire-format walker — varint/64-bit/length-delimited/32-bit), its
integer columns use RLEv2 with all four sub-encodings (short repeat,
direct, patched base, delta — 5-bit width code table, big-endian
MSB-first bit packing, zigzag for signed), presence bitmaps use ORC's
byte-RLE + MSB-first bits, and strings come as DIRECT_V2
(data+lengths) or DICTIONARY_V2 (indices+dict+lengths). Stream
compression framing (3-byte isOriginal headers) decodes through the
repo's OWN zlib/snappy/zstd codecs.

``pyarrow.orc`` (the real ORC C++ writer) is the untrusted producer in
tests and the registry query, across all four compression kinds.

Scope (loudly rejected otherwise): flat struct root with
boolean/byte/short/int/long/float/double/string/binary columns — the
shapes the repo's warehouse-ingest tier actually reads.
"""

from __future__ import annotations

import struct


class OrcError(ValueError):
    """Malformed or out-of-scope ORC file."""


# ---------------------------------------------------------------------------
# Generic protobuf wire-format walker
# ---------------------------------------------------------------------------


def _pb_varint(data: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 70:
            raise OrcError("runaway protobuf varint")


def _pb_message(data: bytes) -> dict[int, list]:
    out: dict[int, list] = {}
    pos = 0
    n = len(data)
    while pos < n:
        tag, pos = _pb_varint(data, pos)
        field, wtype = tag >> 3, tag & 7
        if wtype == 0:
            val, pos = _pb_varint(data, pos)
        elif wtype == 1:
            val = data[pos : pos + 8]
            pos += 8
        elif wtype == 2:
            ln, pos = _pb_varint(data, pos)
            val = data[pos : pos + ln]
            pos += ln
        elif wtype == 5:
            val = data[pos : pos + 4]
            pos += 4
        else:
            raise OrcError(f"protobuf wire type {wtype} out of scope")
        out.setdefault(field, []).append(val)
    return out


def _pb_zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _pb_uints(vals: list) -> list[int]:
    """Repeated uint field: accept both unpacked varints and packed
    length-delimited blobs (proto3 packs by default)."""
    out: list[int] = []
    for v in vals:
        if isinstance(v, int):
            out.append(v)
        else:
            pos = 0
            while pos < len(v):
                x, pos = _pb_varint(v, pos)
                out.append(x)
    return out


# ---------------------------------------------------------------------------
# ORC primitive decoders
# ---------------------------------------------------------------------------

_W5 = list(range(1, 25)) + [26, 28, 30, 32, 40, 48, 56, 64]


def _byte_rle(data: bytes) -> bytes:
    """ORC byte-run-length: control >= 0 run of (c+3), negative literals."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        c = data[pos]
        pos += 1
        if c < 128:  # run
            out += bytes([data[pos]]) * (c + 3)
            pos += 1
        else:  # 256-c literals
            ln = 256 - c
            out += data[pos : pos + ln]
            pos += ln
    return bytes(out)


def _bool_bits(data: bytes, count: int) -> list[bool]:
    raw = _byte_rle(data)
    out = []
    for byte in raw:
        for bit in range(7, -1, -1):
            out.append((byte >> bit) & 1 == 1)
            if len(out) == count:
                return out
    if len(out) < count:
        raise OrcError("presence bitmap shorter than value count")
    return out


def _unpack_be(data: bytes, pos: int, width: int, count: int) -> tuple[list[int], int]:
    """Big-endian MSB-first bit-packed unsigned ints."""
    nbits = width * count
    nbytes = (nbits + 7) // 8
    chunk = int.from_bytes(data[pos : pos + nbytes], "big")
    pad = nbytes * 8 - nbits
    chunk >>= pad
    mask = (1 << width) - 1
    out = [(chunk >> ((count - 1 - i) * width)) & mask for i in range(count)]
    return out, pos + nbytes


def _rle_v2(data: bytes, count: int, signed: bool) -> list[int]:
    """ORC integer RLE version 2: all four sub-encodings."""
    out: list[int] = []
    pos = 0
    while len(out) < count:
        b0 = data[pos]
        enc = b0 >> 6
        if enc == 0:  # short repeat
            width = ((b0 >> 3) & 0x07) + 1
            repeat = (b0 & 0x07) + 3
            val = int.from_bytes(data[pos + 1 : pos + 1 + width], "big")
            pos += 1 + width
            if signed:
                val = _pb_zigzag(val)
            out.extend([val] * repeat)
        elif enc == 1:  # direct
            width = _W5[(b0 >> 1) & 0x1F]
            ln = (((b0 & 1) << 8) | data[pos + 1]) + 1
            vals, pos = _unpack_be(data, pos + 2, width, ln)
            if signed:
                vals = [_pb_zigzag(v) for v in vals]
            out.extend(vals)
        elif enc == 3:  # delta
            wcode = (b0 >> 1) & 0x1F
            width = 0 if wcode == 0 else _W5[wcode]
            ln = (((b0 & 1) << 8) | data[pos + 1]) + 1
            pos += 2
            base, pos = _pb_varint(data, pos)
            base = _pb_zigzag(base) if signed else base
            delta_base, pos = _pb_varint(data, pos)
            delta_base = _pb_zigzag(delta_base)
            vals = [base]
            if ln > 1:
                vals.append(base + delta_base)
            if ln > 2:
                if width:
                    deltas, pos = _unpack_be(data, pos, width, ln - 2)
                else:
                    deltas = [abs(delta_base)] * (ln - 2)
                sign = 1 if delta_base >= 0 else -1
                for d in deltas:
                    vals.append(vals[-1] + sign * d)
            out.extend(vals)
        else:  # patched base
            width = _W5[(b0 >> 1) & 0x1F]
            ln = (((b0 & 1) << 8) | data[pos + 1]) + 1
            b2 = data[pos + 2]
            bw = ((b2 >> 5) & 0x07) + 1
            pw = _W5[b2 & 0x1F]
            b3 = data[pos + 3]
            pgw = ((b3 >> 5) & 0x07) + 1
            pll = b3 & 0x1F
            pos += 4
            base = int.from_bytes(data[pos : pos + bw], "big")
            sign_mask = 1 << (bw * 8 - 1)
            if base & sign_mask:
                base = -(base & (sign_mask - 1))
            pos += bw
            vals, pos = _unpack_be(data, pos, width, ln)
            patch_entry_w = pgw + pw
            # patch entries pack at an 8-aligned combined width
            cw = patch_entry_w
            for cand in (8, 16, 24, 32, 40, 48, 56, 64):
                if cand >= patch_entry_w:
                    cw = cand
                    break
            patches, pos = _unpack_be(data, pos, cw, pll)
            idx = 0
            for p in patches:
                gap = p >> pw
                patch = p & ((1 << pw) - 1)
                idx += gap
                vals[idx] |= patch << width
            out.extend(base + v for v in vals)
    return out[:count]


# ---------------------------------------------------------------------------
# File reading
# ---------------------------------------------------------------------------

_KIND_PRESENT = 0
_KIND_DATA = 1
_KIND_LENGTH = 2
_KIND_DICT_DATA = 3


def _make_decompressor(kind: int):
    if kind == 0:
        return None
    if kind == 1:  # ZLIB (raw deflate blocks)
        from sciscraper_ray.stages.inflate import inflate

        return lambda b: inflate(b)[0]
    if kind == 2:  # SNAPPY
        from sciscraper_ray.stages.snappy import snappy_decompress

        return snappy_decompress
    if kind == 5:  # ZSTD
        from sciscraper_ray.stages.zstd import zstd_decompress

        return zstd_decompress
    raise OrcError(f"compression kind {kind} out of scope")


def _unframe(data: bytes, decomp) -> bytes:
    """ORC compressed-stream framing: 3-byte (len << 1 | isOriginal)."""
    if decomp is None:
        return data
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        header = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        ln = header >> 1
        chunk = data[pos : pos + ln]
        pos += ln
        out += chunk if header & 1 else decomp(chunk)
    return bytes(out)


def read_orc_raw(data: bytes) -> dict[str, list]:
    """ORC bytes -> {column name: python values (None for nulls)}."""
    if data[:3] != b"ORC":
        raise OrcError("bad ORC magic")
    ps_len = data[-1]
    ps = _pb_message(data[-1 - ps_len : -1])
    footer_len = ps[1][0]
    comp_kind = ps.get(2, [0])[0]
    decomp = _make_decompressor(comp_kind)
    footer_raw = data[-1 - ps_len - footer_len : -1 - ps_len]
    footer = _pb_message(_unframe(footer_raw, decomp))
    types = [_pb_message(t) for t in footer.get(4, [])]
    if not types or types[0].get(1, [0])[0] != 12:
        raise OrcError("root type must be a struct")
    root = types[0]
    subtypes = _pb_uints(root.get(2, []))
    names = [n.decode("utf-8") for n in root.get(3, [])]
    col_types = []
    for st in subtypes:
        kind = types[st].get(1, [0])[0]
        if kind not in (0, 1, 2, 3, 4, 5, 6, 7, 8):
            raise OrcError(f"type kind {kind} out of scope")
        if types[st].get(2):
            raise OrcError("nested types out of scope")
        col_types.append(kind)
    columns: dict[str, list] = {n: [] for n in names}
    for stripe_raw in footer.get(3, []):
        stripe = _pb_message(stripe_raw)
        offset = stripe[1][0]
        index_len = stripe.get(2, [0])[0]
        data_len = stripe.get(3, [0])[0]
        sf_len = stripe[4][0]
        n_rows = stripe[5][0]
        sf = _pb_message(
            _unframe(
                data[
                    offset
                    + index_len
                    + data_len : offset
                    + index_len
                    + data_len
                    + sf_len
                ],
                decomp,
            )
        )
        streams = [_pb_message(s) for s in sf.get(1, [])]
        encodings = [_pb_message(e) for e in sf.get(2, [])]
        # per-(column, kind) stream bytes
        spos = offset
        chunks: dict[tuple[int, int], bytes] = {}
        for s in streams:
            kind = s.get(1, [0])[0]
            col = s.get(2, [0])[0]
            ln = s.get(3, [0])[0]
            chunks[(col, kind)] = data[spos : spos + ln]
            spos += ln
        for ci, (name, tkind) in enumerate(zip(names, col_types)):
            col_id = subtypes[ci]
            enc = encodings[col_id].get(1, [0])[0]

            def stream(kind, col_id=col_id):
                raw = chunks.get((col_id, kind))
                return None if raw is None else _unframe(raw, decomp)

            present_raw = stream(_KIND_PRESENT)
            present = (
                _bool_bits(present_raw, n_rows)
                if present_raw
                else [True] * n_rows
            )
            n_vals = sum(present)
            body = stream(_KIND_DATA)
            if tkind == 0:  # boolean
                vals = _bool_bits(body, n_vals)
            elif tkind in (1, 2, 3, 4):  # byte/short/int/long
                if tkind == 1:
                    vals = [
                        v - 256 if v > 127 else v for v in _byte_rle(body)
                    ][:n_vals]
                else:
                    if enc != 2:
                        raise OrcError("integer DIRECT v1 out of scope")
                    vals = _rle_v2(body, n_vals, signed=True)
            elif tkind == 5:  # float
                vals = list(struct.unpack(f"<{n_vals}f", body))
            elif tkind == 6:  # double
                vals = list(struct.unpack(f"<{n_vals}d", body))
            elif tkind in (7, 8):  # string / binary
                lengths_raw = stream(_KIND_LENGTH)
                if enc in (2,):  # DIRECT_V2
                    lengths = _rle_v2(lengths_raw, n_vals, signed=False)
                    vals = []
                    p = 0
                    for ln in lengths:
                        vals.append(body[p : p + ln])
                        p += ln
                elif enc == 3:  # DICTIONARY_V2
                    dict_size = encodings[col_id].get(2, [0])[0]
                    dict_bytes = stream(_KIND_DICT_DATA) or b""
                    lengths = _rle_v2(lengths_raw, dict_size, signed=False)
                    table = []
                    p = 0
                    for ln in lengths:
                        table.append(dict_bytes[p : p + ln])
                        p += ln
                    idx = _rle_v2(body, n_vals, signed=False)
                    vals = [table[i] for i in idx]
                else:
                    raise OrcError(f"string encoding {enc} out of scope")
                if tkind == 7:
                    vals = [v.decode("utf-8") for v in vals]
            it = iter(vals)
            columns[name].extend(next(it) if p else None for p in present)
    return columns
