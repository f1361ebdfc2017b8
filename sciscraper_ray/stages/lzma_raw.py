"""From-scratch LZMA decoder (the public LZMA specification, 7-Zip SDK).

The last stdlib compression format without an owned decoder (zlib,
gzip, bz2 all decode through this repo already): LZMA's binary range
coder with adaptive 11-bit probabilities, the 12-state literal/match
state machine, matched-literal decoding, bit-tree length and
position-slot coders, aligned/direct distance bits, and the four-slot
repeat-distance history. This module decodes:

- ``.lzma`` ("alone") streams: 13-byte header (properties byte ->
  lc/lp/pb, dict size, uncompressed size) + one LZMA1 stream, with
  end-marker handling for unknown sizes.

stdlib ``lzma`` (the real liblzma) with ``FORMAT_ALONE`` is the
untrusted producer in tests and the registry query. Per-payload
sequential work — ``map_batches`` like the other codecs; the range
coder's bit-level dependence is inherent to the format.
"""

from __future__ import annotations

import struct


class LzmaError(ValueError):
    """Malformed LZMA stream."""


_K_TOP = 1 << 24
_INIT_PROB = 1024  # 2048 / 2


class _RangeDecoder:
    __slots__ = ("data", "pos", "code", "range")

    def __init__(self, data: bytes, pos: int) -> None:
        if data[pos] != 0:
            raise LzmaError("first range-coder byte must be zero")
        self.data = data
        self.code = int.from_bytes(data[pos + 1 : pos + 5], "big")
        self.range = 0xFFFFFFFF
        self.pos = pos + 5

    def _normalize(self) -> None:
        if self.range < _K_TOP:
            if self.pos >= len(self.data):
                raise LzmaError("range coder ran out of input")
            self.range = (self.range << 8) & 0xFFFFFFFF
            self.code = ((self.code << 8) | self.data[self.pos]) & 0xFFFFFFFF
            self.pos += 1

    def bit(self, probs: list[int], i: int) -> int:
        bound = (self.range >> 11) * probs[i]
        if self.code < bound:
            self.range = bound
            probs[i] += (2048 - probs[i]) >> 5
            b = 0
        else:
            self.range -= bound
            self.code -= bound
            probs[i] -= probs[i] >> 5
            b = 1
        self._normalize()
        return b

    def direct_bits(self, n: int) -> int:
        out = 0
        for _ in range(n):
            self.range >>= 1
            # uint32 wraparound semantics: mask BEFORE the sign-bit test
            self.code = (self.code - self.range) & 0xFFFFFFFF
            t = 0 - (self.code >> 31)  # 0 (bit 1) or -1 (bit 0)
            self.code = (self.code + (self.range & t)) & 0xFFFFFFFF
            self._normalize()
            out = (out << 1) + (t + 1)
        return out

    def bit_tree(self, probs: list[int], nbits: int) -> int:
        m = 1
        for _ in range(nbits):
            m = (m << 1) + self.bit(probs, m)
        return m - (1 << nbits)

    def bit_tree_reverse(self, probs: list[int], nbits: int) -> int:
        m = 1
        out = 0
        for i in range(nbits):
            b = self.bit(probs, m)
            m = (m << 1) + b
            out |= b << i
        return out

    def finished(self) -> bool:
        return self.code == 0


class _LenDecoder:
    __slots__ = ("choice", "low", "mid", "high")

    def __init__(self, n_pos_states: int) -> None:
        self.choice = [_INIT_PROB] * 2
        self.low = [[_INIT_PROB] * 8 for _ in range(n_pos_states)]
        self.mid = [[_INIT_PROB] * 8 for _ in range(n_pos_states)]
        self.high = [_INIT_PROB] * 256

    def decode(self, rc: _RangeDecoder, pos_state: int) -> int:
        if not rc.bit(self.choice, 0):
            return rc.bit_tree(self.low[pos_state], 3)
        if not rc.bit(self.choice, 1):
            return 8 + rc.bit_tree(self.mid[pos_state], 3)
        return 16 + rc.bit_tree(self.high, 8)


class _Lzma1State:
    """Probability models + machine state, persistable across LZMA2
    chunks (reset modes control which parts survive)."""

    def __init__(self, lc: int, lp: int, pb: int) -> None:
        self.set_props(lc, lp, pb)
        self.reset_state()

    def set_props(self, lc: int, lp: int, pb: int) -> None:
        self.lc, self.lp, self.pb = lc, lp, pb

    def reset_state(self) -> None:
        lc, lp, pb = self.lc, self.lp, self.pb
        n_pos_states = 1 << pb
        self.is_match = [[_INIT_PROB] * n_pos_states for _ in range(12)]
        self.is_rep = [_INIT_PROB] * 12
        self.is_rep_g0 = [_INIT_PROB] * 12
        self.is_rep_g1 = [_INIT_PROB] * 12
        self.is_rep_g2 = [_INIT_PROB] * 12
        self.is_rep0_long = [
            [_INIT_PROB] * n_pos_states for _ in range(12)
        ]
        self.literal = [
            [_INIT_PROB] * 0x300 for _ in range(1 << (lc + lp))
        ]
        self.pos_slot = [[_INIT_PROB] * 64 for _ in range(4)]
        self.spec_pos = [_INIT_PROB] * 115
        self.align_probs = [_INIT_PROB] * 16
        self.len_dec = _LenDecoder(n_pos_states)
        self.rep_len_dec = _LenDecoder(n_pos_states)
        self.state = 0
        self.rep0 = self.rep1 = self.rep2 = self.rep3 = 0


def _decode_lzma1(
    data: bytes,
    pos: int,
    st: "_Lzma1State",
    out: bytearray,
    out_size: int | None,
) -> int:
    """Decode one range-coded stream into ``out`` (which may already
    hold window history); returns the position past the consumed input.
    ``out_size`` is the ABSOLUTE output length to stop at (None = run
    to the end marker)."""
    rc = _RangeDecoder(data, pos)
    lc, lp, pb = st.lc, st.lp, st.pb
    n_pos_states = 1 << pb
    is_match = st.is_match
    is_rep = st.is_rep
    is_rep_g0 = st.is_rep_g0
    is_rep_g1 = st.is_rep_g1
    is_rep_g2 = st.is_rep_g2
    is_rep0_long = st.is_rep0_long
    literal = st.literal
    pos_slot = st.pos_slot
    spec_pos = st.spec_pos
    align_probs = st.align_probs
    len_dec = st.len_dec
    rep_len_dec = st.rep_len_dec
    state = st.state
    rep0, rep1, rep2, rep3 = st.rep0, st.rep1, st.rep2, st.rep3
    lp_mask = (1 << lp) - 1
    while out_size is None or len(out) < out_size:
        pos_state = len(out) & (n_pos_states - 1)
        if not rc.bit(is_match[state], pos_state):
            prev = out[-1] if out else 0
            lit_state = (
                ((len(out) & lp_mask) << lc) | (prev >> (8 - lc))
                if lc
                else (len(out) & lp_mask) << lc
            )
            probs = literal[lit_state]
            if state >= 7:  # matched literal
                match_byte = out[len(out) - rep0 - 1]
                symbol = 1
                while symbol < 0x100:
                    match_bit = (match_byte >> 7) & 1
                    match_byte = (match_byte << 1) & 0xFF
                    b = rc.bit(
                        probs, ((1 + match_bit) << 8) + symbol
                    )
                    symbol = (symbol << 1) | b
                    if match_bit != b:
                        break
                while symbol < 0x100:
                    symbol = (symbol << 1) | rc.bit(probs, symbol)
            else:
                symbol = 1
                while symbol < 0x100:
                    symbol = (symbol << 1) | rc.bit(probs, symbol)
            out.append(symbol & 0xFF)
            state = 0 if state < 4 else (state - 3 if state < 10 else state - 6)
            continue
        if rc.bit(is_rep, state):  # repeated match
            if not out:
                raise LzmaError("rep match with empty output")
            if not rc.bit(is_rep_g0, state):
                if not rc.bit(is_rep0_long[state], pos_state):
                    # short rep: one byte at rep0
                    state = 9 if state < 7 else 11
                    out.append(out[len(out) - rep0 - 1])
                    continue
            else:
                if not rc.bit(is_rep_g1, state):
                    dist = rep1
                else:
                    if not rc.bit(is_rep_g2, state):
                        dist = rep2
                    else:
                        dist = rep3
                        rep3 = rep2
                    rep2 = rep1
                rep1 = rep0
                rep0 = dist
            length = rep_len_dec.decode(rc, pos_state) + 2
            state = 8 if state < 7 else 11
        else:  # new match
            rep3, rep2, rep1 = rep2, rep1, rep0
            length = len_dec.decode(rc, pos_state) + 2
            state = 7 if state < 7 else 10
            len_to_pos = min(length - 2, 3)
            slot = rc.bit_tree(pos_slot[len_to_pos], 6)
            if slot < 4:
                rep0 = slot
            else:
                n_direct = (slot >> 1) - 1
                rep0 = (2 | (slot & 1)) << n_direct
                if slot < 14:
                    # reverse bit tree over SpecPos[rep0 - slot - 1 ...]
                    base = rep0 - slot - 1
                    m = 1
                    for i in range(n_direct):
                        b = rc.bit(spec_pos, base + m)
                        m = (m << 1) + b
                        rep0 |= b << i
                else:
                    rep0 += rc.direct_bits(n_direct - 4) << 4
                    rep0 += rc.bit_tree_reverse(align_probs, 4)
                    rep0 &= 0xFFFFFFFF
            if rep0 == 0xFFFFFFFF:  # end marker
                if out_size is not None and len(out) != out_size:
                    raise LzmaError("end marker before declared size")
                rep0 = st.rep0  # marker does not become a distance
                break
        if rep0 >= len(out):
            raise LzmaError("match distance beyond output start")
        start = len(out) - rep0 - 1
        for i in range(length):
            out.append(out[start + i])
    st.state = state
    st.rep0, st.rep1, st.rep2, st.rep3 = rep0, rep1, rep2, rep3
    return rc.pos


def lzma_alone_decompress(data: bytes) -> bytes:
    """.lzma (FORMAT_ALONE) stream -> decompressed bytes."""
    if len(data) < 13:
        raise LzmaError("alone header too short")
    props = data[0]
    if props >= 9 * 5 * 5:
        raise LzmaError(f"bad properties byte {props}")
    lc = props % 9
    lp = (props // 9) % 5
    pb = props // 45
    (_dict_size,) = struct.unpack_from("<I", data, 1)
    (usize,) = struct.unpack_from("<Q", data, 5)
    out_size = None if usize == 0xFFFFFFFFFFFFFFFF else usize
    out = bytearray()
    _decode_lzma1(data, 13, _Lzma1State(lc, lp, pb), out, out_size)
    if out_size is not None and len(out) != out_size:
        raise LzmaError("decompressed size mismatch")
    return bytes(out)


# ---------------------------------------------------------------------------
# LZMA2 + .xz container (the format stdlib lzma.compress() emits)
# ---------------------------------------------------------------------------

_XZ_MAGIC = b"\xfd7zXZ\x00"

# xz CRC tables: CRC-32 (IEEE, reflected) via zlib; CRC-64/XZ built here
_CRC64_POLY = 0xC96C5795D7870F42
_CRC64_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ _CRC64_POLY if _c & 1 else _c >> 1
    _CRC64_TABLE.append(_c)


def crc64_xz(data: bytes) -> int:
    crc = 0xFFFFFFFFFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _CRC64_TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFFFFFFFFFF


def _lzma2_decode(data: bytes, dict_bits: int) -> bytes:
    """LZMA2 chunk stream -> bytes (control bytes, resets, shared window)."""
    out = bytearray()
    pos = 0
    st: _Lzma1State | None = None
    while True:
        if pos >= len(data):
            raise LzmaError("LZMA2 stream ended without terminator")
        control = data[pos]
        pos += 1
        if control == 0x00:
            return bytes(out)
        if control in (0x01, 0x02):  # uncompressed chunk (0x01 = dict reset)
            size = int.from_bytes(data[pos : pos + 2], "big") + 1
            pos += 2
            out += data[pos : pos + size]
            pos += size
            if st is not None:
                st.reset_state()  # uncompressed chunks reset LZMA state
            continue
        if control < 0x80:
            raise LzmaError(f"bad LZMA2 control byte {control:#x}")
        unpacked = (((control & 0x1F) << 16)
                    | int.from_bytes(data[pos : pos + 2], "big")) + 1
        comp = int.from_bytes(data[pos + 2 : pos + 4], "big") + 1
        pos += 4
        reset = (control >> 5) & 0x03
        if reset >= 2:
            props = data[pos]
            pos += 1
            if props >= 9 * 5 * 5:
                raise LzmaError(f"bad LZMA2 properties {props}")
            lc, lp, pb = props % 9, (props // 9) % 5, props // 45
            if st is None:
                st = _Lzma1State(lc, lp, pb)
            else:
                st.set_props(lc, lp, pb)
                st.reset_state()
        elif st is None:
            raise LzmaError("LZMA2 chunk before any props")
        elif reset == 1:
            st.reset_state()
        target = len(out) + unpacked
        end = _decode_lzma1(data, pos, st, out, target)
        if len(out) != target:
            raise LzmaError("LZMA2 chunk size mismatch")
        if end > pos + comp:
            raise LzmaError("LZMA2 chunk overran its compressed size")
        pos += comp


def _xz_varint(data: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 63:
            raise LzmaError("runaway xz varint")


def xz_decompress(data: bytes) -> bytes:
    """Single-stream .xz -> bytes, with block check verification
    (none/CRC32/CRC64/SHA-256)."""
    import hashlib
    import zlib as _zlib

    if data[:6] != _XZ_MAGIC:
        raise LzmaError("bad xz magic")
    flags = data[6:8]
    if flags[0] != 0 or flags[1] & 0xF0:
        raise LzmaError("bad xz stream flags")
    check_kind = flags[1] & 0x0F
    (want_crc,) = struct.unpack_from("<I", data, 8)
    if _zlib.crc32(flags) & 0xFFFFFFFF != want_crc:
        raise LzmaError("stream header CRC mismatch")
    if data[-2:] != b"YZ":
        raise LzmaError("bad xz footer magic")
    pos = 12
    out_all = bytearray()
    while True:
        header_size_byte = data[pos]
        if header_size_byte == 0x00:  # index indicator: done with blocks
            break
        header_size = (header_size_byte + 1) * 4
        header = data[pos : pos + header_size]
        (want_hcrc,) = struct.unpack_from("<I", data, pos + header_size - 4)
        if _zlib.crc32(header[:-4]) & 0xFFFFFFFF != want_hcrc:
            raise LzmaError("block header CRC mismatch")
        hpos = 1
        bflags = header[hpos]
        hpos += 1
        n_filters = (bflags & 0x03) + 1
        if bflags & 0x3C:
            raise LzmaError("reserved block flags set")
        comp_size = unc_size = None
        if bflags & 0x40:
            comp_size, hpos = _xz_varint(header, hpos)
        if bflags & 0x80:
            unc_size, hpos = _xz_varint(header, hpos)
        dict_bits = 0
        for _ in range(n_filters):
            fid, hpos = _xz_varint(header, hpos)
            psize, hpos = _xz_varint(header, hpos)
            props = header[hpos : hpos + psize]
            hpos += psize
            if fid != 0x21:
                raise LzmaError(f"filter {fid:#x} out of scope (LZMA2 only)")
            dict_bits = props[0] if props else 0
        pos += header_size
        block_start = pos
        chunk = _lzma2_decode(data[pos:], dict_bits)
        # scan forward: LZMA2 terminator position is implicit; re-walk to
        # find the consumed length (decode returned only bytes)
        consumed = _lzma2_consumed(data, pos)
        pos += consumed
        if comp_size is not None and consumed != comp_size:
            raise LzmaError("block compressed size mismatch")
        if unc_size is not None and len(chunk) != unc_size:
            raise LzmaError("block uncompressed size mismatch")
        while (pos - block_start) % 4:  # block padding
            if data[pos] != 0:
                raise LzmaError("nonzero block padding")
            pos += 1
        if check_kind == 0:
            pass
        elif check_kind == 1:
            (want,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if _zlib.crc32(chunk) & 0xFFFFFFFF != want:
                raise LzmaError("block CRC32 mismatch")
        elif check_kind == 4:
            (want,) = struct.unpack_from("<Q", data, pos)
            pos += 8
            if crc64_xz(chunk) != want:
                raise LzmaError("block CRC64 mismatch")
        elif check_kind == 10:
            want = data[pos : pos + 32]
            pos += 32
            if hashlib.sha256(chunk).digest() != want:
                raise LzmaError("block SHA-256 mismatch")
        else:
            raise LzmaError(f"check kind {check_kind} out of scope")
        out_all += chunk
    return bytes(out_all)


def _lzma2_consumed(data: bytes, start: int) -> int:
    """Walk LZMA2 chunk headers (no decoding) to find the stream's byte
    length including the 0x00 terminator."""
    pos = start
    while True:
        control = data[pos]
        pos += 1
        if control == 0x00:
            return pos - start
        if control in (0x01, 0x02):
            size = int.from_bytes(data[pos : pos + 2], "big") + 1
            pos += 2 + size
            continue
        if control < 0x80:
            raise LzmaError(f"bad LZMA2 control byte {control:#x}")
        comp = int.from_bytes(data[pos + 2 : pos + 4], "big") + 1
        pos += 4
        if (control >> 5) & 0x03 >= 2:
            pos += 1
        pos += comp
