"""From-scratch Zstandard decoder (RFC 8878, single frame, no dictionary).

The deepest codec in the tier: zstd is the modern default for object
stores, Parquet, and shuffle payloads, and its bitstream stacks every
entropy-coding idea this repo's other codecs use one at a time —
tANS/FSE (table spreading, backward bitstreams, interleaved states),
canonical Huffman with FSE-compressed weight tables, LZ77 sequences
with a three-slot repeat-offset history, and xxHash64 checksums. All
implemented here from the public RFC:

- Frame header: magic, descriptor (FCS size, single-segment, checksum,
  dict id), window descriptor.
- Blocks: raw / RLE / compressed, 21-bit sizes, last-block flag.
- Literals: raw / RLE / Huffman-compressed / treeless (reuses the
  previous table), 1- and 4-stream layouts with the 6-byte jump table.
- Huffman: direct 4-bit weights or FSE-compressed weights (two
  interleaved states, overflow-terminated), implicit last weight,
  max-bits table fill in rank order.
- Sequences: predefined / RLE / FSE-compressed / repeat table modes
  per category (LL, OF, ML), normalized-count parsing with the
  low-bit-threshold trick and zero-repeat flags, backward bitstream
  with padding marker, interleaved three-state decode, baseline+extra
  bit expansions, the repeat-offset rules including the
  literals-length-0 twist, overlapping match copies.
- xxHash64 (seed 0) for the optional 4-byte content checksum.

The container's REAL C++ zstd (``pyarrow.Codec("zstd")``) is the
untrusted producer in tests and the registry query — every level
exercises different block/mode choices (RLE blocks, predefined vs
compressed FSE, treeless literals, 4-stream Huffman), so parity across
levels and payload shapes pins each branch. Per-payload sequential
work; runs inside ``map_batches`` like the other codecs.
"""

from __future__ import annotations

import struct

ZSTD_MAGIC = 0xFD2FB528


class ZstdError(ValueError):
    """Malformed zstd frame."""


# ---------------------------------------------------------------------------
# Backward bitstream (§3.1.1.3.2.1.1): a byte buffer read from the END,
# with the highest set bit of the last byte marking the padding boundary.
# ---------------------------------------------------------------------------


class _BackStream:
    __slots__ = ("val", "bits")

    def __init__(self, data: bytes) -> None:
        if not data or data[-1] == 0:
            raise ZstdError("backward bitstream missing padding marker")
        self.val = int.from_bytes(data, "little")
        self.bits = (len(data) - 1) * 8 + data[-1].bit_length() - 1

    def read(self, n: int) -> int:
        """Exact read; raises on underflow (sequences are sized exactly)."""
        if n == 0:
            return 0
        if self.bits < n:
            raise ZstdError("backward bitstream underflow")
        self.bits -= n
        return (self.val >> self.bits) & ((1 << n) - 1)

    def read_padded(self, n: int) -> int:
        """Tolerant read: missing low bits are zero, ``bits`` may go
        negative (the Huffman-weights / Huffman-literals termination
        rule tracks the overflow)."""
        if n == 0:
            return 0
        self.bits -= n
        if self.bits >= 0:
            return (self.val >> self.bits) & ((1 << n) - 1)
        short = -self.bits
        if short >= n:
            return 0
        return (self.val & ((1 << (n - short)) - 1)) << short


class _ForeStream:
    """Forward little-endian bit reader (FSE table descriptions §4.1.1)."""

    __slots__ = ("data", "bitpos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.bitpos = 0

    def read(self, n: int) -> int:
        out = 0
        for i in range(n):
            byte = self.bitpos >> 3
            if byte >= len(self.data):
                raise ZstdError("forward bitstream underflow")
            out |= ((self.data[byte] >> (self.bitpos & 7)) & 1) << i
            self.bitpos += 1
        return out

    def rewind(self, n: int) -> None:
        self.bitpos -= n

    def byte_align_pos(self) -> int:
        return (self.bitpos + 7) >> 3


# ---------------------------------------------------------------------------
# FSE (§4.1): normalized-count parsing + decode table construction
# ---------------------------------------------------------------------------


class _FseTable:
    __slots__ = ("symbols", "nbits", "base", "log")

    def __init__(self, counts: list[int], log: int) -> None:
        size = 1 << log
        symbols = [0] * size
        high = size - 1
        for s, c in enumerate(counts):
            if c == -1:
                symbols[high] = s
                high -= 1
        step = (size >> 1) + (size >> 3) + 3
        mask = size - 1
        pos = 0
        for s, c in enumerate(counts):
            if c <= 0:
                continue
            for _ in range(c):
                symbols[pos] = s
                pos = (pos + step) & mask
                while pos > high:
                    pos = (pos + step) & mask
        if pos != 0:
            raise ZstdError("FSE table spreading did not close")
        # -1 (less-than-one probability) symbols start their counter at 1
        counters = [1 if c == -1 else c for c in counts]
        nbits = [0] * size
        base = [0] * size
        for state in range(size):
            s = symbols[state]
            x = counters[s]
            counters[s] += 1
            nb = log - (x.bit_length() - 1)
            nbits[state] = nb
            base[state] = (x << nb) - size
        self.symbols = symbols
        self.nbits = nbits
        self.base = base
        self.log = log

    @classmethod
    def rle(cls, symbol: int) -> "_FseTable":
        t = cls.__new__(cls)
        t.symbols = [symbol]
        t.nbits = [0]
        t.base = [0]
        t.log = 0
        return t


def _read_fse_counts(
    fs: _ForeStream, max_log: int
) -> tuple[list[int], int]:
    """§4.1.1: accuracy log + threshold-coded probabilities."""
    log = fs.read(4) + 5
    if log > max_log:
        raise ZstdError(f"FSE accuracy log {log} > max {max_log}")
    remaining = (1 << log) + 1
    counts: list[int] = []
    while remaining > 1 and len(counts) < 256:
        bits = remaining.bit_length()  # highest_set_bit(remaining) + 1
        val = fs.read(bits)
        lower_mask = (1 << (bits - 1)) - 1
        threshold = (1 << bits) - 1 - remaining
        if (val & lower_mask) < threshold:
            fs.rewind(1)
            value = val & lower_mask
        elif val > lower_mask:
            value = val - threshold
        else:
            value = val
        proba = value - 1
        counts.append(proba)
        remaining -= proba if proba > 0 else -proba if proba < 0 else 0
        if proba == 0:
            while True:
                repeat = fs.read(2)
                counts.extend([0] * repeat)
                if repeat != 3:
                    break
    if remaining != 1:
        raise ZstdError("FSE normalized counts do not sum to table size")
    return counts, log


# ---------------------------------------------------------------------------
# Huffman literals (§4.2)
# ---------------------------------------------------------------------------


class _HufTable:
    __slots__ = ("symbols", "lengths", "max_bits")

    def __init__(self, weights: list[int]) -> None:
        total = sum((1 << (w - 1)) for w in weights if w > 0)
        if total == 0:
            raise ZstdError("empty Huffman weights")
        max_bits = total.bit_length()  # log2(next pow2 of total+last)
        left = (1 << max_bits) - total
        if left & (left - 1):
            raise ZstdError("Huffman weights leave a non-power-of-2 gap")
        last_weight = left.bit_length()
        weights = weights + [last_weight]
        max_bits = (total + left).bit_length() - 1
        if max_bits > 11:
            raise ZstdError(f"Huffman max bits {max_bits} > 11")
        lengths = [
            (max_bits + 1 - w) if w > 0 else 0 for w in weights
        ]
        size = 1 << max_bits
        sym_table = bytearray(size)
        len_table = bytearray(size)
        # rank fill: longest codes (smallest weight) from index 0 upward
        rank_count = [0] * (max_bits + 2)
        for ln in lengths:
            if ln:
                rank_count[ln] += 1
        rank_idx = [0] * (max_bits + 2)
        acc = 0
        for ln in range(max_bits, 0, -1):
            rank_idx[ln] = acc
            acc += rank_count[ln] * (1 << (max_bits - ln))
        for s, ln in enumerate(lengths):
            if not ln:
                continue
            cells = 1 << (max_bits - ln)
            start = rank_idx[ln]
            for i in range(start, start + cells):
                sym_table[i] = s
                len_table[i] = ln
            rank_idx[ln] += cells
        self.symbols = sym_table
        self.lengths = len_table
        self.max_bits = max_bits

    def decode_stream(self, data: bytes, n_out: int) -> bytes:
        bs = _BackStream(data)
        out = bytearray()
        max_bits = self.max_bits
        symbols = self.symbols
        lengths = self.lengths
        state = bs.read_padded(max_bits)
        while len(out) < n_out:
            out.append(symbols[state])
            ln = lengths[state]
            if ln == 0:
                raise ZstdError("invalid Huffman state")
            rest = state & ((1 << (max_bits - ln)) - 1)
            state = (rest << ln) | bs.read_padded(ln)
        if bs.bits > 0:
            raise ZstdError("Huffman literal stream has leftover bits")
        return bytes(out)


def _decode_huf_weights(data: bytes) -> tuple[list[int], int]:
    """Huffman tree description -> (weights, bytes consumed)."""
    hbyte = data[0]
    if hbyte >= 128:  # direct 4-bit weights
        n = hbyte - 127
        nbytes = (n + 1) // 2
        raw = data[1 : 1 + nbytes]
        if len(raw) < nbytes:
            raise ZstdError("truncated direct Huffman weights")
        weights = []
        for i in range(n):
            b = raw[i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0x0F))
        return weights, 1 + nbytes
    comp = data[1 : 1 + hbyte]
    if len(comp) < hbyte:
        raise ZstdError("truncated FSE Huffman weights")
    fs = _ForeStream(comp)
    counts, log = _read_fse_counts(fs, 6)
    table = _FseTable(counts, log)
    bits_data = comp[fs.byte_align_pos() :]
    bs = _BackStream(bits_data)
    s1 = bs.read(table.log)
    s2 = bs.read(table.log)
    weights: list[int] = []
    while True:
        weights.append(table.symbols[s1])
        if bs.bits < table.nbits[s1]:
            weights.append(table.symbols[s2])
            break
        s1 = table.base[s1] + bs.read(table.nbits[s1])
        weights.append(table.symbols[s2])
        if bs.bits < table.nbits[s2]:
            weights.append(table.symbols[s1])
            break
        s2 = table.base[s2] + bs.read(table.nbits[s2])
        if len(weights) > 255:
            raise ZstdError("too many Huffman weights")
    return weights, 1 + hbyte


# ---------------------------------------------------------------------------
# Sequences (§3.1.1.3.2): code tables + predefined distributions
# ---------------------------------------------------------------------------

_LL_BASE = [
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024,
    2048, 4096, 8192, 16384, 32768, 65536,
]
_LL_BITS = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
]
_ML_BASE = [
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 37,
    39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
    4099, 8195, 16387, 32771, 65539,
]
_ML_BITS = [
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
]
# RFC 8878 predefined distributions
_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
     2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
    6,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1, -1, -1],
    6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1],
    5,
)


def _sequences_table(
    mode: int,
    data: bytes,
    pos: int,
    default: tuple[list[int], int],
    max_log: int,
    prev: "_FseTable | None",
    max_symbol: int,
) -> tuple[_FseTable, int]:
    if mode == 0:  # predefined
        counts, log = default
        return _FseTable(counts, log), pos
    if mode == 1:  # RLE: one byte symbol
        sym = data[pos]
        if sym > max_symbol:
            raise ZstdError(f"RLE sequence symbol {sym} out of range")
        return _FseTable.rle(sym), pos + 1
    if mode == 2:  # FSE compressed
        fs = _ForeStream(data[pos:])
        counts, log = _read_fse_counts(fs, max_log)
        if len(counts) - 1 > max_symbol:
            raise ZstdError("FSE counts exceed symbol range")
        return _FseTable(counts, log), pos + fs.byte_align_pos()
    if prev is None:  # repeat with no previous table
        raise ZstdError("repeat sequence table with no previous table")
    return prev, pos


# ---------------------------------------------------------------------------
# xxHash64 (public XXH64 spec; used for the 4-byte content checksum)
# ---------------------------------------------------------------------------

_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed
        v4 = (seed - _P1) & _M64
        while pos + 32 <= n:
            for vi in range(4):
                (lane,) = struct.unpack_from("<Q", data, pos + 8 * vi)
                if vi == 0:
                    v1 = (_rotl((v1 + lane * _P2) & _M64, 31) * _P1) & _M64
                elif vi == 1:
                    v2 = (_rotl((v2 + lane * _P2) & _M64, 31) * _P1) & _M64
                elif vi == 2:
                    v3 = (_rotl((v3 + lane * _P2) & _M64, 31) * _P1) & _M64
                else:
                    v4 = (_rotl((v4 + lane * _P2) & _M64, 31) * _P1) & _M64
            pos += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((_rotl((v * _P2) & _M64, 31) * _P1) & _M64)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while pos + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, pos)
        h = (
            _rotl(h ^ ((_rotl((lane * _P2) & _M64, 31) * _P1) & _M64), 27)
            * _P1
            + _P4
        ) & _M64
        pos += 8
    if pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        h = (_rotl(h ^ ((lane * _P1) & _M64), 23) * _P2 + _P3) & _M64
        pos += 4
    while pos < n:
        h = (_rotl(h ^ ((data[pos] * _P5) & _M64), 11) * _P1) & _M64
        pos += 1
    h = ((h ^ (h >> 33)) * _P2) & _M64
    h = ((h ^ (h >> 29)) * _P3) & _M64
    return h ^ (h >> 32)


# ---------------------------------------------------------------------------
# Frame decoding
# ---------------------------------------------------------------------------


class _BlockState:
    """Cross-block state: last Huffman table + last FSE tables + offsets."""

    __slots__ = ("huf", "ll", "of", "ml", "reps")

    def __init__(self) -> None:
        self.huf: _HufTable | None = None
        self.ll: _FseTable | None = None
        self.of: _FseTable | None = None
        self.ml: _FseTable | None = None
        self.reps = [1, 4, 8]


def _decode_literals(
    data: bytes, st: _BlockState
) -> tuple[bytes, int]:
    """Literals section -> (literals, bytes consumed)."""
    header = data[0]
    ltype = header & 3
    sf = (header >> 2) & 3
    if ltype in (0, 1):  # raw / RLE
        if sf in (0, 2):
            size = header >> 3
            pos = 1
        elif sf == 1:
            size = (header >> 4) | (data[1] << 4)
            pos = 2
        else:
            size = (header >> 4) | (data[1] << 4) | (data[2] << 12)
            pos = 3
        if ltype == 0:
            if pos + size > len(data):
                raise ZstdError("truncated raw literals")
            return data[pos : pos + size], pos + size
        return bytes([data[pos]]) * size, pos + 1
    # compressed (2) / treeless (3)
    if sf == 0:
        regen = (header >> 4) | ((data[1] & 0x3F) << 4)
        comp = (data[1] >> 6) | (data[2] << 2)
        pos = 3
        streams = 1
    elif sf == 1:
        regen = (header >> 4) | ((data[1] & 0x3F) << 4)
        comp = (data[1] >> 6) | (data[2] << 2)
        pos = 3
        streams = 4
    elif sf == 2:
        regen = (header >> 4) | (data[1] << 4) | ((data[2] & 0x03) << 12)
        comp = (data[2] >> 2) | (data[3] << 6)
        pos = 4
        streams = 4
    else:
        regen = (header >> 4) | (data[1] << 4) | ((data[2] & 0x3F) << 12)
        comp = (data[2] >> 6) | (data[3] << 2) | (data[4] << 10)
        pos = 5
        streams = 4
    section = data[pos : pos + comp]
    if len(section) < comp:
        raise ZstdError("truncated compressed literals")
    off = 0
    if ltype == 2:
        weights, off = _decode_huf_weights(section)
        st.huf = _HufTable(weights)
    if st.huf is None:
        raise ZstdError("treeless literals with no previous Huffman table")
    body = section[off:]
    if streams == 1:
        lits = st.huf.decode_stream(body, regen)
    else:
        if len(body) < 6:
            raise ZstdError("missing 4-stream jump table")
        s1, s2, s3 = struct.unpack_from("<HHH", body, 0)
        parts = []
        starts = [6, 6 + s1, 6 + s1 + s2, 6 + s1 + s2 + s3, len(body)]
        if starts[3] > len(body):
            raise ZstdError("jump table exceeds literals section")
        per = (regen + 3) // 4
        sizes = [per, per, per, regen - 3 * per]
        for i in range(4):
            parts.append(
                st.huf.decode_stream(
                    body[starts[i] : starts[i + 1]], sizes[i]
                )
            )
        lits = b"".join(parts)
    if len(lits) != regen:
        raise ZstdError("literal size mismatch")
    return lits, pos + comp


def _decode_block(data: bytes, st: _BlockState, out: bytearray) -> None:
    """Decode one compressed block, appending to ``out`` — matches may
    reference the whole frame window (previous blocks), so the output
    buffer is shared across blocks."""
    literals, pos = _decode_literals(data, st)
    if pos >= len(data):
        raise ZstdError("missing sequences section")
    b0 = data[pos]
    pos += 1
    if b0 == 0:
        nseq = 0
    elif b0 < 128:
        nseq = b0
    elif b0 < 255:
        nseq = ((b0 - 128) << 8) | data[pos]
        pos += 1
    else:
        nseq = data[pos] | (data[pos + 1] << 8)
        nseq += 0x7F00
        pos += 2
    if nseq == 0:
        if pos != len(data):
            raise ZstdError("trailing bytes after literal-only block")
        out += literals
        return
    modes = data[pos]
    pos += 1
    if modes & 0x03:
        raise ZstdError("reserved sequence mode bits set")
    ll_mode = (modes >> 6) & 3
    of_mode = (modes >> 4) & 3
    ml_mode = (modes >> 2) & 3
    ll_t, pos = _sequences_table(
        ll_mode, data, pos, _LL_DEFAULT, 9, st.ll, 35
    )
    of_t, pos = _sequences_table(
        of_mode, data, pos, _OF_DEFAULT, 8, st.of, 31
    )
    ml_t, pos = _sequences_table(
        ml_mode, data, pos, _ML_DEFAULT, 9, st.ml, 52
    )
    st.ll, st.of, st.ml = ll_t, of_t, ml_t
    bs = _BackStream(data[pos:])
    ll_state = bs.read(ll_t.log)
    of_state = bs.read(of_t.log)
    ml_state = bs.read(ml_t.log)
    lp = 0
    reps = st.reps
    for i in range(nseq):
        of_code = of_t.symbols[of_state]
        ml_code = ml_t.symbols[ml_state]
        ll_code = ll_t.symbols[ll_state]
        if of_code > 31 or ml_code > 52 or ll_code > 35:
            raise ZstdError("sequence code out of range")
        offset_value = (1 << of_code) + bs.read(of_code)
        ml = _ML_BASE[ml_code] + bs.read(_ML_BITS[ml_code])
        ll = _LL_BASE[ll_code] + bs.read(_LL_BITS[ll_code])
        if offset_value > 3:
            offset = offset_value - 3
            reps = [offset, reps[0], reps[1]]
        else:
            idx = offset_value + (1 if ll == 0 else 0)
            if idx == 1:
                offset = reps[0]
            elif idx == 2:
                offset = reps[1]
                reps = [offset, reps[0], reps[2]]
            elif idx == 3:
                offset = reps[2]
                reps = [offset, reps[0], reps[1]]
            else:
                offset = reps[0] - 1
                if offset == 0:
                    raise ZstdError("repeat offset underflow")
                reps = [offset, reps[0], reps[1]]
        if lp + ll > len(literals):
            raise ZstdError("sequence literals overrun")
        out += literals[lp : lp + ll]
        lp += ll
        if offset > len(out):
            raise ZstdError("match offset beyond output start")
        if offset >= ml:
            start = len(out) - offset
            out += out[start : start + ml]
        else:
            for _ in range(ml):
                out.append(out[-offset])
        if i < nseq - 1:
            ll_state = ll_t.base[ll_state] + bs.read(ll_t.nbits[ll_state])
            ml_state = ml_t.base[ml_state] + bs.read(ml_t.nbits[ml_state])
            of_state = of_t.base[of_state] + bs.read(of_t.nbits[of_state])
    if bs.bits != 0:
        raise ZstdError("sequence bitstream has leftover bits")
    out += literals[lp:]
    st.reps = reps


def zstd_decompress(data: bytes) -> bytes:
    """Single zstd frame -> decompressed bytes (checksum verified when
    present)."""
    if len(data) < 4 or struct.unpack_from("<I", data, 0)[0] != ZSTD_MAGIC:
        raise ZstdError("bad zstd magic")
    pos = 4
    fhd = data[pos]
    pos += 1
    fcs_code = fhd >> 6
    single_segment = bool(fhd & 0x20)
    if fhd & 0x08:
        raise ZstdError("reserved frame header bit set")
    has_checksum = bool(fhd & 0x04)
    dict_code = fhd & 0x03
    if not single_segment:
        pos += 1  # window descriptor (bounds not enforced here)
    pos += (0, 1, 2, 4)[dict_code]
    if dict_code:
        raise ZstdError("dictionaries not supported")
    fcs: int | None = None
    if fcs_code == 0:
        if single_segment:
            fcs = data[pos]
            pos += 1
    elif fcs_code == 1:
        fcs = struct.unpack_from("<H", data, pos)[0] + 256
        pos += 2
    elif fcs_code == 2:
        (fcs,) = struct.unpack_from("<I", data, pos)
        pos += 4
    else:
        (fcs,) = struct.unpack_from("<Q", data, pos)
        pos += 8
    st = _BlockState()
    out = bytearray()
    while True:
        if pos + 3 > len(data):
            raise ZstdError("truncated block header")
        bh = data[pos] | (data[pos + 1] << 8) | (data[pos + 2] << 16)
        pos += 3
        last = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        if btype == 0:  # raw
            if pos + bsize > len(data):
                raise ZstdError("truncated raw block")
            out += data[pos : pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE
            if pos >= len(data):
                raise ZstdError("truncated RLE block")
            out += bytes([data[pos]]) * bsize
            pos += 1
        elif btype == 2:
            if pos + bsize > len(data):
                raise ZstdError("truncated compressed block")
            _decode_block(data[pos : pos + bsize], st, out)
            pos += bsize
        else:
            raise ZstdError("reserved block type")
        if last:
            break
    if fcs is not None and len(out) != fcs:
        raise ZstdError(
            f"frame content size {fcs} != decompressed {len(out)}"
        )
    if has_checksum:
        if pos + 4 > len(data):
            raise ZstdError("missing content checksum")
        (want,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if xxh64(bytes(out)) & 0xFFFFFFFF != want:
            raise ZstdError("content checksum mismatch")
    if pos != len(data):
        raise ZstdError("trailing bytes after frame")
    return bytes(out)
