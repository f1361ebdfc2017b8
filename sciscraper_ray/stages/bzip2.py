"""From-scratch bzip2 decoder (the public bzip2 format).

The transform-coding counterpart to the LZ family next door: bzip2
stacks run-length coding (RLE1), the Burrows-Wheeler transform, a
move-to-front pass, zero-run-length coding with bijective base-2
RUNA/RUNB symbols, and selector-switched multi-table canonical Huffman
— all reconstructed here from the public format:

- Stream header ``BZh[1-9]``, per-block 48-bit magics, the final
  0x177245385090 footer with combined CRC.
- MSB-first bitstream with NO byte alignment between blocks.
- Symbol map (16+16x16 bitmaps), 2..6 Huffman tables with delta-coded
  lengths, group selectors MTF-decoded from unary codes, 50-symbol
  groups.
- RUNA/RUNB bijective base-2 zero runs -> MTF inverse -> counting-sort
  inverse BWT via the T-vector walk from ``origPtr`` -> RLE1 (4 equal
  bytes + count) -> per-block CRC (bzip2's MSB-first CRC-32 variant)
  and the stream-combined CRC.

stdlib ``bz2`` (the real libbzip2) is the untrusted producer in tests
and the registry query. The deprecated ``randomized`` block flag is
rejected loudly. Per-payload sequential work — ``map_batches`` like the
other codecs.
"""

from __future__ import annotations


class Bzip2Error(ValueError):
    """Malformed bzip2 stream."""


_BLOCK_MAGIC = 0x314159265359
_FOOTER_MAGIC = 0x177245385090

# bzip2's CRC-32: poly 0x04C11DB7, MSB-first (not reflected)
_CRC_TABLE = []
for _i in range(256):
    _c = _i << 24
    for _ in range(8):
        _c = ((_c << 1) ^ 0x04C11DB7) if _c & 0x80000000 else (_c << 1)
        _c &= 0xFFFFFFFF
    _CRC_TABLE.append(_c)


def _crc32(data: bytes) -> int:
    crc = 0xFFFFFFFF
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[(crc >> 24) ^ b]
    return crc ^ 0xFFFFFFFF


class _Bits:
    """MSB-first bit reader over the whole stream (blocks are not
    byte-aligned in bzip2)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise Bzip2Error("unexpected end of stream")
            out = (out << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


class _Huf:
    """Canonical Huffman decode from code lengths (bzip2 table layout)."""

    __slots__ = ("limit", "base", "perm", "min_len", "max_len")

    def __init__(self, lengths: list[int]) -> None:
        min_len = min(lengths)
        max_len = max(lengths)
        if max_len > 23 or min_len < 1:
            raise Bzip2Error("Huffman code length out of range")
        perm = []
        for ln in range(min_len, max_len + 1):
            for sym, l2 in enumerate(lengths):
                if l2 == ln:
                    perm.append(sym)
        limit = [0] * (max_len + 2)
        base = [0] * (max_len + 2)
        count = [0] * (max_len + 2)
        for ln in lengths:
            count[ln] += 1
        code = 0
        total = 0
        for ln in range(min_len, max_len + 1):
            code += count[ln]
            limit[ln] = code - 1
            code <<= 1
            base[ln + 1] = code - (total := total + count[ln])
        self.limit = limit
        self.base = base
        self.perm = perm
        self.min_len = min_len
        self.max_len = max_len

    def decode(self, bits: _Bits) -> int:
        ln = self.min_len
        code = bits.read(ln)
        while True:
            if ln > self.max_len:
                raise Bzip2Error("invalid Huffman code")
            if code <= self.limit[ln]:
                return self.perm[code - self.base[ln]]
            code = (code << 1) | bits.read(1)
            ln += 1


def bzip2_decompress(data: bytes) -> bytes:
    """Full bzip2 stream -> decompressed bytes (all CRCs verified)."""
    if len(data) < 10 or data[:3] != b"BZh":
        raise Bzip2Error("bad bzip2 magic")
    level = data[3] - 0x30
    if not 1 <= level <= 9:
        raise Bzip2Error("bad bzip2 block-size level")
    max_block = level * 100_000
    bits = _Bits(data)
    bits.pos = 32
    out_all = bytearray()
    combined = 0
    while True:
        magic = bits.read(48)
        if magic == _FOOTER_MAGIC:
            want_combined = bits.read(32)
            if combined != want_combined:
                raise Bzip2Error("combined CRC mismatch")
            return bytes(out_all)
        if magic != _BLOCK_MAGIC:
            raise Bzip2Error(f"bad block magic {magic:#x}")
        block_crc = bits.read(32)
        if bits.read(1):
            raise Bzip2Error("deprecated randomized blocks rejected")
        orig_ptr = bits.read(24)
        # symbol map: 16-bit group bitmap + one 16-bit map per set group
        used = []
        groups = bits.read(16)
        for g in range(16):
            if groups & (0x8000 >> g):
                m = bits.read(16)
                for b in range(16):
                    if m & (0x8000 >> b):
                        used.append(16 * g + b)
        n_used = len(used)
        if n_used == 0:
            raise Bzip2Error("empty symbol map")
        alpha = n_used + 2  # RUNA, RUNB, 2..n_used, EOB
        n_trees = bits.read(3)
        if not 2 <= n_trees <= 6:
            raise Bzip2Error("tree count out of range")
        n_sel = bits.read(15)
        # selectors, MTF-coded in unary
        mtf_trees = list(range(n_trees))
        selectors = []
        for _ in range(n_sel):
            j = 0
            while bits.read(1):
                j += 1
                if j >= n_trees:
                    raise Bzip2Error("selector overruns tree count")
            sym = mtf_trees.pop(j)
            mtf_trees.insert(0, sym)
            selectors.append(sym)
        # Huffman tables: 5-bit start + +1/-1 deltas
        tables = []
        for _ in range(n_trees):
            ln = bits.read(5)
            lengths = []
            for _ in range(alpha):
                while bits.read(1):
                    ln += 1 if bits.read(1) == 0 else -1
                    if not 1 <= ln <= 23:
                        raise Bzip2Error("delta code length out of range")
                lengths.append(ln)
            tables.append(_Huf(lengths))
        # decode the MTF/RLE2 symbol stream in 50-symbol groups
        eob = alpha - 1
        mtf = list(used)
        bwt = bytearray()
        group = -1
        group_left = 0
        huf: _Huf | None = None
        run = 0
        run_bit = 0
        while True:
            if group_left == 0:
                group += 1
                if group >= n_sel:
                    raise Bzip2Error("ran out of selectors")
                huf = tables[selectors[group]]
                group_left = 50
            group_left -= 1
            sym = huf.decode(bits)
            if sym <= 1:  # RUNA/RUNB: bijective base-2 zero run
                run += (sym + 1) << run_bit
                run_bit += 1
                continue
            if run:
                bwt.extend(bytes([mtf[0]]) * run)
                run = 0
                run_bit = 0
            if sym == eob:
                break
            # MTF inverse: position sym-1
            v = mtf.pop(sym - 1)
            mtf.insert(0, v)
            bwt.append(v)
            if len(bwt) > max_block:
                raise Bzip2Error("block exceeds declared size")
        if run:
            bwt.extend(bytes([mtf[0]]) * run)
        if orig_ptr >= len(bwt):
            raise Bzip2Error("origPtr outside block")
        # inverse BWT: counting sort -> T vector walk
        counts = [0] * 256
        for b in bwt:
            counts[b] += 1
        starts = [0] * 256
        acc = 0
        for v in range(256):
            starts[v] = acc
            acc += counts[v]
        t_vec = [0] * len(bwt)
        offs = list(starts)
        for i, b in enumerate(bwt):
            t_vec[offs[b]] = i
            offs[b] += 1
        plain = bytearray(len(bwt))
        p = t_vec[orig_ptr]
        for i in range(len(bwt)):
            plain[i] = bwt[p]
            p = t_vec[p]
        # RLE1: 4 identical bytes followed by an extra-count byte
        out = bytearray()
        i = 0
        n = len(plain)
        while i < n:
            b = plain[i]
            run_len = 1
            while run_len < 4 and i + run_len < n and plain[i + run_len] == b:
                run_len += 1
            if run_len == 4:
                if i + 4 >= n:
                    raise Bzip2Error("RLE1 run missing count byte")
                out.extend(bytes([b]) * (4 + plain[i + 4]))
                i += 5
            else:
                out.extend(bytes([b]) * run_len)
                i += run_len
        if _crc32(bytes(out)) != block_crc:
            raise Bzip2Error("block CRC mismatch")
        combined = ((combined << 1) | (combined >> 31)) & 0xFFFFFFFF
        combined ^= block_crc
        out_all += out
