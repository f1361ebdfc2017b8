"""From-scratch LZ4 block-format codec (the public LZ4 block spec).

LZ4 is the de-facto shuffle/object-store compression codec in every
large-scale data engine (Ray's object store, Parquet pages, Arrow IPC
all speak it); this module implements the BLOCK format both ways with
no third-party library: sequences of

    [token: hi-nibble literal length | lo-nibble match length - 4]
    [length extension bytes of 255 while saturated]
    [literals]
    [2-byte little-endian match offset, 1..65535]
    [match length extension]

with the spec's end-of-block rules (final sequence is literals-only;
encoder leaves the last 5 bytes as literals and starts no match within
the last 12). The encoder is the classic greedy single-entry hash-table
matcher (hash of 4-byte window -> last position); the decoder honors
overlapping copies byte-serially, exactly like the DEFLATE inflater
next door (stages/inflate.py).

Compression here exists to produce REAL blocks for the decoder and
fixtures whose compressed size is deterministic; correctness of the
pair is attested by roundtrips over adversarial inputs (incompressible,
run-length, periodic, boundary-condition lengths) and hand-built
sequences decoded independently of the encoder.

Scale notes: per-payload sequential work — runs inside ``map_batches``
over payload rows like the other codecs; no exchanges.
"""

from __future__ import annotations

import struct

import numpy as np


class Lz4Error(ValueError):
    """Malformed LZ4 block."""


_MIN_MATCH = 4
_MFLIMIT = 12  # no match may start within the last 12 bytes
_LAST_LITERALS = 5  # final 5 bytes are always literals


def _write_length(out: bytearray, n: int) -> None:
    while n >= 255:
        out.append(255)
        n -= 255
    out.append(n)


def lz4_compress(data: bytes) -> bytes:
    """Greedy hash-chain-of-1 LZ4 block encoder (spec-conformant)."""
    n = len(data)
    out = bytearray()
    if n == 0:
        out.append(0)  # one literals-only sequence of length 0
        return bytes(out)
    # exact 4-byte windows as dict keys: collision-free and — unlike
    # Python's randomized bytes hash — DETERMINISTIC across processes,
    # so every worker emits identical compressed bytes
    table: dict[bytes, int] = {}
    anchor = 0
    pos = 0
    limit = n - _MFLIMIT
    while pos < limit:
        key = data[pos : pos + 4]
        cand = table.get(key)
        table[key] = pos
        if cand is not None and pos - cand <= 65535:
            # extend the match forward (not into the last-5 literal zone)
            m = pos + 4
            c = cand + 4
            end = n - _LAST_LITERALS
            while m < end and data[m] == data[c]:
                m += 1
                c += 1
            lit_len = pos - anchor
            match_len = m - pos
            token_lit = 15 if lit_len >= 15 else lit_len
            token_match = 15 if match_len - 4 >= 15 else match_len - 4
            out.append((token_lit << 4) | token_match)
            if lit_len >= 15:
                _write_length(out, lit_len - 15)
            out += data[anchor:pos]
            out += struct.pack("<H", pos - cand)
            if match_len - 4 >= 15:
                _write_length(out, match_len - 19)
            pos = m
            anchor = m
        else:
            pos += 1
    # final literals-only sequence
    lit_len = n - anchor
    token_lit = 15 if lit_len >= 15 else lit_len
    out.append(token_lit << 4)
    if lit_len >= 15:
        _write_length(out, lit_len - 15)
    out += data[anchor:]
    return bytes(out)


def _read_length(data: bytes, pos: int, base: int) -> tuple[int, int]:
    if base != 15:
        return base, pos
    total = 15
    while True:
        if pos >= len(data):
            raise Lz4Error("truncated length extension")
        b = data[pos]
        pos += 1
        total += b
        if b != 255:
            return total, pos


def lz4_decompress(data: bytes) -> bytes:
    """LZ4 block decoder with loud malformed-stream errors."""
    out = bytearray()
    pos = 0
    n = len(data)
    if n == 0:
        raise Lz4Error("empty block")
    while pos < n:
        token = data[pos]
        pos += 1
        lit_len, pos = _read_length(data, pos, token >> 4)
        if pos + lit_len > n:
            raise Lz4Error("literal run past end of block")
        out += data[pos : pos + lit_len]
        pos += lit_len
        if pos == n:
            return bytes(out)  # final literals-only sequence
        if pos + 2 > n:
            raise Lz4Error("truncated match offset")
        (offset,) = struct.unpack_from("<H", data, pos)
        pos += 2
        if offset == 0:
            raise Lz4Error("zero match offset")
        if offset > len(out):
            raise Lz4Error("match offset beyond output start")
        match_len, pos = _read_length(data, pos, token & 0x0F)
        match_len += _MIN_MATCH
        if offset >= match_len:
            start = len(out) - offset
            out += out[start : start + match_len]
        else:  # overlapping copy: byte-serial semantics
            for _ in range(match_len):
                out.append(out[-offset])
    raise Lz4Error("block ended inside a sequence")
