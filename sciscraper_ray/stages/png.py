"""From-scratch PNG codec (stdlib ``zlib`` + ``struct`` only).

Implements the public PNG specification (W3C PNG, RFC 2083): chunk
framing with CRC-32 validation, IHDR/PLTE/IDAT/IEND, zlib inflate, and
all five scanline filters (None/Sub/Up/Average/Paeth). This makes the
multimodal image tier honest over a REAL container format — the
reference handles real image bytes (reference ``downloaders.py:283-366``
fetches/stores real payloads); here the decode path itself is real, and
only formats needing out-of-container codecs (JPEG/ffmpeg) stay gated.

Scope (explicitly rejected otherwise, never silently wrong):
  - bit depth 8 only
  - color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA)
  - interlace 0 (no Adam7)

Performance notes: decode is inherently per-payload work (run inside an
actor-pool ``map_batches`` stage over SMALL batches). Within one image,
Up is fully vectorized, Sub is a per-lane prefix-sum (mod 256, exact via
``np.cumsum`` in a wider dtype), and Average/Paeth vectorize across the
pixel's channel lanes with a sequential pass along x — the spec's data
dependence, not a Python-loop accident.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (bit depth 8 => bytes per pixel)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# inferred color type when encoding from an (h, w, c) array
_COLOR_TYPE_FOR_C = {1: 0, 2: 4, 3: 2, 4: 6}


class PngError(ValueError):
    """Malformed or out-of-scope PNG payload."""


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor over int16/int32 inputs."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc_ = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))
    return out.astype(np.uint8)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _defilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Filtered scanline stream -> (h, w*bpp) uint8 recon array."""
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise PngError(
            f"decompressed IDAT length {len(raw)} != expected {h * (stride + 1)}"
        )
    lines = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = lines[:, 0]
    data = lines[:, 1:]
    recon = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        f = int(ftypes[y])
        row = data[y]
        if f == 0:  # None
            cur = row.copy()
        elif f == 1:  # Sub: prefix-sum per bpp lane, mod 256
            cur = (
                np.cumsum(row.reshape(w, bpp).astype(np.uint32), axis=0) % 256
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up
            cur = row + prev  # uint8 wraps mod 256
        elif f == 3:  # Average
            cur = np.empty(stride, np.uint8)
            left = np.zeros(bpp, np.uint16)
            for x in range(w):
                s = slice(x * bpp, (x + 1) * bpp)
                cur[s] = row[s] + ((left + prev[s]) >> 1).astype(np.uint8)
                left = cur[s].astype(np.uint16)
        elif f == 4:  # Paeth
            cur = np.empty(stride, np.uint8)
            left = np.zeros(bpp, np.uint8)
            upleft = np.zeros(bpp, np.uint8)
            for x in range(w):
                s = slice(x * bpp, (x + 1) * bpp)
                cur[s] = row[s] + _paeth(left, prev[s], upleft)
                left = cur[s]
                upleft = prev[s].copy()
        else:
            raise PngError(f"unknown filter type {f} on scanline {y}")
        recon[y] = cur
        prev = cur
    return recon


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, channels) uint8 array (palette expanded to RGB).

    Raises PngError on malformed input, NotImplementedError on valid PNGs
    outside the supported scope (16-bit, sub-byte depths, Adam7).
    """
    if payload[:8] != PNG_SIGNATURE:
        raise PngError("bad PNG signature")
    pos = 8
    ihdr = None
    plte: bytes | None = None
    idat = bytearray()
    seen_iend = False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise PngError("truncated chunk header")
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise PngError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise PngError(f"CRC mismatch in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped after CRC check
    if ihdr is None:
        raise PngError("missing IHDR")
    if not seen_iend:
        raise PngError("missing IEND")
    w, h, depth, color_type, compression, filter_method, interlace = ihdr
    if compression != 0 or filter_method != 0:
        raise PngError("nonstandard compression/filter method")
    if interlace == 1:
        raise NotImplementedError("Adam7 interlace not supported")
    if interlace != 0:
        raise PngError(f"bad interlace method {interlace}")
    if depth != 8:
        raise NotImplementedError(f"bit depth {depth} not supported (8 only)")
    if color_type not in _CHANNELS:
        raise PngError(f"bad color type {color_type}")
    if w == 0 or h == 0:
        raise PngError("zero-dimension image")
    bpp = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise PngError(f"IDAT inflate failed: {exc}") from exc
    recon = _defilter(raw, h, w, bpp)
    img = recon.reshape(h, w, bpp)
    if color_type == 3:
        if plte is None or len(plte) % 3 != 0 or len(plte) == 0:
            raise PngError("palette image without valid PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(pal):
            raise PngError("palette index out of range")
        img = pal[idx]
    return np.ascontiguousarray(img)


# ---------------------------------------------------------------------------
# Encoder (fixture writer — same spec, used to build deterministic inputs)
# ---------------------------------------------------------------------------


def _filter_line(
    ftype: int, cur: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Apply scanline filter ``ftype`` to recon row ``cur`` (encoding
    direction — fully vectorized: no data dependence when filtering)."""
    stride = cur.shape[0]
    left = np.zeros(stride, np.uint8)
    left[bpp:] = cur[:-bpp]
    upleft = np.zeros(stride, np.uint8)
    upleft[bpp:] = prev[:-bpp]
    if ftype == 0:
        return cur.copy()
    if ftype == 1:
        return cur - left
    if ftype == 2:
        return cur - prev
    if ftype == 3:
        avg = (left.astype(np.uint16) + prev.astype(np.uint16)) >> 1
        return cur - avg.astype(np.uint8)
    if ftype == 4:
        return cur - _paeth(left, prev, upleft)
    raise PngError(f"unknown filter type {ftype}")


def encode_png(
    img: np.ndarray, filter_type: int | list[int] = 0, level: int = 6
) -> bytes:
    """(h, w) or (h, w, c) uint8 array -> PNG bytes.

    ``filter_type`` is one filter for every scanline or a per-scanline
    list — fixtures use varying types to exercise the decoder's five
    filter paths deterministically.
    """
    if img.ndim == 2:
        img = img[:, :, None]
    if img.dtype != np.uint8 or img.ndim != 3:
        raise PngError("encoder takes (h, w[, c]) uint8")
    h, w, c = img.shape
    if c not in _COLOR_TYPE_FOR_C:
        raise PngError(f"unsupported channel count {c}")
    color_type = _COLOR_TYPE_FOR_C[c]
    ftypes = (
        [int(filter_type)] * h
        if isinstance(filter_type, int)
        else list(filter_type)
    )
    if len(ftypes) != h:
        raise PngError("per-scanline filter list length != height")
    flat = np.ascontiguousarray(img).reshape(h, w * c)
    lines = bytearray()
    prev = np.zeros(w * c, np.uint8)
    for y in range(h):
        lines.append(ftypes[y])
        lines.extend(_filter_line(ftypes[y], flat[y], prev, c).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines), level))
        + _chunk(b"IEND", b"")
    )
