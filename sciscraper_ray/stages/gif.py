"""From-scratch GIF (GIF87a/89a) codec — stdlib ``struct`` only.

Implements the public GIF89a specification: logical screen descriptor +
global color table, local color tables (per-image, overriding the GCT),
four-pass row interlacing (spec appendix E), variable-width LZW
(3..12-bit codes, LSB-first bit packing, clear/EOI codes, table reset
at 4096), 255-byte sub-block framing, and extension-block walking (the
encoder emits a Graphic Control Extension so the decoder's skip path is
exercised). This closes the last gated IMAGE format in the multimodal
tier — PNG, JPEG and WAV already decode for real (stages/png.py,
jpeg.py, wav.py); the reference handles real image bytes in
``downloaders.py:283-366``.

Animation: ``decode_gif_frames`` walks every image block and composites
onto the logical screen — Graphic Control Extension disposal methods 0/1
(leave) and 2 (restore to background), transparency index skipping, and
per-frame (left, top) offsets. Disposal 3 (restore to previous) is
rejected loudly (scope), as GIF89a deprecates it and no mainstream
encoder emits it.

Performance notes: LZW is inherently sequential per payload (each code's
width depends on the running table size), so decode runs inside an
actor-pool ``map_batches`` stage over SMALL batches like the other real
codecs; palette mapping, de-interlace scatter and index->RGB expansion
are vectorized.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIGNATURES = (b"GIF87a", b"GIF89a")

_MAX_CODE = 4096  # 12-bit ceiling fixed by the spec


class GifError(ValueError):
    """Malformed or out-of-scope GIF payload."""


class _BitWriter:
    """LSB-first variable-width code packer (GIF appendix F)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def emit(self, code: int, width: int) -> None:
        self.buf |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.buf & 0xFF)
            self.buf = 0
            self.nbits = 0
        return bytes(self.out)


def lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Real LZW (dictionary-building) encoder. Width grows when the next
    free code would not fit the current width; at table-full (4096) a
    CLEAR is emitted and the table resets — the exact rule the decoder
    mirrors one step behind."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    w = _BitWriter()
    w.emit(clear, width)
    it = iter(int(s) for s in indices)
    try:
        prefix = next(it)
    except StopIteration:
        w.emit(eoi, width)
        return w.flush()
    for sym in it:
        key = (prefix, sym)
        code = table.get(key)
        if code is not None:
            prefix = code
            continue
        w.emit(prefix, width)
        if next_code < _MAX_CODE:
            table[key] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            w.emit(clear, width)
            table.clear()
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = sym
    w.emit(prefix, width)
    # the decoder ADDS an entry while processing this final code (the
    # encoder doesn't); if that entry lands exactly on the growth
    # boundary the decoder reads the next code one bit wider — mirror it
    # so EOI is written at the width the decoder will read it with
    if next_code == (1 << width) - 1 and width < 12:
        width += 1
    w.emit(eoi, width)
    return w.flush()


def lzw_decode(data: bytes, min_code_size: int) -> np.ndarray:
    """Real LZW decoder: rebuilds the table one entry behind the encoder,
    handles the KwKwK case (code == next free code), grows the width when
    the table reaches the current ceiling, stops growing at 4096 until a
    CLEAR arrives."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    base = {i: (i,) for i in range(clear)}
    table = dict(base)
    next_code = eoi + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    buf = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                raise GifError("LZW stream ended without EOI")
            buf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbits -= width
        if code == eoi:
            break
        if code == clear:
            table = dict(base)
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if prev is None:
            entry = table.get(code)
            if entry is None:
                raise GifError(f"bad first LZW code {code}")
        else:
            entry = table.get(code)
            if entry is None:
                if code != next_code:
                    raise GifError(f"bad LZW code {code}")
                entry = prev + (prev[0],)  # KwKwK
            if next_code < _MAX_CODE:
                table[next_code] = prev + (entry[0],)
                next_code += 1
                # one entry BEHIND the encoder at read time, so grow one
                # entry early (the giflib-encoder / libnsgif-decoder pairing)
                if next_code == (1 << width) - 1 and width < 12:
                    width += 1
        out.extend(entry)
        prev = entry
    return np.array(out, np.uint8)


def _interlace_order(h: int) -> np.ndarray:
    """Row storage order for an interlaced frame (spec appendix E):
    pass 1 rows 0,8,16..., pass 2 rows 4,12..., pass 3 rows 2,6,10...,
    pass 4 rows 1,3,5,..."""
    return np.concatenate(
        [
            np.arange(0, h, 8),
            np.arange(4, h, 8),
            np.arange(2, h, 4),
            np.arange(1, h, 2),
        ]
    )


def _padded_palette(palette: np.ndarray) -> tuple[np.ndarray, int]:
    """Pad a palette to the next power of two (>= 2, <= 256); returns
    (padded table, size_bits)."""
    n = len(palette)
    if not 1 <= n <= 256:
        raise GifError("palette size out of range")
    size_bits = 1
    while (1 << size_bits) < n:
        size_bits += 1
    pal = np.zeros((1 << size_bits, 3), np.uint8)
    pal[:n] = palette
    return pal, size_bits


def encode_gif(
    indices: np.ndarray,
    palette: np.ndarray,
    interlace: bool = False,
    local_palette: bool = False,
) -> bytes:
    """(h, w) uint8 index array + (n, 3) uint8 palette -> GIF89a bytes.
    The palette is padded to the next power of two (>= 2, <= 256).

    ``interlace=True`` stores rows in the four-pass order. With
    ``local_palette=True`` the real palette is written as the image's
    LOCAL color table and the global table holds decoy zeros — a decoder
    that ignores the LCT produces all-black, so fixtures prove the
    override path."""
    if indices.ndim != 2:
        raise GifError("indices must be (h, w)")
    h, w = indices.shape
    pal, size_bits = _padded_palette(palette)
    if indices.max(initial=0) >= len(pal):
        raise GifError("index exceeds palette")
    min_code_size = max(2, size_bits)
    out = bytearray()
    out += b"GIF89a"
    packed = 0x80 | ((size_bits - 1) << 4) | (size_bits - 1)
    out += struct.pack("<HHBBB", w, h, packed, 0, 0)
    out += (np.zeros_like(pal) if local_palette else pal).tobytes()
    # Graphic Control Extension (no-op; exercises the decoder's skip path)
    out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    ipacked = (0x40 if interlace else 0) | (
        0x80 | (size_bits - 1) if local_palette else 0
    )
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    if local_palette:
        out += pal.tobytes()
    out.append(min_code_size)
    rows = indices[_interlace_order(h)] if interlace else indices
    data = lzw_encode(rows.ravel(), min_code_size)
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> tuple[np.ndarray, int]:
    """GIF bytes -> ((h, w, 3) uint8 RGB, global-color-table size)."""
    if payload[:6] not in GIF_SIGNATURES:
        raise GifError("not a GIF signature")
    w, h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    if not packed & 0x80:
        raise GifError("global color table required in this scope")
    gct_n = 2 << (packed & 0x07)
    palette = np.frombuffer(payload, np.uint8, gct_n * 3, pos).reshape(-1, 3)
    pos += gct_n * 3
    while pos < len(payload):
        marker = payload[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if marker != 0x2C:
            raise GifError(f"unexpected block 0x{marker:02x}")
        left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        frame_pal, pal_n = palette, gct_n
        if ipacked & 0x80:  # local color table overrides the global one
            pal_n = 2 << (ipacked & 0x07)
            frame_pal = np.frombuffer(
                payload, np.uint8, pal_n * 3, pos
            ).reshape(-1, 3)
            pos += pal_n * 3
        min_code_size = payload[pos]
        pos += 1
        chunks = bytearray()
        while payload[pos]:
            ln = payload[pos]
            chunks += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = lzw_decode(bytes(chunks), min_code_size)
        if len(idx) != iw * ih:
            raise GifError(
                f"decoded {len(idx)} pixels for {iw}x{ih} frame"
            )
        if idx.max(initial=0) >= pal_n:
            raise GifError("pixel index outside color table")
        idx = idx.reshape(ih, iw)
        if ipacked & 0x40:  # de-interlace: scatter stored rows back
            out = np.empty_like(idx)
            out[_interlace_order(ih)] = idx
            idx = out
        rgb = frame_pal[idx]
        return np.ascontiguousarray(rgb), pal_n
    raise GifError("no image descriptor before trailer")


# ---------------------------------------------------------------------------
# Animation: multi-frame encode + composited decode (GIF89a §23 GCE)
# ---------------------------------------------------------------------------


def encode_gif_frames(
    screen_wh: tuple[int, int],
    frames: list[dict],
    palette: np.ndarray,
) -> bytes:
    """Animated GIF89a: logical screen + one image block per frame.

    Each frame dict: ``indices`` (h, w) uint8, ``left``/``top`` offsets,
    ``disposal`` (0/1/2), optional ``transparent`` index (None = opaque).
    All frames share the global color table; background index is 0.
    """
    sw, sh = screen_wh
    pal, size_bits = _padded_palette(palette)
    min_code_size = max(2, size_bits)
    out = bytearray()
    out += b"GIF89a"
    packed = 0x80 | ((size_bits - 1) << 4) | (size_bits - 1)
    out += struct.pack("<HHBBB", sw, sh, packed, 0, 0)
    out += pal.tobytes()
    for fr in frames:
        idx = fr["indices"]
        if idx.ndim != 2:
            raise GifError("frame indices must be (h, w)")
        fh, fw = idx.shape
        left, top = fr.get("left", 0), fr.get("top", 0)
        if left + fw > sw or top + fh > sh:
            raise GifError("frame exceeds logical screen")
        if idx.max(initial=0) >= len(pal):
            raise GifError("index exceeds palette")
        disposal = fr.get("disposal", 0)
        transparent = fr.get("transparent")
        gce_packed = (disposal & 0x07) << 2
        tidx = 0
        if transparent is not None:
            gce_packed |= 0x01
            tidx = int(transparent)
        out += b"\x21\xf9\x04" + bytes([gce_packed, 0, 0, tidx, 0])
        out += b"\x2c" + struct.pack("<HHHHB", left, top, fw, fh, 0)
        out.append(min_code_size)
        data = lzw_encode(idx.ravel(), min_code_size)
        for i in range(0, len(data), 255):
            block = data[i : i + 255]
            out.append(len(block))
            out += block
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """Animated GIF -> list of composited (screen_h, screen_w, 3) RGB
    frames. Honors GCE disposal 0/1 (leave) and 2 (restore background),
    the transparency index, and frame offsets; disposal 3 is rejected."""
    if payload[:6] not in GIF_SIGNATURES:
        raise GifError("not a GIF signature")
    sw, sh, packed, bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    if not packed & 0x80:
        raise GifError("global color table required in this scope")
    gct_n = 2 << (packed & 0x07)
    palette = np.frombuffer(payload, np.uint8, gct_n * 3, pos).reshape(-1, 3)
    pos += gct_n * 3
    if bg >= gct_n:
        raise GifError("background index outside color table")
    canvas = np.empty((sh, sw), np.uint8)
    canvas[:] = bg
    composites: list[np.ndarray] = []
    disposal = 0
    transparent: int | None = None
    while pos < len(payload):
        marker = payload[pos]
        pos += 1
        if marker == 0x3B:
            break
        if marker == 0x21:
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # Graphic Control Extension
                blen = payload[pos]
                if blen != 4:
                    raise GifError("bad GCE block size")
                gce_packed = payload[pos + 1]
                disposal = (gce_packed >> 2) & 0x07
                if disposal == 3:
                    raise GifError("disposal 3 (restore previous) rejected")
                if disposal > 3:
                    raise GifError(f"reserved disposal {disposal}")
                transparent = (
                    payload[pos + 4] if gce_packed & 0x01 else None
                )
                pos += 5
                if payload[pos]:
                    raise GifError("unterminated GCE")
                pos += 1
            else:  # other extensions: skip sub-blocks
                while payload[pos]:
                    pos += 1 + payload[pos]
                pos += 1
            continue
        if marker != 0x2C:
            raise GifError(f"unexpected block 0x{marker:02x}")
        left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        frame_pal, pal_n = palette, gct_n
        if ipacked & 0x80:
            pal_n = 2 << (ipacked & 0x07)
            frame_pal = np.frombuffer(
                payload, np.uint8, pal_n * 3, pos
            ).reshape(-1, 3)
            pos += pal_n * 3
        if left + iw > sw or top + ih > sh:
            raise GifError("frame exceeds logical screen")
        min_code_size = payload[pos]
        pos += 1
        chunks = bytearray()
        while payload[pos]:
            ln = payload[pos]
            chunks += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = lzw_decode(bytes(chunks), min_code_size)
        if len(idx) != iw * ih:
            raise GifError(f"decoded {len(idx)} pixels for {iw}x{ih} frame")
        if idx.max(initial=0) >= pal_n:
            raise GifError("pixel index outside color table")
        idx = idx.reshape(ih, iw)
        if ipacked & 0x40:
            out = np.empty_like(idx)
            out[_interlace_order(ih)] = idx
            idx = out
        region = canvas[top : top + ih, left : left + iw]
        if transparent is None:
            region[:] = idx
        else:
            np.copyto(region, idx, where=(idx != transparent))
        # composite snapshot (frames may use local palettes only when the
        # whole frame covers the screen — mixed-palette compositing would
        # need an RGB canvas; reject the ambiguous case loudly)
        if ipacked & 0x80 and (iw, ih) != (sw, sh):
            raise GifError(
                "partial frame with local palette needs RGB compositing"
            )
        composites.append(np.ascontiguousarray(frame_pal[canvas]))
        if disposal == 2:
            canvas[top : top + ih, left : left + iw] = bg
        disposal = 0
        transparent = None
    if not composites:
        raise GifError("no image descriptor before trailer")
    return composites
