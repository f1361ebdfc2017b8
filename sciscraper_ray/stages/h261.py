"""From-scratch H.261-class intra-only video codec (VERDICT r4 item 8).

Closes the last "needs an external codec" claim in the video tier: MP4
parses container metadata, AVI/MJPEG decodes real frames, and this module
decodes a REAL DCT-transform video bitstream layer — picture / GOB /
macroblock / block syntax with variable-length transform coefficients —
built entirely from the public ITU-T H.261 specification (the TCOEFF
run/level VLC is the table H.261 shares with MPEG-1 Table B.14; zigzag,
the quantizer reconstruction rule rec = q*(2L+1) [-1 when q is even], and
the 8-bit intra-DC FLC are likewise spec-transcribed). Reference for the
repo contract: /root/reference has no video at all
(src/downloaders.py:283-366 is images/PDF only) — this tier is a rebuild
addition, like the JPEG/PNG/GIF codecs it sits beside.

DECLARED SCOPE (explicit rejections, never silently wrong — the png.py
Adam7 pattern):
  - intra pictures only: no inter prediction, no motion vectors, no loop
    filter (an all-INTRA H.261 stream is valid H.261; this is the
    "Fast Update" / gateway-refresh mode);
  - QCIF (176x144) and CIF (352x288) source formats, 4:2:0;
  - every macroblock coded (MBA always 1), one GQUANT per GOB.

The encoder exists to synthesize deterministic fixtures; encoder and
decoder share the one table module, and the round-trip test drives
non-constant frames through every syntax element including the 20-bit
ESCAPE path.
"""

from __future__ import annotations

import numpy as np

from sciscraper_ray.stages.jpeg import _fdct_blocks, _idct_blocks


class H261Error(ValueError):
    pass


# --- bit IO (no byte stuffing in H.261, unlike JPEG) -----------------------


class _Bits:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
            self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.put(0, 8 - self.n)  # zero-pad, cannot alias PSC prefix
        return bytes(self.out)


class _BitView:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def get(self, n: int) -> int:
        if self.pos + n > 8 * len(self.data):
            raise H261Error("bitstream exhausted")
        v = 0
        p = self.pos
        d = self.data
        for _ in range(n):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def bits_left(self) -> int:
        return 8 * len(self.data) - self.pos


# --- spec tables -----------------------------------------------------------

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    np.int64,
)

# TCOEFF VLC, (run, |level|) -> bitstring WITHOUT the trailing sign bit
# (0 = positive). Transcribed from ITU-T H.261 (shared with MPEG-1 B.14).
# The "first coefficient" 1-bit form for (0,1) applies only to inter
# blocks, which are out of scope — intra ACs always use "11".
_TCOEFF = {
    (0, 1): "11", (0, 2): "0100", (0, 3): "00101", (0, 4): "0000110",
    (0, 5): "00100110", (0, 6): "00100001", (0, 7): "0000001010",
    (0, 8): "000000011101", (0, 9): "000000011000",
    (0, 10): "000000010011", (0, 11): "000000010000",
    (0, 12): "0000000011010", (0, 13): "0000000011001",
    (0, 14): "0000000011000", (0, 15): "0000000010111",
    (1, 1): "011", (1, 2): "000110", (1, 3): "00100101",
    (1, 4): "0000001100", (1, 5): "000000011011",
    (1, 6): "0000000010110", (1, 7): "0000000010101",
    (2, 1): "0101", (2, 2): "0000100", (2, 3): "0000001011",
    (2, 4): "000000010100", (2, 5): "0000000010100",
    (3, 1): "00111", (3, 2): "00100100", (3, 3): "000000011100",
    (3, 4): "0000000010011",
    (4, 1): "00110", (4, 2): "0000001111", (4, 3): "000000010010",
    (5, 1): "000111", (5, 2): "0000001001", (5, 3): "0000000010010",
    (6, 1): "000101", (6, 2): "000000011110",
    (7, 1): "000100", (7, 2): "000000010101",
    (8, 1): "0000111", (8, 2): "000000010001",
    (9, 1): "0000101", (9, 2): "0000000010001",
    (10, 1): "00100111", (10, 2): "0000000010000",
    (11, 1): "00100011", (12, 1): "00100010", (13, 1): "00100000",
    (14, 1): "0000001110", (15, 1): "0000001101", (16, 1): "0000001000",
    (17, 1): "000000011111", (18, 1): "000000011010",
    (19, 1): "000000011001", (20, 1): "000000010111",
    (21, 1): "000000010110", (22, 1): "0000000011111",
    (23, 1): "0000000011110", (24, 1): "0000000011101",
    (25, 1): "0000000011100", (26, 1): "0000000011011",
}
_EOB = "10"
_ESC = "000001"

_TCOEFF_DEC = {v: k for k, v in _TCOEFF.items()}
_TCOEFF_MAXLEN = max(len(v) for v in _TCOEFF.values())
assert len(_TCOEFF_DEC) == len(_TCOEFF)

# MBA VLC for increments 1..8 (the encoder only emits 1; the decoder
# accepts the table so a conforming all-coded stream parses).
_MBA = {
    1: "1", 2: "011", 3: "010", 4: "0011", 5: "0010",
    6: "00011", 7: "00010", 8: "0000111",
}
_MBA_DEC = {v: k for k, v in _MBA.items()}
_MTYPE_INTRA = "0001"

_PSC = (0x00010, 20)  # 0000 0000 0000 0001 0000
_GBSC = (0x0001, 16)

_FORMATS = {(176, 144): 0, (352, 288): 1}  # PTYPE source-format bit
_GOB_GRID = {0: (1, 3), 1: (2, 6)}  # (gob cols, gob rows); GOB = 176x48


# --- quantization ----------------------------------------------------------


def _quant_intra_ac(coefs: np.ndarray, q: int) -> np.ndarray:
    """LEVEL = COEF / (2*QUANT), truncated toward zero (spec intra rule)."""
    return np.trunc(coefs / (2.0 * q)).astype(np.int64)


def _dequant_ac(levels: np.ndarray, q: int) -> np.ndarray:
    """rec = q*(2L+1), minus 1 toward zero when q is even; 0 stays 0."""
    mag = np.abs(levels)
    rec = q * (2 * mag + 1)
    if q % 2 == 0:
        rec -= 1
    rec = np.where(mag == 0, 0, rec)
    return np.sign(levels) * rec


# --- block layer -----------------------------------------------------------


def _put_block(bits: _Bits, block: np.ndarray, q: int) -> None:
    flat = np.asarray(block).ravel()
    if (flat == flat[0]).all():
        # constant block: DC = 8*v exactly (orthonormal DCT), zero ACs —
        # skip the transform and emit DC + EOB directly
        bits.put(int(np.clip(flat[0], 1, 254)), 8)
        for c in _EOB:
            bits.put(c == "1", 1)
        return
    coefs = _fdct_blocks(block[None].astype(np.float64) - 0.0)[0]
    zz = coefs.ravel()[_ZIGZAG]
    dc_idx = int(np.clip(np.round(zz[0] / 8.0), 1, 254))
    bits.put(dc_idx, 8)
    # encoder-side clip to the escape-representable range, the standard
    # rate-control floor (the decoder never sees an out-of-range level)
    levels = np.clip(_quant_intra_ac(zz[1:], q), -127, 127)
    run = 0
    for lv in levels:
        lv = int(lv)
        if lv == 0:
            run += 1
            continue
        mag = abs(lv)
        code = _TCOEFF.get((run, mag))
        if code is not None and mag <= 15:  # spec: VLC covers these
            for c in code:
                bits.put(c == "1", 1)
            bits.put(lv < 0, 1)  # sign
        else:  # 20-bit ESCAPE: 6 esc + 6 run + 8 level (two's complement)
            if not (-127 <= lv <= 127):
                raise H261Error("level out of escape range")
            for c in _ESC:
                bits.put(c == "1", 1)
            bits.put(run, 6)
            bits.put(lv & 0xFF, 8)
        run = 0
    for c in _EOB:
        bits.put(c == "1", 1)


def _get_block(bv: _BitView, q: int) -> np.ndarray:
    zz = np.zeros(64, np.int64)
    zz[0] = bv.get(8) * 8  # INTRADC FLC, rec = idx*8
    idx = 1
    while True:
        # prefix-match against EOB / ESC / TCOEFF
        code = ""
        for _ in range(_TCOEFF_MAXLEN + 1):
            code += "1" if bv.get(1) else "0"
            if code == _EOB:
                spatial = np.zeros(64, np.float64)
                spatial[_ZIGZAG] = zz.astype(np.float64)
                return _idct_blocks(spatial.reshape(1, 8, 8))[0]
            if code == _ESC:
                run = bv.get(6)
                raw = bv.get(8)
                lv = raw - 256 if raw >= 128 else raw
                if lv == 0 or lv == -128:
                    raise H261Error("forbidden escape level")
                break
            rl = _TCOEFF_DEC.get(code)
            if rl is not None:
                run, mag = rl
                lv = -mag if bv.get(1) else mag
                break
        else:
            raise H261Error("invalid TCOEFF code")
        idx += run
        if idx > 63:
            raise H261Error("coefficient run past block end")
        zz[idx] = int(_dequant_ac(np.array([lv]), q)[0])
        idx += 1


# --- picture layer ---------------------------------------------------------


def encode_h261_intra(
    frames_y: list[np.ndarray],
    frames_cb: list[np.ndarray] | None = None,
    frames_cr: list[np.ndarray] | None = None,
    q: int = 8,
) -> bytes:
    """All-INTRA H.261-class stream from luma frames (uint8, QCIF or
    CIF). Missing chroma encodes as constant 128."""
    if not frames_y:
        raise H261Error("no frames")
    h, w = frames_y[0].shape
    if (w, h) not in _FORMATS:
        raise H261Error(
            f"unsupported source format {w}x{h}: H.261-class scope is "
            "QCIF 176x144 / CIF 352x288 (declared rejection)"
        )
    fmt = _FORMATS[(w, h)]
    gob_cols, gob_rows = _GOB_GRID[fmt]
    if not (1 <= q <= 31):
        raise H261Error("QUANT out of range 1..31")
    bits = _Bits()
    for t, y in enumerate(frames_y):
        if y.shape != (h, w):
            raise H261Error("frame size changed mid-stream")
        cb = (
            frames_cb[t]
            if frames_cb is not None
            else np.full((h // 2, w // 2), 128, np.uint8)
        )
        cr = (
            frames_cr[t]
            if frames_cr is not None
            else np.full((h // 2, w // 2), 128, np.uint8)
        )
        bits.put(*_PSC)
        bits.put(t & 0x1F, 5)  # TR
        bits.put(0b001000 | (fmt << 2), 6)  # PTYPE: bit4 on, src format
        bits.put(0, 1)  # PEI
        for gr in range(gob_rows):
            for gc in range(gob_cols):
                gn = gr * gob_cols + gc + 1 if fmt else 2 * gr + 1
                bits.put(*_GBSC)
                bits.put(gn, 4)
                bits.put(q, 5)  # GQUANT
                bits.put(0, 1)  # GEI
                gy0, gx0 = gr * 48, gc * 176
                for mb in range(33):  # 11x3 macroblocks per GOB
                    my = gy0 + (mb // 11) * 16
                    mx = gx0 + (mb % 11) * 16
                    bits.put(1, 1)  # MBA increment 1
                    for c in _MTYPE_INTRA:
                        bits.put(c == "1", 1)
                    for by, bx in ((0, 0), (0, 8), (8, 0), (8, 8)):
                        _put_block(
                            bits,
                            y[my + by : my + by + 8, mx + bx : mx + bx + 8],
                            q,
                        )
                    cy, cx = my // 2, mx // 2
                    _put_block(bits, cb[cy : cy + 8, cx : cx + 8], q)
                    _put_block(bits, cr[cy : cy + 8, cx : cx + 8], q)
    return bits.flush()


def decode_h261_intra(payload: bytes):
    """payload -> (width, height, list of (h, w) uint8 luma frames).
    Chroma planes are decoded (the syntax requires them) but only luma is
    returned — the featurization consumer reads luma stats."""
    bv = _BitView(payload)
    frames: list[np.ndarray] = []
    w = h = None
    while bv.bits_left() >= 32:
        if bv.get(_PSC[1]) != _PSC[0]:
            raise H261Error("expected picture start code")
        bv.get(5)  # TR
        ptype = bv.get(6)
        bv.get(1)  # PEI (extension scope: none)
        fmt = (ptype >> 2) & 1
        w, h = (352, 288) if fmt else (176, 144)
        gob_cols, gob_rows = _GOB_GRID[fmt]
        y = np.zeros((h, w), np.float64)
        for gr in range(gob_rows):
            for gc in range(gob_cols):
                if bv.get(_GBSC[1]) != _GBSC[0]:
                    raise H261Error("expected GOB start code")
                bv.get(4)  # GN
                q = bv.get(5)
                if not 1 <= q <= 31:
                    raise H261Error("GQUANT out of range")
                bv.get(1)  # GEI
                gy0, gx0 = gr * 48, gc * 176
                for mb in range(33):
                    code = ""
                    for _ in range(12):
                        code += "1" if bv.get(1) else "0"
                        if code in _MBA_DEC:
                            if _MBA_DEC[code] != 1:
                                raise H261Error(
                                    "skipped macroblocks: out of declared "
                                    "all-coded intra scope"
                                )
                            break
                    else:
                        raise H261Error("invalid MBA code")
                    mt = ""
                    for _ in range(10):
                        mt += "1" if bv.get(1) else "0"
                        if mt == _MTYPE_INTRA:
                            break
                        if len(mt) >= 10:
                            raise H261Error(
                                "non-INTRA MTYPE: inter prediction is out "
                                "of declared scope"
                            )
                    my = gy0 + (mb // 11) * 16
                    mx = gx0 + (mb % 11) * 16
                    for by, bx in ((0, 0), (0, 8), (8, 0), (8, 8)):
                        y[my + by : my + by + 8, mx + bx : mx + bx + 8] = (
                            _get_block(bv, q)
                        )
                    _get_block(bv, q)  # Cb (decoded, not returned)
                    _get_block(bv, q)  # Cr
        frames.append(np.clip(np.round(y), 0, 255).astype(np.uint8))
    if w is None:
        raise H261Error("no picture in stream")
    return w, h, frames
