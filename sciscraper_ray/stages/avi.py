"""Minimal RIFF/AVI (MJPEG) container codec — from scratch.

Writer + strict parser for the subset a crawl-side video feature pass
needs: a single ``vids`` stream with fourcc ``MJPG`` (one baseline JPEG
per ``00dc`` chunk, decodable by the from-scratch codec in
``stages/jpeg.py``), the ``hdrl`` header pair (``avih`` + ``strh``/
``strf``), a ``movi`` data list, and an ``idx1`` index. The layout
follows the public AVI RIFF specification (Microsoft "AVI RIFF File
Reference"); chunk sizes are word-aligned, so odd payloads carry one
pad byte that the size field does NOT count.

Together with ``stages/mp4.py`` (ISO BMFF metadata walk) this closes
the video tier's honest gap: MP4 parses the container for real while
its H.264 payloads stay import-gated, and AVI/MJPEG decodes actual
FRAMES for real, end to end, with no third-party codec.

Reference behavior parity: the reference validates and routes binary
payloads by sniffing their container bytes
(``/root/reference/src/downloaders.py:283-366``); this module is the
video-container member of that family.
"""

from __future__ import annotations

import struct

import numpy as np


class AviError(ValueError):
    """Malformed or unsupported AVI payload."""


_AVIH = struct.Struct("<14I")  # dwMicroSecPerFrame .. dwHeight + 4 reserved
_STRH = struct.Struct("<4s4sI2HIIIIIIiI4H")
_BMIH = struct.Struct("<I2i2H2I2i2I")


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int
) -> bytes:
    """JPEG frame payloads -> AVI bytes (single MJPG video stream).

    ``fps`` is carried exactly as ``strh`` dwRate/dwScale = fps/1, so the
    parser recovers it without the microseconds-per-frame rounding the
    ``avih`` field suffers.
    """
    if not frames:
        raise AviError("encode: at least one frame required")
    n = len(frames)
    max_size = max(len(f) for f in frames)
    avih = _AVIH.pack(
        round(1_000_000 / fps), max_size * fps, 0, 0x10,  # AVIF_HASINDEX
        n, 0, 1, max_size, width, height, 0, 0, 0, 0,
    )
    strh = _STRH.pack(
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, n, max_size, -1, 0,
        0, 0, width, height,
    )
    strf = _BMIH.pack(40, width, height, 1, 24, 0x47504A4D,  # 'MJPG'
                      width * height * 3, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_body)
    # idx1 offsets are relative to the start of the 'movi' list type word
    idx_entries, off = [], 4
    for f in frames:
        idx_entries.append(struct.pack("<4s3I", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_size); enforce alignment."""
    while pos < end:
        if pos + 8 > end:
            raise AviError("truncated chunk header")
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        start = pos + 8
        if start + size > end:
            raise AviError(f"chunk {fourcc!r} overruns its parent")
        yield fourcc, start, size
        pos = start + size + (size % 2)


def parse_avi(data: bytes) -> dict:
    """AVI bytes -> {width, height, fps, n_frames, duration_s, frames}.

    Strict: RIFF/AVI magic, header presence, MJPG fourcc, and
    header-vs-movi frame-count consistency are all enforced — a silent
    pass on a malformed container would poison every downstream feature.
    """
    if len(data) < 12 or data[:4] != b"RIFF":
        raise AviError("not a RIFF file")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if data[8:12] != b"AVI ":
        raise AviError("RIFF form is not 'AVI '")
    end = min(8 + riff_size, len(data))

    avih = strh = None
    frames: list[bytes] = []
    for fourcc, start, size in _iter_chunks(data, 12, end):
        if fourcc != b"LIST":
            continue
        ltype = data[start : start + 4]
        if ltype == b"hdrl":
            for f2, s2, z2 in _iter_chunks(data, start + 4, start + size):
                if f2 == b"avih":
                    avih = _AVIH.unpack_from(data, s2)
                elif f2 == b"LIST" and data[s2 : s2 + 4] == b"strl":
                    for f3, s3, z3 in _iter_chunks(data, s2 + 4, s2 + z2):
                        if f3 == b"strh":
                            strh = _STRH.unpack_from(data, s3)
        elif ltype == b"movi":
            for f2, s2, z2 in _iter_chunks(data, start + 4, start + size):
                if f2[2:4] == b"dc":
                    frames.append(data[s2 : s2 + z2])
    if avih is None or strh is None:
        raise AviError("missing avih/strh header")
    if strh[0] != b"vids" or strh[1] != b"MJPG":
        raise AviError(f"unsupported stream {strh[0]!r}/{strh[1]!r}")
    scale, rate = strh[6], strh[7]
    if scale <= 0 or rate <= 0:
        raise AviError("bad strh rate/scale")
    n_frames, width, height = avih[4], avih[8], avih[9]
    if n_frames != len(frames):
        raise AviError(
            f"avih claims {n_frames} frames, movi holds {len(frames)}"
        )
    fps = rate / scale
    return {
        "width": width,
        "height": height,
        "fps": fps,
        "n_frames": n_frames,
        "duration_s": n_frames / fps,
        "frames": frames,
    }


def decode_avi_frames(
    data: bytes, stride: int = 1
) -> tuple[dict, list[tuple[int, np.ndarray]]]:
    """Parse + decode every ``stride``-th MJPEG frame via stages/jpeg.py.

    Returns (container_info_without_frames, [(frame_no, pixels), ...]).
    """
    from sciscraper_ray.stages.jpeg import decode_jpeg

    info = parse_avi(data)
    out = [
        (k, decode_jpeg(info["frames"][k]))
        for k in range(0, info["n_frames"], stride)
    ]
    info = {k: v for k, v in info.items() if k != "frames"}
    return info, out
