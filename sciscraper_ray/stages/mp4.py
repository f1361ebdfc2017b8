"""From-scratch ISO BMFF (MP4) container parser — metadata tier only.

Real-format video for the multimodal tier: a standards-shaped box walk
(size/type headers, 64-bit largesize, nested container boxes) extracting
``ftyp`` brand, ``mvhd`` timescale/duration and ``tkhd`` track dimensions.
Frame DECODE (H.264/H.265 entropy + transform) genuinely needs an
out-of-container codec and stays behind the import gate in
``stages/multimodal.py`` — this parser makes the container-level half of
the video path honest, the same split a real crawl pipeline uses
(metadata harvest everywhere, frame decode on a GPU-codec tier).

A writer for deterministic fixtures is included; both sides are pure
``struct`` over bounded headers (payload ``mdat`` bytes are never
touched), so a multi-GB clip parses in microseconds.
"""
from __future__ import annotations

import struct

CONTAINER_BOXES = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


class Mp4Error(ValueError):
    pass


def encode_mp4_stub(
    timescale: int,
    duration: int,
    width: int,
    height: int,
    brand: bytes = b"isom",
    mdat_size: int = 0,
) -> bytes:
    """Minimal valid ISO BMFF: ftyp + moov(mvhd, trak(tkhd)) + mdat."""

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + typ + body

    ftyp = box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    mvhd = box(
        b"mvhd",
        struct.pack(">BxxxIIII", 0, 0, 0, timescale, duration)
        + b"\x00" * 80,  # rate/volume/matrix/predefined/next_track_id
    )
    tkhd = box(
        b"tkhd",
        struct.pack(">BxxxIIIxxxx", 0, 0, 0, 1)  # version/flags, times, id
        + struct.pack(">I", duration)
        + b"\x00" * 52  # reserved/layer/volume/matrix
        + struct.pack(">II", width << 16, height << 16),  # 16.16 fixed
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    mdat = box(b"mdat", b"\x00" * mdat_size)
    return ftyp + moov + mdat


def parse_mp4(payload: bytes) -> dict:
    """-> {brand, timescale, duration, duration_s, width, height}.

    Walks the box tree iteratively; unknown boxes are skipped by size,
    size-0 ("to end of file") and 64-bit largesize headers are honored,
    truncated boxes raise ``Mp4Error``.
    """
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise Mp4Error("not an ISO BMFF payload (missing ftyp)")
    out: dict = {
        "brand": payload[8:12].decode("latin-1"),
        "timescale": None,
        "duration": None,
        "width": None,
        "height": None,
    }
    stack = [(0, len(payload))]
    while stack:
        pos, end = stack.pop()
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", payload[pos : pos + 4])
            typ = payload[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize
                if body + 8 > end:
                    raise Mp4Error("truncated largesize box")
                (size,) = struct.unpack(">Q", payload[body : body + 8])
                body += 8
            elif size == 0:  # to end of enclosing scope
                size = end - pos
            if size < 8 or pos + size > end:
                raise Mp4Error(f"box {typ!r} overruns container")
            if typ in CONTAINER_BOXES:
                stack.append((pos + size, end))
                end = pos + size
                pos = body
                continue
            if typ == b"mvhd":
                version = payload[body]
                if version == 1:
                    ts, dur = struct.unpack(
                        ">IQ", payload[body + 20 : body + 32]
                    )
                else:
                    _, _, ts, dur = struct.unpack(
                        ">IIII", payload[body + 4 : body + 20]
                    )
                out["timescale"], out["duration"] = ts, dur
            elif typ == b"tkhd":
                version = payload[body]
                # ver/flags + creation/mod times + track_ID + reserved
                off = body + (28 if version == 1 else 20)
                off += 8 if version == 1 else 4  # duration
                off += 52  # reserved + layer/group/volume + matrix
                w, h = struct.unpack(">II", payload[off : off + 8])
                out["width"], out["height"] = w >> 16, h >> 16
            pos += size
    if out["timescale"]:
        out["duration_s"] = out["duration"] / out["timescale"]
    else:
        out["duration_s"] = None
    return out
