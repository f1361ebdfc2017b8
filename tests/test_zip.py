"""From-scratch ZIP reader: stdlib zipfile as producer (stored +
deflated members, comments), composition with the from-scratch
inflater, CRC verification, and scope rejections."""

from __future__ import annotations

import io
import random
import zipfile

import pytest

from sciscraper_ray.kernels.zip import ZipError, zip_members


def _build(files, comment=b""):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, content, method in files:
            zf.writestr(name, content, compress_type=method)
        if comment:
            zf.comment = comment
    return buf.getvalue()


def test_stored_and_deflated_members_with_comment():
    rng = random.Random(5)
    files = [
        ("a.txt", b"hello stored", zipfile.ZIP_STORED),
        ("dir/b.txt", b"deflate me " * 500, zipfile.ZIP_DEFLATED),
        (
            "rand.bin",
            bytes(rng.randrange(256) for _ in range(5000)),
            zipfile.ZIP_DEFLATED,
        ),
        ("empty", b"", zipfile.ZIP_DEFLATED),
    ]
    members = zip_members(_build(files, b"a zip comment here"))
    assert [(m["name"], m["payload"]) for m in members] == [
        (n, c) for n, c, _ in files
    ]
    assert members[0]["method"] == 0 and members[1]["method"] == 8


def test_payload_corruption_caught_by_crc():
    arc = bytearray(
        _build([("a.txt", b"hello stored", zipfile.ZIP_STORED)])
    )
    off = bytes(arc).index(b"hello stored")
    arc[off] ^= 0xFF
    with pytest.raises(ZipError, match="CRC"):
        zip_members(bytes(arc))


def test_malformed_rejected():
    with pytest.raises(ZipError, match="end-of-central"):
        zip_members(b"PK\x03\x04 but no directory")
    good = _build([("x", b"y", zipfile.ZIP_STORED)])
    bad = bytearray(good)
    cd = bytes(good).index(b"PK\x01\x02")
    bad[cd + 3] ^= 0xFF
    with pytest.raises(ZipError):
        zip_members(bytes(bad))
