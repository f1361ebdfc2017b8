"""From-scratch tar walker: parity against stdlib tarfile in ustar, pax
and GNU modes, long names, nested prefixes, and corruption errors."""

from __future__ import annotations

import io
import random
import tarfile

import pytest

from sciscraper_ray.kernels.tar import TarError, tar_members


def _build(fmt, files):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=fmt) as tf:
        for name, content in files:
            info = tarfile.TarInfo(name)
            info.size = len(content)
            tf.addfile(info, io.BytesIO(content))
    return buf.getvalue()


def _sample_files(long_names):
    rng = random.Random(3)
    files = [
        ("sample_0001.txt", b"hello world"),
        ("sample_0001.json", b'{"id": 1}'),
        (
            "deep/nested/dir/structure/sample_0001.bin",
            bytes(rng.randrange(256) for _ in range(1500)),
        ),
        ("empty.txt", b""),
    ]
    if long_names:
        files.append(("x" * 150 + ".txt", b"long name member"))
    return files


@pytest.mark.parametrize(
    "fmt,long_names",
    [
        (tarfile.USTAR_FORMAT, False),  # ustar rejects >100-char names
        (tarfile.PAX_FORMAT, True),  # PAX 'x' path records
        (tarfile.GNU_FORMAT, True),  # GNU 'L' long-name entries
    ],
)
def test_parity_against_stdlib(fmt, long_names):
    files = _sample_files(long_names)
    members = tar_members(_build(fmt, files))
    assert [(m["name"], m["payload"]) for m in members] == files
    assert all(m["size"] == len(c) for m, (_, c) in zip(members, files))


def test_ustar_prefix_splitting():
    # a path long enough to need the 155-byte prefix field, short enough
    # for ustar to accept (each component <= 100)
    name = "/".join(["d" * 30] * 4) + "/leaf.txt"
    members = tar_members(_build(tarfile.USTAR_FORMAT, [(name, b"x")]))
    assert members[0]["name"] == name


def test_corruption_and_truncation_loud():
    arc = bytearray(_build(tarfile.PAX_FORMAT, _sample_files(True)))
    arc[50] ^= 0xFF
    with pytest.raises(TarError, match="checksum"):
        tar_members(bytes(arc))
    good = _build(tarfile.USTAR_FORMAT, [("a.txt", b"abc")])
    # header + padded payload only: no end-of-archive zero blocks at all
    # (tarfile pads the full record to 10240, so strip everything after)
    with pytest.raises(TarError, match="end-of-archive"):
        tar_members(good[:1024])
    with pytest.raises(TarError, match="truncated"):
        tar_members(good[:600])
