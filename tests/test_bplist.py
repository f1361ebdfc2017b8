"""Binary plist reader: parity against stdlib plistlib (the real
producer/parser) over nested trees, every scalar type, extended
lengths, and malformed input."""

from __future__ import annotations

import datetime
import plistlib
import random

import pytest

from sciscraper_ray.kernels.bplist import BplistError, bplist_parse


def _sample():
    return {
        "title": "crawl metadata",
        "unicode": "café résumé — ünïcødé",
        "count": 12345678901234,
        "neg": -42,
        "ratio": 0.75,
        "flag": True,
        "off": False,
        "nothing": None,
        "blob": bytes(range(200)),
        "when": datetime.datetime(2026, 8, 20, 12, 0, 0),
        "nested": {
            "a": [1, 2, 3, "four", {"deep": [True, None]}],
            "long": "x" * 5000,  # extended-length ascii string
        },
        "biglist": list(range(300)),  # extended-length array
    }


def test_parity_with_plistlib():
    raw = plistlib.dumps(_sample(), fmt=plistlib.FMT_BINARY)
    assert bplist_parse(raw) == plistlib.loads(raw)


def test_random_trees():
    rng = random.Random(41)

    def tree(depth):
        if depth == 0:
            return rng.choice(
                [rng.randrange(-1000, 10**12), "s%d" % rng.randrange(99),
                 rng.random(), True, False, bytes([rng.randrange(256)]) * 3]
            )
        k = rng.randrange(3)
        if k == 0:
            return [tree(depth - 1) for _ in range(rng.randrange(5))]
        if k == 1:
            return {
                "k%d" % i: tree(depth - 1) for i in range(rng.randrange(4))
            }
        return tree(0)

    for _ in range(30):
        obj = {"root": tree(3)}
        raw = plistlib.dumps(obj, fmt=plistlib.FMT_BINARY)
        got = bplist_parse(raw)
        want = plistlib.loads(raw)
        assert _approx(got, want), (got, want)


def _approx(a, b):
    # float roundtrips are exact (IEEE 754 doubles both ways)
    if isinstance(a, dict):
        return set(a) == set(b) and all(_approx(a[k], b[k]) for k in a)
    if isinstance(a, list):
        return len(a) == len(b) and all(_approx(x, y) for x, y in zip(a, b))
    return a == b


def test_malformed_rejected():
    with pytest.raises(BplistError, match="magic"):
        bplist_parse(b"not a plist at all, truly" + b"\x00" * 40)
    raw = bytearray(plistlib.dumps({"a": 1}, fmt=plistlib.FMT_BINARY))
    raw[0] ^= 0xFF
    with pytest.raises(BplistError):
        bplist_parse(bytes(raw))
    with pytest.raises(BplistError, match="trailer"):
        bplist_parse(b"bplist00" + b"\x00" * 8)
