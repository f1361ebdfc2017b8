"""Aho-Corasick automaton: classic overlap fixture, brute-force parity,
empty/edge inputs, and UTF-8 multi-byte safety."""

from __future__ import annotations

import random

import numpy as np
import pytest

from sciscraper_ray.stages.aho import AhoCorasick


def test_classic_ushers_fixture():
    ac = AhoCorasick(["he", "she", "his", "hers"])
    assert ac.scan_counts("ushers").tolist() == [1, 1, 0, 1]


def test_brute_force_parity_random_texts():
    pats = ["he", "she", "his", "hers", "the", "there", "her", "ab", "abc"]
    ac = AhoCorasick(pats)
    rng = random.Random(5)
    for _ in range(60):
        t = "".join(
            rng.choice("abcdefghirstu ") for _ in range(rng.randrange(0, 200))
        )
        want = [
            sum(1 for i in range(len(t)) if t.startswith(p, i)) for p in pats
        ]
        assert ac.scan_counts(t).tolist() == want, t


def test_self_overlapping_pattern_counts_all():
    # "aa" in "aaaa" -> 3 overlapping occurrences (Aho counts all)
    ac = AhoCorasick(["aa"])
    assert ac.scan_counts("aaaa").tolist() == [3]


def test_duplicate_and_nested_patterns():
    ac = AhoCorasick(["ab", "ab", "abc"])
    c = ac.scan_counts("zabcab")
    assert c.tolist() == [2, 2, 1]


def test_empty_text_and_batch():
    ac = AhoCorasick(["x"])
    assert ac.scan_counts("").tolist() == [0]
    out = ac.scan_batch(["", None, "xx"])
    assert out.tolist() == [[0], [0], [2]]


def test_utf8_multibyte_patterns():
    ac = AhoCorasick(["é", "éé", "e"])
    assert ac.scan_counts("éée").tolist() == [2, 1, 1]


def test_rejects_empty_inputs():
    with pytest.raises(ValueError):
        AhoCorasick([])
    with pytest.raises(ValueError):
        AhoCorasick(["ok", ""])
