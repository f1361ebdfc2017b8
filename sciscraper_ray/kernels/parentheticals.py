"""Parenthetical-statistic mining: ``(p = .05)``-style spans.

Reference: ``PAPER_STATISTIC = re.compile(r"\\(.*\\=.*\\)")`` applied with
``findall`` over the full preprint (/root/reference/src/docscraper.py:15,171).
The greedy ``.*`` (no DOTALL) yields at most one match per line — that
greediness is part of the pinned contract.
"""

from __future__ import annotations

import re

import numpy as np

PAPER_STATISTIC = re.compile(r"\(.*\=.*\)")


def find_parentheticals(text: str) -> list[str]:
    return PAPER_STATISTIC.findall(text)


def parentheticals_array(texts) -> np.ndarray:
    """Batch form: iterable of str|None -> object array of list[str]."""
    out = np.empty(len(texts), dtype=object)
    for i, t in enumerate(texts):
        out[i] = [] if t is None else PAPER_STATISTIC.findall(t)
    return out
