"""Tokenizer kernel — the reference's quirky single-space split.

``format_manuscript`` (/root/reference/src/docscraper.py:176-186) is
``preprint.strip().lower().split(" ")``: split on a SINGLE SPACE only, so
runs of whitespace/newlines yield empty-string tokens. That quirk is
load-bearing for ``total_word_count`` and the wordscore denominator, so the
vectorized form reproduces it exactly:

- strip  -> ``pc.utf8_trim_whitespace`` (unicode whitespace, like str.strip)
- lower  -> ``pc.utf8_lower``
- split  -> ``pc.split_pattern(..., pattern=" ")`` (keeps empty tokens, like
  str.split(" "))
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def format_manuscript(preprint: str) -> list[str]:
    """Scalar reference-parity tokenizer."""
    return preprint.strip().lower().split(" ")


def tokenize_column(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized tokenizer: string column -> list<string> column.

    Element i equals ``format_manuscript(text[i])`` exactly. Nulls stay null.
    """
    cleaned = pc.utf8_lower(pc.utf8_trim_whitespace(text))
    return pc.split_pattern(cleaned, pattern=" ")
