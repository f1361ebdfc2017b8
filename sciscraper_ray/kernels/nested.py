"""Messy-source cell cleaning: nested dict-literal unwrap + NA fill.

- ``clean_nested_values``: the reference unwraps CSV cells that hold
  stringified Python dict literals, keeping plain rows first and appending
  the unwrapped nested rows after them — that partition-then-concat reorder
  is verified behavior (/root/reference/src/serials.py:66-86) and reproduced
  here per batch. We use ``ast.literal_eval`` (never ``eval``).
- ``fill_na``: ``fillna("N/A")`` projection (/root/reference/src/serials.py:89-106)
  as ``pc.fill_null``.
"""

from __future__ import annotations

import ast

import pyarrow as pa
import pyarrow.compute as pc


def clean_nested_values(values: list[str], column: str) -> list[str]:
    """Plain rows first (in order), then each ``{...}`` row's ``[column]``."""
    plain = [v for v in values if not str(v).startswith("{")]
    nested = []
    for v in values:
        if str(v).startswith("{"):
            try:
                parsed = ast.literal_eval(v)
                nested.append(str(parsed.get(column, "")))
            except (ValueError, SyntaxError):
                nested.append("")
    return plain + nested


def fill_na(arr: pa.Array | pa.ChunkedArray, fill: str = "N/A") -> pa.Array | pa.ChunkedArray:
    return pc.fill_null(arr, fill)
