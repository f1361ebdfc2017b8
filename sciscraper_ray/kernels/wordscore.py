"""Wordscore (relevance likelihood) kernel.

Semantics pinned to the reference's ``calculate_likelihood``
(/root/reference/src/docscraper.py:208-244): weights 1.0 / -0.25 / 0.5 for
desired / undesired / other words, divided by total, clamped to [0, 1];
0.0 whenever ``total_words <= 0`` or either match count is negative.

The floating-point expression order is mirrored exactly in both the scalar
and the vectorized form (and in the DuckDB oracle SQL) so results are
bit-identical doubles.
"""

from __future__ import annotations

import numpy as np

DESIRED_WEIGHT = 1.0
UNDESIRED_WEIGHT = -0.25
OTHER_WEIGHT = 0.5


def calculate_likelihood(
    total_words: int, desired_matches: int, undesired_matches: int
) -> float:
    """Scalar wordscore; golden vectors in tests/test_kernels.py.

    e.g. (100, 20, 5) -> 0.5625, (1000, 500, 10) -> 0.7425.
    """
    if total_words <= 0 or desired_matches < 0 or undesired_matches < 0:
        return 0.0
    other_words = total_words - desired_matches - undesired_matches
    score = (
        desired_matches * DESIRED_WEIGHT
        + undesired_matches * UNDESIRED_WEIGHT
        + other_words * OTHER_WEIGHT
    ) / total_words
    return max(0.0, min(1.0, score))


def wordscore_vec(
    total: np.ndarray, desired: np.ndarray, undesired: np.ndarray
) -> np.ndarray:
    """Vectorized wordscore over int arrays -> float64 array.

    Identical FP op order to the scalar form: (d*1.0 + u*-0.25 + other*0.5)/t.
    """
    t = total.astype(np.float64)
    d = desired.astype(np.float64)
    u = undesired.astype(np.float64)
    other = t - d - u
    with np.errstate(divide="ignore", invalid="ignore"):
        score = (d * DESIRED_WEIGHT + u * UNDESIRED_WEIGHT + other * OTHER_WEIGHT) / t
    score = np.minimum(1.0, np.maximum(0.0, score))
    invalid = (total <= 0) | (desired < 0) | (undesired < 0)
    return np.where(invalid, 0.0, score)
