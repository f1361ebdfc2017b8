"""Text-analysis stage tests."""

from __future__ import annotations

import pyarrow as pa

from sciscraper_ray.stages.textstats import (
    lang_id_batch,
    quality_batch,
    winnow_fingerprints,
)


def _batch(texts, ids=None):
    ids = ids or list(range(len(texts)))
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})


def test_lang_id_profiles():
    out = lang_id_batch(
        _batch(
            [
                "the cat sat on a mat and the dog",
                "der hund und die katze ist nicht da",
                "le chat et les chiens dans une maison",
                "xyzzy plugh quux",
            ]
        )
    )
    assert out["lang_pred"].to_pylist() == ["en", "de", "fr", "und"]


def test_quality_formula():
    out = quality_batch(_batch(["the fast query engine"]))
    # 4 words, 21 chars, sum_len 18, 1 stopword
    assert out["n_words"][0].as_py() == 4
    assert out["n_chars"][0].as_py() == 21
    assert out["mean_word_len"][0].as_py() == 18 / 4
    assert out["stopword_ratio"][0].as_py() == 0.25
    expected = 0.5 * min(1.0, 4 / 100.0) + 0.3 * (1.0 - 0.25) + 0.2 * min(1.0, (18 / 4) / 8.0)
    assert out["quality"][0].as_py() == expected


def test_winnow_deterministic_and_shift_robust():
    text = "the quick brown fox jumps over the lazy dog again and again"
    fp1 = winnow_fingerprints(text)
    fp2 = winnow_fingerprints(text)
    assert fp1 == fp2 and len(fp1) > 0
    # winnowing guarantees shared fingerprints for long shared substrings
    shifted = "PREFIX " + text
    shared = set(fp1) & set(winnow_fingerprints(shifted))
    assert shared
