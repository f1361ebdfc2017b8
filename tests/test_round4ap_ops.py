"""Round-4 batch AP: dehyphenation repair + exact phrase search."""

from __future__ import annotations

import pandas as pd

SF = "/root/testdata/sf0.001"


def test_dehyphenate_query(ray_session):
    from sciscraper_ray.pipelines.queries import QUERIES

    got = QUERIES["doc_dehyphenate"](SF).to_pandas()
    docs = pd.read_parquet(SF + "/documents.parquet",
                           columns=["doc_id", "text"])
    merged = got.merge(docs, on="doc_id")
    # repair restores the original byte-for-byte, always
    assert (merged["repaired_text"] == merged["text"]).all()
    # repair count matches the break-eligibility rule
    exp = [
        1 if (i % 10) < len(t.split(" ")) and len(t.split(" ")[i % 10]) > 4
        else 0
        for i, t in zip(merged["doc_id"], merged["text"])
    ]
    assert merged["n_repairs"].tolist() == exp
    assert merged["n_repairs"].sum() > 0  # fixture actually breaks docs


def test_phrase_search_query(ray_session):
    from sciscraper_ray.pipelines.queries import QUERIES

    got = QUERIES["retrieval_phrase_search"](SF).to_pandas()
    assert set(got["doc_id"] % 6) == {0}
    assert (got[got["doc_id"] % 12 == 0]["n_occurrences"] == 2).all()
    assert (got[got["doc_id"] % 12 != 0]["n_occurrences"] == 1).all()


def test_phrase_no_partial_word_match():
    import pyarrow.compute as pc
    import pyarrow as pa

    padded = pa.array([" x zeta quark fluxx y ", " zeta quark flux "])
    cnt = pc.count_substring(padded, " zeta quark flux ")
    assert cnt.to_pylist() == [0, 1]
