"""Round-4 batch AO: suffix arrays (prefix doubling) + Kasai LRS."""

from __future__ import annotations

import numpy as np

from sciscraper_ray.pipelines.queries.corpus_ops import (
    _LRS_CAP,
    suffix_ranks,
)

SF = "/root/testdata/sf0.001"


def _brute_ranks(text: str) -> np.ndarray:
    sufs = sorted(range(len(text)), key=lambda i: text[i:])
    r = np.zeros(len(text), np.int64)
    for rank, pos in enumerate(sufs):
        r[pos] = rank
    return r


def _brute_lrs(text: str) -> int:
    best = 0
    n = len(text)
    for i in range(n):
        for j in range(i + 1, n):
            k = 0
            while i + k < n and j + k < n and text[i + k] == text[j + k]:
                k += 1
            best = max(best, k)
    return min(best, _LRS_CAP)


def test_suffix_ranks_vs_brute():
    rng = np.random.default_rng(3)
    for n in (1, 2, 7, 40, 200):
        text = "".join(rng.choice(list("abcd "), n))
        s = np.frombuffer(text.encode(), np.uint8)
        assert (suffix_ranks(s) == _brute_ranks(text)).all(), text


def test_suffix_ranks_degenerate():
    assert suffix_ranks(np.zeros(0, np.uint8)).tolist() == []
    # all-equal chars: suffix order is by length, shortest first
    s = np.frombuffer(b"aaaa", np.uint8)
    assert suffix_ranks(s).tolist() == [3, 2, 1, 0]


def test_kasai_lrs_query_vs_brute(ray_session):
    import pandas as pd

    from sciscraper_ray.pipelines.queries import QUERIES

    got = QUERIES["doc_longest_repeat"](SF).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(
        SF + "/documents.parquet", columns=["doc_id", "text"]
    ).head(40)
    for did, text in zip(docs["doc_id"], docs["text"]):
        assert got.loc[int(did), "lrs_capped"] == _brute_lrs(text)


def test_suffix_array_query_shape(ray_session):
    import pandas as pd

    from sciscraper_ray.pipelines.queries import QUERIES

    got = QUERIES["doc_suffix_array"](SF).to_pandas()
    docs = pd.read_parquet(
        SF + "/documents.parquet", columns=["doc_id", "text"]
    )
    assert len(got) == int(docs["text"].str.len().sum())
    # ranks are a 1..n permutation per doc
    one = got[got["doc_id"] == int(docs["doc_id"].iloc[0])]
    assert sorted(one["suffix_rank"]) == list(range(1, len(one) + 1))
