"""Round-4 session-O additions: length x prefix-dup crosstab, stupid
backoff — first-principles recomputes (oracle parity runs in
tools/check_correctness.py at all three sf dirs)."""

from collections import Counter

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def test_doc_length_dup_crosstab(ray_session):
    got = _df(QUERIES["doc_length_dup_crosstab"](SF)).set_index(
        ["band", "is_dup"]
    )
    docs = pd.read_parquet(SF + "/documents.parquet")
    pc_ = docs["text"].str[:32]
    dupcnt = pc_.map(pc_.value_counts())
    docs = docs.assign(is_dup=(dupcnt > 1).astype(int)).sort_values(
        ["n_chars", "doc_id"], ignore_index=True
    )
    n = len(docs)
    q, rem = divmod(n, 10)
    cut = rem * (q + 1)
    idx = np.arange(n)
    band = np.where(idx < cut, idx // (q + 1) + 1, rem + (idx - cut) // q + 1)
    want = Counter(zip(band, docs["is_dup"]))
    assert len(got) == len(want)
    for (b, d), c in want.items():
        assert int(got.loc[(b, d), "n_docs"]) == c
    # non-degenerate: the fixture has prefix dups in several bands
    assert got.index.get_level_values("is_dup").nunique() == 2


def test_token_stupid_backoff(ray_session):
    got = _df(QUERIES["token_stupid_backoff"](SF)).set_index(["w1", "w2"])
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["text"])
    uni, bi = Counter(), Counter()
    for t in docs["text"]:
        toks = t.lower().strip().split(" ")
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    total = sum(uni.values())
    assert len(got) == len(uni) ** 2
    for (w1, w2), row in got.iterrows():
        if (w1, w2) in bi:
            assert row["backed_off"] == 0
            assert row["score_num"] == bi[(w1, w2)]
            assert row["score_den"] == uni[w1]
        else:
            assert row["backed_off"] == 1
            assert row["score_num"] == 2 * uni[w2]
            assert row["score_den"] == 5 * total
    # the grid forces real backoff cells, and observed cells dominate mass
    assert 0 < got["backed_off"].sum() < len(got)
