"""Round-4 batch AG: Dice collocations + license classification."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from sciscraper_ray.pipelines.queries import QUERIES
from sciscraper_ray.pipelines.queries.text_analysis import classify_license

SF = "/root/testdata/sf0.001"


def test_license_priority_most_restrictive_wins():
    texts = pa.array(
        [
            "Creative Commons Attribution-ShareAlike: CC BY-SA 4.0.",
            "CC BY-NC-SA 4.0 with Creative Commons Attribution wording",
            "plain CC BY here",
            "MIT license plus All rights reserved boilerplate",
            "nothing to see",
            "public domain dedication (CC0)",
        ]
    )
    lic, com, att = classify_license(texts)
    assert lic.to_pylist() == [
        "cc-by-sa", "cc-by-nc-sa", "cc-by", "mit", "none", "cc0",
    ]
    assert com.to_pylist() == [1, 0, 1, 1, 0, 1]
    assert att.to_pylist() == [1, 1, 1, 1, 0, 0]


def test_dice_collocations_first_principles(ray_session):
    got = QUERIES["token_dice_collocations"](SF)
    got = pd.DataFrame(got.to_pandas() if hasattr(got, "to_pandas") else got)
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["text"])
    from collections import Counter

    cnt: Counter = Counter()
    for t in docs["text"]:
        toks = t.strip().lower().split(" ")
        cnt.update(zip(toks, toks[1:]))
    lc: Counter = Counter()
    rc: Counter = Counter()
    for (a, b), c in cnt.items():
        lc[a] += c
        rc[b] += c
    exp = {
        (a, b): (4_000_000 * c + (lc[a] + rc[b])) // (2 * (lc[a] + rc[b]))
        for (a, b), c in cnt.items()
        if c >= 5
    }
    got_map = {
        (r.token, r.next_token): r.dice_micro for r in got.itertuples()
    }
    assert got_map == exp


def test_license_query_rows(ray_session):
    got = QUERIES["doc_license_classify"](SF).to_pandas()
    assert len(got) == 500
    # commercial corpus = exactly the %8 in {0,1,3,4,5} slice
    ok = got[got["commercial_ok"] == 1]["doc_id"] % 8
    assert set(ok) == {0, 1, 3, 4, 5}
