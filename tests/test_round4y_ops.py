"""Round-4 session-Y additions: RFC4180 hard-case CSV round trip and
varbyte posting-list sizing — first-principles recomputes (oracle parity
runs in tools/check_correctness.py at all three sf dirs)."""

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def test_csv_quoted_roundtrip(ray_session):
    got = _df(QUERIES["csv_quoted_roundtrip"](SF)).sort_values(
        "doc_id", ignore_index=True
    )
    docs = pd.read_parquet(
        SF + "/documents.parquet", columns=["doc_id", "lang", "text"]
    ).sort_values("doc_id", ignore_index=True)
    assert len(got) == len(docs)
    assert (got["doc_id"].to_numpy() == docs["doc_id"].to_numpy()).all()
    assert (got["lang"].to_numpy() == docs["lang"].to_numpy()).all()
    want = [
        f'{t},"{lg}\n"end' for t, lg in zip(docs["text"], docs["lang"])
    ]
    assert got["payload"].tolist() == want
    # the payload really contains all three hard cases
    assert all(
        ("," in p) and ('"' in p) and ("\n" in p)
        for p in got["payload"].head(5)
    )


def test_token_postings_varbyte_size(ray_session):
    got = _df(QUERIES["token_postings_varbyte_size"](SF)).set_index("token")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    postings: dict[str, set[int]] = {}
    for i, t in zip(docs["doc_id"], docs["text"]):
        for tok in t.strip().lower().split(" "):
            postings.setdefault(tok, set()).add(int(i))

    def vb(delta):
        return 1 if delta < 128 else 2 if delta < 16384 else 3 if delta < 2097152 else 4

    for tok, ids in postings.items():
        ids = sorted(ids)
        deltas = [ids[0] + 1] + [b - a for a, b in zip(ids, ids[1:])]
        row = got.loc[tok]
        assert int(row["df"]) == len(ids)
        assert int(row["encoded_bytes"]) == sum(vb(d) for d in deltas)
    assert len(got) == len(postings)
    # compression works: bytes <= 2 per posting on dense small-id corpora
    assert (got["encoded_bytes"] <= 2 * got["df"]).all()
