"""Round-4 session-X additions: member-gzip WARC ingestion — the real
Common-Crawl .warc.gz framing (one gzip member per record, boundaries
discovered by streaming decode)."""

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def test_warc_gzip_member_split(ray_session):
    got = _df(QUERIES["warc_gzip_member_split"](SF))
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    assert len(got) == len(docs)  # every record recovered exactly once
    got = got.sort_values("doc_id", ignore_index=True)
    docs = docs.sort_values("doc_id", ignore_index=True)
    assert (got["doc_id"].to_numpy() == docs["doc_id"].to_numpy()).all()
    assert (got["shard"].to_numpy() == got["doc_id"].to_numpy() % 8).all()
    want_len = np.array(
        [
            14 + len(str(int(i))) + len(t.encode())
            for i, t in zip(docs["doc_id"], docs["text"])
        ],
        np.int64,
    )
    assert (got["uncomp_len"].to_numpy() == want_len).all()
    # member_index is dense 1..k within each shard in doc order
    for _, g in got.sort_values("doc_id").groupby("shard"):
        assert g["member_index"].tolist() == list(range(1, len(g) + 1))
