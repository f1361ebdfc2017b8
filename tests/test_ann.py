"""ANN tests: brute-force exactness and IVF recall vs brute force."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.mark.usefixtures("ray_session")
def test_brute_force_matches_numpy():
    import ray

    from sciscraper_ray.pipelines.queries import knn_cosine
    from sciscraper_ray.stages.ann import cosine_matrix

    sf = "/root/testdata/sf0.001"
    got = knn_cosine(sf).to_pandas()

    import pyarrow.parquet as pq

    from sciscraper_ray.stages.ann import _stack

    t = pq.read_table(f"{sf}/embeddings.parquet")
    vids = t["vec_id"].to_numpy(zero_copy_only=False)
    mat = _stack(t["embedding"])
    q = vids < 10
    sims = cosine_matrix(mat[q], mat)
    for qi, qid in enumerate(vids[q]):
        s = sims[qi].copy()
        s[vids == qid] = -np.inf
        order = np.lexsort((vids, -s))[:5]
        expected = vids[order].tolist()
        mine = got[got.qid == qid].sort_values("rank")["neighbor"].tolist()
        assert mine == expected, (qid, mine, expected)


@pytest.mark.usefixtures("ray_session")
def test_ivf_recall_vs_brute_force():
    from sciscraper_ray.pipelines.queries import ann_ivf, knn_cosine

    sf = "/root/testdata/sf0.001"
    exact = knn_cosine(sf).to_pandas()
    approx = ann_ivf(sf).to_pandas()
    e = {(r.qid, r.neighbor) for r in exact.itertuples()}
    a = {(r.qid, r.neighbor) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.7, recall
