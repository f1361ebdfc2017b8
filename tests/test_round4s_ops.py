"""Round-4 session-S additions: minhash-vs-exact-Jaccard audit and
labeled multi-seed BFS closeness — first-principles recomputes (oracle
parity runs in tools/check_correctness.py at all three sf dirs)."""

import hashlib

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def test_dedup_minhash_jaccard_audit(ray_session):
    got = _df(QUERIES["dedup_minhash_jaccard_audit"](SF))
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id", "text"])
    by_prefix: dict[str, list[int]] = {}
    text_of = {}
    for i, t in zip(docs["doc_id"], docs["text"]):
        by_prefix.setdefault(t[:32], []).append(int(i))
        text_of[int(i)] = t

    def grams(i):
        toks = text_of[i].strip().lower().split(" ")
        return {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}

    def sig(gs):
        return [
            min(
                int(hashlib.md5(f"{s}|{g}".encode()).hexdigest()[:15], 16)
                for g in gs
            )
            for s in range(8)
        ]

    want = []
    for ids in by_prefix.values():
        ids = sorted(ids)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                a, b = ids[x], ids[y]
                ga, gb = grams(a), grams(b)
                if not ga or not gb:
                    continue
                sa, sb = sig(ga), sig(gb)
                agree = sum(1 for u, v in zip(sa, sb) if u == v)
                inter = len(ga & gb)
                want.append((a, b, agree, inter, len(ga) + len(gb) - inter))
    want.sort()
    assert len(got) == len(want)
    got = got.sort_values(["a", "b"], ignore_index=True)
    for row, (a, b, agree, inter, uni) in zip(got.itertuples(), want):
        assert (row.a, row.b, row.agree, row.inter, row.uni) == (
            a, b, agree, inter, uni,
        )
    # the estimator is meaningful: on true near-dups (J >= 0.5) most
    # permutations agree; sanity that agree tracks inter/uni direction
    if len(got) >= 2:
        j = got["inter"] / got["uni"]
        hi = got.loc[j >= 0.5, "agree"]
        if len(hi):
            assert hi.mean() >= 4


def test_graph_seed_closeness(ray_session):
    got = _df(QUERIES["graph_seed_closeness"](SF)).set_index("seed")
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id"])
    adj: dict[int, list[int]] = {}
    for d in docs["doc_id"]:
        d = int(d)
        adj[d] = [t for t in ((d * 17 + 13) % 997, (d * 29 + 7) % 997)]
    seeds = [int(d) for d in docs["doc_id"] if d % 200 == 0]
    for s in seeds:
        dist = {s: 0}
        frontier = [s]
        for d in range(1, 13):
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            frontier = nxt
            if not frontier:
                break
        row = got.loc[s]
        assert int(row["n_reached"]) == len(dist)
        assert int(row["sum_dist"]) == sum(dist.values())
        assert int(row["ecc"]) == max(dist.values())
    assert sorted(got.index) == sorted(seeds)
