"""Round-4 session-Z additions: deterministic md5-seeded random walks —
first-principles recompute (oracle parity runs in
tools/check_correctness.py at all three sf dirs)."""

import hashlib

import pandas as pd

from sciscraper_ray.pipelines.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _df(out):
    out = out.to_pandas() if hasattr(out, "to_pandas") else out
    return pd.DataFrame(out)


def test_graph_random_walks(ray_session):
    got = _df(QUERIES["graph_random_walks"](SF))
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id"])
    n = len(docs)
    nbrs: dict[int, list[int]] = {}
    for d in docs["doc_id"]:
        d = int(d)
        ts = sorted(
            {t for t in ((d * 17 + 13) % 997, (d * 29 + 7) % 997) if t != d}
        )
        nbrs[d] = ts
    want = []
    for w in range(64):
        node = w
        want.append((w, 0, node))
        for step in range(8):
            lst = nbrs.get(node, [])
            if not lst:
                break
            idx = (
                int(hashlib.md5(f"{w}:{step}".encode()).hexdigest()[:15], 16)
                % len(lst)
            )
            node = lst[idx]
            want.append((w, step + 1, node))
    got_t = sorted(map(tuple, got[["walk_id", "step", "node"]].to_numpy()))
    assert got_t == sorted(want)
    # determinism: a second run reproduces byte-identical trajectories
    again = _df(QUERIES["graph_random_walks"](SF))
    assert sorted(
        map(tuple, again[["walk_id", "step", "node"]].to_numpy())
    ) == got_t
