"""Connected components (pipelines/graph.py) vs a reference union-find."""
import numpy as np
import pyarrow as pa

from sciscraper_ray.pipelines.graph import connected_components


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-label components
    return {n: find(n) for n in parent}


def _check(pairs):
    tbl = pa.table(
        {
            "a": pa.array([p[0] for p in pairs], pa.int64()),
            "b": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    got = connected_components(tbl).to_pandas()
    got_map = dict(zip(got["doc_id"], got["comp_id"]))
    want = _union_find(pairs)
    # union-find roots are component mins because we always parent toward min
    assert got_map == want
    assert len(got) == len(want)


def test_empty():
    out = connected_components(pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})).to_pandas()
    assert len(out) == 0


def test_single_pair():
    _check([(5, 9)])


def test_path_graph():
    # worst case for naive label prop: a long chain
    _check([(i, i + 1) for i in range(1, 60)])


def test_two_cliques_and_chain():
    pairs = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (20, 21)]
    _check(pairs)


def test_random_graph_matches_union_find():
    rng = np.random.default_rng(42)
    n = 400
    pairs = [tuple(sorted(p)) for p in rng.integers(0, n, size=(300, 2)) if p[0] != p[1]]
    _check(pairs)


def test_duplicate_and_reversed_edges():
    _check([(1, 2), (1, 2), (2, 7), (2, 7), (3, 4)])


def test_pagerank_plan_parity_and_sum():

    from sciscraper_ray.pipelines.graph import pagerank

    # small symmetric graph: two triangles bridged by one edge
    und = [(1, 2), (2, 3), (1, 3), (3, 10), (10, 11), (11, 12), (10, 12)]
    sym = und + [(b, a) for a, b in und]
    tbl = pa.table(
        {
            "a": pa.array([p[0] for p in sym], pa.int64()),
            "b": pa.array([p[1] for p in sym], pa.int64()),
        }
    )
    d = pagerank(tbl, iters=5, plan="driver").to_pandas()
    s = pagerank(tbl, iters=5, plan="shuffle", num_buckets=4).to_pandas()
    d = d.sort_values("node").reset_index(drop=True)
    s = s.sort_values("node").reset_index(drop=True)
    assert list(d["node"]) == list(s["node"])
    assert np.allclose(d["r"], s["r"], atol=1e-9)
    # ranks are a probability distribution (no dangling mass on symmetric graphs)
    assert abs(d["r"].sum() - 1.0) < 1e-6
    # bridge nodes (3, 10) have the highest degree -> highest rank
    top2 = set(d.sort_values("r", ascending=False)["node"].head(2))
    assert top2 == {3, 10}


def test_pagerank_source_only_nodes_plan_parity():
    """ADVICE r2: a DIRECTED graph where some nodes have out-edges but no
    in-edges (valid under the >=1-out-edge contract) must produce the
    same node set and ranks on both plans — the shuffle plan used to drop
    source-only nodes after iteration 1."""
    from sciscraper_ray.pipelines.graph import pagerank

    # 20 and 21 are pure sources; every node has >= 1 out-edge
    edges = [(20, 1), (21, 1), (1, 2), (2, 3), (3, 1)]
    tbl = pa.table(
        {
            "a": pa.array([p[0] for p in edges], pa.int64()),
            "b": pa.array([p[1] for p in edges], pa.int64()),
        }
    )
    d = pagerank(tbl, iters=4, plan="driver").to_pandas()
    s = pagerank(tbl, iters=4, plan="shuffle", num_buckets=4).to_pandas()
    d = d.sort_values("node").reset_index(drop=True)
    s = s.sort_values("node").reset_index(drop=True)
    assert list(d["node"]) == list(s["node"]) == [1, 2, 3, 20, 21]
    assert np.allclose(d["r"], s["r"], atol=1e-9)
    # source-only nodes sit at the analytic floor (1-d)/N
    floor = (1 - 0.85) / 5
    assert np.allclose(d[d["node"] >= 20]["r"], floor, atol=1e-12)


def _bfs_ref(edges, seeds, max_rounds):
    """Reference BFS: plain dict/queue."""
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist = {s: 0 for s in seeds}
    frontier = list(dict.fromkeys(seeds))
    for depth in range(1, max_rounds + 1):
        nxt = []
        for n in frontier:
            for m in adj.get(n, []):
                if m not in dist:
                    dist[m] = depth
                    nxt.append(m)
        if not nxt:
            break
        frontier = nxt
    return dist


def _bfs_run(edges, seeds, max_rounds=12):
    import ray.data

    from sciscraper_ray.pipelines.graph import bfs_distances

    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    out = bfs_distances(ds, seeds, max_rounds=max_rounds).to_pandas()
    return dict(zip(out["node"], out["dist"]))


def test_bfs_cycle_and_unreachable():
    # cycle 1->2->3->1, island 9->10 unreachable from seed 1
    edges = [(1, 2), (2, 3), (3, 1), (9, 10)]
    got = _bfs_run(edges, [1])
    assert got == {1: 0, 2: 1, 3: 2}


def test_bfs_multi_seed_min_distance():
    # node 4 reachable at dist 3 from seed 1 but dist 1 from seed 3
    edges = [(1, 2), (2, 3), (3, 4)]
    got = _bfs_run(edges, [1, 3])
    assert got == {1: 0, 3: 0, 2: 1, 4: 1}


def test_bfs_round_cap():
    edges = [(i, i + 1) for i in range(10)]
    got = _bfs_run(edges, [0], max_rounds=3)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_bfs_matches_reference_random():
    rng = np.random.default_rng(7)
    edges = [tuple(map(int, e)) for e in rng.integers(0, 40, size=(120, 2))]
    seeds = [0, 5, 11]
    assert _bfs_run(edges, seeds) == _bfs_ref(edges, seeds, 12)


def test_bfs_seed_only_graph():
    got = _bfs_run([(7, 7)], [7])  # self-loop: no new nodes
    assert got == {7: 0}


def _hits_ref(edges, iters=3):
    """Plain-numpy HITS reference."""
    src = np.array([e[0] for e in edges]); dst = np.array([e[1] for e in edges])
    hub_nodes, si = np.unique(src, return_inverse=True)
    auth_nodes, di = np.unique(dst, return_inverse=True)
    h = np.ones(len(hub_nodes))
    for _ in range(iters):
        a = np.bincount(di, weights=h[si], minlength=len(auth_nodes))
        a = a / np.sqrt((a * a).sum())
        h = np.bincount(si, weights=a[di], minlength=len(hub_nodes))
        h = h / np.sqrt((h * h).sum())
    out = {}
    for n, s in zip(auth_nodes, a):
        out[("auth", int(n))] = round(float(s), 10)
    for n, s in zip(hub_nodes, h):
        out[("hub", int(n))] = round(float(s), 10)
    return out


def _hits_run(edges, plan, iters=3):
    import ray.data

    from sciscraper_ray.pipelines.graph import hits

    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], pa.int64()),
                "dst": pa.array([e[1] for e in edges], pa.int64()),
            }
        )
    )
    out = hits(ds, iters=iters, plan=plan, num_buckets=4)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    if not isinstance(df, type(pa.table({}).to_pandas())):
        df = df.to_pandas()
    return {
        (k, int(n)): round(float(s), 9)
        for k, n, s in zip(df["kind"], df["node"], df["score"])
    }


def test_hits_plan_parity_and_reference():
    rng = np.random.default_rng(3)
    edges = sorted({tuple(map(int, e)) for e in rng.integers(0, 25, size=(80, 2))})
    ref = {k: round(v, 9) for k, v in _hits_ref(edges).items()}
    drv = _hits_run(edges, "driver")
    shf = _hits_run(edges, "shuffle")
    assert drv == ref
    # shuffle plan sums in a different order; compare at 1e-9 after rounding
    assert set(shf) == set(ref)
    for k in ref:
        assert abs(shf[k] - ref[k]) < 1e-8, (k, shf[k], ref[k])


def test_hits_bipartite_star():
    # one hub pointing at 3 authorities: hub score 1, auths equal at 1/sqrt(3)
    edges = [(1, 10), (1, 11), (1, 12)]
    got = _hits_run(edges, "driver")
    assert got[("hub", 1)] == 1.0
    for a in (10, 11, 12):
        assert abs(got[("auth", a)] - 1 / np.sqrt(3)) < 1e-9


def test_ppr_plan_parity_and_seed_locality():
    """Personalized PageRank: both physical plans agree, teleport mass
    stays concentrated near the seed, and total mass is conserved on a
    symmetric graph."""
    from sciscraper_ray.pipelines.graph import pagerank

    und = [(1, 2), (2, 3), (1, 3), (3, 10), (10, 11), (11, 12), (10, 12)]
    sym = und + [(b, a) for a, b in und]
    tbl = pa.table(
        {
            "a": pa.array([p[0] for p in sym], pa.int64()),
            "b": pa.array([p[1] for p in sym], pa.int64()),
        }
    )
    seeds = np.array([1], dtype=np.int64)
    d = pagerank(tbl, iters=5, plan="driver", seeds=seeds).to_pandas()
    s = pagerank(
        tbl, iters=5, plan="shuffle", num_buckets=4, seeds=seeds
    ).to_pandas()
    d = d.sort_values("node").reset_index(drop=True)
    s = s.sort_values("node").reset_index(drop=True)
    assert list(d["node"]) == list(s["node"])
    assert np.allclose(d["r"], s["r"], atol=1e-9)
    assert abs(d["r"].sum() - 1.0) < 1e-6  # restart conserves mass
    r = d.set_index("node")["r"]
    # walk-with-restart locality: the seed's triangle outranks the far one
    assert r[1] == r.max()
    assert r[2] > r[11] and r[3] > r[12]


def test_ppr_source_only_nodes_constant_rank():
    from sciscraper_ray.pipelines.graph import pagerank

    edges = [(20, 1), (21, 1), (1, 2), (2, 3), (3, 1)]
    tbl = pa.table(
        {
            "a": pa.array([p[0] for p in edges], pa.int64()),
            "b": pa.array([p[1] for p in edges], pa.int64()),
        }
    )
    seeds = np.array([20, 1], dtype=np.int64)
    d = pagerank(tbl, iters=4, plan="driver", seeds=seeds).to_pandas()
    s = pagerank(
        tbl, iters=4, plan="shuffle", num_buckets=4, seeds=seeds
    ).to_pandas()
    d = d.sort_values("node").reset_index(drop=True)
    s = s.sort_values("node").reset_index(drop=True)
    assert list(d["node"]) == list(s["node"]) == [1, 2, 3, 20, 21]
    assert np.allclose(d["r"], s["r"], atol=1e-9)
    r = d.set_index("node")["r"]
    # seed source-only node: constant (1-d)*p; non-seed source-only: 0
    assert abs(r[20] - 0.15 * 0.5) < 1e-12
    assert r[21] == 0.0
