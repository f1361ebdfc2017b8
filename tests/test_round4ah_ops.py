"""Round-4 batch AH: strongly connected components (trim + core Tarjan)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from sciscraper_ray.pipelines.graph import _tarjan_scc_sizes

SF = "/root/testdata/sf0.001"


def test_tarjan_hand_graph():
    # two 3-cycles bridged by a path, a self loop, a dangling chain
    src = np.array([1, 2, 3, 3, 10, 11, 12, 20, 30, 31], np.int64)
    dst = np.array([2, 3, 1, 10, 11, 12, 10, 20, 31, 32], np.int64)
    got = sorted(map(tuple, _tarjan_scc_sizes(src, dst).values.tolist()))
    assert got == [(1, 3), (10, 3), (20, 1), (30, 1), (31, 1), (32, 1)]


def test_tarjan_nested_structure():
    # one big SCC formed by two overlapping cycles: 1-2-3-1 and 3-4-1
    src = np.array([1, 2, 3, 3, 4], np.int64)
    dst = np.array([2, 3, 1, 4, 1], np.int64)
    got = _tarjan_scc_sizes(src, dst)
    assert got.values.tolist() == [[1, 4]]


def test_trim_peels_long_chain(ray_session):
    import pyarrow as pa

    import ray.data

    from sciscraper_ray.pipelines.graph import strongly_connected_sizes

    # chain 100->101->...->110 feeding cycle 0->1->2->0, plus pure chain
    chain = [(100 + i, 100 + i + 1) for i in range(10)] + [(110, 0)]
    cyc = [(0, 1), (1, 2), (2, 0)]
    tail = [(2, 50), (50, 51)]
    src, dst = zip(*(chain + cyc + tail))
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )
    )
    got = strongly_connected_sizes(edges)
    assert got.to_pydict() == {"scc_id": [0], "size": [3]}


def _kosaraju_sizes(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Independent SCC recompute (Kosaraju, iterative)."""
    fwd: dict[int, list[int]] = {}
    rev: dict[int, list[int]] = {}
    nodes = set()
    for a, b in edges:
        fwd.setdefault(a, []).append(b)
        rev.setdefault(b, []).append(a)
        nodes.update((a, b))
    seen: set[int] = set()
    order: list[int] = []
    for start in nodes:
        if start in seen:
            continue
        stack = [(start, iter(fwd.get(start, ())))]
        seen.add(start)
        while stack:
            v, it = stack[-1]
            nxt = next(it, None)
            if nxt is None:
                order.append(v)
                stack.pop()
            elif nxt not in seen:
                seen.add(nxt)
                stack.append((nxt, iter(fwd.get(nxt, ()))))
    comp: dict[int, int] = {}
    for start in reversed(order):
        if start in comp:
            continue
        members = [start]
        comp[start] = start
        stack2 = [start]
        while stack2:
            v = stack2.pop()
            for u in rev.get(v, ()):
                if u not in comp:
                    comp[u] = start
                    members.append(u)
                    stack2.append(u)
        root = min(members)
        for m in members:
            comp[m] = root
    sizes: dict[int, int] = {}
    for _v, r in comp.items():
        sizes[r] = sizes.get(r, 0) + 1
    return {r: s for r, s in sizes.items() if s >= 2}


def test_graph_scc_sizes_query_vs_kosaraju(ray_session):
    from sciscraper_ray.pipelines.queries import QUERIES

    got = QUERIES["graph_scc_sizes"](SF)
    got = pd.DataFrame(got.to_pandas() if hasattr(got, "to_pandas") else got)
    docs = pd.read_parquet(SF + "/documents.parquet", columns=["doc_id"])
    edges = []
    for d in docs["doc_id"].astype(int):
        edges.append((d, (d * 17 + 13) % 997))
        edges.append((d, (d * 29 + 7) % 997))
    exp = _kosaraju_sizes(edges)
    assert dict(zip(got["scc_id"], got["size"])) == exp
