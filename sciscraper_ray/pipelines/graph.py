"""Distributed connected components over a duplicate-pair graph.

The near-dup pipelines (`pipelines/dedup.py`) stop at verified candidate
PAIRS; full dedup semantics need the transitive closure — if A~B and B~C
then {A,B,C} is one duplicate cluster and one representative survives.
This module computes components with the alternating Large-Star /
Small-Star algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond", SoCC 2014): each round is
a pure edge-list `groupby(node).map_groups` — no driver-side union-find —
and converges in O(log^2 n) rounds (2 rounds on typical dedup graphs,
whose components are near-cliques).

Scale notes (100 TB corpus):
- The algorithm runs on the PAIR GRAPH, not the corpus: nodes are only
  the documents that appear in >= 1 verified near-dup pair, typically
  orders of magnitude smaller than the corpus. Per-round `materialize()`
  of the edge list is therefore bounded by duplicate volume, not input
  volume (and is required: each convergence probe would otherwise
  re-execute the whole lineage from the pair stage).
- Each star round shuffles only (int64, int64) edges grouped by node;
  payloads never move.
- Per-group Python overhead (~100 us/group) is paid once per graph node
  per round; with dup-graph nodes << corpus rows this is not the
  bottleneck. Group bodies are vectorized numpy.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _star_round(edges: ray.data.Dataset, *, large: bool) -> ray.data.Dataset:
    """One Large-Star (large=True) or Small-Star round.

    Large-Star: group the symmetrized edge list by node u; with
    m = min(N(u) ∪ {u}), emit (v, m) for every neighbor v > u.
    Small-Star: orient each edge max->min, group by the max node u; with
    m = min(N(u)) (all neighbors are < u), emit (v, m) for
    v in N(u) ∪ {u}, v != m.
    Every emitted edge has a > b, pointing down toward the component min.
    """

    def orient(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        if large:
            u = np.concatenate([a, bb])
            v = np.concatenate([bb, a])
        else:
            u = np.maximum(a, bb)
            v = np.minimum(a, bb)
        return pa.table(
            {"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64())}
        )

    def star(g: pd.DataFrame) -> pd.DataFrame:
        u = int(g["u"].iloc[0])
        nbrs = g["v"].to_numpy()
        m = min(u, int(nbrs.min()))
        if large:
            out = np.unique(nbrs[nbrs > u])
        else:
            out = np.unique(np.append(nbrs, u))
            out = out[out != m]
        return pd.DataFrame(
            {
                "a": out.astype(np.int64),
                "b": np.full(len(out), m, dtype=np.int64),
            }
        )

    return (
        edges.map_batches(orient, batch_format="pyarrow")
        .groupby("u")
        .map_groups(star, batch_format="pandas")
    )


def _dedup_edges(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct (a, b) via a single packed-int64 key groupby.

    Star rounds emit the same (child, parent) edge from many source
    groups; left in place they grow the shuffle quadratically on cliques.
    doc_ids fit in 31 bits here, so (a << 32) | b packs losslessly into
    one int64 and the distinct is a native vectorized count aggregate
    (no per-group Python). Wider id spaces would pack into two int64
    columns (Ray groupby takes a key list) at the same cost.
    """

    def pack(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"k": pa.array((a << 32) | bb, pa.int64())})

    def unpack(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": pa.array(k >> 32, pa.int64()),
                "b": pa.array(k & 0xFFFFFFFF, pa.int64()),
            }
        )

    return (
        edges.map_batches(pack, batch_format="pyarrow")
        .groupby("k")
        .count()
        .map_batches(unpack, batch_format="pyarrow")
    )


def _signature(edges: ray.data.Dataset) -> tuple[int, int]:
    """Cheap convergence probe: (row count, sum of packed keys).

    Exact set equality would need another shuffle; count + keyed sum is
    collision-safe in practice for a fixpoint check (the star operators
    are deterministic, so a stable signature means a stable edge set —
    and the loop additionally re-checks one full round after stability).
    """

    def pack(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array((a << 32) | bb, pa.int64())})

    packed = edges.map_batches(pack, batch_format="pyarrow")
    n = packed.count()
    s = int(packed.sum("k")) if n else 0
    return n, s


def connected_components(
    pairs: ray.data.Dataset | pa.Table,
    *,
    max_rounds: int = 32,
) -> ray.data.Dataset:
    """Components of an undirected (a, b) pair graph.

    Returns a Dataset (doc_id, comp_id) with one row per graph node and
    comp_id = the smallest doc_id in the node's component (so component
    representatives satisfy doc_id == comp_id). Nodes absent from the
    pair list are singletons and are not emitted — callers doing full
    dedup keep every non-listed doc plus the representatives.
    """
    if isinstance(pairs, pa.Table):
        pairs = ray.data.from_arrow(pairs)
    edges = _dedup_edges(pairs).materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "comp_id": pa.array([], pa.int64()),
                }
            )
        )

    prev = None
    for _ in range(max_rounds):
        edges = _dedup_edges(_star_round(edges, large=True))
        edges = _dedup_edges(_star_round(edges, large=False)).materialize()
        sig = _signature(edges)
        if sig == prev:
            break
        prev = sig
    else:  # pragma: no cover - max_rounds is ~log^2 of any realistic graph
        raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b["a"], "comp_id": b["b"]})

    def roots(b: pa.Table) -> pa.Table:
        r = np.unique(b["b"].to_numpy(zero_copy_only=False))
        return pa.table(
            {"doc_id": pa.array(r, pa.int64()), "comp_id": pa.array(r, pa.int64())}
        )

    members = edges.map_batches(finalize, batch_format="pyarrow")
    # root self-rows: each component min is a node too; distinct across
    # batches via the same packed-key distinct (roots repeat per batch)
    root_rows = _dedup_edges(
        edges.map_batches(
            lambda b: pa.table({"a": b["b"], "b": b["b"]}), batch_format="pyarrow"
        )
    ).map_batches(finalize, batch_format="pyarrow")
    return members.union(root_rows)
