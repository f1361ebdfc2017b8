"""Similarity search over an embedding column (list<float>).

- ``BruteForceTopK``: exact cosine top-k — a broadcast query matrix
  (``ray.put`` once) against streamed embedding batches; each batch emits a
  PARTIAL top-k per query, merged in a tiny final grouped reduce. One
  matmul per batch, no shuffle of the corpus.
- ``assign_centroids`` / IVF search: the scale path — vectors are bucketed
  by nearest centroid (one shuffle-free pass); queries probe only the
  ``nprobe`` nearest buckets. Approximate; recall is measured in tests
  against brute force.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _stack(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def cosine_matrix(q: np.ndarray, v: np.ndarray) -> np.ndarray:
    """(nq, d) x (nv, d) -> (nq, nv) cosine similarities, float64."""
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    return qn @ vn.T


class BruteForceTopK:
    """map_batches stage: per batch, partial top-k rows (qid, neighbor, sim).

    ``queries_ref`` = ray.put((qids: np.ndarray, qmat: (nq,d) ndarray)).
    """

    def __init__(self, queries_ref, k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding"):
        import ray

        self.qids, self.qmat = ray.get(queries_ref)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sims = cosine_matrix(self.qmat, _stack(batch[self.vec_col]))
        # exclude self-matches
        self_mask = vids[None, :] == self.qids[:, None]
        sims[self_mask] = -np.inf
        k = min(self.k, sims.shape[1])
        # partial top-k per query within this batch (sim desc, neighbor asc)
        order = np.lexsort((vids[None, :].repeat(len(self.qids), 0), -sims), axis=1)[:, :k]
        rows_q, rows_n, rows_s = [], [], []
        for qi in range(len(self.qids)):
            sel = order[qi]
            sel = sel[np.isfinite(sims[qi, sel])]
            rows_q.extend([self.qids[qi]] * len(sel))
            rows_n.extend(vids[sel].tolist())
            rows_s.extend(sims[qi, sel].tolist())
        return pa.table(
            {
                "qid": pa.array(rows_q, type=pa.int64()),
                "neighbor": pa.array(rows_n, type=pa.int64()),
                "sim": pa.array(rows_s, type=pa.float64()),
            }
        )


def topk_reduce(group: pd.DataFrame, k: int = 5) -> pd.DataFrame:
    """Merge partial top-k rows: global top-k per qid (sim desc, neighbor asc)."""
    g = group.sort_values(["sim", "neighbor"], ascending=[False, True]).head(k)
    g = g.reset_index(drop=True)
    g["rank"] = np.arange(1, len(g) + 1)
    return g


def pick_centroids(vectors: np.ndarray, n_centroids: int, seed: int = 42) -> np.ndarray:
    """Deterministic centroid init: k-means++-style seeded greedy farthest
    selection, then a few Lloyd iterations on the given sample."""
    rng = np.random.default_rng(seed)
    idx = [int(rng.integers(len(vectors)))]
    for _ in range(n_centroids - 1):
        d = np.min(
            1 - cosine_matrix(vectors[idx], vectors), axis=0
        )
        idx.append(int(np.argmax(d)))
    cents = vectors[idx].copy()
    for _ in range(5):
        assign = np.argmax(cosine_matrix(cents, vectors), axis=0)
        for c in range(n_centroids):
            members = vectors[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def kmeans_fit(
    ds,
    n_centroids: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    seed: int = 42,
    init_sample: int = 256,
) -> np.ndarray:
    """Distributed Lloyd k-means over an embedding column.

    Init = seeded greedy selection on a small ``limit()`` sample (cheap,
    deterministic); then each iteration streams the corpus ONCE through a
    ``map_batches`` partial that emits (centroid, count, vector-sum) — a
    k x d table per batch, so the driver reduce is O(k*d*blocks), never
    O(rows). This replaces the sample-only fit: at 10^12 rows the
    centroids see every vector, and the per-iteration cost is one
    embarrassingly-parallel pass plus a tiny driver combine.
    """
    import ray as _ray
    import ray.data  # noqa: F401

    sample = _stack(
        pa.Table.from_pandas(ds.limit(init_sample).to_pandas())[vec_col]
    )
    cents = pick_centroids(sample, n_centroids, seed=seed)
    k, d = cents.shape
    for _ in range(iters):
        cref = _ray.put(cents)

        def partial(batch: pa.Table) -> pa.Table:
            c = _ray.get(cref)
            v = _stack(batch[vec_col])
            assign = np.argmax(cosine_matrix(c, v), axis=0)
            sums = np.zeros((k, d), np.float64)
            for j in range(k):  # loop over k (16), not rows
                members = v[assign == j]
                if len(members):
                    sums[j] = members.sum(axis=0)
            cnts = np.bincount(assign, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "centroid": pa.array(np.arange(k, dtype=np.int64)),
                    "cnt": pa.array(cnts),
                    "vsum": pa.array(sums.tolist(), pa.list_(pa.float64())),
                }
            )

        parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        cnt_tot = np.zeros(k, np.int64)
        sum_tot = np.zeros((k, d), np.float64)
        for cid, cnt, vsum in zip(parts["centroid"], parts["cnt"], parts["vsum"]):
            cnt_tot[cid] += cnt
            sum_tot[cid] += np.asarray(vsum)
        nonempty = cnt_tot > 0
        cents = cents.copy()
        cents[nonempty] = sum_tot[nonempty] / cnt_tot[nonempty, None]
    return cents


class CentroidAssign:
    """map_batches stage: append nearest-centroid bucket id."""

    def __init__(self, centroids_ref, vec_col: str = "embedding"):
        import ray

        self.centroids = ray.get(centroids_ref)
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = _stack(batch[self.vec_col])
        assign = np.argmax(cosine_matrix(self.centroids, v), axis=0)
        return batch.append_column("bucket", pa.array(assign.astype(np.int64)))


ANN_SRP_BITS = 6  # 64 buckets


def srp_planes(dim: int = 64, bits: int = ANN_SRP_BITS, seed: int = 7) -> np.ndarray:
    """Seeded signed-random-projection hyperplanes, ROUNDED to 6 decimals
    so the exact same plane values can be embedded as SQL literals (repr
    round-trips; the oracle computes identical sign bits)."""
    rng = np.random.default_rng(seed)
    return np.round(rng.standard_normal((bits, dim)), 6)


def srp_bucket_of(vectors: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n, d) -> int64 bucket ids: bit j set iff dot(v, plane_j) >= 0."""
    signs = (vectors @ planes.T) >= 0  # (n, bits)
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return signs.astype(np.int64) @ weights


class SrpBucketAssign:
    """map_batches stage: append the SRP bucket id column."""

    def __init__(self, planes: np.ndarray, vec_col: str = "embedding"):
        self.planes = planes
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        v = _stack(batch[self.vec_col])
        return batch.append_column(
            "bucket", pa.array(srp_bucket_of(v, self.planes))
        )


def hamming_probe_mask(query_buckets: np.ndarray, n_buckets: int, max_hamming: int = 1) -> np.ndarray:
    """(nq, n_buckets) bool: probe buckets within hamming distance of each
    query's bucket (multi-probe LSH)."""
    all_b = np.arange(n_buckets, dtype=np.int64)
    x = np.bitwise_xor(query_buckets[:, None], all_b[None, :]).astype(np.uint64)
    from sciscraper_ray.stages.dedup import hamming64

    return hamming64(x, np.zeros_like(x)) <= max_hamming


def pruned_search_batch(
    batch: pa.Table,
    qids: np.ndarray,
    qmat: np.ndarray,
    probe_mask: np.ndarray,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[pa.Table, int]:
    """Bucket-pruned exact-cosine partial top-k over ONE bucketed batch.

    ``probe_mask``: (nq, n_buckets) bool — which buckets each query probes.
    Only rows whose bucket is probed by SOME query are multiplied at all
    (the IVF contract: after the corpus is sorted/partitioned by bucket,
    most blocks contain no probed bucket for most queries and the matmul
    shrinks to the probed fraction). Returns (partial rows, n_scanned) —
    the second element is the pruning evidence tests assert on.
    """
    empty = pa.table(
        {
            "qid": pa.array([], type=pa.int64()),
            "neighbor": pa.array([], type=pa.int64()),
            "sim": pa.array([], type=pa.float64()),
        }
    )
    if batch.num_rows == 0:
        return empty, 0
    buckets = batch["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    probed_any = probe_mask[:, buckets]  # (nq, n_rows)
    row_used = probed_any.any(axis=0)
    n_scanned = int(row_used.sum())
    if n_scanned == 0:
        return empty, 0
    idx = np.nonzero(row_used)[0]
    sub = batch.take(pa.array(idx))
    vids = sub[id_col].to_numpy(zero_copy_only=False)
    sims = cosine_matrix(qmat, _stack(sub[vec_col]))  # (nq, n_scanned)
    rows_q, rows_n, rows_s = [], [], []
    for qi in range(len(qids)):
        mask = probed_any[qi, idx] & (vids != qids[qi])
        cand = np.nonzero(mask)[0]
        if not len(cand):
            continue
        order = cand[np.lexsort((vids[cand], -sims[qi, cand]))][:k]
        rows_q.extend([qids[qi]] * len(order))
        rows_n.extend(vids[order].tolist())
        rows_s.extend(sims[qi, order].tolist())
    out = pa.table(
        {
            "qid": pa.array(rows_q, type=pa.int64()),
            "neighbor": pa.array(rows_n, type=pa.int64()),
            "sim": pa.array(rows_s, type=pa.float64()),
        }
    )
    return out, n_scanned
