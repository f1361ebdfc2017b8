"""Dedup pipeline compositions: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Partitioning assumptions (stated per SURVEY §2 custom-operator rule):
- exact dedup shuffles once on the content hash (uniform key, no skew);
- near-dup variants shuffle once on LSH band / chunk keys (uniform by
  construction), then exact-verify only the CANDIDATE pairs — the candidate
  set is assumed ≪ corpus (guaranteed by LSH parameters), so the verify
  step broadcasts just the involved documents' texts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from sciscraper_ray.stages.dedup import (
    MinHashBandStage,
    SimHashStage,
    bucket_pairs,
    char_ngrams,
    content_hash_batch,
    hamming64,
    jaccard,
    word_shingles,
)


def exact_dedup(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    key_merge: str = "driver",
) -> ray.data.Dataset:
    """Keep the lowest-id row per distinct text.

    Same two-pass shape as ``keep_latest_by_url``: pass 1 reduces
    (content-hash, min-id, count) per batch and merges the partials
    (driver-side vectorized below ~50M keys, or the distributed groupby
    via ``key_merge='shuffle'``); only hashes that actually collide are
    broadcast, and pass 2 filters the full rows without any payload
    shuffle or per-group Python. 64-bit content-hash prefix collisions are
    the documented tradeoff (as for url dedup)."""
    import pyarrow.compute as pc

    def hash64(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """(hashes, valid_mask). Null-text rows are NOT duplicates of each
        other — a shared sentinel hash would collapse every
        failed-extraction row into one survivor — so they carry
        valid=False and are excluded from dup detection entirely."""
        hexes = content_hash_batch(batch, text_col).to_pylist()
        valid = np.array([h is not None for h in hexes], dtype=bool)
        hashes = np.array(
            [int(h[:16], 16) - (1 << 63) if h else 0 for h in hexes],
            dtype=np.int64,
        )
        return hashes, valid

    def key_partial(batch: pa.Table) -> pd.DataFrame:
        h, valid = hash64(batch)
        df = pd.DataFrame(
            {
                "h": h[valid],
                "i": batch[id_col].to_numpy(zero_copy_only=False)[valid],
            }
        )
        return (
            df.groupby("h", sort=False)
            .agg(min_id=("i", "min"), cnt=("i", "size"))
            .reset_index()
        )

    partials = ds.select_columns([id_col, text_col]).map_batches(
        key_partial, batch_format="pyarrow"
    )
    if key_merge == "driver":
        merged = partials.to_pandas()
        g = merged.groupby("h", sort=False).agg(
            min_id=("min_id", "min"), cnt=("cnt", "sum")
        )
        dups = g[g["cnt"] > 1].reset_index()
    else:
        from ray.data.aggregate import Min, Sum

        dups = (
            partials.groupby("h")
            .aggregate(Min(on="min_id", alias_name="min_id"),
                       Sum(on="cnt", alias_name="cnt"))
            .map_batches(
                lambda b: b.filter(pc.greater(b["cnt"], 1)),
                batch_format="pyarrow",
            )
        ).to_pandas()

    dup_h = np.sort(dups["h"].to_numpy().astype(np.int64))
    winner = np.sort(
        dups["h"].to_numpy().astype(np.int64).view(np.uint64)
        * np.uint64(0x9E3779B97F4A7C15)
        + dups["min_id"].to_numpy().astype(np.int64).view(np.uint64)
    )
    refs = ray.put((dup_h, winner))

    def keep_first(batch: pa.Table) -> pa.Table:
        dup_h_, winner_ = ray.get(refs)
        if len(dup_h_) == 0:
            return batch
        h, valid = hash64(batch)
        in_dup = np.isin(h, dup_h_) & valid
        if not in_dup.any():
            return batch
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        row_key = h.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + ids.view(
            np.uint64
        )
        keep = ~in_dup | np.isin(row_key, winner_)
        return batch.filter(pa.array(keep))

    return ds.map_batches(keep_first, batch_format="pyarrow")


def _candidate_pairs(
    banded: ray.data.Dataset, keys: list[str], pair_mode: str = "driver"
) -> pd.DataFrame:
    """LSH buckets -> distinct unordered candidate id pairs.

    ``driver`` (default): stream the band rows (a fixed ``bands`` rows per
    doc — tiny vs the corpus) to the driver and pair with one vectorized
    pandas pass. Ray's ``groupby().map_groups`` pays per-GROUP Python
    overhead, and LSH produces ~one bucket per doc, so the distributed
    plan costs O(corpus) group dispatches to find O(dups) pairs.

    ``shuffle``: the beyond-driver-memory plan — distributed groupby on
    the uniform band key, pairs emitted per bucket.
    """
    if pair_mode == "shuffle":
        pairs = (
            banded.groupby(keys)
            .map_groups(bucket_pairs, batch_format="pandas")
            .to_pandas()
        )
    else:
        df = banded.to_pandas()
        sizes = df.groupby(keys, sort=False)["doc_id"].transform("size")
        df = df[sizes > 1]  # only multi-doc buckets can produce pairs
        chunks = [bucket_pairs(g) for _, g in df.groupby(keys, sort=False)]
        pairs = (
            pd.concat(chunks, ignore_index=True)
            if chunks
            else pd.DataFrame({"a": [], "b": []}).astype("int64")
        )
    if pairs.empty:
        return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
    return pairs.drop_duplicates(ignore_index=True)


def _texts_for(
    ds: ray.data.Dataset, ids: np.ndarray, id_col: str, value_col: str
) -> dict:
    """Fetch ``value_col`` of the involved ids only (broadcast-small-side
    pattern; serves texts and embedding vectors alike). The sorted id
    array is built ONCE and closed over — not per batch."""
    ids_arr = np.unique(np.asarray(ids, dtype=np.int64))

    def keep(batch: pa.Table) -> pa.Table:
        mask = np.isin(batch[id_col].to_numpy(zero_copy_only=False), ids_arr)
        return batch.filter(pa.array(mask))

    small = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    return dict(zip(small[id_col], small[value_col]))


def near_dup_pairs_minhash(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_perms: int = 64,
    bands: int = 16,
    k: int = 3,
    pair_mode: str = "driver",
) -> pa.Table:
    """MinHash+LSH near-duplicate pairs, exact-Jaccard verified.

    Returns (a, b) with word-k-gram-shingle Jaccard >= threshold, a < b.
    """
    # instance => task-based map_batches: the stage state (hash
    # coefficients) is tiny, so shipping it once in the serialized fn beats
    # paying an actor pool spin-up per execution
    banded = ds.map_batches(
        MinHashBandStage(
            id_col=id_col, text_col=text_col, num_perms=num_perms, bands=bands, k=k
        ),
        batch_format="pyarrow",
    )
    pairs = _candidate_pairs(banded, ["band_id", "band_hash"], pair_mode)
    if pairs.empty:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    texts = _texts_for(ds, np.unique(pairs[["a", "b"]].to_numpy()), id_col, text_col)
    from sciscraper_ray.kernels.tokenize import format_manuscript

    shingle_cache = {
        i: set(word_shingles(format_manuscript(t), k).tolist())
        for i, t in texts.items()
    }
    keep = [
        jaccard(shingle_cache[a], shingle_cache[b]) >= threshold
        for a, b in zip(pairs["a"], pairs["b"])
    ]
    out = pairs[keep]
    return pa.table({"a": pa.array(out["a"], pa.int64()), "b": pa.array(out["b"], pa.int64())})


def near_dup_pairs_simhash(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    k: int = 3,
) -> pa.Table:
    """SimHash near-duplicate pairs: 4×16-bit chunk blocking (pigeonhole
    guarantees recall for hamming <= 3), exact hamming verified."""
    sigs = ds.map_batches(
        SimHashStage(id_col=id_col, text_col=text_col, k=k),
        batch_format="pyarrow",
    )
    sig_df = sigs.to_pandas()  # (doc_id, simhash, chunk0..3); small: 1 row/doc
    candidates = []
    for c in range(4):
        g = sig_df.groupby(f"chunk{c}")["doc_id"]
        for _, ids in g:
            if len(ids) > 1:
                arr = np.sort(ids.to_numpy())
                ia, ib = np.triu_indices(len(arr), k=1)
                candidates.append(np.stack([arr[ia], arr[ib]], axis=1))
    if not candidates:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    pairs = pd.DataFrame(
        np.unique(np.concatenate(candidates), axis=0), columns=["a", "b"]
    )
    sig_map = dict(zip(sig_df[id_col], sig_df["simhash"].astype(np.uint64)))
    ha = np.array([sig_map[a] for a in pairs["a"]], np.uint64)
    hb = np.array([sig_map[b] for b in pairs["b"]], np.uint64)
    out = pairs[hamming64(ha, hb) <= max_hamming]
    return pa.table({"a": pa.array(out["a"], pa.int64()), "b": pa.array(out["b"], pa.int64())})


def near_dup_pairs_ngram(
    ds: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n: int = 5,
    num_perms: int = 64,
    bands: int = 16,
    pair_mode: str = "driver",
) -> pa.Table:
    """Char n-gram Jaccard near-dup pairs: char-shingle MinHash-LSH
    candidates, then EXACT char-n-gram Jaccard >= threshold."""
    banded = ds.map_batches(
        MinHashBandStage(
            id_col=id_col,
            text_col=text_col,
            shingle_mode="char",
            num_perms=num_perms,
            bands=bands,
            k=n,
        ),
        batch_format="pyarrow",
    )
    pairs = _candidate_pairs(banded, ["band_id", "band_hash"], pair_mode)
    if pairs.empty:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    texts = _texts_for(ds, np.unique(pairs[["a", "b"]].to_numpy()), id_col, text_col)
    gram_cache = {i: char_ngrams(t, n) for i, t in texts.items()}
    keep = [
        jaccard(gram_cache[a], gram_cache[b]) >= threshold
        for a, b in zip(pairs["a"], pairs["b"])
    ]
    out = pairs[keep]
    return pa.table({"a": pa.array(out["a"], pa.int64()), "b": pa.array(out["b"], pa.int64())})


def near_dup_pairs_embedding(
    ds: ray.data.Dataset,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bits: int = 64,
    bands: int = 16,
    dim: int = 64,
    pair_mode: str = "driver",
) -> pa.Table:
    """Embedding-cosine near-dup pairs: signed-random-projection LSH
    candidates (one matmul per batch, one shuffle on the uniform band key),
    then EXACT cosine >= threshold on the involved vectors only."""
    from sciscraper_ray.stages.ann import _stack, cosine_matrix
    from sciscraper_ray.stages.dedup import HyperplaneBandStage

    banded = ds.map_batches(
        HyperplaneBandStage(
            id_col=id_col, vec_col=vec_col, dim=dim, bits=bits, bands=bands
        ),
        batch_format="pyarrow",
    )
    pairs = _candidate_pairs(banded, ["band_id", "band_hash"], pair_mode)
    if pairs.empty:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})

    vecs = _texts_for(ds, pairs[["a", "b"]].to_numpy().ravel(), id_col, vec_col)
    vec_map = {i: np.asarray(v, dtype=np.float64) for i, v in vecs.items()}
    a_mat = np.stack([vec_map[a] for a in pairs["a"]])
    b_mat = np.stack([vec_map[b] for b in pairs["b"]])
    an = a_mat / np.linalg.norm(a_mat, axis=1, keepdims=True)
    bn = b_mat / np.linalg.norm(b_mat, axis=1, keepdims=True)
    sims = np.einsum("ij,ij->i", an, bn)
    out = pairs[sims >= threshold]
    return pa.table({"a": pa.array(out["a"], pa.int64()), "b": pa.array(out["b"], pa.int64())})
