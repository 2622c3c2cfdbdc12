"""Product-quantization ANN (PQ-ADC with exact re-rank) — the
MEMORY-bound regime of the ANN menu (brute force / IVF / hyperplane-LSH
/ HNSW cover the compute-bound regimes in stages/similarity, hnsw).

Public algorithm [Jégou, Douze, Schmid 2011, "Product quantization for
nearest neighbor search"]: split the d-dim space into m subspaces, run
k-means with ks codewords in each, represent every vector as m one-byte
codes (d·4 bytes → m bytes; 32× compression at d=64, m=8). A query
scores a coded vector by ADC — per-subspace lookup tables
LUT[j] = q_j · C_jᵀ summed over j — so the scan touches m bytes per
vector instead of d floats. An exact re-rank of the per-batch PQ
shortlist (the standard IVF-ADC+R refinement) restores top-k quality.

Why this matters at 100 TB: an embedding corpus that cannot be held or
even streamed economically as float32 CAN be held as PQ codes (32×
smaller), and the codes are what a resident index would pin in memory.
In this engine the stage form is per-batch: train once on a driver-side
sample (bounded, broadcast via ray.put — the ivf_centroids pattern),
encode + ADC-scan + shortlist-re-rank inside one map_batches pass, exact
driver k-merge. The scan is fully vectorized (one fancy-index gather +
sum per query); nothing leaves a task but per-shard top-k rows.

Output/determinism contract identical to the other ANN entries:
columns query_idx, vec_id, score, rank; score = EXACT cosine of the
re-ranked rows rounded to 6dp, ties by id; seeded training.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from miekki_ray.stages.similarity import (
    _det_topk_idx,
    _mat,
    _normalize,
    _rank_topk,
)


def _kmeans_l2(sample: np.ndarray, ks: int, seed: int,
               n_iter: int = 12) -> np.ndarray:
    """Plain Euclidean Lloyd k-means (UNnormalized centroids — PQ
    codewords reconstruct subvectors, unlike the unit-sphere IVF coarse
    quantizer). Deterministic from seed."""
    rng = np.random.default_rng(seed)
    n = sample.shape[0]
    k = min(ks, n)
    cent = sample[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(n_iter):
        # ||x - c||² = ||x||² - 2 x·c + ||c||²; ||x||² constant per row
        d2 = -2.0 * (sample @ cent.T) + (cent * cent).sum(axis=1)[None, :]
        assign = np.argmin(d2, axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    return cent


def pq_train(sample: np.ndarray, m: int, ks: int,
             seed: int) -> np.ndarray:
    """(m, ks', d/m) codebook stack — one Euclidean k-means per
    subspace. d must divide evenly into m subspaces."""
    n, d = sample.shape
    if d % m != 0:
        raise ValueError(
            f"PQ subspace count m={m} must divide the embedding dim "
            f"d={d}; pick m from its divisors")
    ds_ = d // m
    return np.stack([
        _kmeans_l2(np.ascontiguousarray(sample[:, j * ds_:(j + 1) * ds_]),
                   ks, seed + j)
        for j in range(m)])


def pq_encode(mvecs: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, m) int32 codes: per subspace, the L2-nearest codeword."""
    n, d = mvecs.shape
    m, ks, ds_ = codebooks.shape
    codes = np.empty((n, m), dtype=np.int32)
    for j in range(m):
        sub = mvecs[:, j * ds_:(j + 1) * ds_]
        cb = codebooks[j]
        d2 = -2.0 * (sub @ cb.T) + (cb * cb).sum(axis=1)[None, :]
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


def pq_topk(embeddings: ray.data.Dataset, queries: np.ndarray,
            k: int = 10, m: int = 8, ks: int = 256,
            shortlist: int = 128, train_sample: int = 4096,
            seed: int = 7, id_col: str = "vec_id",
            vec_col: str = "embedding") -> pd.DataFrame:
    """PQ-ADC top-k with exact re-rank (module docstring). Per batch:
    encode → ADC scan (LUT gather + sum) → per-query shortlist → exact
    cosine re-rank of shortlist rows → emit top-k; driver k-merges."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    sample_tbl = embeddings.limit(train_sample).to_pandas()
    if len(sample_tbl) == 0:
        return pd.DataFrame({"query_idx": pd.Series([], dtype=np.int32),
                             id_col: pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64),
                             "rank": pd.Series([], dtype=np.int32)})
    sm = _normalize(np.stack(
        sample_tbl[vec_col].map(np.asarray).to_list()).astype(np.float64))
    codebooks = pq_train(sm, m, ks, seed)
    # per-query ADC lookup tables: LUT[qi, j, code] = q_j · C_j[code]
    mm, ks_eff, ds_ = codebooks.shape
    q_sub = qn.reshape(qn.shape[0], mm, ds_)
    lut = np.einsum("qjd,jkd->qjk", q_sub, codebooks)   # (nq, m, ks)
    ref = ray.put((qn, lut, codebooks))
    EMPTY = pa.table({"query_idx": pa.array([], type=pa.int32()),
                      id_col: pa.array([], type=pa.int64()),
                      "score": pa.array([], type=pa.float64())})

    def per_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return EMPTY
        q, lut_, cb = ray.get(ref)
        vecs = _normalize(_mat(batch, vec_col, np.float64))
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        codes = pq_encode(vecs, cb)                 # (nb, m)
        nb = vecs.shape[0]
        r = min(shortlist, nb)
        out_q, out_id, out_s = [], [], []
        jj = np.arange(cb.shape[0])
        for qi in range(q.shape[0]):
            adc = lut_[qi][jj, codes].sum(axis=1)   # (nb,) approx scores
            short = np.argpartition(-adc, r - 1)[:r] if r < nb \
                else np.arange(nb)
            exact = vecs[short] @ q[qi]             # re-rank exactly
            kk = min(k, short.size)
            sel = _det_topk_idx(exact, ids[short], kk)
            out_q.append(np.full(kk, qi, dtype=np.int32))
            out_id.append(ids[short][sel])
            out_s.append(exact[sel])
        if not out_q:                 # zero queries: np.concatenate([])
            return EMPTY              # raises; every ANN entry returns
        return pa.table({             # an empty frame here instead
            "query_idx": pa.array(np.concatenate(out_q), type=pa.int32()),
            id_col: pa.array(np.concatenate(out_id)),
            "score": pa.array(np.concatenate(out_s), type=pa.float64()),
        })

    parts = embeddings.map_batches(per_batch, batch_format="pyarrow",
                                   zero_copy_batch=True).to_pandas()
    return _rank_topk(parts, k, id_col)
