"""M6 — SimHash signatures (the spec's alternative sketch family).

[spec BASELINE.json:14] lists "MinHash/SimHash/suffix-array substring" as
the method menu. 64-bit SimHash (Charikar 2002 [public]): each shingle
hash votes ±1 on each of 64 bit positions; the signature bit is the vote
sign. Hamming distance between signatures tracks cosine similarity of the
shingle sets. Same actor-pool shape as the MinHash sketcher (SURVEY.md
§2.2 M6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from miekki_ray.config import DedupConfig
from miekki_ray.functions.hashing import shingle_sets_from_arrow


def simhash_from_hashes(h: np.ndarray) -> np.uint64:
    """64-bit simhash of a set of uint64 shingle hashes (vectorized)."""
    if h.size == 0:
        return np.uint64(0)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1))
    votes = bits.sum(axis=0, dtype=np.int64) * 2 - h.size
    sig = np.uint64(0)
    for j in np.flatnonzero(votes > 0):
        sig |= np.uint64(1) << np.uint64(j)
    return sig


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise Hamming distance between uint64 arrays (popcount)."""
    x = a ^ b
    cnt = np.zeros(x.shape, dtype=np.int64)
    while np.any(x):
        cnt += (x & np.uint64(1)).astype(np.int64)
        x = x >> np.uint64(1)
    return cnt


def simhash_batch(hash_sets: list[np.ndarray]) -> np.ndarray:
    """64-bit simhash for a BATCH of shingle-hash sets in one vectorized
    pass: per bit position, per-doc vote totals via np.add.reduceat over the
    concatenated hash array (64 passes over one 1D array — no per-doc
    Python loop, no (M, 64) bit-matrix temporary)."""
    n = len(hash_sets)
    sigs = np.zeros(n, dtype=np.uint64)
    if n == 0:
        return sigs
    sizes = np.array([h.size for h in hash_sets], dtype=np.int64)
    nonempty = sizes > 0
    if not nonempty.any():
        return sigs
    concat = np.concatenate([h for h in hash_sets if h.size])
    offsets = np.concatenate(([0], np.cumsum(sizes[nonempty])[:-1]))
    ne_sizes = sizes[nonempty]
    votes_sig = np.zeros(nonempty.sum(), dtype=np.uint64)
    for j in range(64):
        bit = ((concat >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
        ones = np.add.reduceat(bit, offsets)
        votes_sig |= ((2 * ones > ne_sizes).astype(np.uint64)
                      << np.uint64(j))
    sigs[nonempty] = votes_sig
    return sigs


class SimHasher:
    """Actor-pool UDF: docs batch -> + simhash:uint64 column."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        # batch-wide Arrow shingling (bit-identical to per-doc
        # shingle_hashes — hashing.shingle_sets_from_arrow docstring)
        sets, _ = shingle_sets_from_arrow(batch["doc"], self.cfg.k)
        sigs = simhash_batch(sets)
        return batch.append_column("simhash",
                                   pa.array(sigs, type=pa.uint64()))


def simhash_docs(docs: ray.data.Dataset, cfg: DedupConfig) -> ray.data.Dataset:
    return docs.map_batches(
        SimHasher,
        fn_constructor_args=(cfg,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.sketch_batch_size,
        concurrency=cfg.sketch_concurrency,
    )


def _block_bounds(n_blocks: int) -> list[tuple[int, int]]:
    """(offset, width) of n_blocks contiguous chunks covering 64 bits,
    widths as equal as possible."""
    w, r = divmod(64, n_blocks)
    bounds, off = [], 0
    for j in range(n_blocks):
        width = w + (1 if j < r else 0)
        bounds.append((off, width))
        off += width
    return bounds


def simhash_candidates(simmed: ray.data.Dataset, cfg: DedupConfig,
                       max_hamming: int = 3) -> ray.data.Dataset:
    """Near-dup candidates by SimHash: pigeonhole band blocking with the
    block count DERIVED from the promised radius — two 64-bit signatures
    within Hamming distance d differ in ≤ d blocks, so with d+1 blocks at
    least one block is shared (the fixed 4×16 split of the first version
    silently missed pairs for any max_hamming > 3). Exact Hamming filter
    per block group keeps the output radius-exact.

    ``max_hamming`` must be ≤ 63: with only 64 bits there can be at most
    64 blocks, so at d ≥ 64 the pigeonhole guarantee is unsatisfiable
    (two signatures differing in all 64 bits share no block yet are
    within the promised radius) — rejected loudly rather than silently
    under-recalling (ADVICE r4)."""
    import pandas as pd

    from miekki_ray.functions.hashing import splitmix64

    if not 0 <= max_hamming <= 63:
        raise ValueError(
            f"max_hamming={max_hamming} out of range [0, 63]: the "
            "pigeonhole block guarantee needs d+1 <= 64 blocks over a "
            "64-bit signature; at d >= 64 every pair is within radius — "
            "use an all-pairs comparison instead of simhash blocking")
    n_blocks = max_hamming + 1
    bounds = _block_bounds(n_blocks)

    def explode(batch: pa.Table) -> pa.Table:
        sig = batch["simhash"].to_numpy()
        blocks = []
        for j, (off, width) in enumerate(bounds):
            val = ((sig >> np.uint64(off))
                   & np.uint64((1 << width) - 1))
            # fold (chunk value, chunk index) into one int64 key: a fold
            # collision can only MERGE buckets (extra candidates for the
            # exact filter below), never split one — recall is preserved
            with np.errstate(over="ignore"):
                tagged = val ^ (np.uint64(j + 1)
                                * np.uint64(0x9E3779B97F4A7C15))
            blocks.append(splitmix64(tagged).view(np.int64))
        key = np.concatenate(blocks)
        ids = np.tile(batch["conv_id"].to_numpy(zero_copy_only=False),
                      n_blocks)
        sigsk = np.tile(sig, n_blocks)
        return pa.table({
            "block_key": pa.array(key, type=pa.int64()),
            "conv_id": pa.array(ids, type=pa.string()),
            "simhash": pa.array(sigsk, type=pa.uint64()),
        })

    def emit(group: pd.DataFrame) -> pd.DataFrame:
        from miekki_ray.stages.candidates import _triu_unrank

        g = group.sort_values(["block_key", "conv_id"], kind="mergesort")
        out_a, out_b = [], []
        for bk, grp in g.groupby("block_key", sort=False):
            if len(grp) < 2:
                continue
            ids = grp["conv_id"].to_numpy(dtype=object)
            sigs = grp["simhash"].to_numpy(dtype=np.uint64)
            m = len(ids)
            n_pairs = m * (m - 1) // 2
            if n_pairs > cfg.pair_cap:
                # skew guard, same contract as the LSH path: a shared
                # 16-bit block across a boilerplate corpus would otherwise
                # materialize O(m^2) triu arrays in one task
                rng = np.random.default_rng(int(bk) & 0x7FFFFFFF)
                pick = rng.choice(n_pairs, size=cfg.pair_cap,
                                  replace=False)
                ii, jj = _triu_unrank(pick, m)
            else:
                ii, jj = np.triu_indices(m, k=1)
            hd = hamming64(sigs[ii], sigs[jj])
            keep = hd <= max_hamming
            out_a.append(ids[ii[keep]])
            out_b.append(ids[jj[keep]])
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype=str),
                                 "b": pd.Series([], dtype=str)})
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        return pd.DataFrame({"a": np.minimum(a, b), "b": np.maximum(a, b)}) \
            .drop_duplicates()

    from miekki_ray.functions.util import add_uint_part

    per_block = (simmed.map_batches(explode, batch_format="pyarrow",
                                    zero_copy_batch=True)
                 .map_batches(add_uint_part("block_key",
                                            cfg.num_partitions),
                              batch_format="pyarrow")
                 .groupby("_part").map_groups(emit, batch_format="pandas"))

    # a pair sharing MULTIPLE blocks surfaces once per agreeing block, in
    # different block_key partitions — the per-partition drop_duplicates
    # above cannot see those twins. Global distinct via THE shared A1
    # helper (candidates.distinct_pairs: same (a,b) co-partition
    # convention as the LSH path — one definition, not a re-roll)
    from miekki_ray.stages.candidates import distinct_pairs

    return distinct_pairs(per_block, cfg).drop_columns(["n_bands"])
