"""M5/ST1 — the MinHash sketcher actor pool, and M7 — band explode.

[spec BASELINE.json:6]: "per-conversation k-shingle MinHash signatures
computed in map_batches over zero-copy Arrow batches (vectorized 64-bit
multiply-shift hashing in NumPy inside an actor pool)".

Sketcher is a callable CLASS → Ray actor pool: the (S,2) multiply-shift
parameter matrix is built ONCE per actor in __init__ from the config seed
(stateful stage ST1, SURVEY.md §2.3); __call__ sketches a whole Arrow batch
with one np.minimum.reduceat pass (functions/hashing.py).

Band explode emits b rows per doc with a single uint64 bucket_key =
mix(band_id, band_hash) — the idiomatic rendering of Miekki's per-slot index
partitions as a groupby shuffle key [spec BASELINE.json:6]. The band-row
schema is minimal (conv_id, doc_hash, bucket_key): no doc text ever crosses
the LSH shuffle (SURVEY.md §4.2 memory note).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from miekki_ray.config import DedupConfig
from miekki_ray.functions.hashing import (
    band_hashes,
    hash_params,
    minhash_from_concat,
)


class Sketcher:
    """Actor-pool UDF: docs batch -> + sig (fixed_size_list<uint64, S>),
    n_shingles."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg
        self.a, self.b = hash_params(cfg.num_perm, cfg.seed)  # once per actor
        n_pslots = cfg.prefix_bands * cfg.prefix_rows
        self.pa_, self.pb_ = hash_params(n_pslots, cfg.seed + 7)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        # ONE rolling-hash pass over the batch's shared Arrow string
        # buffer — no Python-string round trip, and the prefix sketch is a
        # free slice of the same pass (hashing.shingle_sets_from_arrow)
        from miekki_ray.functions.hashing import shingle_sets_from_arrow
        sets, psets = shingle_sets_from_arrow(
            batch["doc"], cfg.k, prefix_bytes=cfg.prefix_sketch_bytes)
        sizes = np.array([s.size for s in sets], dtype=np.int64)
        n_pslots = cfg.prefix_bands * cfg.prefix_rows
        if sets:
            concat = np.concatenate(sets)
            offsets = np.concatenate(([0], np.cumsum(sizes)[:-1]))
            sig = minhash_from_concat(concat, offsets, self.a, self.b)
            psizes = np.array([s.size for s in psets], dtype=np.int64)
            pconcat = np.concatenate(psets)
            poffsets = np.concatenate(([0], np.cumsum(psizes)[:-1]))
            psig = minhash_from_concat(pconcat, poffsets, self.pa_, self.pb_)
        else:
            sig = np.empty((0, cfg.num_perm), dtype=np.uint64)
            psig = np.empty((0, n_pslots), dtype=np.uint64)
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sig.ravel(), type=pa.uint64()), cfg.num_perm)
        psig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(psig.ravel(), type=pa.uint64()), n_pslots)
        out = batch.append_column("sig", sig_col)
        out = out.append_column("psig", psig_col)
        return out.append_column(
            "n_shingles", pa.array(sizes.astype(np.int32), type=pa.int32()))


# Per-worker-process sketcher cache: stateless TASKS reuse Ray's warm
# worker processes, so the (S,2) hash-parameter state is built once per
# process — the same amortization an actor pool gives, without paying a
# fresh actor-process spawn (~1s each, staggered) per pipeline stage.
# Measured on the 5M-turn corpus at 32 cpus: actor pool 45s wall for 348
# core-s of work (spawn-bound, ~8x effective parallelism) vs tasks ~12s.
_SKETCHER_CACHE: dict[str, Sketcher] = {}


def _sketch_batch(batch: pa.Table, cfg: DedupConfig) -> pa.Table:
    key = cfg.config_hash()
    sk = _SKETCHER_CACHE.get(key)
    if sk is None:
        sk = _SKETCHER_CACHE[key] = Sketcher(cfg)
    return sk(batch)


def sketch_docs(docs: ray.data.Dataset, cfg: DedupConfig,
                use_actor_pool: bool = False) -> ray.data.Dataset:
    """M5. Default: warm-worker tasks with per-process cached state (see
    note above). use_actor_pool=True gives the classic dedicated actor pool
    (useful when the state were heavy enough to warrant pinned processes)."""
    if use_actor_pool:
        return docs.map_batches(
            Sketcher,
            fn_constructor_args=(cfg,),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.sketch_batch_size,
            concurrency=cfg.sketch_concurrency,
        )
    return docs.map_batches(
        _sketch_batch,
        fn_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=cfg.sketch_batch_size,
    )


def _sig_matrix(batch: pa.Table, num_perm: int) -> np.ndarray:
    return _sig_matrix_col(batch, "sig", num_perm)


def _sig_matrix_col(batch: pa.Table, name: str, width: int) -> np.ndarray:
    col = batch[name]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.flatten().to_numpy(zero_copy_only=False).reshape(-1, width)


def band_explode(sketched: ray.data.Dataset, cfg: DedupConfig,
                 include_prefix: bool = True) -> ray.data.Dataset:
    """sig → b band rows per doc (Arrow-native explode inside map_batches —
    cheaper than per-row flat_map, SURVEY.md §2.2 M7).

    ``include_prefix=False`` emits only the full-doc sig bands — for
    sketch families (word n-grams) whose psig slot is NOT a true prefix
    sketch; tagging those pband=True would wrongly put their hot buckets
    under the tight prefix_pair_cap."""
    b_, r_, seed = cfg.bands, cfg.rows_per_band, cfg.seed

    pb_, pr_ = ((cfg.prefix_bands, cfg.prefix_rows) if include_prefix
                else (0, 0))
    total_b = b_ + pb_

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        sig = _sig_matrix(batch, cfg.num_perm)
        bh = band_hashes(sig, b_, r_, seed)              # (n, b)
        if pb_:
            # prefix-sketch bands (containment candidates) use band ids
            # past b_
            psig = _sig_matrix_col(batch, "psig",
                                   cfg.prefix_bands * cfg.prefix_rows)
            pbh = band_hashes(psig, pb_, pr_, seed + 13)     # (n, pb)
            allh = np.concatenate([bh, pbh], axis=1)         # (n, b+pb)
        else:
            allh = bh
        band_ids = np.tile(np.arange(total_b, dtype=np.uint64), n)
        from miekki_ray.functions.hashing import splitmix64
        with np.errstate(over="ignore"):
            bucket = splitmix64(allh.ravel()
                                + band_ids * np.uint64(0x9E3779B97F4A7C15))
        conv = pc_take_repeat(batch["conv_id"], n, total_b)
        dh = np.repeat(batch["doc_hash"].to_numpy(), total_b)
        pband = np.tile(np.arange(total_b) >= b_, n)
        # NOTE: bucket_key is the uint64 hash REINTERPRETED as int64 (same
        # bits) — Ray Data's sort/groupby handles int64 keys natively but
        # falls back to slow pickled-object arrays for uint64 values > 2^63.
        return pa.table({
            "conv_id": conv,
            "doc_hash": pa.array(dh, type=pa.uint64()),
            "bucket_key": pa.array(bucket.view(np.int64), type=pa.int64()),
            "pband": pa.array(pband, type=pa.bool_()),
        })

    return sketched.map_batches(explode, batch_format="pyarrow",
                                zero_copy_batch=True)


def pc_take_repeat(col: pa.ChunkedArray | pa.Array, n: int, times: int):
    """repeat each element `times` times via a take (Arrow-native)."""
    import pyarrow.compute as pc
    idx = np.repeat(np.arange(n, dtype=np.int64), times)
    return pc.take(col, pa.array(idx))
