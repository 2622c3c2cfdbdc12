"""J1 + A1 — LSH bucket grouping → candidate pairs, with explicit skew
handling (salting / splitting / pair caps).

[spec BASELINE.json:6]: "LSH band hashing via groupby-aggregate shuffles to
candidate buckets ... skewed LSH buckets are explicitly salted/split before
the verify stage". SURVEY.md §4.2 is the design note.

Flow:
  band_rows (conv_id, doc_hash, bucket_key)
    │ 1. exact keys-only hot-bucket counts (per-batch unique → coarse
    │    _part groupby → reduceat sum, hot keys only leave the reducer)
    │ 2. hot keys (count > bucket_cap) broadcast via ray.put
    │ 3. salt stage: hot rows re-keyed bucket_key' = mix(key, doc_hash % s)
    │ 4. groupby coarse part of bucket_key → vectorized pair emission per
    │    partition (size-2 buckets fully vectorized; bigger buckets via
    │    triu indices with a seeded pair-cap sample)
    │ 5. pair distinct: groupby coarse part of pair-hash → unique + n_bands
  pairs (a, b, n_bands)

The per-bucket pair cap bounds worst-case O(m²) blowup; a pair lost to the
cap in one band still meets in the other b-1 bands (recall accounting in
metrics keeps this honest — SURVEY.md §4.2 (3)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from miekki_ray.config import DedupConfig
from miekki_ray.functions.hashing import splitmix64

U64 = np.uint64


def bucket_sizes(band_rows: ray.data.Dataset, cfg: DedupConfig
                 ) -> ray.data.Dataset:
    """EXACT per-bucket counts for HOT-bucket detection, emitting only
    buckets whose total size exceeds ``cfg.bucket_cap``. Per-batch unique
    keys + local counts (keys-only, two int64s/row — strictly narrower
    than the bucket shuffle that follows), then the engine's standard
    COARSE-partition reduce: ``_part = key % P`` → ``groupby("_part")
    .map_groups`` with a vectorized sorted-reduceat sum per partition.

    Two earlier revisions bracket this design: (1) shipping only keys
    that repeat WITHIN a batch (~50x less traffic) missed a hot bucket
    spread exactly one-row-per-block (VERDICT r3 "What's wrong" #4) —
    still pair-capped at emit but never salted, so one shuffle partition
    absorbed the whole mega-bucket; (2) exact counts via a fine-grained
    ``groupby("bucket_key").aggregate(Sum)`` were correct but created
    ~n_docs*n_bands GROUPS, and Ray's sort-based aggregate pays per-group
    overhead — measured 390 s vs 2.2 s for this coarse-partition exact
    form on 8.5M band rows at 4 cpus (the r4 scaling-trial regression).
    The `n_rep` column carries the locally-repeating share of each count
    so hot_bucket_keys can report how many hot buckets the cheap
    local-repeat heuristic alone would have caught vs how many only the
    exact pass sees."""
    P = cfg.num_partitions
    cap = cfg.bucket_cap

    def partial(batch: pa.Table) -> pa.Table:
        keys, counts = np.unique(batch["bucket_key"].to_numpy(),
                                 return_counts=True)
        n = counts.astype(np.int64)
        part = (keys.view(np.uint64) % np.uint64(P)).astype(np.int32)
        return pa.table({
            "bucket_key": pa.array(keys, type=pa.int64()),
            "n": pa.array(n, type=pa.int64()),
            "n_rep": pa.array(np.where(n >= 2, n, 0), type=pa.int64()),
            "_part": pa.array(part, type=pa.int32()),
        })

    def hot_in_partition(group: pd.DataFrame) -> pa.Table:
        empty = pa.table({"bucket_key": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64()),
                          "n_rep": pa.array([], type=pa.int64())})
        if len(group) == 0 or "bucket_key" not in group.columns:
            return empty
        keys = group["bucket_key"].to_numpy(dtype=np.int64)
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        ns = group["n"].to_numpy(dtype=np.int64)[order]
        reps = group["n_rep"].to_numpy(dtype=np.int64)[order]
        change = np.flatnonzero(
            np.concatenate(([True], ks[1:] != ks[:-1])))
        tot = np.add.reduceat(ns, change)
        rep = np.add.reduceat(reps, change)
        hot = tot > cap
        if not hot.any():
            return empty
        return pa.table({
            "bucket_key": pa.array(ks[change][hot], type=pa.int64()),
            "n": pa.array(tot[hot], type=pa.int64()),
            "n_rep": pa.array(rep[hot], type=pa.int64()),
        })

    return (band_rows.map_batches(partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
            .groupby("_part")
            .map_groups(hot_in_partition, batch_format="pandas"))


def hot_bucket_keys(band_rows: ray.data.Dataset, cfg: DedupConfig,
                    metrics_name: str | None = None) -> np.ndarray:
    """Sorted int64 array of bucket keys whose size exceeds bucket_cap.
    Small by construction (bucket_sizes already filters to mega-buckets
    inside each partition) → safe to collect. Emits both detection
    counters: buckets whose locally-repeating rows alone exceed the cap
    (the old heuristic's reach) and buckets only the exact count catches
    (spread thinner than one-repeat-per-block)."""
    tbl = bucket_sizes(band_rows, cfg).to_pandas()
    if len(tbl) == 0 or "bucket_key" not in tbl.columns:
        return np.empty(0, dtype=np.int64)
    if metrics_name:
        from miekki_ray.state.metrics import emit as memit
        n_local = int((tbl["n_rep"] > cfg.bucket_cap).sum())
        memit(metrics_name, {
            "hot_buckets_local": n_local,
            "hot_buckets_second_chance": int(len(tbl) - n_local)})
    return np.sort(tbl["bucket_key"].to_numpy(dtype=np.int64))


def salt_hot_buckets(band_rows: ray.data.Dataset, hot_keys: np.ndarray,
                     cfg: DedupConfig) -> ray.data.Dataset:
    """Re-key rows in hot buckets: bucket_key' = mix(key + salt+1) where
    salt = mix(doc_hash, bucket_key) % salt_factor. Splits a mega-bucket
    into salt_factor sub-buckets spread across shuffle partitions
    [spec BASELINE.json:6].

    The salt draw MUST vary per band (hence mixing bucket_key in): a
    band-independent `doc_hash % s` would assign each doc the SAME salt in
    every band, permanently separating two different-salt docs in all b
    bands — a mega near-dup cluster would split into up to salt_factor
    components. With a per-band draw, a pair split in one band still
    collides in another with prob 1/s per band (expected b/s shared
    sub-buckets), preserving the recall rationale."""
    if hot_keys.size == 0:
        return band_rows
    hot_ref = ray.put(hot_keys)
    s = U64(cfg.salt_factor)

    def salt(batch: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        keys = batch["bucket_key"].to_numpy()          # int64 view
        is_hot = np.isin(keys, hot, assume_unique=False)
        if not is_hot.any():
            return batch
        dh = batch["doc_hash"].to_numpy()
        with np.errstate(over="ignore"):
            draw = splitmix64(
                dh + keys.view(U64) * U64(0x9E3779B97F4A7C15)) % s
            salted = splitmix64(keys.view(U64) + draw + U64(1))
        new_keys = np.where(is_hot, salted.view(np.int64), keys)
        return batch.set_column(
            batch.schema.get_field_index("bucket_key"), "bucket_key",
            pa.array(new_keys, type=pa.int64()))

    return band_rows.map_batches(salt, batch_format="pyarrow",
                                 zero_copy_batch=True)


def _triu_unrank(k: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized unranking of row-major upper-triangle pair ranks
    (i < j, rank = T(i) + j - i - 1 with T(i) = i*(2m-i-1)//2) — lets a
    capped mega-bucket sample `cap` pairs WITHOUT materializing the full
    O(m^2) triu index arrays first."""
    i = np.floor(((2 * m - 1)
                  - np.sqrt((2.0 * m - 1) ** 2 - 8.0 * k)) / 2.0) \
        .astype(np.int64)

    def T(r):
        return r * (2 * m - r - 1) // 2

    # one-step float-edge correction on each side
    i = np.where(T(i + 1) <= k, i + 1, i)
    i = np.where(T(i) > k, i - 1, i)
    j = k - T(i) + i + 1
    return i, j


def _emit_pairs_partition(cfg: DedupConfig, metrics_name: str | None = None):
    pair_cap = cfg.pair_cap
    prefix_cap = cfg.prefix_pair_cap

    def emit(group: pd.DataFrame) -> pd.DataFrame:
        t = group.sort_values("bucket_key", kind="mergesort")
        keys = t["bucket_key"].to_numpy(dtype=np.int64)
        ids = t["conv_id"].to_numpy(dtype=object)
        pband = (t["pband"].to_numpy(dtype=bool)
                 if "pband" in t.columns else np.zeros(len(t), dtype=bool))
        change = np.flatnonzero(np.concatenate(([True], keys[1:] != keys[:-1])))
        bounds = np.append(change, keys.size)
        sizes = np.diff(bounds)
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        # size-2 buckets: fully vectorized (the overwhelming majority)
        two = np.flatnonzero(sizes == 2)
        if two.size:
            s0 = bounds[two]
            x, y = ids[s0], ids[s0 + 1]
            lo = np.minimum(x, y)
            hi = np.maximum(x, y)
            neq = lo != hi
            out_a.append(lo[neq])
            out_b.append(hi[neq])
        # larger buckets: triu pairs, capped with a seeded sample
        n_capped_buckets = 0
        n_pairs_dropped = 0
        for gi in np.flatnonzero(sizes > 2):
            s, e = bounds[gi], bounds[gi] + sizes[gi]
            members = np.unique(ids[s:e].astype(str))
            m = members.size
            if m < 2:
                continue
            cap = prefix_cap if pband[s] else pair_cap
            n_pairs = m * (m - 1) // 2
            if n_pairs > cap:
                # sample ranks FIRST (Floyd's algorithm: O(cap) memory),
                # then unrank analytically — triu_indices before capping
                # would allocate O(m^2) for a salted mega-bucket
                rng = np.random.default_rng(int(keys[s]) & 0x7FFFFFFF)
                pick = rng.choice(n_pairs, size=cap, replace=False)
                ii, jj = _triu_unrank(pick, m)
                n_capped_buckets += 1
                n_pairs_dropped += n_pairs - cap
            else:
                ii, jj = np.triu_indices(m, k=1)
            out_a.append(members[ii])
            out_b.append(members[jj])
        if n_capped_buckets:
            from miekki_ray.state.metrics import emit as memit
            # one emit per GROUP but Ray runs many groups per task: the
            # group key (_part) is the retry-stable per-call discriminator
            # (ADVICE r4 — without it all but the first group's counters
            # in a task were dropped as presumed retries)
            part = (str(group["_part"].iat[0])
                    if "_part" in group.columns and len(group)
                    else str(int(keys[0])))
            memit(metrics_name, {"pairs_capped_buckets": n_capped_buckets,
                                 "pairs_dropped_by_cap": n_pairs_dropped},
                  token_suffix=part)
        if not out_a:
            return pa.table({"a": pa.array([], type=pa.string()),
                             "b": pa.array([], type=pa.string())})
        return pa.table({
            "a": pa.array(np.concatenate(out_a).astype(str),
                          type=pa.string()),
            "b": pa.array(np.concatenate(out_b).astype(str),
                          type=pa.string())})

    return emit


def candidate_pairs(band_rows: ray.data.Dataset, cfg: DedupConfig,
                    metrics_name: str | None = None) -> ray.data.Dataset:
    """Full J1+A1: salt → bucket pairs → distinct with n_bands count.
    Shuffle #2 (bucket_key) + shuffle #3 (pair key)."""
    hot = hot_bucket_keys(band_rows, cfg, metrics_name)
    if metrics_name and hot.size:
        from miekki_ray.state.metrics import emit as memit
        memit(metrics_name, {"hot_buckets_salted": int(hot.size)})
    salted = salt_hot_buckets(band_rows, hot, cfg)
    P = cfg.num_partitions
    from miekki_ray.functions.util import add_uint_part

    parted = salted.map_batches(add_uint_part("bucket_key", P),
                                batch_format="pyarrow", zero_copy_batch=True)
    raw_pairs = parted.groupby("_part").map_groups(
        _emit_pairs_partition(cfg, metrics_name), batch_format="pandas")
    return distinct_pairs(raw_pairs, cfg)


def distinct_pairs(raw_pairs: ray.data.Dataset, cfg: DedupConfig
                   ) -> ray.data.Dataset:
    """A1 — dedupe (a,b) and count how many buckets agreed (n_bands).

    Fully Arrow-native as of r5 (VERDICT r4 Next #6): the partition tag
    hashes the (a, b) columns straight off their Arrow buffers
    (arrow_str_hash64 — no pandas conversion, no per-row Python string
    concat on the flagship's hottest small-row stream), and the per-
    partition distinct is Arrow's C-speed hash group_by. The _part tag is
    load-balancing only — exactness comes from grouping on the strings."""
    P = cfg.num_partitions

    from miekki_ray.functions.hashing import arrow_str_hash64, splitmix64

    _EMPTY_TAGGED = pa.table({"a": pa.array([], type=pa.string()),
                              "b": pa.array([], type=pa.string()),
                              "_part": pa.array([], type=pa.int32())})
    _EMPTY_OUT = pa.table({"a": pa.array([], type=pa.string()),
                           "b": pa.array([], type=pa.string()),
                           "n_bands": pa.array([], type=pa.int32())})

    def add_part(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "a" not in batch.column_names:
            # schema-less empty block from an empty upstream partition
            return _EMPTY_TAGGED
        ha = arrow_str_hash64(batch["a"])
        hb = arrow_str_hash64(batch["b"], seed=1)
        with np.errstate(over="ignore"):
            part = (splitmix64(ha + hb * U64(0x9E3779B97F4A7C15))
                    % U64(P)).astype(np.int32)
        return batch.append_column("_part", pa.array(part, type=pa.int32()))

    def uniq(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "a" not in group.column_names:
            return _EMPTY_OUT
        g = (group.select(["a", "b"])
             .group_by(["a", "b"]).aggregate([([], "count_all")]))
        return pa.table({
            "a": g["a"].cast(pa.string()),
            "b": g["b"].cast(pa.string()),
            "n_bands": g["count_all"].cast(pa.int32()),
        })

    return (raw_pairs.map_batches(add_part, batch_format="pyarrow",
                                  zero_copy_batch=True)
            .groupby("_part").map_groups(uniq, batch_format="pyarrow"))
