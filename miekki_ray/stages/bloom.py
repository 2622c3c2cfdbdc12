"""Bloom-prefiltered semi-join — the shuffle-volume reducer for joining a
100-TB fact table against a selective key set (SURVEY.md §2.4 J3/J4 scale
note: broadcast what is SMALL, never shuffle what can be pre-filtered).

Pattern: (1) the build side's keys fold into one m-bit Bloom filter via a
distributed OR-merge tree (per-block partial blooms, Ray AggregateFn merge
— the driver only ever sees m/8 bytes, never a key list); (2) the filter
is put in the object store ONCE (`ray.put`) and every probe-side batch
tests membership vectorized (k splitmix64-derived probes, bitwise AND);
(3) because Bloom admits false positives, survivors still flow through an
exact hash semi-join — the bloom only shrinks that join's input, it never
decides membership. Result is exact; the win is that the all-to-all join
exchange moves `selectivity + fp_rate` of the fact table instead of all
of it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import AggregateFn

from miekki_ray.functions.hashing import splitmix64

U64 = np.uint64


def _probe_positions(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing h1 + i*h2 (Kirsch–
    Mitzenmacher): two independent splitmix64 streams, k derived probes."""
    x = keys.astype(np.int64).view(U64)
    h1 = splitmix64(x)
    h2 = splitmix64(x ^ U64(0x9E3779B97F4A7C15)) | U64(1)  # odd stride
    i = np.arange(k, dtype=U64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % U64(m_bits)).astype(np.int64)


def _local_bloom(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    bloom = np.zeros(m_bits // 8, dtype=np.uint8)
    pos = _probe_positions(keys, m_bits, k).ravel()
    np.bitwise_or.at(bloom, pos >> 3,
                     np.uint8(1) << (pos & 7).astype(np.uint8))
    return bloom


def bloom_test(bloom: np.ndarray, keys: np.ndarray, m_bits: int,
               k: int) -> np.ndarray:
    """Vectorized membership test: True = maybe-present (or present)."""
    if keys.size == 0:
        return np.zeros(0, dtype=bool)
    pos = _probe_positions(keys, m_bits, k)
    bits = (bloom[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


def build_bloom(ds: ray.data.Dataset, key: str, *, m_bits: int = 1 << 23,
                k: int = 5) -> np.ndarray:
    """Fold a Dataset's int key column into one Bloom filter with a
    distributed OR-merge (AggregateFn: per-block partials, tree merge —
    driver receives only the final m/8-byte array)."""
    assert m_bits % 8 == 0

    def acc_block(block) -> np.ndarray:
        tbl = block if isinstance(block, pa.Table) \
            else pa.Table.from_pandas(block)
        keys = tbl[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return _local_bloom(keys, m_bits, k)

    agg = AggregateFn(
        init=lambda _: np.zeros(m_bits // 8, dtype=np.uint8),
        accumulate_block=lambda a, block: np.bitwise_or(a, acc_block(block)),
        merge=np.bitwise_or,
        name="bloom")
    return ds.aggregate(agg)["bloom"]


def bloom_semi_join(probe: ray.data.Dataset, build: ray.data.Dataset, *,
                    probe_key: str, build_key: str,
                    m_bits: int = 1 << 23, k: int = 5,
                    num_partitions: int = 16,
                    broadcast_limit: int | None = 2_000_000
                    ) -> ray.data.Dataset:
    """Exact semi-join (rows of ``probe`` whose key appears in ``build``),
    with the Bloom prefilter cutting the exact join's shuffled volume.
    ``build``'s key column should be selective; the filter itself is
    m/8 bytes regardless of build size.

    Auto-switch (the repo's broadcast↔shuffle policy): a build side
    under ``broadcast_limit`` rows broadcasts its EXACT sorted key array
    once and the whole semi-join is ONE probe scan (np.isin per batch) —
    an exact key set this small strictly dominates a Bloom (no false
    positives, no verify pass; the r3 bench profile showed the verify
    join paying ~4 s of aggregator-actor startup to check a handful of
    survivors). Above the limit — or with ``broadcast_limit=None``,
    which skips the sizing count() pass for builds known to be huge —
    the Bloom prefilter cuts the exact join's shuffled volume and the
    distributed distinct-keys⨝survivors join removes its false
    positives. Identical output, pinned by test_bloom_hll."""
    if broadcast_limit is not None:
        # ONE executor pass decides the switch AND fetches the keys
        # (count() + to_pandas() would read build twice; limit(N+1)
        # stops early on a huge build — the drop_losers fetch pattern)
        kp = (build.select_columns([build_key])
              .limit(broadcast_limit + 1).to_pandas())
        if len(kp) <= broadcast_limit:
            kref = ray.put(np.unique(
                kp[build_key].to_numpy(dtype=np.int64)))

            def exact_semi(batch: pa.Table) -> pa.Table:
                keys_sorted = ray.get(kref)
                keys = batch[probe_key].to_numpy(
                    zero_copy_only=False).astype(np.int64)
                return batch.filter(pa.array(np.isin(keys, keys_sorted)))

            return probe.map_batches(exact_semi, batch_format="pyarrow",
                                     zero_copy_batch=True)

    bloom = build_bloom(build, build_key, m_bits=m_bits, k=k)
    bloom_ref = ray.put(bloom)  # one object-store copy, read per task

    def prefilter(batch: pa.Table) -> pa.Table:
        b = ray.get(bloom_ref)
        keys = batch[probe_key].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return batch.filter(pa.array(bloom_test(b, keys, m_bits, k)))

    maybe = probe.map_batches(prefilter, batch_format="pyarrow")

    # exact verification: distinct build keys ⨝ survivors removes the
    # Bloom's false positives (result is exact, not approximate)
    from ray.data.aggregate import Count
    keys_ds = (build.select_columns([build_key])
               .groupby(build_key).aggregate(Count(alias_name="_k")))
    out = maybe.join(keys_ds, join_type="inner",
                     num_partitions=num_partitions,
                     on=(probe_key,), right_on=(build_key,))
    return out.drop_columns(["_k"])
