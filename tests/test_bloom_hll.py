"""Bloom-prefiltered semi-join exactness + HyperLogLog error bound."""

import numpy as np
import pandas as pd
import ray.data

from miekki_ray.functions.hll import (approx_distinct, hll_estimate,
                                      hll_registers)
from miekki_ray.stages.bloom import (_local_bloom, bloom_semi_join,
                                     bloom_test, build_bloom)


def test_bloom_no_false_negatives_and_low_fp():
    rng = np.random.default_rng(3)
    members = rng.choice(10**9, 5000, replace=False).astype(np.int64)
    rest = rng.choice(10**9, 20000, replace=False).astype(np.int64)
    rest = np.setdiff1d(rest, members)
    m_bits, k = 1 << 17, 5
    bloom = _local_bloom(members, m_bits, k)
    assert bloom_test(bloom, members, m_bits, k).all()   # no false negs
    fp = bloom_test(bloom, rest, m_bits, k).mean()
    # 5k keys in 2^17 bits, k=5 -> theoretical fp ~ 0.6%; allow slack
    assert fp < 0.03, fp


def test_build_bloom_distributed_matches_local():
    keys = np.arange(1000, 4000, dtype=np.int64)
    ds = ray.data.from_pandas(pd.DataFrame({"k": keys})) \
        .repartition(7)
    m_bits, k = 1 << 16, 4
    assert np.array_equal(build_bloom(ds, "k", m_bits=m_bits, k=k),
                          _local_bloom(keys, m_bits, k))


def test_bloom_semi_join_exact_despite_false_positives():
    rng = np.random.default_rng(9)
    probe = pd.DataFrame({
        "pk": rng.integers(0, 500, 4000).astype(np.int64),
        "v": np.arange(4000, dtype=np.int64)})
    build = pd.DataFrame(
        {"bk": rng.choice(500, 60, replace=False).astype(np.int64)})
    # tiny filter (high fp rate) proves the exact-join backstop works
    out = bloom_semi_join(
        ray.data.from_pandas(probe), ray.data.from_pandas(build),
        probe_key="pk", build_key="bk", m_bits=256, k=2,
        num_partitions=4).to_pandas()
    want = probe[probe["pk"].isin(set(build["bk"]))]
    assert sorted(out["v"]) == sorted(want["v"])
    assert sorted(out.columns) == ["pk", "v"]


def test_hll_error_within_bound():
    rng = np.random.default_rng(1)
    for true_n in (500, 50_000):
        keys = rng.choice(2**62, true_n, replace=False).astype(np.int64)
        # duplicate every key 3x — distinct count must not change
        tripled = np.repeat(keys, 3)
        regs = hll_registers(
            __import__("miekki_ray.functions.hashing",
                       fromlist=["splitmix64"]).splitmix64(
                tripled.view(np.uint64)))
        est = hll_estimate(regs)
        assert abs(est - true_n) / true_n < 0.03, (true_n, est)


def test_hll_distributed_merge():
    n = 30_000
    df = pd.DataFrame({"doc": np.arange(n, dtype=np.int64) % 10_000})
    ds = ray.data.from_pandas(df).repartition(9)
    est = approx_distinct(ds, "doc")
    assert abs(est - 10_000) / 10_000 < 0.03, est


def test_bloom_semi_join_paths_identical():
    # broadcast verify (default, small build) vs distributed join verify
    # (forced with broadcast_limit=0) must agree row-for-row
    rng = np.random.default_rng(11)
    probe = pd.DataFrame({
        "pk": rng.integers(0, 300, 2500).astype(np.int64),
        "v": np.arange(2500, dtype=np.int64)})
    build = pd.DataFrame(
        {"bk": rng.choice(300, 40, replace=False).astype(np.int64)})
    kw = dict(probe_key="pk", build_key="bk", m_bits=256, k=2,
              num_partitions=4)
    a = bloom_semi_join(ray.data.from_pandas(probe),
                        ray.data.from_pandas(build), **kw).to_pandas()
    b = bloom_semi_join(ray.data.from_pandas(probe),
                        ray.data.from_pandas(build), broadcast_limit=0,
                        **kw).to_pandas()
    key = lambda df: df.sort_values(["pk", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(a)[sorted(a.columns)],
                                  key(b)[sorted(b.columns)])
