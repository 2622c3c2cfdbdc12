"""HNSW graph ANN (stages/hnsw.py): kernel correctness, recall gates vs
the brute-force baseline, determinism, and the shard-merge Ray stage —
the same gate shape the IVF/LSH entries carry (tests/test_similarity)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from miekki_ray.stages.hnsw import HNSWIndex, hnsw_topk

SF = "/root/testdata/sf0.001"


def _unit(rng, n, d):
    m = rng.standard_normal((n, d))
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _brute(vecs, q, k):
    return np.argsort(-(vecs @ q), kind="stable")[:k]


def test_kernel_recall_and_determinism():
    rng = np.random.default_rng(11)
    vecs = _unit(rng, 1500, 24)
    qs = _unit(rng, 10, 24)
    idx = HNSWIndex(M=16, ef_construction=64, seed=3).build(vecs)
    idx2 = HNSWIndex(M=16, ef_construction=64, seed=3).build(vecs)
    recalls = []
    for q in qs:
        truth = set(_brute(vecs, q, 10).tolist())
        ids, sims = idx.search(q, 10, ef_search=96)
        recalls.append(len(truth & set(ids.tolist())) / 10)
        # best-first order, sims consistent with the vectors
        assert np.all(np.diff(sims) <= 1e-12)
        np.testing.assert_allclose(sims, vecs[ids] @ q, atol=1e-9)
        # identical build -> identical result (seeded level draw)
        ids2, _ = idx2.search(q, 10, ef_search=96)
        assert ids.tolist() == ids2.tolist()
    assert np.mean(recalls) >= 0.9, recalls


def test_kernel_planted_neighbor_always_found():
    """A near-duplicate of the query (cos ~0.999) must be retrieved —
    the dedup-flavored use of ANN."""
    rng = np.random.default_rng(5)
    vecs = _unit(rng, 800, 16)
    idx = HNSWIndex(M=12, ef_construction=48, seed=1).build(vecs)
    for probe in range(0, 800, 97):
        q = vecs[probe] + rng.standard_normal(16) * 0.01
        q = q / np.linalg.norm(q)
        ids, _ = idx.search(q, 5, ef_search=64)
        assert probe in ids.tolist()


def test_kernel_edge_cases():
    rng = np.random.default_rng(2)
    vecs = _unit(rng, 6, 8)
    q = vecs[0]
    for n in (0, 1, 2, 6):
        idx = HNSWIndex(M=4, ef_construction=8, seed=1).build(vecs[:n])
        ids, sims = idx.search(q, 10, ef_search=16)
        assert len(ids) == min(n, 10)
        if n:
            assert ids[0] == 0          # the query's own vector wins
    with pytest.raises(ValueError):
        HNSWIndex(M=1)


def test_hnsw_topk_stage_recall_gate():
    """The Ray stage over the driver embeddings table: recall@10 >= 0.9
    vs brute_force_topk (the accuracy baseline) per query, exact shard
    merge, deterministic output across two runs — the same gate the
    IVF/LSH graded entries carry."""
    from miekki_ray.stages.similarity import brute_force_topk

    import __ray_entry__ as E

    emb = E._read_tbl(SF, "embeddings")
    qs = E._query_vecs(SF)
    truth = brute_force_topk(emb, qs, k=10)
    got = hnsw_topk(emb, qs, k=10)
    got2 = hnsw_topk(emb, qs, k=10)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), got2.reset_index(drop=True))
    assert set(got.columns) == {"query_idx", "vec_id", "score", "rank"}
    for qi, grp in truth.groupby("query_idx"):
        t = set(grp["vec_id"])
        g = set(got[got["query_idx"] == qi]["vec_id"])
        assert len(t & g) / len(t) >= 0.9, (qi, t, g)


def test_hnsw_topk_stage_multi_block_merge():
    """Shards are per BLOCK: force several blocks and check the merge
    still finds the planted best match wherever its block is."""
    rng = np.random.default_rng(7)
    m = _unit(rng, 600, 16)
    target = 577
    q = m[target] + rng.standard_normal(16) * 0.005
    q = q / np.linalg.norm(q)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(600, dtype=np.int64)),
        "embedding": pa.array([row.tolist() for row in m],
                              type=pa.list_(pa.float64())),
    })
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = hnsw_topk(ds, np.asarray([q]), k=5)
    assert target in set(out["vec_id"])
    assert out.iloc[0]["vec_id"] == target
