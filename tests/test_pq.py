"""Product-quantization ANN (stages/pq.py): codebook/encode kernels,
compression quality, recall gate vs brute force, exact re-rank scores,
determinism — the gate shape shared by the IVF/LSH/HNSW entries."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from miekki_ray.stages.pq import _kmeans_l2, pq_encode, pq_topk, pq_train

SF = "/root/testdata/sf0.001"


def _unit(rng, n, d):
    m = rng.standard_normal((n, d))
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def test_kmeans_l2_recovers_planted_centers():
    rng = np.random.default_rng(3)
    centers = rng.standard_normal((4, 8)) * 3
    pts = np.concatenate([c + rng.standard_normal((50, 8)) * 0.05
                          for c in centers])
    cb = _kmeans_l2(pts, ks=4, seed=1)
    # every planted center has a codeword within noise distance
    for c in centers:
        assert np.min(np.linalg.norm(cb - c, axis=1)) < 0.2


def test_train_encode_reconstruction_beats_variance():
    rng = np.random.default_rng(0)
    v = _unit(rng, 2000, 64)
    cb = pq_train(v[:1000], m=8, ks=256, seed=7)
    assert cb.shape == (8, 256, 8)
    codes = pq_encode(v, cb)
    assert codes.shape == (2000, 8)
    recon = np.concatenate([cb[j][codes[:, j]] for j in range(8)], axis=1)
    mse = float(((v - recon) ** 2).mean())
    assert mse < float(v.var()) / 2          # real compression signal
    # dim not divisible by m -> loud error
    with pytest.raises(ValueError, match="divide"):
        pq_train(v[:, :60], m=8, ks=16, seed=1)


def test_pq_topk_recall_gate_and_exact_scores():
    """Recall@10 >= 0.9 vs brute force per query on the driver
    embeddings; the emitted scores are EXACT cosines (re-rank contract),
    so hits carry identical scores to the baseline; deterministic."""
    from miekki_ray.stages.similarity import brute_force_topk

    import __ray_entry__ as E

    emb = E._read_tbl(SF, "embeddings")
    qs = E._query_vecs(SF)
    truth = brute_force_topk(emb, qs, k=10)
    got = pq_topk(emb, qs, k=10)
    got2 = pq_topk(emb, qs, k=10)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), got2.reset_index(drop=True))
    tmap = {(r.query_idx, r.vec_id): r.score
            for r in truth.itertuples()}
    for qi, grp in truth.groupby("query_idx"):
        t = set(grp["vec_id"])
        sub = got[got["query_idx"] == qi]
        g = set(sub["vec_id"])
        assert len(t & g) / len(t) >= 0.9, (qi, t, g)
        for r in sub.itertuples():            # exact-score contract
            if (r.query_idx, r.vec_id) in tmap:
                assert r.score == tmap[(r.query_idx, r.vec_id)]


def test_pq_topk_full_shortlist_equals_bruteforce():
    """shortlist >= corpus degenerates to exact brute force (the same
    degeneracy pin the IVF full-probe test carries)."""
    from miekki_ray.stages.similarity import brute_force_topk

    rng = np.random.default_rng(9)
    m = _unit(rng, 300, 16)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(300, dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in m],
                              type=pa.list_(pa.float64())),
    })
    ds = ray.data.from_arrow(tbl)
    qs = m[:3] + 0.01
    exact = brute_force_topk(ds, qs, k=5)
    full = pq_topk(ds, qs, k=5, m=4, ks=64, shortlist=300)
    pd.testing.assert_frame_equal(
        exact.reset_index(drop=True), full.reset_index(drop=True))


def test_pq_topk_empty_query_set():
    """r5 review: zero queries must return an empty frame (like every
    other ANN entry), not crash on np.concatenate([])."""
    rng = np.random.default_rng(1)
    m = _unit(rng, 50, 16)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(50, dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in m],
                              type=pa.list_(pa.float64())),
    }))
    out = pq_topk(ds, np.empty((0, 16)), k=5, m=4, ks=16)
    assert len(out) == 0
