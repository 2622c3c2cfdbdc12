"""Similarity search: brute-force cosine top-k, LSH variant, near-dups."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from miekki_ray.stages.similarity import (
    brute_force_topk,
    embedding_near_dups,
    lsh_topk,
)


@pytest.fixture(scope="module")
def emb_ds():
    rng = np.random.default_rng(11)
    d = 16
    base = rng.standard_normal((100, d)).astype(np.float32)
    # plant near-duplicates of rows 0..4
    base[50:55] = base[0:5] + rng.standard_normal((5, d)).astype(
        np.float32) * 0.01
    tbl = pa.table({
        "vec_id": pa.array(np.arange(100, dtype=np.int64)),
        "embedding": pa.array(list(base), type=pa.list_(pa.float32())),
    })
    return ray.data.from_arrow(tbl), base


def test_brute_force_topk_exact(emb_ds):
    ds, base = emb_ds
    q = base[:3]
    out = brute_force_topk(ds, q, k=5)
    # rank-1 of each query must be the query vector itself (cos = 1)
    for qi in range(3):
        top1 = out[(out["query_idx"] == qi) & (out["rank"] == 1)]
        assert int(top1["vec_id"].iloc[0]) == qi
        assert top1["score"].iloc[0] == pytest.approx(1.0, abs=1e-5)
    # numpy oracle for full ranking of query 0
    m = base / np.linalg.norm(base, axis=1, keepdims=True)
    scores = m @ (m[0])
    want = set(np.argsort(-scores)[:5])
    got = set(out[out["query_idx"] == 0]["vec_id"])
    assert got == want


def test_lsh_topk_finds_self(emb_ds):
    ds, base = emb_ds
    out = lsh_topk(ds, base[:3], k=5)
    for qi in range(3):
        sub = out[(out["query_idx"] == qi) & (out["rank"] == 1)]
        # query's own bucket always contains the query vector
        assert int(sub["vec_id"].iloc[0]) == qi


def test_ivf_topk_full_probe_equals_bruteforce(emb_ds):
    from miekki_ray.stages.similarity import ivf_topk

    ds, base = emb_ds
    q = base[:3]
    exact = brute_force_topk(ds, q, k=5)
    # probing EVERY centroid scores every vector -> identical to exact
    ivf = ivf_topk(ds, q, k=5, n_centroids=8, nprobe=8, seed=3)
    pd.testing.assert_frame_equal(
        exact.sort_values(["query_idx", "rank"]).reset_index(drop=True),
        ivf.sort_values(["query_idx", "rank"]).reset_index(drop=True))


def test_ivf_topk_partial_probe_self_hit(emb_ds):
    from miekki_ray.stages.similarity import ivf_topk

    ds, base = emb_ds
    out = ivf_topk(ds, base[:3], k=5, n_centroids=8, nprobe=2, seed=3)
    for qi in range(3):
        sub = out[(out["query_idx"] == qi) & (out["rank"] == 1)]
        # the query's own cell is always its nearest centroid
        assert int(sub["vec_id"].iloc[0]) == qi


def test_embedding_near_dups(emb_ds):
    ds, base = emb_ds
    pairs = embedding_near_dups(ds, threshold=0.98).to_pandas()
    found = set(zip(pairs["a"], pairs["b"]))
    # planted near-dup pairs (i, i+50) must be found
    for i in range(5):
        assert (i, i + 50) in found, (i, found)
    assert (pairs["cosine"] >= 0.98).all()
