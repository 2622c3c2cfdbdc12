"""Distributed Lloyd's k-means: recovers planted clusters, determinism."""

import numpy as np
import pandas as pd
import ray.data

from miekki_ray.stages.kmeans import kmeans_fit_predict


def _blobs(k=4, n_per=300, d=16, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, labels = [], []
    for i, c in enumerate(centers):
        pts = c + rng.normal(scale=0.05, size=(n_per, d))
        rows.append(pts)
        labels += [i] * n_per
    X = np.concatenate(rows)
    return pd.DataFrame({
        "vec_id": np.arange(len(X), dtype=np.int64),
        "embedding": [r.astype(np.float32) for r in X],
        "label": np.array(labels, dtype=np.int32),
    })


def _purity(df):
    # each found cluster's majority true-label share, weighted
    tot = 0
    for _, grp in df.groupby("cluster"):
        tot += grp["label"].value_counts().iloc[0]
    return tot / len(df)


def test_kmeans_recovers_planted_blobs():
    df = _blobs()
    ds = ray.data.from_pandas(df).repartition(5)
    out, cent = kmeans_fit_predict(ds, k=4, iters=6, seed=3,
                                   extra_cols=("label",))
    got = out.to_pandas()
    assert len(got) == len(df)
    assert cent.shape == (4, 16)
    # unit-norm centroids (spherical update)
    assert np.allclose(np.linalg.norm(cent, axis=1), 1.0, atol=1e-9)
    assert _purity(got) > 0.95


def test_kmeans_deterministic():
    df = _blobs(k=3, n_per=100, seed=5)
    ds = ray.data.from_pandas(df).repartition(3)
    _, c1 = kmeans_fit_predict(ds, k=3, iters=4, seed=11)
    _, c2 = kmeans_fit_predict(ds, k=3, iters=4, seed=11)
    assert np.array_equal(c1, c2)
