"""Seeded multi-corpus differential sweep: the flagship must agree with
the brute-force exact-Jaccard oracle — recall >= 0.99 on strong pairs,
edge precision 1.0 — across VARIED dup geometries (each seed draws a
different mix of exact/near/borderline/containment/skew structure), not
just the one golden corpus pinned in test_golden.py."""

import pytest
import ray.data

from miekki_ray.oracle import exact_pairs
from miekki_ray.pipelines.dedup import dedup_datasets
from miekki_ray.synth import synth_transcripts


@pytest.mark.parametrize("seed", [3, 11, 77, 2026])
def test_differential_corpus_sweep(seed, cfg):
    turns, _ = synth_transcripts(300, seed)
    res = dedup_datasets(ray.data.from_arrow(turns), cfg)
    oracle = exact_pairs(turns, cfg.k, cfg.role_sep, cfg.turn_sep)
    cl = res.clusters.to_pandas().set_index("conv_id")["cluster_id"]

    strong = oracle[oracle["jaccard"] >= cfg.jaccard_threshold + 0.05]
    assert len(strong) >= 10       # every seed must actually test recall
    hits = sum(int(cl[a] == cl[b])
               for a, b in zip(strong["a"], strong["b"]))
    assert hits / len(strong) >= 0.99, \
        f"seed {seed}: recall {hits}/{len(strong)}"

    tj = {(a, b): j for a, b, j in zip(
        oracle["a"], oracle["b"], oracle["jaccard"])}
    e = res.edges.to_pandas()
    jac = e[e["kind"] == "jaccard"]
    bad = [k for k in zip(jac["a"], jac["b"])
           if tj.get(k, 0.0) < cfg.jaccard_threshold]
    assert not bad, f"seed {seed}: false edges {bad[:5]}"
