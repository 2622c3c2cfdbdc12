"""ST4 union-find: driver-side vs distributed hash-min must agree
(SURVEY.md §4.3)."""

import pandas as pd
import ray.data

from miekki_ray.config import DedupConfig
from miekki_ray.stages.cluster import (
    cluster_edges_distributed,
    cluster_edges_driver,
)


def _edges_ds(pairs):
    df = pd.DataFrame(pairs, columns=["a", "b"])
    df["kind"] = "jaccard"
    return ray.data.from_pandas(df)


def test_known_components():
    edges = _edges_ds([("c2", "c1"), ("c3", "c2"), ("c5", "c4"),
                       ("c9", "c8")])
    comp = cluster_edges_driver(edges)
    assert comp == {"c1": "c1", "c2": "c1", "c3": "c1",
                    "c4": "c4", "c5": "c4", "c8": "c8", "c9": "c8"}


def test_chain_and_order_invariance():
    # long chain, edges in adversarial order
    chain = [(f"c{i+1:02d}", f"c{i:02d}") for i in range(10)]
    comp1 = cluster_edges_driver(_edges_ds(chain))
    comp2 = cluster_edges_driver(_edges_ds(list(reversed(chain))))
    assert comp1 == comp2
    assert set(comp1.values()) == {"c00"}


def test_distributed_matches_driver():
    cfg = DedupConfig(num_partitions=4)
    pairs = [("c2", "c1"), ("c3", "c2"), ("c5", "c4"), ("c7", "c6"),
             ("c6", "c5"), ("c10", "c9")]
    ds = _edges_ds(pairs)
    assert cluster_edges_distributed(ds, cfg) == cluster_edges_driver(ds)


def test_distributed_deep_chain():
    # 40-node path with the component min at the far end: one-hop hash-min
    # alone needs ~39 rounds; the pointer-jump step must cut that to
    # O(log d). max_rounds=10 > log2(39)+slack makes the test fail loudly
    # (RuntimeError) if jumping ever regresses to linear convergence.
    from miekki_ray.stages.cluster import cluster_labels_distributed
    cfg = DedupConfig(num_partitions=4)
    chain = [(f"c{i+1:02d}", f"c{i:02d}") for i in range(39)]
    ds = _edges_ds(list(reversed(chain)))
    labels = cluster_labels_distributed(ds, cfg, max_rounds=10)
    got = {r["node"]: r["label"] for r in labels.take_all()}
    assert got == {f"c{i:02d}": "c00" for i in range(40)}
    assert cluster_edges_distributed(ds, cfg) == cluster_edges_driver(ds)


def test_empty_edges():
    import pyarrow as pa
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array([], type=pa.string()),
        "b": pa.array([], type=pa.string()),
        "kind": pa.array([], type=pa.string())}))
    assert cluster_edges_driver(ds) == {}
