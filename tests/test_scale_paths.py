"""Scale auto-switch equivalence (VERDICT r1 #3) + M1 normalize wiring.

The flagship routes between driver/broadcast variants (small corpora) and
fully-distributed ones (above cfg.broadcast_loser_limit /
cfg.driver_edge_limit). Pinning the limits to 0 forces the distributed
paths end-to-end on the same corpus; assignments must be identical."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from miekki_ray.config import DedupConfig
from miekki_ray.pipelines.dedup import dedup_datasets


@pytest.fixture(scope="module")
def both_results(small_corpus):
    turns, _ = small_corpus
    # cfg_small takes every driver/broadcast fast path (incl. the r3
    # verify_local switch); cfg_scale pins ALL limits to 0, forcing the
    # fully-distributed variants (exact_dedup shuffle, attach_docs hash
    # joins + distributed verify, label propagation) on the same corpus
    cfg_small = DedupConfig(num_partitions=4, sketch_concurrency=2)
    cfg_scale = DedupConfig(num_partitions=4, sketch_concurrency=2,
                            broadcast_loser_limit=0, driver_edge_limit=0,
                            driver_verify_pairs=0)
    a = dedup_datasets(ray.data.from_arrow(turns), cfg_small)
    b = dedup_datasets(ray.data.from_arrow(turns), cfg_scale)
    return (a.clusters.to_pandas(), b.clusters.to_pandas(),
            a.metrics, b.metrics, a.verified.to_pandas(),
            b.verified.to_pandas())


def test_scale_paths_identical_clusters(both_results):
    small, scale = both_results[0], both_results[1]
    s = small.sort_values("conv_id").reset_index(drop=True)
    t = scale.sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(s, t)


def test_scale_paths_same_component_count(both_results):
    ma, mb = both_results[2], both_results[3]
    assert ma["n_components"] == mb["n_components"]


def test_verify_local_matches_distributed(both_results):
    """r3 verify_local auto-switch: the driver-narrow verify (no hash
    joins) must produce the BIT-identical verified table the distributed
    attach_docs + verify_pairs chain produces."""
    va, vb = both_results[4], both_results[5]
    va = va.sort_values(["a", "b"]).reset_index(drop=True)
    vb = vb.sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(va, vb)


def _crlf_corpus():
    """Two conversations identical up to \\r\\n vs \\n, plus a distinct one."""
    body = ("line one\nline two with enough text to shingle meaningfully "
            "across the k-gram window\nline three closes the conversation "
            "with more than enough bytes of content to make the MinHash "
            "estimate stable and the exact Jaccard well above threshold\n")
    rows = []
    for cid, text in (("ca", body), ("cb", body.replace("\n", "\r\n")),
                      ("cz", "a completely different conversation about "
                             "nothing in particular whatsoever, unrelated "
                             "content that shares no shingles with the "
                             "others at all in any window of the text")):
        for i in range(3):
            rows.append({"conv_id": cid, "turn_idx": i, "role": "user",
                         "text": f"{text} turn {i}", "tool": None,
                         "ts": 1_700_000_000_000_000})
    t = pa.Table.from_pylist(rows)
    return t.set_column(t.schema.get_field_index("ts"), "ts",
                        t["ts"].cast(pa.timestamp("us")))


def test_normalize_docs_unifies_crlf_variants():
    turns = _crlf_corpus()
    cfg = DedupConfig(num_partitions=2, sketch_concurrency=2,
                      normalize_docs=True)
    res = dedup_datasets(ray.data.from_arrow(turns), cfg)
    cl = res.clusters.to_pandas().set_index("conv_id")["cluster_id"]
    assert cl["ca"] == cl["cb"], "normalized variants must co-cluster"
    assert cl["cz"] != cl["ca"]
    # the \r\n variant is an EXACT dup after normalization (same doc_hash)
    edges = res.edges.to_pandas()
    kinds = set(edges[(edges["a"] == "ca") & (edges["b"] == "cb")]["kind"])
    assert kinds == {"exact"}


def test_normalize_docs_off_keeps_variants_apart_and_doc_raw():
    turns = _crlf_corpus()
    cfg = DedupConfig(num_partitions=2, sketch_concurrency=2,
                      normalize_docs=False)
    res = dedup_datasets(ray.data.from_arrow(turns), cfg)
    docs = res.docs.to_pandas().set_index("conv_id")["doc"]
    # raw bytes preserved when normalization is off (the spec invariant
    # extended to the doc representation)
    assert "\r\n" in docs["cb"] and "\r\n" not in docs["ca"]
    # config hash must differ (normalize_docs is semantic, not physical)
    assert cfg.config_hash() != DedupConfig(
        num_partitions=2, sketch_concurrency=2,
        normalize_docs=True).config_hash()


def test_verify_local_fanout_branch_identical():
    # r3: above 4*verify_batch_size pairs verify_local slices the
    # driver-assembled table and fans the kernel out via map_batches;
    # force that branch directly (45 pairs, batch size 4) and pin it
    # against the inline (single-call) branch
    import numpy as np

    from miekki_ray.stages.verify import verify_local

    docs_tbl = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(10)]),
        "doc": pa.array([f"user: the quick brown fox {i} jumps over "
                         f"the lazy dog again and again {i}" + "x" * i
                         for i in range(10)], type=pa.large_string()),
    })
    ii, jj = np.triu_indices(10, k=1)
    pairs_tbl = pa.table({
        "a": pa.array([f"c{i}" for i in ii]),
        "b": pa.array([f"c{j}" for j in jj]),
        "n_bands": pa.array(np.ones(ii.size, dtype=np.int32)),
    })
    docs = ray.data.from_arrow(docs_tbl)
    pairs = ray.data.from_arrow(pairs_tbl)
    inline = verify_local(
        pairs, docs, DedupConfig(num_partitions=4, sketch_concurrency=2)
    ).to_pandas()
    fanout = verify_local(
        pairs, docs, DedupConfig(num_partitions=4, sketch_concurrency=2,
                                 verify_batch_size=4)
    ).to_pandas()
    assert len(fanout) == ii.size
    key = ["a", "b"]
    pd.testing.assert_frame_equal(
        inline.sort_values(key).reset_index(drop=True),
        fanout.sort_values(key).reset_index(drop=True))


def test_verify_local_drops_pairs_missing_from_docs():
    # r4 review: the distributed path inner-joins away a pair whose id is
    # absent from docs; verify_local used to KeyError — the two paths
    # auto-switch on pair volume and must not diverge on this input
    from miekki_ray.stages.verify import verify_local

    docs_tbl = pa.table({
        "conv_id": pa.array(["c0", "c1"]),
        "doc": pa.array(["user: shared text body one two three"] * 2,
                        type=pa.large_string()),
    })
    pairs_tbl = pa.table({
        "a": pa.array(["c0", "c0"]),
        "b": pa.array(["c1", "cMISSING"]),
        "n_bands": pa.array([1, 1], type=pa.int32()),
    })
    out = verify_local(ray.data.from_arrow(pairs_tbl),
                       ray.data.from_arrow(docs_tbl),
                       DedupConfig(num_partitions=2, sketch_concurrency=2)
                       ).to_pandas()
    assert set(zip(out["a"], out["b"])) == {("c0", "c1")}


def test_verify_local_dropped_pairs_counter():
    """VERDICT r4 Next #7: the silent-drop semantics above must be
    OBSERVABLE — each pair referencing a doc absent from the docs table
    increments verify_local_dropped_pairs in the metrics sink."""
    from miekki_ray.stages.verify import verify_local
    from miekki_ray.state.metrics import MetricsSink

    docs_tbl = pa.table({
        "conv_id": pa.array(["c0", "c1"]),
        "doc": pa.array(["user: shared text body one two three"] * 2,
                        type=pa.large_string()),
    })
    pairs_tbl = pa.table({
        "a": pa.array(["c0", "c0", "cGONE"]),
        "b": pa.array(["c1", "cMISSING", "cALSOGONE"]),
        "n_bands": pa.array([1, 1, 1], type=pa.int32()),
    })
    sink = MetricsSink()
    try:
        out = verify_local(
            ray.data.from_arrow(pairs_tbl), ray.data.from_arrow(docs_tbl),
            DedupConfig(num_partitions=2, sketch_concurrency=2),
            metrics_name=sink.name).to_pandas()
        assert set(zip(out["a"], out["b"])) == {("c0", "c1")}
        assert sink.collect() == {"verify_local_dropped_pairs": 2.0}
    finally:
        sink.close()
