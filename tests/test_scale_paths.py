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
    cfg_small = DedupConfig(num_partitions=4, sketch_concurrency=2)
    cfg_scale = DedupConfig(num_partitions=4, sketch_concurrency=2,
                            broadcast_loser_limit=0, driver_edge_limit=0)
    a = dedup_datasets(ray.data.from_arrow(turns), cfg_small)
    b = dedup_datasets(ray.data.from_arrow(turns), cfg_scale)
    return (a.clusters.to_pandas(), b.clusters.to_pandas(),
            a.metrics, b.metrics)


def test_scale_paths_identical_clusters(both_results):
    small, scale, _, _ = both_results
    s = small.sort_values("conv_id").reset_index(drop=True)
    t = scale.sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(s, t)


def test_scale_paths_same_component_count(both_results):
    _, _, ma, mb = both_results
    assert ma["n_components"] == mb["n_components"]


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
