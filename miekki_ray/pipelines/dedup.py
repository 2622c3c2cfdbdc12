"""D2 — the flagship end-to-end near-dedup pipeline (SURVEY.md §3.2).

turns ─O1→ docs ─D1→ unique docs (+exact edges) ─M5→ signatures ─M7→ band
rows ─J1/A1→ candidate pairs ─J2→ +doc texts ─ST2/ST3→ verified edges
─ST4→ clusters → cluster assignment + keep-list.

Everything up to the driver-side union-find is lazy streaming Ray Data;
the only materialized driver state is the verified edge list (tiny relative
to the corpus — SURVEY.md §4.3) and the component map broadcast back.

``run_dedup(..., out_dir=...)`` additionally checkpoints each stage with a
lineage manifest and resumes past valid stages (SURVEY.md §3.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import ray.data

from miekki_ray.config import DedupConfig
from miekki_ray.sources.transcripts import read_transcripts
from miekki_ray.stages.candidates import candidate_pairs
from miekki_ray.stages.cluster import (
    assign_clusters,
    cluster_edges_driver,
)
from miekki_ray.stages.docs import reconstruct_docs
from miekki_ray.stages.exact import exact_dedup
from miekki_ray.stages.sketch import band_explode, sketch_docs
from miekki_ray.stages.verify import (
    attach_docs,
    edges_from_verified,
    verify_pairs,
)


@dataclass
class DedupResult:
    clusters: ray.data.Dataset       # conv_id, cluster_id, is_rep
    edges: ray.data.Dataset          # a, b, kind in {exact, jaccard, containment}
    verified: ray.data.Dataset       # full verify output incl. rejected pairs
    docs: ray.data.Dataset           # reconstructed docs (all convs)
    metrics: dict = field(default_factory=dict)


def dedup_datasets(turns: ray.data.Dataset, cfg: DedupConfig) -> DedupResult:
    """Pure-Dataset composition (no checkpointing) — used by tests/bench."""
    # docs feeds exact-dedup AND the final cluster assignment; unique_docs
    # feeds BOTH the sketcher and the verify join; band rows feed BOTH the
    # bucket-size scan and the salted grouping. Materializing the multiply-
    # consumed intermediates (slim schemas — band rows carry no doc text)
    # avoids recomputing the whole upstream chain per consumer; Ray spills
    # to disk under pressure.
    docs = reconstruct_docs(turns, cfg).materialize()
    unique_docs, exact_edges = exact_dedup(docs, cfg)
    unique_docs = unique_docs.materialize()
    sketched = sketch_docs(unique_docs, cfg)
    bands = band_explode(sketched, cfg).materialize()
    pairs = candidate_pairs(bands, cfg).materialize()
    if pairs.count() == 0:
        from miekki_ray.stages.verify import empty_verified
        verified = empty_verified()
    else:
        with_docs = attach_docs(pairs, unique_docs, cfg)
        verified = verify_pairs(with_docs, cfg).materialize()
    near_edges = edges_from_verified(verified)
    edges = exact_edges.union(near_edges).materialize()
    comp = cluster_edges_driver(edges)
    clusters = assign_clusters(docs, comp).materialize()
    return DedupResult(clusters=clusters, edges=edges, verified=verified,
                       docs=docs)


def run_dedup(turns_path: str | list[str] | ray.data.Dataset,
              cfg: DedupConfig | None = None,
              out_dir: str | None = None) -> DedupResult:
    """Flagship entry point. With out_dir set, every stage output is
    checkpointed under out_dir/<stage>/ with a lineage manifest and the run
    resumes past valid checkpoints."""
    cfg = cfg or DedupConfig()
    turns = (turns_path if isinstance(turns_path, ray.data.Dataset)
             else read_transcripts(turns_path))
    if out_dir is None:
        return dedup_datasets(turns, cfg)

    from miekki_ray.state.manifest import StageRunner
    r = StageRunner(out_dir, cfg.config_hash())
    docs, d_docs = r.run("docs", lambda: reconstruct_docs(turns, cfg))
    uniq, d_uniq = r.run(
        "unique_docs", lambda: exact_dedup(docs, cfg)[0], upstream_dir=d_docs)
    ex_edges, d_ex = r.run(
        "exact_edges", lambda: exact_dedup(docs, cfg)[1], upstream_dir=d_docs)
    bands, d_bands = r.run(
        "band_rows", lambda: band_explode(sketch_docs(uniq, cfg), cfg),
        upstream_dir=d_uniq)
    pairs, d_pairs = r.run(
        "pairs", lambda: candidate_pairs(bands, cfg), upstream_dir=d_bands)
    from miekki_ray.stages.verify import empty_verified

    def _verify():
        if pairs.count() == 0:
            return empty_verified()
        return verify_pairs(attach_docs(pairs, uniq, cfg), cfg)

    verified, d_ver = r.run("verified", _verify, upstream_dir=d_pairs)
    edges, d_edges = r.run(
        "edges", lambda: ex_edges.union(edges_from_verified(verified)),
        upstream_dir=d_ver)
    comp = cluster_edges_driver(edges)
    clusters, _ = r.run(
        "clusters", lambda: assign_clusters(docs, comp), upstream_dir=d_edges)
    res = DedupResult(clusters=clusters, edges=edges, verified=verified,
                      docs=docs)
    res.metrics = {"ran": r.ran, "skipped": r.skipped}
    return res


def keep_list(result: DedupResult) -> ray.data.Dataset:
    """S4 — deduped keep-list: the representative (min conv_id) per cluster."""
    return result.clusters.filter(expr="is_rep == True") \
                          .select_columns(["conv_id"])
