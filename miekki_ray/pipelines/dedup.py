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
    # reusable intermediates: the exact-unique doc set and its
    # (materialized, text-free) sketch table — downstream pipelines
    # (incremental) reuse them instead of re-running reconstruct /
    # exact-dedup / sketch on the same corpus
    unique_docs: ray.data.Dataset | None = None
    sketched: ray.data.Dataset | None = None


def dedup_datasets(turns: ray.data.Dataset, cfg: DedupConfig) -> DedupResult:
    """Pure-Dataset composition (no checkpointing) — used by tests/bench.

    Scale note: this variant holds the reconstructed docs table in the
    object store (docs.materialize(), 4 consumers). At the 10^12-turn
    envelope use ``run_dedup(out_dir=...)`` — the checkpointed path
    replaces every in-memory barrier with partitioned parquet + lineage
    manifests, so stage outputs live on disk, consumers re-read instead
    of pinning plasma, and the run resumes after failure."""
    import time

    from miekki_ray.state.metrics import MetricsSink

    stage_sec: dict[str, float] = {}
    _t = time.perf_counter()

    def lap(name: str) -> None:
        nonlocal _t
        now = time.perf_counter()
        stage_sec[name] = round(now - _t, 3)
        _t = now

    sink = MetricsSink()
    # Materialization points (each is a barrier — keep them few): docs
    # feed exact dedup, the verify join and the final assignment; exact
    # dedup shuffles only (conv_id, doc_hash) metadata and its loser set
    # comes back as a broadcast filter; the sketcher is a separate
    # map_batches stage over ~1024-doc batches (fusing it into the shuffle
    # reduce tasks was re-measured r2: ~4x SLOWER — P monolithic
    # single-threaded group tasks serialize the sketch compute; see
    # stages/docs.py tail note); band
    # explosion is a cheap numpy map recomputed per consumer instead of
    # materializing the b-times larger band-row table.
    from miekki_ray.stages.exact import drop_losers, exact_dedup_slim

    # (Overlapping the exact-dedup and sketch executions with driver
    # threads was tried: two concurrent streaming executors contend for
    # the same CPU budget and the combined phase comes out SLOWER than
    # running them sequentially.)
    docs = reconstruct_docs(turns, cfg).materialize()
    lap("docs")
    exact_edges, losers_ds = exact_dedup_slim(docs, cfg)
    # ONE executor run decides the broadcast switch AND fetches the set
    # (r2 ran count() then to_pandas() — two passes over the loser
    # filter; each pass is ~1 s of fixed executor cost that dominates on
    # small corpora). limit(L+1) stops early at scale, bounding the fetch.
    losers = losers_ds.limit(cfg.broadcast_loser_limit + 1).to_pandas()
    lap("exact_dedup")
    if len(losers) <= cfg.broadcast_loser_limit:
        unique_docs = drop_losers(docs, losers) if len(losers) else docs
    else:
        # scale switch (J4): the loser set is too big to broadcast — take
        # the full exact_dedup path instead (one doc_hash shuffle of the
        # doc text, no driver-side loser state). Same unique set.
        unique_docs, _ = exact_dedup(docs, cfg)
    sketched = (sketch_docs(unique_docs, cfg)
                .select_columns(["conv_id", "doc_hash", "sig", "psig"])
                .materialize())   # ~1.1 KB/doc, no text
    lap("sketch")
    bands = band_explode(sketched, cfg)
    pairs = candidate_pairs(bands, cfg, metrics_name=sink.name).materialize()
    n_pairs = pairs.count()
    lap("candidates")
    if n_pairs == 0:
        from miekki_ray.stages.verify import empty_verified
        verified = empty_verified()
    elif (n_pairs <= cfg.driver_verify_pairs
          and _est_pair_doc_bytes(docs, n_pairs) <= cfg.driver_verify_bytes):
        # auto-switch: tiny pair set — skip both hash joins and run the
        # same Verifier kernel once on the driver (verify.verify_local;
        # output identical, tests/test_scale_paths.py). Pairs reference
        # winners only, but fetching from `docs` (already materialized)
        # is equivalent and avoids composing with the loser filter.
        from miekki_ray.stages.verify import verify_local
        verified = verify_local(pairs, docs, cfg, metrics_name=sink.name)
    else:
        # join against the deduped docs only: pairs reference unique_docs
        # exclusively, so loser rows would be dead weight through both hash
        # joins (≥2x right-side payload on dup-heavy corpora)
        with_docs = attach_docs(pairs, unique_docs, cfg, n_pairs=n_pairs)
        # verified stays LAZY: the edges materialization below is its only
        # in-pipeline consumer (one barrier instead of two); accessing
        # DedupResult.verified later re-executes the verify chain
        verified = verify_pairs(with_docs, cfg)
    near_edges = edges_from_verified(verified)
    edges = exact_edges.union(near_edges).materialize()
    lap("verify_edges")
    metrics = sink.collect()
    clusters, n_components = _cluster_and_assign(docs, edges, cfg)
    clusters = clusters.materialize()
    lap("cluster_assign")
    sink.close()
    metrics["n_components"] = n_components
    metrics["stage_sec"] = stage_sec
    return DedupResult(clusters=clusters, edges=edges, verified=verified,
                       docs=docs, metrics=metrics,
                       unique_docs=unique_docs, sketched=sketched)


def _est_pair_doc_bytes(docs: ray.data.Dataset, n_pairs: int) -> int:
    """Estimated driver bytes to fetch the ≤ 2·n_pairs docs a pair set
    references: average row bytes of the materialized docs table (both
    size_bytes and count are metadata-free on a MaterializedDataset).
    An estimate, not a bound — a pathological corpus (one doc_len_cap doc
    among tiny ones) can exceed it, which is why driver_verify_pairs also
    caps the pair count."""
    n_docs = docs.count()
    if n_docs == 0:
        return 0
    size = docs.size_bytes()
    if size is None:
        # unknown size (no metadata) — conservative: report over any limit
        # so the caller takes the distributed path
        return 2**63
    return int(size / n_docs * min(2 * n_pairs, n_docs))


def _cluster_and_assign(docs: ray.data.Dataset, edges: ray.data.Dataset,
                        cfg: DedupConfig) -> tuple[ray.data.Dataset, int]:
    """ST4 with the scale auto-switch: driver union-find + broadcast map
    below cfg.driver_edge_limit edges; above it, distributed hash-min label
    propagation + co-partitioned assignment (no driver edge list, no
    broadcast component map). Both produce identical assignments
    (tests/test_cluster.py asserts end-to-end)."""
    n_edges = edges.count()
    if n_edges <= cfg.driver_edge_limit:
        comp = cluster_edges_driver(edges)
        return assign_clusters(docs, comp), len(set(comp.values()))
    from miekki_ray.stages.cluster import (
        assign_clusters_ds,
        cluster_labels_distributed,
    )
    from ray.data.aggregate import Count

    labels = cluster_labels_distributed(edges, cfg)
    clusters = assign_clusters_ds(docs, labels, cfg)
    n_components = (0 if labels is None else
                    labels.groupby("label")
                    .aggregate(Count(alias_name="n")).count())
    return clusters, n_components


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

    from miekki_ray.state.manifest import StageRunner, root_input_fp
    r = StageRunner(out_dir, cfg.config_hash())
    in_fp = root_input_fp(turns_path)
    docs, d_docs = r.run("docs", lambda: reconstruct_docs(turns, cfg),
                         input_fp=in_fp)
    # ONE slim exact stage (r5, VERDICT r4 Next #1): the persisted output
    # is (a, b, kind, loser) — edges with the losing conv_id alongside —
    # instead of re-writing the full doc text as a unique_docs parquet
    # (3.6 s / 198 MB of the 15.5 s r4 checkpointed wall). The unique set
    # is DERIVED from the docs checkpoint below with the same
    # broadcast↔shuffle auto-switch as dedup_datasets.
    from miekki_ray.stages.exact import drop_losers, exact_state_slim
    ex_state, d_ex = r.run(
        "exact", lambda: exact_state_slim(docs, cfg), upstream_dir=d_docs)
    n_losers = ex_state.count()      # metadata-only on the stage parquet
    if n_losers == 0:
        uniq, ex_edges = docs, None  # empty stage parquet has no schema
    else:
        ex_edges = ex_state.select_columns(["a", "b", "kind"])
        if n_losers <= cfg.broadcast_loser_limit:
            import pandas as pd
            losers = pd.DataFrame({"conv_id": ex_state.select_columns(
                ["loser"]).to_pandas()["loser"]})
            uniq = drop_losers(docs, losers)
        else:
            # scale switch (J4): loser set too big to broadcast — full
            # doc_hash shuffle of the docs checkpoint. Same unique set.
            uniq, _ = exact_dedup(docs, cfg)
    # sketch checkpoints SLIM (conv_id, doc_hash, sig, psig — ~1.1 KB/doc,
    # no text): it is the most compute-heavy per-byte stage, so it earns
    # durability; band explosion does NOT (recompute-cheap, b× wider —
    # SURVEY §3.2) and is re-derived inside the pairs stage instead of
    # being persisted (r4 profile: the band_rows write was 2.3 s).
    sketched, d_sk = r.run(
        "sketch",
        lambda: sketch_docs(uniq, cfg)
        .select_columns(["conv_id", "doc_hash", "sig", "psig"]),
        upstream_dir=d_ex)
    # the salted/capped recall accounting flows into the pairs stage
    # MANIFEST (metrics_fn runs after the data write, when the counters
    # exist) — the manifest contract is lineage + METRICS, and a resumed
    # run recovers the skipped stage's counters from the same place
    from miekki_ray.state.manifest import stage_metrics
    from miekki_ray.state.metrics import MetricsSink
    sink = MetricsSink()
    pairs, d_pairs = r.run(
        "pairs",
        lambda: candidate_pairs(band_explode(sketched, cfg), cfg,
                                metrics_name=sink.name),
        upstream_dir=d_sk, metrics_fn=sink.collect)
    pair_metrics = stage_metrics(d_pairs, filesystem=r.fs)
    pair_metrics.pop("wall_sec", None)   # already under stage_sec below
    sink.close()
    from miekki_ray.stages.verify import empty_verified

    # separate sink for the verify stage so its counters (e.g.
    # verify_local_dropped_pairs) land in the VERIFIED stage manifest,
    # not mixed into the pairs counters above
    vsink = MetricsSink()

    def _verify():
        n_pairs = pairs.count()   # metadata-only on the pairs parquet
        if n_pairs == 0:
            return empty_verified()
        # same driver-narrow auto-switch as dedup_datasets (r4: the ckpt
        # path used to run the two distributed hash joins unconditionally
        # — 11.3 s of its 31.9 s profile at the bench corpus was pure
        # aggregator startup for a 0.4 MB pair table). The byte estimate
        # uses the parquet-backed DOCS stage (count/size_bytes are
        # metadata-only there; uniq may be a lazy filter of it with the
        # same average row bytes), and verify_local fetches from docs —
        # pairs reference winners, all present in docs, and the kernel
        # is equivalent (tests/test_scale_paths.py pins it).
        if (n_pairs <= cfg.driver_verify_pairs
                and _est_pair_doc_bytes(docs, n_pairs)
                <= cfg.driver_verify_bytes):
            from miekki_ray.stages.verify import verify_local
            return verify_local(pairs, docs, cfg, metrics_name=vsink.name)
        # n_pairs drives attach_docs' adaptive join width — without it the
        # join runs at cfg.num_partitions and small candidate sets leave
        # most join partitions with zero left blocks (verify.py env note:
        # Ray's join finalize chokes on those, and over-wide joins measure
        # ~3x slower)
        return verify_pairs(attach_docs(pairs, uniq, cfg, n_pairs=n_pairs),
                            cfg)

    verified, d_ver = r.run("verified", _verify, upstream_dir=d_pairs,
                            metrics_fn=vsink.collect)
    ver_metrics = stage_metrics(d_ver, filesystem=r.fs)
    ver_metrics.pop("wall_sec", None)
    vsink.close()

    # edges are NOT persisted as their own stage (r5): both inputs already
    # are — exact edges in the exact stage, near edges a cheap map over
    # the verified parquet — so the union stays lazy (the r4 edges stage
    # was 0.7 s of write + executor startup for 0.3 MB).
    def _edges_ds() -> ray.data.Dataset:
        ne = edges_from_verified(verified)
        return ne if ex_edges is None else ex_edges.union(ne)

    # materialize the (tiny) union once: _cluster_and_assign consumes the
    # edge list twice (count + collect) and a lazy union would re-execute
    # both small parquet scans each time
    clusters, _ = r.run(
        "clusters",
        lambda: _cluster_and_assign(docs, _edges_ds().materialize(),
                                    cfg)[0],
        upstream_dir=d_ver)
    res = DedupResult(clusters=clusters, edges=_edges_ds(),
                      verified=verified, docs=docs,
                      unique_docs=uniq, sketched=sketched)
    res.metrics = {"ran": r.ran, "skipped": r.skipped,
                   "stage_sec": dict(r.stage_sec),
                   **pair_metrics, **ver_metrics}
    return res


def keep_list(result: DedupResult) -> ray.data.Dataset:
    """S4 — deduped keep-list: the representative (min conv_id) per cluster."""
    return result.clusters.filter(expr="is_rep == True") \
                          .select_columns(["conv_id"])
