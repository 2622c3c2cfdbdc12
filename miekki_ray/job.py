"""`ray job submit` entry point for the flagship dedup pipeline.

[spec BASELINE.json:14] "run via ray job submit on a fixed-size multi-node
Ray cluster". On a cluster:

    ray job submit --working-dir . -- \\
        python -m miekki_ray.job --turns /mnt/shared/turns/ \\
        --out /mnt/shared/dedup-run-1/ --num-partitions 512

(--turns/--out accept local/shared-mount paths or object-store URIs:
since r5 the checkpoint layer resolves both through a pyarrow.fs
adapter (state/manifest.resolve_fs), so the clearing/lineage/manifest
machinery operates on the SAME filesystem write_parquet targets.
Manifest publication is tmp+rename on local filesystems and a
single-object PUT on object stores — all-or-nothing either way. The
final keep_list below replaces its directory through pyarrow.fs too.)

Single node (this sandbox):

    python -m miekki_ray.job --turns /root/testdata/... --out /tmp/run1

The job owns its Ray session (guarded init — under `ray job submit` the
cluster address comes from the environment). Output is checkpointed
per-stage under --out with lineage manifests (state/manifest.py), so
re-submitting the same job after a failure resumes past completed stages.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="miekki_ray.job",
                                description="transcript curation/dedup job")
    p.add_argument("--turns", required=True,
                   help="parquet path(s) of the turns table (dir or file)")
    p.add_argument("--out", required=True,
                   help="output/checkpoint dir (stage parquet + manifests)")
    p.add_argument("--pipeline", choices=["dedup", "curate"],
                   default="dedup",
                   help="dedup: MinHash/LSH near-dedup flagship; curate: "
                        "docs -> [decontaminate] -> quality filter -> "
                        "exact keep-first -> pack_bins")
    p.add_argument("--num-partitions", type=int, default=None,
                   help="shuffle width (default: cluster CPU count)")
    p.add_argument("--normalize", action="store_true",
                   help="normalize doc representation (M1) before sketching")
    p.add_argument("--jaccard-threshold", type=float, default=None)
    p.add_argument("--k", type=int, default=None)
    # curate-pipeline knobs (ignored under --pipeline dedup)
    p.add_argument("--min-words", type=int, default=40)
    p.add_argument("--min-alpha-ratio", type=float, default=0.8)
    p.add_argument("--lm-threshold", type=float, default=None,
                   help="drop docs whose avg trigram log-prob under the "
                        "corpus-sample LM is below this (CCNet-style "
                        "perplexity cut); off by default")
    p.add_argument("--pack-budget", type=int, default=512)
    p.add_argument("--tokenizer", choices=["whitespace", "bpe"],
                   default="whitespace")
    p.add_argument("--bench-docs", default=None,
                   help="parquet of (doc_id, text) benchmark docs to "
                        "decontaminate against before scoring")
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init()  # ray job submit / RAY_ADDRESS decides the cluster

    from miekki_ray.config import DedupConfig
    from miekki_ray.pipelines.dedup import keep_list, run_dedup

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    overrides: dict = {
        # 4x CPU granularity balances Ray's sort-shuffle ranges (bench.py)
        "num_partitions": args.num_partitions or max(8, 4 * ncpu),
        "sketch_concurrency": max(2, ncpu - 2),
    }
    if args.normalize:
        overrides["normalize_docs"] = True
    if args.jaccard_threshold is not None:
        overrides["jaccard_threshold"] = args.jaccard_threshold
    if args.k is not None:
        overrides["k"] = args.k
    cfg = DedupConfig(**overrides)

    if args.pipeline == "curate":
        from miekki_ray.pipelines.curate import run_curate

        packed, metrics = run_curate(
            args.turns, cfg, out_dir=args.out,
            min_words=args.min_words,
            min_alpha_ratio=args.min_alpha_ratio,
            lm_threshold=args.lm_threshold,
            budget=args.pack_budget, tokenizer=args.tokenizer,
            bench_docs=args.bench_docs)
        bins = packed.groupby("bin").count()
        summary = {
            "packed_rows": packed.count(),
            "bins": bins.count(),
            "stages_ran": metrics.get("ran"),
            "stages_skipped": metrics.get("skipped"),
            "out": args.out,
        }
        print(json.dumps(summary))
        return 0

    res = run_dedup(args.turns, cfg, out_dir=args.out)
    n_clusters = res.clusters.count()
    # materialize once: the keep_list filter lineage would otherwise
    # execute twice — inside write_parquet and again for the summary
    # count (filter-derived datasets get no metadata-only count)
    keep = keep_list(res).materialize()
    # Ray's write_parquet APPENDS uuid-named files to an existing dir; on
    # re-submit (the resume flow) that would double every keep row. The
    # keep_list is a final output, not a checkpoint — replace it
    # wholesale via the SHARED crash-safe swap (sources/text_formats.
    # replace_dir_write: temp sibling + rename locally, delete-then-write
    # on object-store URIs). marker=None: a marker file inside a parquet
    # directory would trip naive read_parquet consumers.
    from miekki_ray.sources.text_formats import replace_dir_write

    replace_dir_write(f"{args.out}/keep_list", keep.write_parquet,
                      marker=None)
    summary = {
        "clusters_rows": n_clusters,
        "keep_rows": keep.count(),
        "stages_ran": res.metrics.get("ran"),
        "stages_skipped": res.metrics.get("skipped"),
        "out": args.out,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
