"""A3/A4/O2/O3 — reporting aggregates over dedup outputs, plus sampling.

SURVEY.md §2.5-2.6: cluster size distribution, top-k largest clusters,
distinct counts, seeded sampling. All are small groupby/sort pipelines over
the (conv_id, cluster_id) assignment table.
"""

from __future__ import annotations

import pandas as pd
import ray.data
from ray.data.aggregate import Count


def cluster_sizes(clusters: ray.data.Dataset) -> ray.data.Dataset:
    """(cluster_id, size) — one row per cluster."""
    return clusters.groupby("cluster_id").aggregate(Count(alias_name="size"))


def top_clusters(clusters: ray.data.Dataset, k: int = 10) -> ray.data.Dataset:
    """O2 — the k largest clusters (deterministic tie-break on id)."""
    return (cluster_sizes(clusters)
            .sort(["size", "cluster_id"], descending=[True, False]).limit(k))


def cluster_size_histogram(clusters: ray.data.Dataset) -> pd.DataFrame:
    """size -> number of clusters of that size. Two distributed grouped
    aggregates; only the (distinct sizes)-row result reaches the driver —
    never the per-cluster table (corpus-scale at 100 TB)."""
    hist = (cluster_sizes(clusters).groupby("size")
            .aggregate(Count(alias_name="n_clusters")).to_pandas())
    return hist.sort_values("size").reset_index(drop=True)


def dedup_summary(clusters: ray.data.Dataset) -> pd.DataFrame:
    """One-row summary: docs, clusters, dup docs removed, dedup ratio.
    Distributed counts only — no driver-side per-cluster table. The input
    is materialized once: the two counts are separate Ray actions and
    would otherwise each re-execute the whole upstream dedup lineage."""
    clusters = clusters.materialize()
    n_docs = clusters.count()
    n_clusters = cluster_sizes(clusters).count()
    removed = n_docs - n_clusters
    return pd.DataFrame({
        "n_docs": [n_docs],
        "n_clusters": [n_clusters],
        "n_removed": [removed],
        "dedup_ratio": [removed / n_docs if n_docs else 0.0],
    })


def sample_corpus(ds: ray.data.Dataset, frac: float, seed: int
                  ) -> ray.data.Dataset:
    """O3 — seeded sampling only (determinism mandate, SURVEY.md §4.2)."""
    return ds.random_sample(frac, seed=seed)
