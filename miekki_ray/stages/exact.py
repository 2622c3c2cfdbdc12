"""D1 — exact dedup (byte-identical docs), run BEFORE sketching.

SURVEY.md §2.7: exact dedup shrinks the MinHash input and removes identical
docs from LSH buckets (first skew mitigation, §4.2), and its pairs are
trivially recall-1 edges. Shuffle key: doc_hash (coarse-partitioned, same
rationale as docs.py — one vectorized call per partition, not per group).

Outputs:
  unique_docs: docs table with one representative (min conv_id) per doc_hash
  exact_edges: (a, b, kind='exact') edges rep→member for the cluster stage
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from miekki_ray.config import DedupConfig


def _dedup_partition(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values(["doc_hash", "conv_id"], kind="mergesort")
    first = ~g["doc_hash"].duplicated(keep="first")
    reps = g[first][["doc_hash", "conv_id"]].rename(
        columns={"conv_id": "_rep"})
    g = g.merge(reps, on="doc_hash", how="left")
    g["_is_rep"] = g["conv_id"] == g["_rep"]
    return g


def exact_dedup(docs: ray.data.Dataset, cfg: DedupConfig
                ) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    P = cfg.num_partitions

    def add_part(batch: pa.Table) -> pa.Table:
        part = (batch["doc_hash"].to_numpy() % np.uint64(P)).astype(np.int32)
        return batch.append_column("_part", pa.array(part, type=pa.int32()))

    parted = docs.map_batches(add_part, batch_format="pyarrow",
                              zero_copy_batch=True)
    tagged = parted.groupby("_part").map_groups(
        _dedup_partition, batch_format="pandas")

    unique_docs = tagged.filter(expr="_is_rep == True").drop_columns(
        ["_part", "_rep", "_is_rep"])
    edges = (
        tagged.filter(expr="_is_rep == False")
        .map_batches(_to_edges, batch_format="pandas")
    )
    return unique_docs, edges


def _to_edges(batch: pd.DataFrame) -> pd.DataFrame:
    a = np.minimum(batch["_rep"], batch["conv_id"])
    b = np.maximum(batch["_rep"], batch["conv_id"])
    return pd.DataFrame({"a": a, "b": b, "kind": "exact"})
