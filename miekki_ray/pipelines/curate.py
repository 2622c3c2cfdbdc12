"""Corpus curation pipeline: quality-filter → exact-dedup keep-first.

The end-to-end shape a training-data pipeline runs in front of the
near-dedup flagship (SURVEY.md §2.11): score every document with the
vectorized quality kernels (functions/textstats.py), drop documents below
declared thresholds, then keep the smallest doc_id per exact text. All
three stages are streaming map_batches / grouped exchanges:

- scoring is stateless and shuffle-free;
- the filter is applied per batch BEFORE any exchange, so low-quality
  documents never cross the wire (at 100 TB the filter typically drops
  30-60% of bytes — pruning before the shuffle is the whole point);
- keep-first shuffles (hash(text-hash), doc_id)-width rows only: the text
  itself stays in its block and the winner set is re-joined by id.

The thresholds are part of the operator contract (stated in the paired
DuckDB oracle verbatim), and the filter compares the 6-dp ROUNDED ratio so
both engines cut on exactly the same value — an unrounded float predicate
could flip a knife-edge document between engines."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min


def quality_filter(docs: ray.data.Dataset, *, min_words: int = 40,
                   min_alpha_ratio: float = 0.8) -> ray.data.Dataset:
    """Score + threshold in one stateless pass. Emits (doc_id, text,
    n_chars, n_words, alpha_ratio) for survivors."""
    from miekki_ray.functions.textstats import quality_scores

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        q = quality_scores(batch["text"])
        out = pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
            "text": batch["text"],
            "n_chars": q["n_chars"],
            "n_words": q["n_words"],
            "alpha_ratio": q["alpha_ratio"],
        })
        keep = (out["n_words"].to_numpy() >= min_words) & \
               (out["alpha_ratio"].to_numpy() >= min_alpha_ratio)
        return out[keep]

    return docs.map_batches(score, batch_format="pandas")


def keep_first_exact(scored: ray.data.Dataset) -> ray.data.Dataset:
    """Exact dedup keep-first over the filtered set: min doc_id per
    64-bit text hash, then a semi join back by doc_id. Only
    (hash, doc_id) pairs cross the exchange — never text."""
    def add_hash(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(batch["text"], index=False) \
            .to_numpy(np.uint64).view(np.int64)   # int64 for ray keys
        return batch.assign(_h=h)

    hashed = scored.map_batches(add_hash, batch_format="pandas")
    winners = (hashed.select_columns(["_h", "doc_id"])
               .groupby("_h").aggregate(Min("doc_id", alias_name="doc_id")))
    return (hashed.join(winners, join_type="inner", num_partitions=8,
                        on=("_h", "doc_id"))
            .drop_columns(["_h"]))


def curate_documents(docs: ray.data.Dataset, *, min_words: int = 40,
                     min_alpha_ratio: float = 0.8) -> ray.data.Dataset:
    """quality_filter → keep_first_exact; see module docstring."""
    return keep_first_exact(quality_filter(
        docs, min_words=min_words, min_alpha_ratio=min_alpha_ratio))
