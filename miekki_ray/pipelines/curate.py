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
- keep-first makes ONE grouped exchange on hash(text) and resolves
  winners against the exact text inside each group (collision-safe).

The thresholds are part of the operator contract (stated in the paired
DuckDB oracle verbatim), and the filter compares the 6-dp ROUNDED ratio so
both engines cut on exactly the same value — an unrounded float predicate
could flip a knife-edge document between engines."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def quality_filter(docs: ray.data.Dataset, *, min_words: int = 40,
                   min_alpha_ratio: float = 0.8) -> ray.data.Dataset:
    """Score + threshold in one stateless pass. Emits (doc_id, text,
    n_chars, n_words, alpha_ratio) for survivors."""
    from miekki_ray.functions.textstats import quality_scores

    from miekki_ray.functions.util import pa_from_pandas

    def score(batch: pd.DataFrame) -> pa.Table:
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
        # clean Arrow out: pandas-backed blocks defeat the downstream
        # shuffle's schema-dedup (see util.pa_from_pandas). An ALL-
        # filtered batch must keep its types: from_pandas infers
        # Arrow `null` for an empty object column, the schema-drift
        # hazard guarded elsewhere with typed empty tables.
        if not keep.any():
            return pa.schema([("doc_id", pa.int64()),
                              ("text", pa.string()),
                              ("n_chars", pa.int64()),
                              ("n_words", pa.int64()),
                              ("alpha_ratio", pa.float64())]).empty_table()
        return pa_from_pandas(out[keep])

    return docs.map_batches(score, batch_format="pandas")


def keep_first_exact(scored: ray.data.Dataset,
                     num_partitions: int = 16) -> ray.data.Dataset:
    """Exact dedup keep-first over the filtered set: one grouped exchange
    on a 64-bit text hash co-locates every copy of a text (plus any hash
    collisions), then a vectorized per-partition pass keeps the smallest
    doc_id per EXACT text — the full text is compared inside the group,
    so a hash collision can never delete a distinct document (at 10^12
    docs the birthday bound makes 64-bit collisions certain; the hash is
    a partitioner here, not an identity). Text crosses the exchange once
    — the same cost contract as the flagship's doc shuffle."""
    from miekki_ray.functions.util import pa_from_pandas, str_part

    def add_part(batch: pd.DataFrame) -> pa.Table:
        return pa_from_pandas(
            batch.assign(_p=str_part(batch["text"], num_partitions)))

    def keep_first(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values("doc_id", kind="mergesort")
        return pa_from_pandas(
            g.drop_duplicates("text").drop(columns=["_p"]))

    return (scored.map_batches(add_part, batch_format="pandas")
            .groupby("_p").map_groups(keep_first, batch_format="pandas"))


def curate_documents(docs: ray.data.Dataset, *, min_words: int = 40,
                     min_alpha_ratio: float = 0.8,
                     num_partitions: int = 16) -> ray.data.Dataset:
    """quality_filter → keep_first_exact; see module docstring.
    ``num_partitions`` sizes the pipeline's ONE grouped exchange — size it
    like any shuffle width (~4x the executor count)."""
    return keep_first_exact(
        quality_filter(docs, min_words=min_words,
                       min_alpha_ratio=min_alpha_ratio),
        num_partitions=num_partitions)
