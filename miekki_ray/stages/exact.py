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


def _dedup_partition(grp: pa.Table) -> pa.Table:
    """Tag per-hash winners within a partition WITHOUT round-tripping the
    payload columns (the full doc text on the non-slim path) through
    pandas objects: only (doc_hash, conv_id) are touched as arrays; the
    rest of the table is reordered zero-copy via Arrow take, so doc stays
    large_string and text bytes are never re-boxed."""
    if grp.num_rows == 0:
        return grp.append_column("_rep", pa.array([], type=pa.string())) \
                  .append_column("_is_rep", pa.array([], type=pa.bool_()))
    dh = grp["doc_hash"].to_numpy(zero_copy_only=False)
    cid = grp["conv_id"].to_pandas().to_numpy(dtype=object)
    order = np.lexsort((cid, dh))
    dh_s, cid_s = dh[order], cid[order]
    starts = np.flatnonzero(
        np.concatenate(([True], dh_s[1:] != dh_s[:-1])))
    runlen = np.diff(np.append(starts, len(dh_s)))
    rep = np.repeat(cid_s[starts], runlen)
    t = grp.take(pa.array(order, type=pa.int64()))
    t = t.append_column("_rep", pa.array(rep, type=pa.string()))
    return t.append_column(
        "_is_rep", pa.array(cid_s == rep, type=pa.bool_()))


def exact_dedup(docs: ray.data.Dataset, cfg: DedupConfig
                ) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    from miekki_ray.functions.util import add_uint_part

    P = cfg.num_partitions
    parted = docs.map_batches(add_uint_part("doc_hash", P),
                              batch_format="pyarrow", zero_copy_batch=True)
    # materialize the tagged table ONCE: both outputs (unique docs + exact
    # edges) are cheap filters of it — without this, each consumer re-runs
    # the whole upstream shuffle
    tagged = parted.groupby("_part").map_groups(
        _dedup_partition, batch_format="pyarrow").materialize()

    unique_docs = tagged.filter(expr="_is_rep == True").drop_columns(
        ["_part", "_rep", "_is_rep"])
    edges = (
        tagged.filter(expr="_is_rep == False")
        .map_batches(_to_edges, batch_format="pandas")
    )
    return unique_docs, edges


def _to_edges(batch: pd.DataFrame) -> pa.Table:
    return _to_edges_loser(batch).drop_columns(["loser"])


def _tagged_slim(docs: ray.data.Dataset, cfg: DedupConfig
                 ) -> ray.data.Dataset:
    """The shared slim D1 core: (conv_id, doc_hash) projected, coarse-
    partitioned by doc_hash, winners tagged per partition. One
    definition for exact_dedup_slim AND exact_state_slim (r5 review —
    they carried verbatim copies of this chain)."""
    from miekki_ray.functions.util import add_uint_part

    slim = docs.select_columns(["conv_id", "doc_hash"])
    return (slim.map_batches(add_uint_part("doc_hash",
                                           cfg.num_partitions),
                             batch_format="pyarrow", zero_copy_batch=True)
            .groupby("_part")
            .map_groups(_dedup_partition, batch_format="pyarrow"))


def exact_dedup_slim(docs: ray.data.Dataset, cfg: DedupConfig
                     ) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """D1 over METADATA only: shuffles (conv_id, doc_hash) — a few bytes
    per doc instead of the full doc text — and returns
    (exact_edges Dataset, losers Dataset[conv_id, doc_hash], both lazy
    filters of one materialized tagged table).

    The caller filters its (already-sketched) docs table by broadcasting
    the loser set when it is small (``drop_losers``); above
    cfg.broadcast_loser_limit the flagship switches to the full
    ``exact_dedup`` doc_hash shuffle instead (SURVEY.md §2.4 J3/J4).
    Semantics identical to exact_dedup."""
    tagged = _tagged_slim(docs, cfg).materialize()
    edges = (tagged.filter(expr="_is_rep == False")
             .map_batches(_to_edges, batch_format="pandas"))
    losers = (tagged.filter(expr="_is_rep == False")
              .select_columns(["conv_id", "doc_hash"]))
    return edges, losers


def _to_edges_loser(batch: pd.DataFrame) -> pa.Table:
    a = np.minimum(batch["_rep"], batch["conv_id"])
    b = np.maximum(batch["_rep"], batch["conv_id"])
    return pa.table({"a": pa.array(a.astype(str), type=pa.string()),
                     "b": pa.array(b.astype(str), type=pa.string()),
                     "kind": pa.array(["exact"] * len(a),
                                      type=pa.string()),
                     "loser": pa.array(batch["conv_id"].astype(str),
                                       type=pa.string())})


def exact_state_slim(docs: ray.data.Dataset, cfg: DedupConfig
                     ) -> ray.data.Dataset:
    """D1 as ONE slim table (a, b, kind, loser): the exact edges with the
    losing conv_id carried alongside. Fuses the separate exact_edges /
    losers outputs so the checkpointed flagship persists a single
    metadata-sized stage instead of re-writing the full doc text as a
    ``unique_docs`` parquet (r4 profile: 3.6 s / 198 MB of the 15.5 s
    checkpointed wall was that re-write). The unique-docs set is DERIVED
    downstream: drop_losers(docs, losers) when the loser set broadcasts,
    the full exact_dedup shuffle above cfg.broadcast_loser_limit —
    exactly the in-memory flagship's auto-switch."""
    return (_tagged_slim(docs, cfg).filter(expr="_is_rep == False")
            .map_batches(_to_edges_loser, batch_format="pandas"))


def drop_losers(docs: ray.data.Dataset, losers: pd.DataFrame
                ) -> ray.data.Dataset:
    """Broadcast semi-filter: drop exact-dup losers from the docs table.
    Loser set is broadcast once via ray.put (J3); at scales where the
    loser set itself cannot be broadcast, use an anti-join instead."""
    import ray as _ray

    if len(losers) == 0:
        return docs
    ref = _ray.put(pd.Index(losers["conv_id"].astype(str)))

    def f(batch: pa.Table) -> pa.Table:
        bad = _ray.get(ref)
        mask = ~pd.Index(batch["conv_id"].to_pandas().astype(str)).isin(bad)
        return batch.filter(pa.array(np.asarray(mask)))

    return docs.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
