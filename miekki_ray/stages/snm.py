"""Sorted-neighborhood dedup candidates (Hernández & Stolfo's SNM —
the classic windowed complement to LSH candidate generation).

Sort the corpus by a blocking key (e.g. the document's first K chars),
then propose every pair within a rank window of size w. Where LSH
proposes pairs that collide in a random projection, SNM proposes pairs
that are LEXICOGRAPHIC neighbors — it catches prefix-edit families and
shared-boilerplate runs that hash-based blocking can split, and its
output is exactly statable in SQL (rank self-join), so the operator is
hash-oracled rather than rows-only.

Scale shape (three SLIM shuffles, no text ever crosses an exchange
after the key map):
  1. (doc_id, key) → range partition by key-quantile boundaries.
     Boundaries come from a PER-BATCH stride decimation (a few evenly
     spaced keys from every batch, bounded by the block count) — NOT a
     ``limit()`` prefix, which on a corpus whose storage order
     correlates with the key (crawl/append-ordered corpora) would put
     every boundary at the low end and collapse the rank shuffle into
     one partition (r5 review). Then per-partition count → driver
     exclusive scan (P numbers) → per-partition sort + GLOBAL rank
     assignment — the pack_bins two-pass prefix-scan idiom over an
     arbitrary sort key.
  2. rank-band explode: band = rank // B, plus an overlap copy of each
     band's first w-1 rows into the previous band — bands hold EXACT
     consecutive rank ranges of size B >= w, so every within-window
     pair co-locates in exactly one band (single-boundary guarantee by
     construction, no skew assumption).
  3. per-band vectorized pair emission: ranks are consecutive integers,
     so the d-apart pairs are two array slices; a pair is emitted only
     where its LOWER-ranked row is band-owned — exactly-once.

Determinism: total order is (key, doc_id); ties in the key cannot
reorder across engines. The SQL twin states the identical order
(ORDER BY key, doc_id row_number self-join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def snm_pairs(docs: ray.data.Dataset, *, window: int = 10,
              key_col: str = "key", id_col: str = "doc_id",
              num_partitions: int = 16, band_size: int | None = None,
              boundary_sample: int = 4096) -> ray.data.Dataset:
    """(a, b, gap) for every doc pair within ``window`` ranks of each
    other under the (key, id) total order; a < b by id, gap = rank
    distance in [1, window-1]. Input needs (id_col int64, key_col
    string) — compute the blocking key upstream with a cheap map."""
    if window < 2:
        raise ValueError(f"window={window} proposes no pairs; need >= 2")
    B = band_size or max(window, 4096)
    if B < window:
        raise ValueError(
            f"band_size={B} < window={window}: a band must hold at "
            "least one full window for the single-boundary guarantee")
    P = num_partitions
    slim = docs.select_columns([id_col, key_col])

    # 1a. quantile boundaries from a bounded deterministic sample —
    # a stride decimation of EVERY batch (storage-order independent),
    # capped per batch so the collected sample is bounded by the block
    # count, not the corpus size
    per_batch = max(8, boundary_sample // 64)

    def decimate(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({key_col: pa.array([], type=pa.string())})
        stride = max(1, n // per_batch)
        idx = np.arange(0, n, stride, dtype=np.int64)[:per_batch]
        import pyarrow.compute as pc
        return pa.table({key_col: pc.take(batch[key_col],
                                          pa.array(idx))})

    sample = slim.map_batches(decimate, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    if len(sample) == 0:
        return ray.data.from_arrow(_EMPTY_PAIRS)
    skeys = np.sort(sample[key_col].to_numpy(dtype=object))
    qidx = (np.arange(1, P) * len(skeys)) // P
    bounds = skeys[qidx]                       # (P-1,) partition edges
    bref = ray.put(bounds)

    def tag(batch: pa.Table) -> pa.Table:
        b = ray.get(bref)
        keys = batch[key_col].to_pandas().to_numpy(dtype=object)
        part = np.searchsorted(b, keys, side="right").astype(np.int32)
        return pa.table({
            id_col: batch[id_col],
            key_col: batch[key_col],
            "_part": pa.array(part, type=pa.int32()),
        })

    tagged = slim.map_batches(tag, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()

    # 1b. per-partition counts -> exclusive scan -> global rank offsets
    counts = tagged.groupby("_part").count().to_pandas()
    counts = counts.sort_values("_part")
    offs = dict(zip(counts["_part"],
                    np.concatenate(([0],
                                    np.cumsum(counts["count()"]
                                              .to_numpy())[:-1]))))
    oref = ray.put(offs)

    def rank_part(group: pd.DataFrame) -> pa.Table:
        empty = pa.table({id_col: pa.array([], type=pa.int64()),
                          "_rnk": pa.array([], type=pa.int64())})
        if len(group) == 0 or id_col not in group.columns:
            return empty
        o = ray.get(oref)
        ids = group[id_col].to_numpy(dtype=np.int64)
        keys = group[key_col].to_numpy(dtype=object)
        order = np.lexsort((ids, keys))
        base = int(o[int(group["_part"].iat[0])])
        return pa.table({
            id_col: pa.array(ids[order], type=pa.int64()),
            "_rnk": pa.array(base + np.arange(ids.size, dtype=np.int64),
                             type=pa.int64()),
        })

    ranked = tagged.groupby("_part").map_groups(rank_part,
                                               batch_format="pandas")

    # 2. band explode with the w-1 overlap copy into the previous band
    w = window

    def band_tag(batch: pa.Table) -> pa.Table:
        rnk = batch["_rnk"].to_numpy()
        ids = batch[id_col].to_numpy()
        band = rnk // B
        own = np.ones(rnk.size, dtype=bool)
        head = (rnk % B < w - 1) & (band > 0)
        out_ids = np.concatenate([ids, ids[head]])
        out_rnk = np.concatenate([rnk, rnk[head]])
        out_band = np.concatenate([band, band[head] - 1])
        out_own = np.concatenate([own, np.zeros(int(head.sum()),
                                                dtype=bool)])
        return pa.table({
            id_col: pa.array(out_ids, type=pa.int64()),
            "_rnk": pa.array(out_rnk, type=pa.int64()),
            "_band": pa.array(out_band, type=pa.int64()),
            "_own": pa.array(out_own, type=pa.bool_()),
        })

    banded = ranked.map_batches(band_tag, batch_format="pyarrow",
                                zero_copy_batch=True)

    # 3. per-band consecutive-rank pair emission, lower row band-owned
    def emit(group: pd.DataFrame) -> pa.Table:
        if len(group) == 0 or "_rnk" not in group.columns:
            return _EMPTY_PAIRS
        order = np.argsort(group["_rnk"].to_numpy())
        rnk = group["_rnk"].to_numpy(dtype=np.int64)[order]
        ids = group[id_col].to_numpy(dtype=np.int64)[order]
        own = group["_own"].to_numpy(dtype=bool)[order]
        out_a, out_b, out_g = [], [], []
        n = rnk.size
        for d in range(1, w):
            if n <= d:
                break
            lo, hi = ids[:-d], ids[d:]
            keep = (rnk[d:] - rnk[:-d] == d) & own[:-d]
            if not keep.any():
                continue
            a = np.minimum(lo[keep], hi[keep])
            b = np.maximum(lo[keep], hi[keep])
            out_a.append(a)
            out_b.append(b)
            out_g.append(np.full(a.size, d, dtype=np.int64))
        if not out_a:
            return _EMPTY_PAIRS
        return pa.table({
            "a": pa.array(np.concatenate(out_a), type=pa.int64()),
            "b": pa.array(np.concatenate(out_b), type=pa.int64()),
            "gap": pa.array(np.concatenate(out_g), type=pa.int64()),
        })

    return banded.groupby("_band").map_groups(emit,
                                              batch_format="pandas")


_EMPTY_PAIRS = pa.table({"a": pa.array([], type=pa.int64()),
                         "b": pa.array([], type=pa.int64()),
                         "gap": pa.array([], type=pa.int64())})
