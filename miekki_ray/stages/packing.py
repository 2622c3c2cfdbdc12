"""Sequence packing: assign documents to fixed-token-budget training bins
by a GLOBAL running token count in doc_id order — the concat-and-chunk
packing rule (``bin = exclusive_prefix_sum // budget``, i.e. SQL
``SUM() OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING AND 1
PRECEDING)``). Documents may straddle a bin boundary; the bin is where
the document STARTS, matching the chunked-concatenation layout used for
LM pretraining batches.

Rendered as a distributed two-pass prefix scan (the classic parallel
scan, a pattern no other stage in this repo needs): pass A computes
per-range-partition token totals — P tiny rows to the driver, which
exclusive-scans them into offsets — and pass B re-derives the SAME
deterministic range partitions and finishes the cumsum locally with its
partition's offset. Only (doc_id, n_tokens) — 16 bytes/row — crosses
either exchange; text is read once in the counting map and dropped
immediately. The materialize() holds the slim id/count table only,
never text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from miekki_ray.functions.textstats import whitespace_token_count


def pack_bins(docs: ray.data.Dataset, *, budget: int = 2048,
              id_col: str = "doc_id", text_col: str = "text",
              num_partitions: int = 16,
              tokenizer: str = "whitespace") -> ray.data.Dataset:
    """Returns (id_col, n_tokens:int64, bin:int64).

    tokenizer='whitespace' (default) counts with the ASCII-whitespace
    kernel shared with doc_token_counts, so the oracle can restate it
    with the same string_split_regex class. tokenizer='bpe' counts with
    the vendored byte-level BPE (functions/bpe.py — production shape for
    LM packing; pinned by pytest golden, not SQL-expressible). The
    prefix-scan machinery is tokenizer-independent."""
    if tokenizer == "bpe":
        from miekki_ray.functions.bpe import bpe_token_count as _count
    elif tokenizer == "whitespace":
        _count = whitespace_token_count
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r} "
                         "(expected 'whitespace' or 'bpe')")

    def count_tokens(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(dtype=np.int64),
            "n_tokens": _count(batch[text_col]),
        })

    slim = docs.map_batches(count_tokens,
                            batch_format="pandas").materialize()
    stats = slim.aggregate(Count())
    if not stats or not stats.get("count()"):
        return slim.map_batches(
            lambda b: b.assign(bin=np.empty(0, dtype=np.int64)),
            batch_format="pandas")

    P = max(1, min(num_partitions, int(stats["count()"])))

    # deterministic RANGE partitions: prefix-scan needs ordered
    # contiguity, so the tag must be monotone in doc_id (a hash
    # partition would interleave ranges). Boundaries come from a
    # t-digest quantile sketch over the ids (one cheap pass over the
    # materialized slim table) rather than a value-proportional linear
    # map, so a pathologically clustered id space — 99% of ids in one
    # narrow band — still yields ~equal partition POPULATIONS
    # (VERDICT r3 Next #5). searchsorted over sorted boundaries is
    # monotone in id, so contiguity is preserved; computed once on the
    # driver and captured in the tag closure, so re-derivation in pass B
    # matches pass A exactly even across lineage re-execution.
    if P > 1:
        from miekki_ray.functions.tdigest import approx_quantiles
        bounds = approx_quantiles(
            slim, id_col, qs=tuple(i / P for i in range(1, P)))
    else:
        bounds = np.empty(0, dtype=np.float64)

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy(dtype=np.int64)
        p = np.searchsorted(bounds, ids.astype(np.float64), side="left")
        return batch.assign(_p=p.astype(np.int32))

    tagged = slim.map_batches(tag, batch_format="pandas")

    # pass A: per-partition totals -> driver exclusive scan (P rows)
    totals = (tagged.groupby("_p")
              .aggregate(Sum("n_tokens", alias_name="tok"))
              .to_pandas().sort_values("_p"))
    toks = totals["tok"].to_numpy(dtype=np.int64)
    offsets = dict(zip(
        totals["_p"].astype(int),
        np.concatenate([[0], np.cumsum(toks)[:-1]])))

    # pass B: same tags, local cumsum + broadcast offset (tiny dict,
    # ships in the task closure once)
    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        t = g["n_tokens"].to_numpy(dtype=np.int64)
        start = offsets[int(g["_p"].iloc[0])] + np.cumsum(t) - t
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "n_tokens": t,
            "bin": start // np.int64(budget),
        })

    return tagged.groupby("_p").map_groups(assign, batch_format="pandas")


def chunk_docs(docs: ray.data.Dataset, *, chunk_tokens: int = 64,
               overlap: int = 16, num_partitions: int = 16,
               id_col: str = "doc_id", text_col: str = "text"
               ) -> ray.data.Dataset:
    """E58 — training-window CHUNKING with overlap (the standard
    pretraining/RAG splitter, the intra-document complement of
    pack_bins' inter-document packing): each doc's whitespace tokens
    are windowed into chunks of ``chunk_tokens`` starting every
    ``chunk_tokens - overlap`` positions; the last chunk may be short.
    Output: (doc_id, chunk_idx, n_tokens, chunk_text), chunk_text =
    the window's tokens re-joined with single spaces.

    Scale shape: one map explodes (doc_id, chunk_idx, token_idx, token)
    rows — each token lands in at most ceil(C/step) chunks — then ONE
    doc-hash grouped exchange assembles chunks with an Arrow-native
    list build + pc.binary_join (no per-token Python). Tokenization is
    pc.split_pattern(' '), byte-identical to the SQL twin's
    string_split (empty tokens from repeated spaces included — the
    split is the contract, not a linguistic tokenizer)."""
    import pyarrow.compute as pc

    from miekki_ray.functions.hashing import splitmix64

    C, O = chunk_tokens, overlap
    if not 0 <= O < C:
        raise ValueError(f"overlap={O} must satisfy 0 <= overlap < "
                         f"chunk_tokens={C}")
    step = C - O
    n_mem = -(-C // step)               # ceil: max chunks per token
    P = num_partitions

    def explode(batch: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], type=pa.int64()),
            "_k": pa.array([], type=pa.int64()),
            "_idx": pa.array([], type=pa.int64()),
            "_tok": pa.array([], type=pa.string()),
            "_part": pa.array([], type=pa.int32()),
        })
        if batch.num_rows == 0:
            return empty
        # null-text docs drop, matching the SQL twin (unnest of NULL
        # yields no rows) — without this pc.list_value_length raises on
        # the null list (r5 review, reproduced)
        batch = batch.filter(pc.is_valid(batch[text_col]))
        if batch.num_rows == 0:
            return empty
        toks = pc.split_pattern(batch[text_col], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        total = int(lens.sum())
        if total == 0:
            return empty
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        doc_rep = np.repeat(ids, lens)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        idx = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
        flat = toks.flatten()
        base = idx // step
        out = []
        for m in range(n_mem):
            k = base - m
            valid = (k >= 0) & (idx < k * step + C)
            if not valid.any():
                continue
            out.append(pa.table({
                id_col: pa.array(doc_rep[valid], type=pa.int64()),
                "_k": pa.array(k[valid], type=pa.int64()),
                "_idx": pa.array(idx[valid], type=pa.int64()),
                "_tok": flat.filter(pa.array(valid)),
            }))
        t = pa.concat_tables(out)
        part = (splitmix64(t[id_col].to_numpy().view(np.uint64))
                % np.uint64(P)).astype(np.int32)
        return t.append_column("_part", pa.array(part, type=pa.int32()))

    def assemble(group: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], type=pa.int64()),
            "chunk_idx": pa.array([], type=pa.int64()),
            "n_tokens": pa.array([], type=pa.int64()),
            "chunk_text": pa.array([], type=pa.string()),
        })
        if group.num_rows == 0 or "_k" not in group.column_names:
            return empty
        # Arrow all the way (r5 review): key columns to numpy for the
        # sort, tokens reordered with pc.take — no Python-string boxing
        # on the per-token exchange; offsets int64 (LargeList) so a
        # partition is never capped at 2^31 token rows
        ids = group[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ks = group["_k"].to_numpy(zero_copy_only=False)
        idxs = group["_idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((idxs, ks, ids))
        ids, ks = ids[order], ks[order]
        tok_vals = pc.take(group["_tok"],
                           pa.array(order, type=pa.int64()))
        if isinstance(tok_vals, pa.ChunkedArray):
            tok_vals = tok_vals.combine_chunks()
        change = np.flatnonzero(np.concatenate(
            ([True], (ids[1:] != ids[:-1]) | (ks[1:] != ks[:-1]))))
        bounds = np.append(change, ids.size)
        lists = pa.LargeListArray.from_arrays(
            pa.array(bounds, type=pa.int64()), tok_vals)
        return pa.table({
            id_col: pa.array(ids[change], type=pa.int64()),
            "chunk_idx": pa.array(ks[change], type=pa.int64()),
            "n_tokens": pa.array(np.diff(bounds), type=pa.int64()),
            "chunk_text": pc.binary_join(lists, " ").cast(pa.string()),
        })

    return (docs.map_batches(explode, batch_format="pyarrow",
                             zero_copy_batch=True)
            .groupby("_part").map_groups(assemble,
                                         batch_format="pyarrow"))
