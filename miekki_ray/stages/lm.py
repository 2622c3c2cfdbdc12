"""Character-trigram language-model quality scoring (CCNet/Gopher-style
perplexity filtering — the standard curation signal this engine's
length/punct/stopword heuristics don't cover).

Model: byte-trigram counts with add-one smoothing over a byte alphabet,
P(t) = (c(t) + 1) / (c(prefix2(t)) + 256), fit on a DETERMINISTIC
content-addressed sample of the corpus (the engine's sampling-digest
convention, relational._digest_rank16) and applied to every doc as
avg log P over its trigrams — low scores flag degenerate/unnatural text.

Scale shape (the 100-TB path):
  - FIT: per-batch partial trigram counts (np.unique over byte codes cut
    straight from the Arrow buffer) → the engine's coarse-partition
    reduce (_part = code % P → groupby → reduceat sum) → driver collect.
    The vocabulary is BOUNDED at 256³ ≈ 16.7M codes regardless of corpus
    size, so the collected model is broadcastable by construction.
  - SCORE: ray.put the model once, one stateless vectorized streaming
    pass (searchsorted lookups, reduceat per-doc means). No shuffle.

The trigram extraction is exact byte identity (code = b0·65536 + b1·256
+ b2), not the rolling polynomial hash the sketcher uses — exactness is
what lets the DuckDB oracle state the identical model in SQL (substr
trigram counts; the driver corpus is pure ASCII so char == byte; on
non-ASCII corpora the engine's byte-level model still stands, it just
diverges from SQL substr semantics — documented, not oracled, there).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

V = 256          # smoothing vocabulary: one byte
ALPHA = 1.0      # add-one smoothing (stated identically in the oracle)


def tri_codes(col) -> tuple[np.ndarray, np.ndarray]:
    """(codes, tri_lens): exact byte-trigram codes of every in-doc
    position of an Arrow string column, doc-ordered, plus the per-doc
    trigram count (len-2, floored at 0). Cut straight from the shared
    Arrow data buffer — no Python strings. A position is valid iff its
    first and third byte fall in the same doc (pos_doc[:-2] ==
    pos_doc[2:]), which excludes windows crossing doc boundaries."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return (np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64))
    off_dtype = (np.int64 if pa.types.is_large_string(col.type)
                 else np.int32)
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[
        col.offset:col.offset + n + 1].astype(np.int64)
    lens = np.diff(offs)
    tri_lens = np.maximum(lens - 2, 0)
    total = int(offs[-1] - offs[0])
    if total < 3:
        return np.empty(0, dtype=np.int64), tri_lens
    data = np.frombuffer(bufs[2], dtype=np.uint8)[
        offs[0]:offs[-1]].astype(np.int64)
    codes = data[:-2] * 65536 + data[1:-1] * 256 + data[2:]
    pos_doc = np.repeat(np.arange(n, dtype=np.int64), lens)
    valid = pos_doc[:-2] == pos_doc[2:]
    return codes[valid], tri_lens


def fit_trigram_counts(docs: ray.data.Dataset, text_col: str = "text",
                       num_partitions: int = 16) -> pd.DataFrame:
    """Distributed trigram count fit → (code, n) DataFrame sorted by
    code. Partial counts per batch, coarse-partition reduceat reduce —
    the exchange carries (code, partial-count) pairs only, bounded by
    256³ distinct codes however big the corpus is."""
    P = num_partitions

    def partial(batch: pa.Table) -> pa.Table:
        codes, _ = tri_codes(batch[text_col])
        u, c = np.unique(codes, return_counts=True)
        return pa.table({
            "code": pa.array(u, type=pa.int64()),
            "n": pa.array(c.astype(np.int64), type=pa.int64()),
            "_part": pa.array((u % P).astype(np.int32), type=pa.int32()),
        })

    def reduce_part(group: pd.DataFrame) -> pa.Table:
        empty = pa.table({"code": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})
        if len(group) == 0 or "code" not in group.columns:
            return empty
        codes = group["code"].to_numpy(dtype=np.int64)
        ns = group["n"].to_numpy(dtype=np.int64)
        order = np.argsort(codes, kind="stable")
        cs, nss = codes[order], ns[order]
        starts = np.flatnonzero(
            np.concatenate(([True], cs[1:] != cs[:-1])))
        return pa.table({
            "code": pa.array(cs[starts], type=pa.int64()),
            "n": pa.array(np.add.reduceat(nss, starts),
                          type=pa.int64()),
        })

    out = (docs.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("_part").map_groups(reduce_part,
                                        batch_format="pandas")
           .to_pandas())
    if "code" not in out.columns:
        out = pd.DataFrame({"code": pd.Series([], dtype=np.int64),
                            "n": pd.Series([], dtype=np.int64)})
    return out.sort_values("code").reset_index(drop=True)


def _ctx_table(counts: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Context (prefix-bigram) counts derived from the trigram table:
    ctx_code = code // 256, ctx count = sum of its trigrams' counts."""
    codes = counts["code"].to_numpy(dtype=np.int64)
    ns = counts["n"].to_numpy(dtype=np.int64)
    if codes.size == 0:
        return (np.empty(0, dtype=np.int64),
                np.empty(0, dtype=np.int64))
    ctx = codes // 256
    starts = np.flatnonzero(np.concatenate(([True], ctx[1:] != ctx[:-1])))
    return ctx[starts], np.add.reduceat(ns, starts)


def _lookup(sorted_keys: np.ndarray, vals: np.ndarray,
            keys: np.ndarray) -> np.ndarray:
    """Vectorized sorted-array lookup, 0.0 for misses — THE model-count
    lookup shared by score_docs and lm_filter (one definition; the
    smoothing semantics the SQL oracles pin must not drift, r5
    review)."""
    out = np.zeros(keys.size, dtype=np.float64)
    if sorted_keys.size:
        idx = np.searchsorted(sorted_keys, keys)
        idx_c = np.minimum(idx, sorted_keys.size - 1)
        hit = sorted_keys[idx_c] == keys
        out[hit] = vals[idx_c[hit]]
    return out


def _model_ref(counts: pd.DataFrame):
    """Broadcast the fitted model ONCE: (trigram codes sorted, counts,
    ctx codes sorted, ctx counts) as a ray.put reference."""
    codes_sorted = counts["code"].to_numpy(dtype=np.int64)
    n_sorted = counts["n"].to_numpy(dtype=np.float64)
    if len(counts):
        ctx_sorted, ctx_n = _ctx_table(counts)
    else:
        ctx_sorted = np.empty(0, dtype=np.int64)
        ctx_n = np.empty(0, dtype=np.int64)
    return ray.put((codes_sorted, n_sorted, ctx_sorted,
                    ctx_n.astype(np.float64)))


def _batch_avg_logp(col, model) -> tuple[np.ndarray, np.ndarray]:
    """THE per-batch scoring core shared by score_docs and lm_filter:
    (avg_logp rounded 6dp per row, -inf for trigram-less rows; tri_lens
    per row). One definition so the smoothing formula, rounding and
    lookup — the exact knife-edge semantics the SQL twins state — can
    never diverge between the scorer and the filter (r5 review)."""
    from miekki_ray.functions.textstats import round_half_away

    tc, tn, cc, cn = model
    codes, tri_lens = tri_codes(col)
    c = _lookup(tc, tn, codes)
    cx = _lookup(cc, cn, codes // 256)
    logp = np.log((c + ALPHA) / (cx + ALPHA * V))
    avg = np.full(tri_lens.size, -np.inf)
    has = tri_lens > 0
    starts = np.concatenate(([0], np.cumsum(tri_lens)[:-1]))[has]
    if starts.size:
        avg[has] = round_half_away(
            np.add.reduceat(logp, starts) / tri_lens[has], 6)
    return avg, tri_lens


def score_docs(docs: ray.data.Dataset, counts: pd.DataFrame,
               id_col: str = "doc_id", text_col: str = "text"
               ) -> ray.data.Dataset:
    """Per-doc average trigram log-probability under the fitted model:
    one broadcast (ray.put) + one stateless vectorized pass. Output:
    (doc_id, n_tri int64, avg_logp float64 rounded 6dp); docs with fewer
    than one trigram (length < 3) are excluded — AVG over zero rows is
    NULL in the SQL twin."""
    ref = _model_ref(counts)
    EMPTY = pa.table({id_col: pa.array([], type=pa.int64()),
                      "n_tri": pa.array([], type=pa.int64()),
                      "avg_logp": pa.array([], type=pa.float64())})

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return EMPTY
        avg, tri_lens = _batch_avg_logp(batch[text_col], ray.get(ref))
        keep = tri_lens > 0
        ids = batch[id_col].to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            id_col: pa.array(ids),
            "n_tri": pa.array(tri_lens[keep], type=pa.int64()),
            "avg_logp": pa.array(avg[keep], type=pa.float64()),
        })

    return docs.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)


def lm_filter(docs: ray.data.Dataset, *, threshold: float,
              digest: str = "splitmix", id_col: str = "doc_id",
              text_col: str = "text",
              num_partitions: int = 16) -> ray.data.Dataset:
    """Perplexity FILTER for the curation chain: fit the trigram model on
    the deterministic content-addressed 1/16 sample OF THE INPUT (rank 0
    under ``digest`` — CCNet fits on a reference corpus; self-training on
    the corpus sample is the self-contained variant), then keep rows
    whose 6-dp-rounded avg trigram log-prob is >= ``threshold``. All
    input columns pass through, plus ``avg_logp``. Rows without a single
    trigram (text shorter than 3 chars) are dropped — they carry no
    score. The comparison uses the ROUNDED value so the SQL twin cuts on
    exactly the same number (the curate-module knife-edge rule).

    NOTE the model fit is an execution barrier over the sample branch: on
    a lazy input it re-executes the upstream lineage for the ~1/16
    sample. In the checkpointed job the input is a parquet-backed stage
    read, so the fit pass is a cheap projected re-read."""
    from miekki_ray.relational import _digest_rank16

    def sample_filter(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(_digest_rank16(ids, digest) == 0))

    counts = fit_trigram_counts(
        docs.map_batches(sample_filter, batch_format="pyarrow",
                         zero_copy_batch=True),
        text_col=text_col, num_partitions=num_partitions)
    ref = _model_ref(counts)

    def filt(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # typed empty WITH the output column: an all-filtered-
            # upstream corpus must still carry avg_logp in its schema
            # (the quality_filter/score_docs discipline, r5 review)
            return batch.append_column(
                "avg_logp", pa.array([], type=pa.float64()))
        avg, tri_lens = _batch_avg_logp(batch[text_col], ray.get(ref))
        keep = (tri_lens > 0) & (avg >= threshold)
        out = batch.filter(pa.array(keep))
        return out.append_column(
            "avg_logp", pa.array(avg[keep], type=pa.float64()))

    return docs.map_batches(filt, batch_format="pyarrow",
                            zero_copy_batch=True)
