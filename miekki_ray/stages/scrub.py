"""PII scrubbing and benchmark decontamination — curation stages every
large-scale training-data pipeline runs alongside near-dedup
[SURVEY.md §2.11; spec BASELINE.json:15 text-corpus envelope].

- ``redact_pii``: stateless vectorized Arrow map (RE2 kernels via
  pyarrow.compute, ASCII classes so the DuckDB oracle agrees byte-for-
  byte), no shuffle — redaction is embarrassingly parallel.
- ``decontaminate``: the benchmark/eval set is TINY next to the corpus
  (the 100-TB side is the candidates), so its word-n-gram set is
  collected once and broadcast via ``ray.put`` — the canonical
  small-side pattern — and deserialized once per worker process via a
  module-level cache, not once per batch. The corpus-side membership
  scan is per-batch vectorized with NO shuffle at all. Grams are
  compared as exact strings (no hashing), so the result is
  deterministic and oracle-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum

# RE2-compatible ASCII patterns (same class discipline as
# functions/textstats.py: DuckDB's regexp_* is RE2 too, so the kernels and
# oracles share semantics exactly)
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}"


def redact_pii(ds: ray.data.Dataset, text_col: str = "text"
               ) -> ray.data.Dataset:
    """Replace emails then phone numbers in ``text_col`` with
    ``<EMAIL>`` / ``<PHONE>`` placeholders; append int64 match counts
    (counted on the RAW text, before redaction) as ``n_emails`` /
    ``n_phones``. Oracle: nested DuckDB ``regexp_replace(..., 'g')`` +
    ``len(regexp_extract_all(...))`` with identical patterns."""
    def f(batch: pa.Table) -> pa.Table:
        t = batch[text_col]
        n_e = pc.cast(pc.count_substring_regex(t, EMAIL_RE), pa.int64())
        n_p = pc.cast(pc.count_substring_regex(t, PHONE_RE), pa.int64())
        clean = pc.replace_substring_regex(t, EMAIL_RE, "<EMAIL>")
        clean = pc.replace_substring_regex(clean, PHONE_RE, "<PHONE>")
        cols = {c: (clean if c == text_col else batch[c])
                for c in batch.column_names}
        cols["n_emails"] = n_e
        cols["n_phones"] = n_p
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _batch_grams(texts: pd.Series, n: int
                 ) -> tuple[np.ndarray, np.ndarray]:
    """(row_position, gram_string) for every word n-gram in the batch.
    Rows with fewer than n words contribute none. Tokenizer pinned to
    ``TOKEN_SPLIT_RE`` — the complement of the oracle's RE2 split class
    ``[\\s\\x1c-\\x1f]+`` (RE2 ``\\s`` is ASCII-only; Python
    ``str.split()`` would diverge on VT/NBSP/Unicode spaces)."""
    from miekki_ray.functions.textstats import TOKEN_SPLIT_RE

    words = (texts.fillna("").reset_index(drop=True)
             .str.findall(TOKEN_SPLIT_RE))
    ex = words.explode().dropna()
    if len(ex) < n:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=object))
    idx = ex.index.to_numpy(dtype=np.int64)
    w = ex.to_numpy(dtype=object)
    m = len(w) - n + 1
    # an n-gram is valid iff its first and last word are in the same row
    valid = idx[:m] == idx[n - 1:]
    gram = w[:m].copy()
    for j in range(1, n):
        gram = gram + " "
        gram = gram + w[j:j + m]
    return idx[:m][valid], gram[valid]


# warm-worker cache: the broadcast gram set is deserialized once per
# worker PROCESS (same pattern as the Sketcher's task cache), not once
# per batch
_GRAM_CACHE: dict[str, frozenset] = {}


def _cached_grams(ref) -> frozenset:
    key = ref.hex()
    v = _GRAM_CACHE.get(key)
    if v is None:
        v = _GRAM_CACHE[key] = ray.get(ref)
        if len(_GRAM_CACHE) > 4:          # bound worker memory
            _GRAM_CACHE.pop(next(iter(_GRAM_CACHE)))
    return v


def decontaminate(candidates: ray.data.Dataset, bench: ray.data.Dataset,
                  *, n_words: int = 8, text_col: str = "text",
                  id_col: str = "doc_id",
                  emit: str = "flags") -> ray.data.Dataset:
    """Flag every candidate document sharing at least one word
    ``n_words``-gram with ANY benchmark document (test-set
    decontamination). emit='flags' (default) returns
    (id_col, contaminated:bool); emit='clean' returns the SURVIVING
    candidate rows with their original columns — the shape pipeline
    compositions chain on (same flag kernel, zero extra exchange).

    The bench gram set is driver-collected by design: an eval benchmark
    is bounded (thousands of docs) regardless of corpus scale — the
    asymmetric small side of this operator's contract."""
    assert emit in ("flags", "clean"), emit
    def bench_grams(batch: pd.DataFrame) -> pd.DataFrame:
        _, grams = _batch_grams(batch[text_col], n_words)
        return pd.DataFrame({"gram": pd.unique(grams)})

    gset: set[str] = set()
    for b in (bench.map_batches(bench_grams, batch_format="pandas")
              .iter_batches(batch_format="pandas")):
        gset.update(b["gram"])
    ref = ray.put(frozenset(gset))

    def flag(batch: pa.Table) -> pa.Table:
        grams_set = _cached_grams(ref)
        idx, grams = _batch_grams(batch[text_col].to_pandas(), n_words)
        contaminated = np.zeros(batch.num_rows, dtype=bool)
        if len(grams):
            hit = pd.Series(grams).isin(grams_set).to_numpy()
            contaminated[np.unique(idx[hit])] = True
        if emit == "clean":
            # Arrow filter, NOT a pandas .iloc: an ALL-contaminated batch
            # filtered in pandas comes back as an empty object-dtype
            # frame whose Arrow schema infers text:null — schema drift in
            # the checkpointed 'clean' stage (r4 review). Arrow keeps the
            # typed schema for empty results, and typed Arrow returns
            # preserve the shuffle schema-dedup fast path.
            return batch.filter(pa.array(~contaminated))
        return pa.table({
            id_col: batch[id_col],
            "contaminated": pa.array(contaminated, type=pa.bool_()),
        })

    return candidates.map_batches(flag, batch_format="pyarrow",
                                  zero_copy_batch=True)


def dup_ngram_stats(docs: ray.data.Dataset, *, n_words: int = 8,
                    text_col: str = "text", id_col: str = "doc_id",
                    flag_threshold: float = 0.5,
                    num_partitions: int = 8) -> ray.data.Dataset:
    """Cross-document duplicate n-gram statistics — the corpus-level
    "duplicate n-gram fraction" signal production curation stacks rank
    and filter on (the cross-doc complement of the within-doc
    ``repetition_ratio``; SURVEY.md §2.11).

    Per document with at least ``n_words`` words:
    ``n_grams`` (count of DISTINCT word n-grams), ``n_shared`` (those
    present in >= 2 distinct documents), ``shared_ratio`` (rounded to 6,
    DuckDB ROUND parity) and ``dup_flag`` (ratio >= flag_threshold).
    Documents with fewer than ``n_words`` words have no grams and emit
    no row — stated contract, mirrored by the oracle's ``len(ws) >= n``.

    Scale shape — deliberately NOT decontaminate's broadcast: there the
    membership side is a bounded eval set; here it is the corpus itself,
    so document frequency is computed with a gram-key exchange. The
    exploded rows carry (hash128, doc_id) only — 24 bytes per
    doc-distinct gram, never gram text. A document lives in one input
    row, so within-doc dedupe happens locally in the explode map, which
    makes gram-group size == doc frequency exactly. Plan: explode →
    gram-hash grouped Count (df table, distinct-gram-sized) → hash join
    back (both sides hash-width) → doc-key grouped Count/Sum →
    vectorized finalize. Collision odds on the 128-bit key ~2^-128-scale
    (same contract as relational._text_hash128)."""
    def explode(batch: pa.Table) -> pa.Table:
        # Arrow in AND out: downstream multi-key sort-aggregates are ~15x
        # slower on pandas blocks (measured 52.6s vs 3.5s on a 24k-row
        # sf0.001 explode), and a pandas INPUT format makes Ray derive
        # unhashable block schemas that defeat the shuffle schema-dedup
        # fast path ('Failed to hash the schemas' spam, 32 hits/run [env
        # ray 2.49.2]). _batch_grams needs a Series; convert locally.
        idx, grams = _batch_grams(batch[text_col].to_pandas(), n_words)
        ids = batch[id_col].to_numpy()
        if not len(grams):
            return pa.table({
                "_h1": pa.array([], type=pa.int64()),
                "_h2": pa.array([], type=pa.int64()),
                id_col: pa.array(ids[:0], type=batch[id_col].type),
            })
        per = pd.DataFrame({"r": idx, "gram": grams}).drop_duplicates()
        # shared 128-bit key convention (util.series_hash128; the
        # 'miekki-g' prefix keeps this operator's historical key stream)
        from miekki_ray.functions.util import series_hash128
        h1, h2 = series_hash128(per["gram"].astype(str), "miekki-g")
        return pa.table({
            "_h1": pa.array(h1, type=pa.int64()),
            "_h2": pa.array(h2, type=pa.int64()),
            id_col: pa.array(ids[per["r"].to_numpy()]),
        })

    exploded = docs.map_batches(explode, batch_format="pyarrow",
                                zero_copy_batch=True)
    df_tbl = exploded.groupby(["_h1", "_h2"]).aggregate(
        Count(alias_name="_df"))
    # exploded feeds both the df groupby and the join probe; its lineage
    # (pruned read + explode map) re-executes once per consumer — the
    # stream-friendly choice over a mid-pipeline materialize barrier
    # (same tradeoff as relational.documents_dup_clusters)
    j = exploded.join(df_tbl, join_type="inner",
                      num_partitions=num_partitions,
                      on=("_h1", "_h2"), right_on=("_h1", "_h2"))

    def tag(batch: pa.Table) -> pa.Table:
        shared = pc.cast(pc.greater_equal(batch["_df"], 2), pa.int64())
        return pa.table({id_col: batch[id_col], "shared": shared})

    per_doc = (j.map_batches(tag, batch_format="pyarrow",
                             zero_copy_batch=True)
               .groupby(id_col)
               .aggregate(Count(alias_name="n_grams"),
                          Sum("shared", alias_name="n_shared")))

    def finalize(batch: pa.Table) -> pa.Table:
        from miekki_ray.functions.textstats import round_half_away

        n = batch["n_grams"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = batch["n_shared"].to_numpy(zero_copy_only=False).astype(np.int64)
        ratio = round_half_away(s / np.maximum(n, 1), 6)
        return pa.table({
            id_col: batch[id_col],
            "n_grams": pa.array(n, type=pa.int64()),
            "n_shared": pa.array(s, type=pa.int64()),
            "shared_ratio": pa.array(ratio, type=pa.float64()),
            "dup_flag": pa.array(ratio >= flag_threshold, type=pa.bool_()),
        })

    return per_doc.map_batches(finalize, batch_format="pyarrow",
                               zero_copy_batch=True).sort(id_col)
